"""VggTinyFusedStem: the packed-conv + Pallas fused conv1+pool stem
computes the identical function as VggTiny at inference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpose_tpu.models.backbones import (
    VggTiny, VggTinyFusedStem, remap_vggtiny_to_fused,
)
from hyperpose_tpu.models.openpose import LightWeightOpenPose
from hyperpose_tpu.ops.pallas.stem_kernel import (
    fused_conv1_pool, fused_conv1_pool_reference,
)


def _randomize_bn(variables, rng):
    """Give BN non-trivial folded parameters (init is scale=1, mean=0)."""

    def visit(tree, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = visit(v, path + (k,))
            else:
                arr = np.asarray(v)
                if path and path[-1] == "bn":
                    if k in ("scale", "var"):
                        arr = rng.uniform(0.5, 1.5, arr.shape).astype(arr.dtype)
                    else:
                        arr = rng.normal(0, 0.3, arr.shape).astype(arr.dtype)
                out[k] = arr
        return out

    return jax.tree.map(lambda x: x, {
        "params": visit(variables["params"]),
        "batch_stats": visit(variables["batch_stats"]),
    })


def test_kernel_matches_xla_oracle():
    rng = np.random.default_rng(0)
    a0p = jnp.asarray(rng.normal(0, 1, (2, 24, 16, 128)), jnp.float32)
    w1p = jnp.asarray(rng.normal(0, 0.1, (3, 128, 128)), jnp.float32)
    b1p = jnp.asarray(rng.normal(0, 0.1, (128,)), jnp.float32)
    got = fused_conv1_pool(a0p, w1p, b1p, interpret=True)
    want = fused_conv1_pool_reference(a0p, w1p, b1p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_backbone_matches_vggtiny():
    rng_np = np.random.default_rng(1)
    plain = VggTiny(dtype=jnp.float32)
    x = jnp.asarray(rng_np.uniform(0, 1, (2, 48, 64, 3)), jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn(variables, rng_np)
    # remap expects a full-model-style tree with a "backbone" subtree
    tree = {
        "params": {"backbone": variables["params"]},
        "batch_stats": {"backbone": variables["batch_stats"]},
    }
    fused_tree = remap_vggtiny_to_fused(tree)
    fused_vars = {
        "params": fused_tree["params"]["backbone"],
        "batch_stats": fused_tree["batch_stats"]["backbone"],
    }
    fused = VggTinyFusedStem(dtype=jnp.float32, interpret=True)
    want = plain.apply(variables, x, train=False)
    got = fused.apply(fused_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_fused_full_model_matches():
    """Full LW-OpenPose forward through the fused stem == plain, and the
    remap leaves every non-stem leaf untouched."""
    rng_np = np.random.default_rng(2)
    hw = (32, 48)
    plain = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
    x = jnp.asarray(rng_np.uniform(0, 1, (1, *hw, 3)), jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn(variables, rng_np)
    fused_vars = remap_vggtiny_to_fused(variables)
    assert "conv0p" in fused_vars["params"]["backbone"]
    assert "block_0" not in fused_vars["params"]["backbone"]
    np.testing.assert_array_equal(
        np.asarray(fused_vars["params"]["cpm"]["init"]["kernel"]),
        np.asarray(variables["params"]["cpm"]["init"]["kernel"]),
    )

    def make_fused():
        return LightWeightOpenPose(
            backbone=lambda **kw: VggTinyFusedStem(interpret=True, **kw),
            dtype=jnp.float32,
        )

    want = plain.apply(variables, x, train=False)
    got = make_fused().apply(fused_vars, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got["conf_map"]), np.asarray(want["conf_map"]),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["paf_map"]), np.asarray(want["paf_map"]),
        atol=2e-4, rtol=1e-3,
    )


def test_fused_stem_rejects_training():
    fused = VggTinyFusedStem(dtype=jnp.float32, interpret=True)
    x = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(NotImplementedError):
        fused.init(jax.random.PRNGKey(0), x, train=True)
