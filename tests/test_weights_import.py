"""Reference npz_dict checkpoint ingestion."""
import numpy as np
import pytest


def tl_style_npz(variables, path, rng):
    """Synthesize a TensorLayer npz_dict for the given flax variables:
    TL-style keys (<layer>/<param>:0), build-order-like entry order, random
    values, TF depthwise layout where applicable. Returns the entries."""
    from hyperpose_tpu.utils.weights_import import (
        _flax_kind, _target_entries,
    )

    kind_to_tl = {
        "kernel": "filters", "bias": "biases", "bn_scale": "gamma",
        "bn_bias": "beta", "mean": "moving_mean", "var": "moving_variance",
        "alpha": "alphas",
    }
    entries = {}
    for i, (coll, names, kind, shape) in enumerate(
        _target_entries(variables)
    ):
        arr = rng.normal(size=shape).astype(np.float32)
        key = f"layer_{i}_{'_'.join(names[:-1])}/{kind_to_tl[kind]}:0"
        entries[key] = arr
    np.savez(path, **entries)
    return entries


def test_import_lwopenpose_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu.models.backbones import VggTiny
    from hyperpose_tpu.models.openpose import LightWeightOpenPose
    from hyperpose_tpu.utils.weights_import import (
        compare_report, import_npz_dict,
    )

    model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    rng = np.random.default_rng(0)
    path = str(tmp_path / "ref.npz")
    entries = tl_style_npz(dict(variables), path, rng)

    report = compare_report(dict(variables), path)
    assert all(v["aligned"] for v in report.values()), report

    out = import_npz_dict(dict(variables), path)
    # every parameter replaced: none equals its init value stream
    leaves_in = jax.tree_util.tree_leaves(variables["params"])
    leaves_out = jax.tree_util.tree_leaves(out["params"])
    n_changed = sum(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_in, leaves_out)
    )
    assert n_changed == len(leaves_in)
    # and the imported values really are file values (sum check)
    total_file = sum(float(v.sum()) for v in entries.values())
    total_out = sum(
        float(np.asarray(leaf, np.float64).sum())
        for coll in ("params", "batch_stats")
        for leaf in jax.tree_util.tree_leaves(out[coll])
    )
    assert total_out == pytest.approx(total_file, rel=1e-3)


def test_import_resnet50_unique_stem(tmp_path):
    """Stems/heads with unique shapes align even though flax flattens
    alphabetically (stem sorts after blocks)."""
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu.models.backbones import Resnet18
    from hyperpose_tpu.utils.weights_import import (
        compare_report, import_npz_dict,
    )

    model = Resnet18(dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    path = str(tmp_path / "ref.npz")
    tl_style_npz(dict(variables), path, np.random.default_rng(1))
    report = compare_report(dict(variables), path)
    assert all(v["aligned"] for v in report.values()), report
    out = import_npz_dict(dict(variables), path)
    assert out["params"] is not variables["params"]


def test_import_strict_raises_on_mismatch(tmp_path):
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu.models.backbones import VggTiny
    from hyperpose_tpu.utils.weights_import import import_npz_dict

    model = VggTiny(dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    path = str(tmp_path / "bad.npz")
    np.savez(path, **{"only/filters:0": np.zeros((3, 3, 3, 8), np.float32)})
    with pytest.raises(ValueError):
        import_npz_dict(dict(variables), path)
    # lenient mode succeeds and logs instead
    import_npz_dict(dict(variables), path, strict=False)


def test_depthwise_reshape(tmp_path):
    """TF depthwise [H, W, C, 1] kernels reshape into flax grouped-conv
    [H, W, 1, C] slots."""
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu.models.backbones import MobilenetV1
    from hyperpose_tpu.utils.weights_import import compare_report

    model = MobilenetV1(dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    path = str(tmp_path / "ref.npz")
    # Build TL file but store depthwise kernels in TF layout.
    from hyperpose_tpu.utils.weights_import import _target_entries

    kind_to_tl = {
        "kernel": "filters", "bias": "biases", "bn_scale": "gamma",
        "bn_bias": "beta", "mean": "moving_mean", "var": "moving_variance",
        "alpha": "alphas",
    }
    rng = np.random.default_rng(2)
    entries = {}
    for i, (coll, names, kind, shape) in enumerate(
        _target_entries(dict(variables))
    ):
        if kind == "kernel" and len(shape) == 4 and shape[2] == 1:
            arr = rng.normal(size=(shape[0], shape[1], shape[3], 1))
        else:
            arr = rng.normal(size=shape)
        entries[f"l{i}/{kind_to_tl[kind]}:0"] = arr.astype(np.float32)
    np.savez(path, **entries)
    report = compare_report(dict(variables), path)
    assert all(v["aligned"] for v in report.values()), report
