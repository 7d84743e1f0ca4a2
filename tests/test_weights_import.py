"""Mechanics of the LEGACY kind-stream npz_dict matcher.

Reference-convention parity (real TL naming, build order, bias folding)
lives in tests/test_tl_import.py against hand-transcribed fixtures; this
file only covers the fallback heuristic's mechanics with HAND-WRITTEN
npz keys — no key is derived from our own flax tree.
"""
import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from hyperpose_tpu.utils.weights_import import (
    compare_report, import_npz_dict,
)


class TinyNet(nn.Module):
    """stem conv -> bn -> head conv: shapes chosen unique per layer."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), name="stem")(x)
        x = nn.BatchNorm(
            use_running_average=not train, name="bn"
        )(x)
        return nn.Conv(4, (1, 1), name="head")(x)


def _init():
    model = TinyNet()
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))


def _tl_file(path, stem_kernel=None):
    rng = np.random.default_rng(0)
    entries = {
        "net/conv2d/filters:0": (
            stem_kernel if stem_kernel is not None
            else rng.normal(size=(3, 3, 3, 8)).astype(np.float32)
        ),
        "net/conv2d/biases:0": rng.normal(size=(8,)).astype(np.float32),
        "net/batchnorm/gamma:0": rng.normal(size=(8,)).astype(np.float32),
        "net/batchnorm/beta:0": rng.normal(size=(8,)).astype(np.float32),
        "net/batchnorm/moving_mean:0": rng.normal(size=(8,)).astype(np.float32),
        "net/batchnorm/moving_variance:0":
            rng.normal(size=(8,)).astype(np.float32) ** 2,
        "net/conv2d_1/filters:0": rng.normal(size=(1, 1, 8, 4)).astype(np.float32),
        "net/conv2d_1/biases:0": rng.normal(size=(4,)).astype(np.float32),
    }
    np.savez(path, **entries)
    return entries


def test_hand_written_keys_align_and_import(tmp_path):
    variables = dict(_init())
    path = str(tmp_path / "tl.npz")
    entries = _tl_file(path)
    report = compare_report(variables, path)
    assert all(v["aligned"] for v in report.values()), report
    out = import_npz_dict(variables, path)
    assert np.allclose(
        np.asarray(out["params"]["stem"]["kernel"]),
        entries["net/conv2d/filters:0"],
    )
    assert np.allclose(
        np.asarray(out["batch_stats"]["bn"]["mean"]),
        entries["net/batchnorm/moving_mean:0"],
    )
    assert np.allclose(
        np.asarray(out["params"]["head"]["bias"]),
        entries["net/conv2d_1/biases:0"],
    )


def test_import_strict_raises_on_mismatch(tmp_path):
    variables = dict(_init())
    path = str(tmp_path / "bad.npz")
    np.savez(path, **{"only/filters:0": np.zeros((5, 5, 3, 8), np.float32)})
    with pytest.raises(ValueError):
        import_npz_dict(variables, path)
    import_npz_dict(variables, path, strict=False)  # lenient mode logs


def test_depthwise_reshape_adapts(tmp_path):
    """TF depthwise [H, W, C, 1] kernels fit flax grouped [H, W, 1, C]."""

    class DwNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(
                6, (3, 3), feature_group_count=6, name="dw"
            )(jnp.tile(x, (1, 1, 1, 2)))

    variables = dict(DwNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))))
    assert variables["params"]["dw"]["kernel"].shape == (3, 3, 1, 6)
    path = str(tmp_path / "dw.npz")
    tf_layout = np.arange(3 * 3 * 6, dtype=np.float32).reshape(3, 3, 6, 1)
    np.savez(path, **{
        "net/depthwiseconv2d/filters:0": tf_layout,
        "net/depthwiseconv2d/biases:0": np.zeros(6, np.float32),
    })
    out = import_npz_dict(variables, path)
    got = np.asarray(out["params"]["dw"]["kernel"])
    assert got.shape == (3, 3, 1, 6)
    assert np.allclose(got, tf_layout.reshape(3, 3, 1, 6))
