"""Sharded execution on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpose_tpu.parallel.mesh import batch_sharding, make_mesh
from hyperpose_tpu.parallel.stream_shard import ShardedStreamEngine
from hyperpose_tpu.models.openpose import LightWeightOpenPose
from hyperpose_tpu.models.backbones import VggTiny
from hyperpose_tpu.ops.paf_decode import PafDecoderConfig, paf_decode_batch


def test_mesh_shapes():
    mesh = make_mesh(n_devices=8, spatial=2)
    assert dict(mesh.shape) == {"dp": 4, "sp": 2}
    mesh = make_mesh(n_devices=8)
    assert dict(mesh.shape) == {"dp": 8, "sp": 1}


def test_sharded_stream_engine_matches_single_device():
    mesh = make_mesh(n_devices=4, spatial=1)
    model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
    hw = (64, 64)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=False
    )
    cfg = PafDecoderConfig()

    def decoder_call(out):
        conf = out["conf_map"].astype(jnp.float32)
        paf = out["paf_map"].astype(jnp.float32)
        return paf_decode_batch(conf, paf, cfg)

    engine = ShardedStreamEngine(model, variables, decoder_call, mesh)
    images = np.random.default_rng(0).integers(
        0, 255, (8, *hw, 3), dtype=np.uint8
    )
    sharded = engine.infer_global_batch(images)

    # single-device reference
    x = jnp.asarray(images).astype(jnp.float32) / 255.0
    out = model.apply(variables, x, train=False)
    single = decoder_call(out)
    np.testing.assert_allclose(
        np.asarray(sharded.scores), np.asarray(single.scores), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.valid), np.asarray(single.valid)
    )
