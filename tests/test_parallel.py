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


@pytest.mark.parametrize("mode", ["sync_avg", "pair_avg"])
def test_sync_modes_run_and_keep_replication(mode):
    import optax

    from hyperpose_tpu.parallel.sync_modes import make_local_step_train_fn
    from hyperpose_tpu.models.openpose import openpose_loss

    mesh = make_mesh(n_devices=4, spatial=1)
    model = LightWeightOpenPose(dtype=jnp.float32)
    hw = (32, 32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=True
    )
    optimizer = optax.sgd(1e-3)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt_state = optimizer.init(params)

    def loss_fn(predict, targets):
        return openpose_loss(predict, targets["conf_map"], targets["paf_map"])

    step = make_local_step_train_fn(model, loss_fn, optimizer, mesh, mode)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((8, *hw, 3)).astype(np.float32))
    targets = {
        "conf_map": jnp.asarray(rng.random((8, 4, 4, 19)).astype(np.float32)),
        "paf_map": jnp.asarray(rng.random((8, 4, 4, 38)).astype(np.float32)),
    }
    with mesh:
        p1, s1, o1, m1 = step(
            params, stats, opt_state, images, targets, jnp.int32(0)
        )
        p2, s2, o2, m2 = step(p1, s1, o1, images, targets, jnp.int32(1))
    assert np.isfinite(float(m2["total_loss"]))
    # params changed and every leaf is finite
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params, p2
    )
    assert max(jax.tree.leaves(diff)) > 0
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(p2)
    )
