"""Worker process for the multi-process sharded INFERENCE test.

Run as: python multihost_infer_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; together they form one global
("dp", "sp") mesh. Each process feeds ONLY its own frame shard through
ShardedStreamEngine.infer_local_shard (the multi-host serving path,
BASELINE north star: the reference's stream scheduler scales only within
one process, reference: src/stream.cpp:18-183), runs the fused
forward+decode across processes, and checks:

  1. score/coord parity with an unsharded single-device reference of the
     SAME global batch (computed locally with plain jit),
  2. ordered reassembly across two consecutive stream batches (frame k's
     skeleton comes back at global row k on every host),
  3. a scaling_report row from measured sharded vs single-device walltime.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    f"localhost:{port}", num_processes=nproc, process_id=pid
)

import time  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hyperpose_tpu.models.backbones import VggTiny  # noqa: E402
from hyperpose_tpu.models.openpose import LightWeightOpenPose  # noqa: E402
from hyperpose_tpu.ops.paf_decode import (  # noqa: E402
    PafDecoderConfig, paf_decode_batch,
)
from hyperpose_tpu.parallel.stream_shard import (  # noqa: E402
    ShardedStreamEngine, make_distributed_mesh, scaling_report,
)
from hyperpose_tpu.utils.topology import COCO_TOPOLOGY  # noqa: E402

assert jax.device_count() == 2 * nproc, jax.device_count()
assert jax.process_count() == nproc

HW = (64, 64)
GLOBAL = 8  # 2 rows per device on the 4-way dp axis
model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
variables = jax.device_get(model.init(
    jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False
))
dec = PafDecoderConfig(max_humans=4)


def decoder_call(out):
    conf = out["conf_map"].astype(jnp.float32)
    paf = out["paf_map"].astype(jnp.float32)
    return paf_decode_batch(conf, paf, dec, (conf.shape[1], conf.shape[2]),
                            COCO_TOPOLOGY)


mesh = make_distributed_mesh(spatial=1)
engine = ShardedStreamEngine(model, variables, decoder_call, mesh)

# Two consecutive "stream" batches of the global frame sequence; every
# process generates the same deterministic global stream but FEEDS only its
# own shard.
rng = np.random.default_rng(7)
stream = (rng.random((2 * GLOBAL, *HW, 3)) * 255).astype(np.uint8)
lo_n = GLOBAL // nproc


@jax.jit
def reference_step(variables, images_u8):
    x = images_u8.astype(jnp.float32) / 255.0
    return decoder_call(model.apply(variables, x, train=False))


reassembled_scores = []
reassembled_coords = []
t_shard = 0.0
for b in range(2):
    gbatch = stream[b * GLOBAL:(b + 1) * GLOBAL]
    local = gbatch[pid * lo_n:(pid + 1) * lo_n]
    t0 = time.perf_counter()
    decoded = engine.infer_local_shard(local, global_batch=GLOBAL)
    scores = np.asarray(decoded.scores)  # replicated => full global batch
    coords = np.asarray(decoded.coords)
    t_shard += time.perf_counter() - t0
    assert scores.shape[0] == GLOBAL, scores.shape
    # parity with the unsharded single-device reference
    ref = reference_step(variables, jnp.asarray(gbatch))
    np.testing.assert_allclose(scores, np.asarray(ref.scores), atol=1e-4)
    np.testing.assert_allclose(coords, np.asarray(ref.coords), atol=1e-4)
    reassembled_scores.append(scores)
    reassembled_coords.append(coords)

# ordered reassembly: concatenating the per-batch replicated outputs
# reconstructs the global stream order identically on every process
all_scores = np.concatenate(reassembled_scores, axis=0)
digest = float(np.sum(all_scores * np.arange(1, all_scores.size + 1)
                      .reshape(all_scores.shape)))

# scaling row: measured sharded walltime vs single-device walltime for the
# same global batch (CPU-virtual; the row proves the measurement path, the
# absolute efficiency is only meaningful on real chips)
gbatch = jnp.asarray(stream[:GLOBAL])
reference_step(variables, gbatch)  # warm
t0 = time.perf_counter()
for _ in range(3):
    jax.block_until_ready(reference_step(variables, gbatch).scores)
t_1dev = (time.perf_counter() - t0) / 3
t0 = time.perf_counter()
for _ in range(3):
    np.asarray(engine.infer_local_shard(
        stream[pid * lo_n:(pid + 1) * lo_n], global_batch=GLOBAL
    ).scores)
t_ndev = (time.perf_counter() - t0) / 3
report = scaling_report(
    fps_1chip=GLOBAL / t_1dev, fps_nchip=GLOBAL / t_ndev,
    n=jax.device_count(),
)
print(f"SCALING {pid} {report['efficiency']:.4f}", flush=True)
print(f"RESULT {pid} {digest:.6f}", flush=True)
