"""Worker process for the multi-host (multi-process jax.distributed) test.

Run as: python multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; together they form one global
("dp", "sp") mesh and run the REAL sharded train step
(hyperpose_tpu.parallel.train_step.make_sharded_train_step) for two steps.
Cross-process gradient all-reduce rides gloo — the CPU stand-in for DCN,
mirroring how the reference's KungFu allreduce spans workers
(reference: Model/train.py:327-588 parallel_train).
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    f"localhost:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hyperpose_tpu.models.backbones import VggTiny  # noqa: E402
from hyperpose_tpu.models.openpose import (  # noqa: E402
    LightWeightOpenPose, openpose_loss,
)
from hyperpose_tpu.parallel.mesh import batch_sharding, make_mesh  # noqa: E402
from hyperpose_tpu.parallel.train_step import (  # noqa: E402
    make_sharded_train_step,
)

assert jax.device_count() == 2 * nproc, jax.device_count()
assert jax.process_count() == nproc

mesh = make_mesh(spatial=1)  # all 4 global devices on the dp axis
hw = (32, 32)
model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
variables = model.init(
    jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=True
)
optimizer = optax.sgd(1e-3)
params, stats = variables["params"], variables["batch_stats"]
opt_state = optimizer.init(params)


def loss_fn(predict, targets):
    return openpose_loss(predict, targets["conf_map"], targets["paf_map"])


step = make_sharded_train_step(model, loss_fn, optimizer, mesh)

# Deterministic GLOBAL batch; each process feeds only its local rows.
GLOBAL = 8
rng = np.random.default_rng(42)
g_images = rng.random((GLOBAL, *hw, 3)).astype(np.float32)
g_conf = rng.random((GLOBAL, 4, 4, 19)).astype(np.float32)
g_paf = rng.random((GLOBAL, 4, 4, 38)).astype(np.float32)
bsh = batch_sharding(mesh)
lo, hi = pid * GLOBAL // nproc, (pid + 1) * GLOBAL // nproc


def to_global(a):
    return jax.make_array_from_process_local_data(bsh, a[lo:hi], a.shape)


images = to_global(g_images)
targets = {"conf_map": to_global(g_conf), "paf_map": to_global(g_paf)}

with mesh:
    params, stats, opt_state, m1 = step(
        params, stats, opt_state, images, targets
    )
    params, stats, opt_state, m2 = step(
        params, stats, opt_state, images, targets
    )

l1, l2 = float(m1["total_loss"]), float(m2["total_loss"])
assert np.isfinite(l1) and np.isfinite(l2), (l1, l2)
assert l2 < l1, f"loss did not decrease: {l1} -> {l2}"
assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params))
print(f"RESULT {pid} {l1:.8f} {l2:.8f}", flush=True)
