"""Multi-chip / multi-host stream sharding.

The reference scales inference only within one process (pipeline stages +
parser replica threads, reference: stream.hpp:18-89). The TPU-native scale
story (BASELINE.json north star) is: shard frame batches across chips/hosts
over the mesh, run the fused forward+decode per shard, and all-gather the
fixed-shape skeleton results over ICI so every host can reassemble the
ordered output stream.

Because decoded skeletons are small fixed-shape arrays (a few KB/frame),
the all_gather rides ICI at negligible cost; frames are the only large
payload and each host feeds only its own shard (DCN never sees activations).

Multi-host usage: call jax.distributed.initialize() per host, build the
global mesh, and feed per-host frame shards through
`ShardedStreamEngine.infer_local_shard` with host-local arrays (tested
cross-process by tests/test_multihost_infer.py).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.paf_decode import DecodedSkeletons


class ShardedStreamEngine:
    """Data-parallel fused inference over a ("dp", "sp") mesh.

    fused_fn(variables, images) -> DecodedSkeletons must be shape-polymorphic
    over the batch (it is re-jitted per global batch under sharding
    constraints here).
    """

    def __init__(self, model, variables, decoder_call: Callable, mesh: Mesh):
        self.model = model
        self.mesh = mesh
        self.decoder_call = decoder_call
        rep = NamedSharding(mesh, P())
        self.variables = jax.device_put(variables, rep)
        self._jitted = None

    def _build(self):
        mesh = self.mesh
        model = self.model
        decoder_call = self.decoder_call
        rep = NamedSharding(mesh, P())
        img_sh = NamedSharding(mesh, P("dp", "sp", None, None))
        out_sh = NamedSharding(mesh, P())  # gathered: replicated outputs

        def step(variables, images_u8):
            x = images_u8.astype(model.dtype) / 255.0
            out = model.apply(variables, x, train=False)
            decoded = decoder_call(out)
            # out_shardings=replicated forces XLA to insert the all-gather
            # of the (tiny) skeleton arrays over ICI.
            return decoded

        return jax.jit(
            step,
            in_shardings=(rep, img_sh),
            out_shardings=out_sh,
        )

    @property
    def _img_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P("dp", "sp", None, None))

    def infer_global_batch(self, images_u8) -> DecodedSkeletons:
        """images_u8: [B_global, H, W, 3]; B_global must be divisible by the
        dp axis. Returns replicated decoded skeletons for ALL frames, on
        every participating host.

        Single-process: pass the whole batch. Multi-process: every process
        must pass the SAME host-global array; each transfers only its own
        dp rows (sliced here) — prefer `infer_local_shard`, which never
        materializes frames a host does not own."""
        if jax.process_count() > 1:
            b = int(np.shape(images_u8)[0])
            n = jax.process_count()
            if b % n:
                raise ValueError(
                    f"global batch {b} not divisible by {n} processes"
                )
            lo = jax.process_index() * b // n
            return self.infer_local_shard(
                np.asarray(images_u8)[lo:lo + b // n], global_batch=b
            )
        if self._jitted is None:
            self._jitted = self._build()
        images = jax.device_put(jnp.asarray(images_u8), self._img_sharding)
        with self.mesh:
            return self._jitted(self.variables, images)

    def infer_local_shard(
        self, local_images_u8, global_batch: int | None = None,
    ) -> DecodedSkeletons:
        """Multi-host entry point: each process feeds ONLY the frames it
        owns (equal-size shards, ordered by process index — process p owns
        global rows [p*B/n, (p+1)*B/n)). The global device array is
        assembled from the process-local shards
        (jax.make_array_from_process_local_data), the fused forward+decode
        runs across all hosts' chips, and the replicated skeleton outputs
        come back for the ENTIRE global batch on every host — so each host
        can reassemble the ordered output stream locally (the ordering
        guarantee of reference stream.hpp:82-87, preserved across hosts).
        """
        local = np.asarray(local_images_u8)
        n = jax.process_count()
        if global_batch is None:
            global_batch = local.shape[0] * n
        if global_batch != local.shape[0] * n:
            raise ValueError(
                f"global batch {global_batch} != local {local.shape[0]} x "
                f"{n} processes (shards must be equal-size)"
            )
        if self._jitted is None:
            self._jitted = self._build()
        images = jax.make_array_from_process_local_data(
            self._img_sharding, local, (global_batch,) + local.shape[1:]
        )
        with self.mesh:
            return self._jitted(self.variables, images)


def make_distributed_mesh(spatial: int = 1) -> Mesh:
    """Global mesh across all processes (call jax.distributed.initialize()
    first on each host; reference analog: KungFu cluster bootstrap,
    Model/train.py:454-461)."""
    devs = np.array(jax.devices())
    n = len(devs)
    return Mesh(devs.reshape(n // spatial, spatial), ("dp", "sp"))


def scaling_report(fps_1chip: float, fps_nchip: float, n: int) -> dict:
    """Scaling-efficiency row for the north-star metric (>=80% at 2+
    hosts). Measured by tests/multihost_infer_worker.py on the 2-process
    virtual mesh and by bench.py when real multi-chip hardware exists."""
    return {
        "chips": n,
        "fps_per_chip_1": fps_1chip,
        "fps_total_n": fps_nchip,
        "efficiency": fps_nchip / (fps_1chip * n) if n else 0.0,
    }
