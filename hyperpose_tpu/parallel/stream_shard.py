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
`ShardedStreamEngine.infer_global_batch` with host-local arrays.
"""
from __future__ import annotations

import functools
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

    def infer_global_batch(self, images_u8) -> DecodedSkeletons:
        """images_u8: [B_global, H, W, 3]; B_global must be divisible by the
        dp axis. Returns replicated decoded skeletons for ALL frames, on
        every participating host."""
        if self._jitted is None:
            self._jitted = self._build()
        img_sh = NamedSharding(self.mesh, P("dp", "sp", None, None))
        images = jax.device_put(jnp.asarray(images_u8), img_sh)
        with self.mesh:
            return self._jitted(self.variables, images)


def make_distributed_mesh(spatial: int = 1) -> Mesh:
    """Global mesh across all processes (call jax.distributed.initialize()
    first on each host; reference analog: KungFu cluster bootstrap,
    Model/train.py:454-461)."""
    devs = np.array(jax.devices())
    n = len(devs)
    return Mesh(devs.reshape(n // spatial, spatial), ("dp", "sp"))


@functools.lru_cache(maxsize=None)
def scaling_report(fps_1chip: float, fps_nchip: float, n: int) -> dict:
    """Scaling-efficiency bookkeeping for the north-star metric."""
    return {
        "chips": n,
        "fps_per_chip_1": fps_1chip,
        "fps_total_n": fps_nchip,
        "efficiency": fps_nchip / (fps_1chip * n) if n else 0.0,
    }
