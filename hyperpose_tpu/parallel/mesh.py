"""Device-mesh helpers for multi-chip / multi-host execution.

TPU-native replacement for the reference's KungFu data-parallel layer
(reference: Model/train.py:327-588 parallel_train, Config/define.py:33-36):
instead of optimizer-wrapped allreduce, we lay out a jax.sharding.Mesh and
let XLA insert collectives over ICI/DCN.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, spatial: int = 1, devices=None
) -> Mesh:
    """Build a ("dp", "sp") mesh: data-parallel x spatial-parallel.

    Pose CNNs have no sequence/expert axes; the meaningful shards are the
    frame batch (dp) and image rows (sp, GSPMD halo-exchanges the conv
    overlaps automatically).
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    arr = np.array(devs).reshape(n // spatial, spatial)
    return Mesh(arr, ("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: shard N over dp and H over sp."""
    return NamedSharding(mesh, P("dp", "sp", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_local_batch_size(global_batch: int) -> int:
    """Per-host slice of the global batch (multi-host DCN sharding)."""
    return global_batch // jax.process_count()
