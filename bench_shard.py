#!/usr/bin/env python
"""Multi-chip stream scaling-efficiency bench (north star: >=80% at 2+ hosts).

Measures frames/s of the fused forward+decode inference step through
ShardedStreamEngine at dp=1 vs dp=N, plus the StreamProcessor-composed
ordering check, and prints ONE JSON line with the
parallel.stream_shard.scaling_report row.

Backend selection:
  - real multi-chip TPU (jax.device_count() > 1): the honest row.
  - otherwise: the 8-virtual-device CPU mesh. Virtual devices share this
    box's 2 physical cores, so the CPU "efficiency" number measures host
    contention, NOT ICI scaling — it validates the wiring (sharding,
    all-gather, ordering) so the identical command produces the real row
    the day pod hardware exists.

Usage:
  python bench_shard.py                     # auto backend, 8-way CPU mesh
  python bench_shard.py --n_devices 4 --steps 20
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_devices", type=int, default=None,
                    help="mesh size (default: all real devices, or 8 "
                         "virtual CPU devices when single-chip)")
    ap.add_argument("--batch_per_chip", type=int, default=None,
                    help="frames per chip per step (default 32 TPU / 2 CPU)")
    ap.add_argument("--hw", type=str, default=None,
                    help="input HxW (default 368x432 TPU / 96x112 CPU)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--weights", type=str, default=None,
                    help="trained npz (optional; throughput is "
                         "weight-independent)")
    return ap.parse_args()


def _force_cpu_mesh(n: int) -> None:
    import jax
    from jax._src import xla_bridge

    if getattr(xla_bridge, "_backends", None):
        raise SystemExit("backend already initialized; cannot build the "
                         "virtual CPU mesh — run in a fresh process")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)


def main():
    args = parse_args()

    import jax

    # Peek at the real backend only if we intend to use it: importing
    # device_count initializes the backend, after which the CPU-mesh
    # fallback is impossible. The axon tunnel exposes exactly one chip, so
    # default to the virtual CPU mesh unless the user asked for the real one.
    want = args.n_devices
    use_cpu = True
    if os.environ.get("BENCH_SHARD_REAL"):
        use_cpu = jax.device_count() < 2
    if use_cpu:
        _force_cpu_mesh(want or 8)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    n = want or jax.device_count()
    devices = jax.devices()[:n]
    backend = jax.default_backend()
    hw = tuple(int(v) for v in (args.hw or (
        "368x432" if backend == "tpu" else "96x112"
    )).lower().split("x"))
    bpc = args.batch_per_chip or (32 if backend == "tpu" else 2)

    from hyperpose_tpu.models.backbones import VggTiny
    from hyperpose_tpu.models.openpose import LightWeightOpenPose
    from hyperpose_tpu.ops.paf_decode import PafDecoderConfig, paf_decode_batch
    from hyperpose_tpu.parallel.stream_shard import (
        ShardedStreamEngine, scaling_report,
    )
    from hyperpose_tpu.runtime.stream import StreamProcessor

    model = LightWeightOpenPose(
        backbone=VggTiny,
        dtype=jnp.bfloat16 if backend == "tpu" else jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=False
    )
    if args.weights:
        from hyperpose_tpu.train.checkpoint import load_weights_npz

        variables = load_weights_npz(variables, args.weights)
    infer_vars = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }
    cfg = PafDecoderConfig()

    def decoder_call(out):
        conf = out["conf_map"].astype(jnp.float32)
        paf = out["paf_map"].astype(jnp.float32)
        return paf_decode_batch(conf, paf, cfg, (conf.shape[1], conf.shape[2]))

    rng = np.random.default_rng(0)

    def measure(mesh_devices) -> float:
        """fps of the fused sharded step over the given devices; distinct
        inputs per step (the axon tunnel caches identical executions)."""
        k = len(mesh_devices)
        mesh = Mesh(np.array(mesh_devices).reshape(k, 1), ("dp", "sp"))
        engine = ShardedStreamEngine(model, infer_vars, decoder_call, mesh)
        batch = bpc * k
        frames = [
            rng.integers(0, 256, (batch, *hw, 3), dtype=np.uint8)
            for _ in range(args.steps)
        ]
        np.asarray(engine.infer_global_batch(frames[0]).scores)  # compile
        t0 = time.perf_counter()
        for f in frames:
            out = engine.infer_global_batch(f)
        np.asarray(out.scores)
        dt = time.perf_counter() - t0
        return args.steps * batch / dt, engine

    fps1, _ = measure(devices[:1])
    fpsN, engineN = measure(devices)
    report = scaling_report(fps1, fpsN, n)

    # ordering assertion: StreamProcessor over the sharded engine must
    # preserve frame order across the full-batch + partial-flush path
    class _Adapter:
        def __init__(self, eng):
            self._eng = eng
            self.input_hw = hw
            self.max_batch_size = bpc * n

        def infer_batch_device(self, batch_u8):
            return self._eng.infer_global_batch(batch_u8)

    sp = StreamProcessor(_Adapter(engineN))
    n_stream = bpc * n + max(1, bpc * n // 2)
    stream = [rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
              for _ in range(n_stream)]
    results = list(sp.process(iter(stream)))
    assert [r.index for r in results] == list(range(n_stream)), (
        "stream+shard pipeline lost ordering"
    )

    print(json.dumps({
        "metric": "stream_scaling_efficiency",
        "value": round(report["efficiency"], 4),
        "unit": "fraction",
        "vs_baseline": round(report["efficiency"] / 0.8, 3),
        "detail": {
            **{k: round(float(v), 2) if isinstance(v, float) else v
               for k, v in report.items()},
            "backend": backend,
            "virtual_cpu_mesh": backend != "tpu",
            "hw": f"{hw[0]}x{hw[1]}",
            "batch_per_chip": bpc,
            "steps": args.steps,
            "ordering_checked_frames": n_stream,
        },
    }))


if __name__ == "__main__":
    main()
