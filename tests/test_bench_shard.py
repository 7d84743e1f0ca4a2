"""bench_shard.py dryrun coverage (VERDICT r4 item 6): the scaling-
efficiency bench must run end to end on the virtual CPU mesh, emit a
valid scaling_report JSON line, and enforce stream ordering. Runs in a
subprocess because the bench must own backend initialization."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_shard_cpu_mesh():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_shard.py"),
         "--n_devices", "2", "--steps", "2"],
        capture_output=True, text=True, timeout=540, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    row = json.loads(line)
    assert row["metric"] == "stream_scaling_efficiency"
    d = row["detail"]
    assert d["chips"] == 2
    assert d["virtual_cpu_mesh"] is True
    assert d["fps_total_n"] > 0 and d["fps_per_chip_1"] > 0
    assert 0 < row["value"] <= 1.5  # CPU-mesh efficiency is contention-bound
    assert d["ordering_checked_frames"] > d["batch_per_chip"] * 2
