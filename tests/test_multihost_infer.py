"""True multi-process sharded inference (the multi-host serving stand-in).

The inference twin of test_multihost.py: 2 OS processes x 2 virtual CPU
devices each form one 4-device ("dp", "sp") mesh; each process feeds only
its process-local frame shard through ShardedStreamEngine.infer_local_shard
(jax.make_array_from_process_local_data), the fused forward+decode runs
across processes, and every host gets the replicated skeletons for the
ENTIRE global stream back in order. Reference analog: the in-process
ordering guarantee of stream.hpp:82-87, extended across hosts — the
BASELINE.json north-star component the reference lacks.
"""
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_infer_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_inference():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    results, scaling = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, digest = line.split()
                results[int(pid)] = float(digest)
            elif line.startswith("SCALING"):
                _, pid, eff = line.split()
                scaling[int(pid)] = float(eff)
    assert set(results) == {0, 1}, f"missing worker results: {outs}"
    # Identical order-weighted digest on every process: the reassembled
    # global stream (2 batches) is bit-identical and ordered on both hosts.
    assert results[0] == results[1]
    # the scaling_report measurement path ran on both processes
    assert set(scaling) == {0, 1} and all(e > 0 for e in scaling.values())
