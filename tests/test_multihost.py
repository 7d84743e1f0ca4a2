"""True multi-process data-parallel training (the multi-host stand-in).

Launches 2 OS processes x 2 virtual CPU devices each, joined via
jax.distributed + gloo collectives into one 4-device global mesh, and runs
the real sharded train step across them. This is the test the reference
lacks entirely for its KungFu path (SURVEY.md section 4: "Multi-node
testing: none") — here both workers must compute the identical global loss
or the cross-process all-reduce is broken.
"""
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_training():
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
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, l1, l2 = line.split()
                results[int(pid)] = (float(l1), float(l2))
    assert set(results) == {0, 1}, f"missing worker results: {outs}"
    # Same global loss on every process => gradients were truly all-reduced.
    assert results[0] == results[1]
