"""Multi-host smoke: 2 real processes through jax.distributed.initialize.

The reference is strictly single-process (SURVEY §2.4); this is the
TPU-world replacement for its absent distributed tests. Two subprocesses run
tests/multihost_worker.py: parallel.initialize_distributed (env activation),
a 2-process global mesh, a cross-process pjit reduction, and disjoint
per-process sampler streams.
"""
import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    # per-process sampler streams must differ (different first indices)
    picks = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("OK ")][0]
        pid, rest = line[3:].split(" ", 1)
        picks[pid] = rest
    assert picks["0"] != picks["1"], picks
