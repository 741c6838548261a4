"""Real multi-process distributed test: two CPU processes, one global mesh.

Launches two workers (parallel/distributed.py __main__) against a local
coordinator; each host loads ONLY its own frames and contributes its shard of
the global frame-sharded batch; the sharded multi-frame train step must
reproduce the single-process loss on every host (SURVEY §2.10 plan — the
standard JAX fake-multihost pattern, no TPU pod required)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_frame_sharded_step(tmp_path):
    port = _free_port()
    nproc = 2
    frames = 2
    procs, outs = [], []
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    for pid in range(nproc):
        out = tmp_path / f"proc{pid}.txt"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "hybridneuralrendering_tpu.parallel.distributed",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(nproc),
             "--process-id", str(pid),
             "--frames", str(frames),
             "--out", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    for out in outs:
        sharded, local = np.loadtxt(out)
        assert np.isfinite(sharded) and np.isfinite(local)
        np.testing.assert_allclose(sharded, local, rtol=1e-4)
