"""Real multi-process distributed tests: two CPU processes, one global mesh.

Launches two workers (parallel/distributed.py __main__) against a local
coordinator; each host loads ONLY its own frames and contributes its shard of
the global frame-sharded batch (SURVEY §2.10 plan — the standard JAX
fake-multihost pattern, no TPU pod required).  Scenarios:

  parity    — the sharded multi-frame train step reproduces the
              single-process loss on every host.
  lifecycle — N sharded steps -> probe/grow -> checkpoint save on process 0
              + restore on all hosts -> eval chunk; per-host state digests
              must be IDENTICAL (cross-host divergence would silently desync
              the replicated state).  VERDICT r2 #4.
  mesh2d    — the 2-axis (replica, data) mesh layout compiles and runs.
"""

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


def _launch(tmp_path, scenario, nproc=2, frames=2):
    port = _free_port()
    procs, outs = [], []
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    workdir = tmp_path / f"ckpt_{scenario}"
    os.makedirs(workdir, exist_ok=True)
    for pid in range(nproc):
        out = tmp_path / f"{scenario}_proc{pid}.txt"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "hybridneuralrendering_tpu.parallel.distributed",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(nproc),
             "--process-id", str(pid),
             "--frames", str(frames),
             "--scenario", scenario,
             "--workdir", str(workdir),
             "--out", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    return outs


@pytest.mark.timeout(600)
def test_two_process_frame_sharded_step(tmp_path):
    outs = _launch(tmp_path, "parity")
    for out in outs:
        sharded, local = np.loadtxt(out)
        assert np.isfinite(sharded) and np.isfinite(local)
        np.testing.assert_allclose(sharded, local, rtol=1e-4)


@pytest.mark.timeout(600)
def test_two_process_lifecycle_ckpt_eval(tmp_path):
    """Steps -> grow -> ckpt save/restore -> eval under a 2-process mesh;
    all hosts must land on bit-identical state digests."""
    outs = _launch(tmp_path, "lifecycle")
    digests = [np.loadtxt(out) for out in outs]
    assert np.isfinite(digests[0]).all()
    # growth actually happened and checkpoint round-tripped
    step_loss, n_added, num_live, xyz_sum, w_sum, best, xyz_restored, evalm = \
        digests[0]
    assert n_added > 0
    assert best == pytest.approx(1.25)
    assert xyz_restored == pytest.approx(xyz_sum, rel=1e-6)
    # cross-host equality, the divergence check
    np.testing.assert_array_equal(digests[0], digests[1])


@pytest.mark.timeout(600)
def test_two_process_replica_data_mesh(tmp_path):
    outs = _launch(tmp_path, "mesh2d")
    for out in outs:
        sharded, local = np.loadtxt(out)
        assert np.isfinite(sharded) and np.isfinite(local)
        np.testing.assert_allclose(sharded, local, rtol=1e-4)
