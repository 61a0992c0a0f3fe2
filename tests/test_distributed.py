"""Multi-host (multi-controller) execution: 2 CPU processes over
jax.distributed must reproduce the single-process result bitwise
(SURVEY.md 2.9 / BASELINE.md "N>=2 hosts").

The test launches two fresh interpreters (each contributing 4 virtual
CPU devices to an 8-device global row mesh) running
tests/_dist_worker.py, then re-computes the same problem in-process on
an 8-device mesh and compares.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_equals_single(tmp_path):
    port = _free_port()
    workers = []
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    script = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    for pid in range(2):
        workers.append(subprocess.Popen(
            [sys.executable, script, str(pid), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [w.communicate(timeout=900)[0] for w in workers]
    for pid, (w, o) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {pid} failed:\n{o[-4000:]}"
        assert f"WORKER_OK {pid}" in o

    # single-process reference on the same problem (8 local devices,
    # conftest already forces 8 virtual CPU devices)
    from mgm_tpu.config import MGMConfig
    from mgm_tpu.parallel.shard import make_mesh
    from mgm_tpu.stereo import compute_disparity

    rng = np.random.default_rng(7)
    H, W = 32, 37
    u = rng.uniform(0, 60, (H, W, 1)).astype(np.float32)
    v = (np.roll(u, 2, axis=1)
         + rng.normal(0, 0.5, (H, W, 1)).astype(np.float32))
    cfg = MGMConfig(dmin=-5, dmax=2, ndir=4, mgm=2, refinement="vfit",
                    median_radius=1, test_lr=True)
    ref = compute_disparity(u, v, cfg, mesh=make_mesh(8))

    for pid in range(2):
        got = np.load(tmp_path / f"proc{pid}.npz")
        assert set(got.files) == set(ref.keys())
        for k in ref:
            a, b = ref[k], got[k]
            fa, fb = np.isfinite(a), np.isfinite(b)
            np.testing.assert_array_equal(fa, fb, err_msg=f"{k} proc{pid}")
            np.testing.assert_array_equal(b[fa], a[fa],
                                          err_msg=f"{k} proc{pid}")
