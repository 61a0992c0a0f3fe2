"""Worker for tests/test_distributed.py: one process of a 2-process
CPU jax.distributed run of the row-sharded stereo pipeline."""
import os
import sys

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

# jax may be preloaded (sitecustomize) with the env already read
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import numpy as np  # noqa: E402

from mgm_tpu.config import MGMConfig  # noqa: E402
from mgm_tpu.parallel import distributed  # noqa: E402

distributed.initialize(f"localhost:{port}", nprocs, proc_id)

import jax  # noqa: E402

assert len(jax.devices()) == 4 * nprocs, jax.devices()

rng = np.random.default_rng(7)
H, W = 4 * nprocs * 4, 37
u = rng.uniform(0, 60, (H, W, 1)).astype(np.float32)
v = np.roll(u, 2, axis=1) + rng.normal(0, 0.5, (H, W, 1)).astype(np.float32)
cfg = MGMConfig(dmin=-5, dmax=2, ndir=4, mgm=2, refinement="vfit",
                median_radius=1, test_lr=True)
out = distributed.compute_disparity_distributed(u, v, cfg)
np.savez(os.path.join(outdir, f"proc{proc_id}.npz"),
         **{k: np.asarray(a) for k, a in out.items()})
print("WORKER_OK", proc_id, flush=True)
