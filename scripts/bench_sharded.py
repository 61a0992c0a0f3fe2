"""Measure the sharded-fused pipeline's superstep glue on ONE chip.

Two measurements substantiating the multi-chip scaling story without a
multi-chip host (VERDICT round-3 task 4):

1. mesh-of-1 overhead: compute_disparity(mesh=Mesh([dev])) vs the
   resident fused path on the same config — the difference is pure
   per-superstep glue (XLA slab slices, track/apron ppermute no-ops,
   launch overhead), since the kernels and math are bitwise identical.
2. rows-per-device sweep: the same mesh-of-1 run on vertically tiled
   images (1x, 2x, 4x fountain rows).  Glue is paid per superstep and
   supersteps grow with FRONTS (not rows): if per-row cost falls as
   rows/device grows, the fixed-glue model behind the ~n x 0.97
   projection (PERF.md) is substantiated in the regime the mesh path
   exists for (large scenes).

    python scripts/bench_sharded.py [--reps N]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from mgm_tpu.io import read_image
from mgm_tpu.config import MGMConfig
from mgm_tpu.stereo import compute_disparity
from jax.sharding import Mesh


def _u8(a):
    r = a.astype(np.uint8)
    return r if np.array_equal(r.astype(np.float32), a) else a


def timed(fn, reps):
    fn()  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    u = _u8(read_image("/root/reference/data/fountain23-imL.png"))
    v = _u8(read_image("/root/reference/data/fountain23-imR.png"))
    cfg = MGMConfig(dmin=-120, dmax=30, ndir=4, mgm=2, distance="ad",
                    p1=8, p2=32, test_lr=True)
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("y",))
    L = cfg.dmax - cfg.dmin + 1

    for mult in (1, 2, 4):
        uu = np.ascontiguousarray(np.tile(u, (mult, 1, 1)))
        vv = np.ascontiguousarray(np.tile(v, (mult, 1, 1)))
        H, W, _ = uu.shape
        mpd = 2 * H * W * L / 1e6

        try:
            # the resident kernel holds ALL rows in lanes: tall images
            # exceed its scoped-VMEM budget by design (that regime
            # belongs to the tiled runner / the mesh path)
            t_res, ts_r = timed(lambda: compute_disparity(
                uu, vv, cfg, outputs=("disp",)), args.reps)
        except Exception as e:
            t_res, ts_r = None, [f"{type(e).__name__}"[:40]]
        t_mesh, ts_m = timed(lambda: compute_disparity(
            uu, vv, cfg, outputs=("disp",), mesh=mesh1), args.reps)
        print(json.dumps({
            "metric": f"sharded-fused glue, {H} rows/device",
            "resident_s": round(t_res, 4) if t_res else None,
            "mesh1_s": round(t_mesh, 4),
            "overhead_x": (round(t_mesh / t_res, 3) if t_res else None),
            "mesh1_mpds": round(mpd / t_mesh, 1),
            "resident_reps": [round(t, 4) if isinstance(t, float) else t
                              for t in ts_r],
            "mesh1_reps": [round(t, 4) for t in ts_m],
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
