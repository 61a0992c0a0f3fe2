"""Headline benchmark: BASELINE.md cfg1 on the bundled fountain23 pair.

Config (BASELINE.json cfg1): AD cost, -r -120 -R 30 (L=151), -O 4,
TSGM=2, default P1/P2, LR consistency check on (both sides solved).
Reference serial-CPU baseline: 18.2 s = 5.8 MP*disp/s over 2 sides
(BASELINE.md).  Prints one JSON line with measured MP*disp/s.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_MPDS = 5.8  # reference binary, same config, 1-core Xeon 2.10 GHz

def main():
    from mgm_tpu.config import MGMConfig
    from mgm_tpu.io import read_image
    from mgm_tpu.stereo import compute_disparity

    u = read_image("/root/reference/data/fountain23-imL.png")
    v = read_image("/root/reference/data/fountain23-imR.png")
    cfg = MGMConfig(dmin=-120, dmax=30, ndir=4, mgm=2, distance="ad",
                    p1=8, p2=32, test_lr=True)
    H, W, _ = u.shape
    L = cfg.dmax - cfg.dmin + 1
    mpd = 2 * H * W * L / 1e6  # both sides

    try:
        compute_disparity(u, v, cfg, outputs=("disp", "cost"))  # warmup
    except Exception:
        # the remote TPU compile service intermittently OOM-kills big
        # kernel compiles; retry with a shallower wavefront block
        import jax

        os.environ["MGM_TPU_MAX_G"] = "8"
        jax.clear_caches()
        compute_disparity(u, v, cfg, outputs=("disp", "cost"))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        compute_disparity(u, v, cfg, outputs=("disp", "cost"))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    value = mpd / dt
    print(json.dumps({
        "metric": "fountain23 cfg1 (AD, L=151, O4, TSGM=2, LR) throughput",
        "value": round(value, 2),
        "unit": "MP*disp/s",
        "vs_baseline": round(value / BASELINE_MPDS, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
