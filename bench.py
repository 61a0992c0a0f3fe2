"""Headline benchmark: BASELINE.md cfg1 on the bundled fountain23 pair.

Config (BASELINE.json cfg1): AD cost, -r -120 -R 30 (L=151), -O 4,
TSGM=2, default P1/P2, LR consistency check on (both sides solved).
Reference serial-CPU baseline: 18.2 s = 5.8 MP*disp/s over 2 sides
(BASELINE.md).

Prints one result JSON line after EVERY timed rep (each line is a
complete, valid record, so a partially-killed run still yields a
number — the TPU toolchain's remote compile service is high-variance,
2-40 min when the persistent compile cache misses).  The published
`value` is the MEDIAN of the reps so far (the tunnel to the TPU adds
10-20% wall-clock noise per rep; a best-of-N protocol made
round-over-round comparisons noise-dominated — VERDICT round 3), with
the best rep and every raw rep time carried alongside.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_MPDS = 5.8  # reference binary, same config, 1-core Xeon 2.10 GHz
# the tunnel's bandwidth oscillates ~2x on minute timescales (round-4
# measurements: 8-25 MB/s windows); more reps sample more windows and
# keep the median representative
REPS = int(os.environ.get("MGM_TPU_BENCH_REPS", "10"))


def main():
    from mgm_tpu.config import MGMConfig
    from mgm_tpu.io import read_image
    from mgm_tpu.stereo import compute_disparity

    def u8(a):
        # the PNGs are 8-bit: feed their native representation (the
        # pipeline casts on device; lossless-checked here once)
        r = a.astype(np.uint8)
        return r if np.array_equal(r.astype(np.float32), a) else a

    u = u8(read_image("/root/reference/data/fountain23-imL.png"))
    v = u8(read_image("/root/reference/data/fountain23-imR.png"))
    cfg = MGMConfig(dmin=-120, dmax=30, ndir=4, mgm=2, distance="ad",
                    p1=8, p2=32, test_lr=True)
    H, W, _ = u.shape
    L = cfg.dmax - cfg.dmin + 1
    mpd = 2 * H * W * L / 1e6  # both sides

    def run():
        return compute_disparity(u, v, cfg, outputs=("disp", "cost"))

    run()  # warmup (compile; fast when the persistent cache is warm)

    if os.environ.get("MGM_TPU_BENCH_PARITY", "1") != "0":
        # full-scale-geometry parity gate (scripts/tpu_parity.py is the
        # full sweep): Mosaic lowering varies with tile shapes, and the
        # round-2 overcount-fold miscompile appeared ONLY at Rp=512,
        # L=151 — so probe the fused kernels against the dense path on
        # a full-height strip before publishing a number.  Non-fatal:
        # the bench still reports, with the parity verdict on its own
        # comment line.
        for mgm in (2, 4):
            c = MGMConfig(dmin=-120, dmax=30, ndir=4, mgm=mgm,
                          distance="ad", p1=8, p2=32, test_lr=True)
            us, vs = u[:, :256], v[:, :256]
            f = compute_disparity(us, vs, c, outputs=("disp", "cost"))
            os.environ["MGM_TPU_FUSED"] = "0"
            try:
                x = compute_disparity(us, vs, c, outputs=("disp", "cost"))
            finally:
                del os.environ["MGM_TPU_FUSED"]
            fa, fb = np.isfinite(x["disp"]), np.isfinite(f["disp"])
            both = fa & fb
            eq = float((np.abs(x["disp"][both] - f["disp"][both])
                        <= 0.05).mean()) if both.any() else 1.0
            ok = (fa == fb).mean() >= 0.9995 and eq >= 0.998
            print(f"# parity strip mgm={mgm}: "
                  f"{'ok' if ok else 'FAIL'} eq={eq:.5f}", flush=True)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
        value = mpd / float(np.median(times))
        print(json.dumps({
            "metric": ("fountain23 cfg1 (AD, L=151, O4, TSGM=2, LR) "
                       "throughput"),
            "value": round(value, 2),
            "unit": "MP*disp/s",
            "vs_baseline": round(value / BASELINE_MPDS, 2),
            "stat": "median",
            "best": round(mpd / min(times), 2),
            "rep_times_s": [round(t, 4) for t in times],
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
