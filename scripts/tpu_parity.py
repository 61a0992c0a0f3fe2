"""On-device parity sweep: fused Pallas path vs the XLA path, on TPU.

The pytest suite runs hermetically on CPU, where the fused path is
exercised only in Pallas interpret mode on small crops — Mosaic
lowering bugs that depend on real tile shapes can slip through.  This
sweep runs crop-sized problems on the attached TPU with the fused path
on and off and demands near-bit equality, covering every fused
geometry: slope 1/2, spaces A/B/V, fwd/bwd accumulation, the fast
unskew+WTA assembly, census/FH/weights, and the leftover cost-volume
mix at mgm=4.

    python scripts/tpu_parity.py            # crop sweep
    python scripts/tpu_parity.py --full     # full-image sweep (slow)
    python scripts/tpu_parity.py mgm4_leftover_mix  # one case

Exits non-zero on the first failure.

--full exists because crop parity is NOT sufficient: the round-2
mgm=4 overcount-fold bug produced ~10% wrong disparities ONLY at
full-image geometry (Rp=512, L=151) while every crop case passed —
Mosaic lowering varies with tile shapes, so each fused geometry needs
at least one full-scale run before a config's output is trusted.
"""
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from mgm_tpu.io import read_image
from mgm_tpu.models.presets import get_preset
from mgm_tpu.stereo import compute_disparity

DATA = "/root/reference/data"

# (name, preset, overrides) — crop ranges keep compiles fast
CASES = [
    ("mgm2_slope1_fastwta", "fast_ad", {}),
    ("mgm3_all_spaces", "fast_ad", {"ndir": 8, "mgm": 3}),
    ("mgm4_parity", "fast_ad", {"mgm": 4}),
    ("mgm4_parity_o8", "fast_ad", {"ndir": 8, "mgm": 4}),
    ("mgm1_slope1_all8", "fast_ad", {"ndir": 8, "mgm": 1}),
    ("census_fh", "census_tl", {}),
    ("census_fh_mgm4", "census_tl", {"mgm": 4}),
    ("weights", "fast_ad", {"a_p2": 0.5, "ndir": 8, "mgm": 3}),
    ("single_side", "fast_ad", {"test_lr": False}),
    ("bt", "bt", {"refinement": "none"}),
]


# full-image cases: every fused geometry at production shapes
FULL_CASES = [
    ("full_mgm2_fastwta", "fast_ad", {}),
    ("full_mgm4_parity", "fast_ad", {"mgm": 4}),
    ("full_mgm4_parity_o8", "fast_ad", {"ndir": 8, "mgm": 4}),
    ("full_census_fh_o8", "census_tl", {}),
    ("full_census_fh_mgm4", "census_tl", {"mgm": 4}),
    ("full_mgm3_spaces", "fast_ad", {"ndir": 8, "mgm": 3}),
    ("full_per_pixel", "fast_ad", {"per_pixel": True}),
    ("full_per_pixel_fh", "census_tl", {"per_pixel": True}),
    ("full_per_pixel_mgm4", "fast_ad", {"mgm": 4, "per_pixel": True}),
]


def run_case(name, preset, over, full=False):
    over = dict(over)
    per_pixel = over.pop("per_pixel", False)
    u = read_image(f"{DATA}/fountain23-imL.png")
    v = read_image(f"{DATA}/fountain23-imR.png")
    if not full:
        u, v = u[:120, :160], v[:120, :160]
        cfg = get_preset(preset, dmin=-40, dmax=26,
                         **{"test_lr": True, **over})
    else:
        cfg = get_preset(preset, dmin=-120, dmax=30,
                         **{"test_lr": True, **over})
    kw = {}
    if per_pixel:
        rng = np.random.default_rng(0)
        H, W, _ = u.shape
        dmin_img = (cfg.dmin + 40 * rng.random((H, W))).astype(np.float32)
        kw = dict(dmin_img=dmin_img,
                  dmax_img=(dmin_img + 60).astype(np.float32))
    f = compute_disparity(u, v, cfg, outputs=("disp", "cost"), **kw)
    os.environ["MGM_TPU_FUSED"] = "0"
    try:
        x = compute_disparity(u, v, cfg, outputs=("disp", "cost"), **kw)
    finally:
        del os.environ["MGM_TPU_FUSED"]
    fa, fb = np.isfinite(x["disp"]), np.isfinite(f["disp"])
    mask = (fa == fb).mean()
    both = fa & fb
    # near-exact, not bitwise: fused planes and dense groups sum the
    # per-pass volumes in different orders (float epsilon on S, which
    # can shift a near-tie WTA/vfit on isolated pixels)
    dd = np.abs(x["disp"][both] - f["disp"][both]) if both.any() else \
        np.zeros(1)
    eq = (dd <= 0.05).mean()
    # refined costs can be legitimately NaN (vfit against +-inf S
    # cells); the two paths must agree on WHERE, and on the values
    # elsewhere
    ca, cb = np.isfinite(x["cost"]), np.isfinite(f["cost"])
    cmask = (ca == cb).mean()
    cboth = both & ca & cb
    cerr = (np.abs(x["cost"][cboth] - f["cost"][cboth])
            / (1.0 + np.abs(x["cost"][cboth]))).max() if cboth.any() else 0.0
    ok = (mask >= 0.9995 and eq >= 0.998 and cmask >= 0.9995
          and cerr <= 1e-4)
    print(f"[{'ok' if ok else 'FAIL'}] {name}: mask={mask:.5f} "
          f"eq={eq:.5f} cost_relerr={cerr:.2e}", flush=True)
    return ok


def main():
    args = sys.argv[1:]
    full = "--full" in args
    sel = [a for a in args if a != "--full"] or None
    ok = True
    for name, preset, over in (FULL_CASES if full else CASES):
        if sel and name not in sel:
            continue
        ok = run_case(name, preset, over, full=full) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
