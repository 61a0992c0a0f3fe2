"""Quality evaluation on fountain23 against the bundled ground truth.

Reproduces the BASELINE.md quality metrics (bad-2.0, average endpoint
error, invalidated fraction; true disparity = -GT, GT range 0..122)
for any config, so disparity quality can be compared 1:1 with the
measured reference numbers.

    python scripts/eval_fountain.py            # cfg1
    python scripts/eval_fountain.py cfg2       # census + trunc-linear
"""
import json
import sys

sys.path.insert(0, ".")

import numpy as np

from mgm_tpu.io import read_image
from mgm_tpu.models.presets import get_preset
from mgm_tpu.stereo import compute_disparity

DATA = "/root/reference/data"

_R = dict(dmin=-120, dmax=30, test_lr=True)  # fountain23 range, LR on

_T = dict(dmin=-16, dmax=0, test_lr=True)  # tsukuba (runme.m dmax=16)

CFGS = {
    "cfg1": get_preset("fast_ad", **_R),
    "cfg1_tsgm4": get_preset("fast_ad", mgm=4, **_R),
    "cfg2": get_preset("census_tl", **_R),
    "cfg4": get_preset("sobelx_tl", **_R),
    # the MATLAB demo scene (runme.m:5-18); GT = 16 x |disparity|
    "tsukuba": get_preset("fast_ad", **_T),
    "tsukuba_census": get_preset("census_tl", **_T),
}


def evaluate(disp: np.ndarray, gt: np.ndarray) -> dict:
    """bad-2.0 / avg err / invalidated over LR-surviving pixels."""
    true_disp = -gt
    valid = np.isfinite(disp)
    err = np.abs(disp - true_disp)[valid]
    return {
        "bad_2.0_pct": round(float(np.mean(err > 2.0) * 100), 2),
        "avg_err_px": round(float(np.mean(err)), 3),
        "invalidated_pct": round(float(np.mean(~valid) * 100), 2),
    }


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cfg1"
    cfg = CFGS[name]
    if name.startswith("tsukuba"):
        u = read_image(f"{DATA}/imL.png")
        v = read_image(f"{DATA}/imR.png")
        gt = read_image(f"{DATA}/tsukuba-truedispL.png")[..., 0] / 16.0
    else:
        u = read_image(f"{DATA}/fountain23-imL.png")
        v = read_image(f"{DATA}/fountain23-imR.png")
        gt = read_image(f"{DATA}/fountain23-truedispL.png")[..., 0]
    res = compute_disparity(u, v, cfg, outputs=("disp",))
    out = {"config": name, **evaluate(res["disp"], gt)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
