"""Energy diagnostics vs a literal oracle of mgm_print_energy.h:17-96."""
import numpy as np
import pytest

import jax.numpy as jnp

from mgm_tpu.ops.energy import evaluate_energy_4connected


def energy_oracle(disp, cc, lo, hi, gmin, p1, p2, etype):
    H, W, L = cc.shape
    dirs = [(-1, 0), (0, 1), (1, 0), (0, -1), (-1, 0)]
    total = 0.0
    img = np.zeros((H, W), np.float32)
    for y in range(H):
        for x in range(W):
            o = disp[y, x]
            oi = int(o) if np.isfinite(o) else None
            g = [np.inf] * 3
            li = oi - gmin if oi is not None else None
            if li is not None and lo[y, x] <= li <= hi[y, x] and 0 <= li < L:
                g = [cc[y, x, li]] * 3
            for t in range(4):
                rx, ry = x + dirs[t][0], y + dirs[t][1]
                qx, qy = x + dirs[t + 1][0], y + dirs[t + 1][1]
                if not (0 <= rx < W and 0 <= ry < H):
                    continue
                if not (0 <= qx < W and 0 <= qy < H):
                    continue
                oor, ooq = disp[ry, rx], disp[qy, qx]
                g[0] += abs(oor - o) / 4
                g[1] += np.sqrt((oor - o) ** 2 + (ooq - o) ** 2) / 4
                g[2] += (p1 if abs(oor - o) <= 1 else p2) / 4
            total += g[[2, 0, 1][etype]]
            img[y, x] = g[0]  # type 0 stores the L1 map (the quirk)
    if etype == 1:
        img = None  # oracle only checks the type-0 image
    return total, img


@pytest.mark.parametrize("etype", [0, 1, 2])
def test_energy(rng, etype):
    H, W, L, gmin = 6, 8, 5, -2
    cc = rng.uniform(0, 30, (H, W, L)).astype(np.float32)
    lo = np.zeros((H, W), np.int32)
    hi = np.full((H, W), L - 1, np.int32)
    disp = (rng.integers(0, L, (H, W)) + gmin).astype(np.float32)
    want_total, want_img = energy_oracle(disp, cc, lo, hi, gmin, 8.0, 32.0,
                                         etype)
    total, img = evaluate_energy_4connected(
        jnp.asarray(disp), jnp.asarray(cc), jnp.asarray(lo), jnp.asarray(hi),
        gmin, p1=8.0, p2=32.0, etype=etype)
    np.testing.assert_allclose(float(total), want_total, rtol=1e-5)
    if etype == 0:
        np.testing.assert_allclose(np.asarray(img), want_img, rtol=1e-5)


def test_energy_nonfinite_disp(rng):
    """NaN disparities contribute +inf through the data term."""
    H, W, L = 4, 5, 3
    cc = rng.uniform(0, 10, (H, W, L)).astype(np.float32)
    lo = np.zeros((H, W), np.int32)
    hi = np.full((H, W), L - 1, np.int32)
    disp = rng.integers(0, L, (H, W)).astype(np.float32)
    disp[1, 2] = np.nan
    total, _ = evaluate_energy_4connected(
        jnp.asarray(disp), jnp.asarray(cc), jnp.asarray(lo), jnp.asarray(hi),
        0, p1=8.0, p2=32.0, etype=0)
    assert np.isinf(float(total))
