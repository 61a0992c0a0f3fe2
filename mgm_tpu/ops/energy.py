"""Energy diagnostics (mgm_print_energy.h:17-112 of gfacciol/mgm).

Recomputes E(D) = sum_p C_p(D_p) + pairwise terms over the 4-connected
grid under three pairwise models:
  type 0: truncated-L1  (P1 if |Dp-Dq| <= 1 else P2, averaged over dirs)
  type 1: L1            |Dp-Dq| / 4
  type 2: L2            sqrt((Dr-Dp)^2 + (Dq-Dp)^2) / 4 over direction
                        pairs (r, q = next direction CCW)
Faithful quirks: a pairwise term only counts when BOTH pr and pq (the
L2 pair) are inside the image; the per-pixel energy image returned for
type 0 stores the *L1* contribution (mgm_print_energy.h:80, `Etrunc
[pidx] = G`); a non-finite or out-of-window disparity contributes +inf
through the data term (Dvec out-of-range read).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import INF, shift_fill

# directions[] at mgm_print_energy.h:51-53: W, S, E, N (+ wrap W)
DIRS = ((-1, 0), (0, 1), (1, 0), (0, -1))


def _neighbor(disp, dx, dy):
    """disp value at (x+dx, y+dy); NaN outside the image."""
    return shift_fill(shift_fill(disp, -dy, -2, jnp.nan), -dx, -1, jnp.nan)


@partial(jax.jit, static_argnames=("etype",))
def evaluate_energy_4connected(disp, cc, lo, hi, gmin, *, p1, p2,
                               etype: int = 0):
    """disp: (H, W) float disparities; cc: (H, W, L) dense cost volume
    (+inf outside windows); gmin: disparity of label 0.
    Returns (total_energy, per_pixel_image)."""
    H, W, L = cc.shape
    # data term: CC[p][o] implicitly converts the RAW float disparity to
    # int (truncation toward zero, mgm_print_energy.h:46 + dvec.cc:129)
    # *before* the window-min offset is applied; truncating (o - gmin)
    # instead would pick the wrong cell for fractional negative
    # disparities.
    di = jnp.nan_to_num(disp, nan=jnp.float32(gmin) - 1.0,
                        posinf=jnp.float32(gmin) - 1.0,
                        neginf=jnp.float32(gmin) - 1.0).astype(jnp.int32)
    oi = di - jnp.int32(gmin)
    in_rng = jnp.isfinite(disp) & (oi >= lo) & (oi <= hi) & (oi >= 0) & (oi < L)
    data = jnp.where(
        in_rng,
        jnp.take_along_axis(cc, jnp.clip(oi, 0, L - 1)[..., None], -1)[..., 0],
        INF)

    g_l1 = data
    g_l2 = data
    g_tr = data
    n = jnp.float32(len(DIRS))
    for t in range(4):
        dr = _neighbor(disp, *DIRS[t])
        dq = _neighbor(disp, *DIRS[(t + 1) % 4])
        # both pr and pq must be inside the image; NaN *disparities*
        # still count, so use explicit inside masks, not value tests
        inside_r = _inside_mask(H, W, *DIRS[t])
        inside_q = _inside_mask(H, W, *DIRS[(t + 1) % 4])
        both = inside_r & inside_q
        l1 = jnp.abs(dr - disp) / n
        l2 = jnp.sqrt((dr - disp) ** 2 + (dq - disp) ** 2) / n
        tr = jnp.where(jnp.abs(dr - disp) <= 1.0, p1 / n, p2 / n)
        g_l1 = g_l1 + jnp.where(both, l1, 0.0)
        g_l2 = g_l2 + jnp.where(both, l2, 0.0)
        g_tr = g_tr + jnp.where(both, tr, 0.0)

    if etype == 1:
        return jnp.sum(g_l1), g_l1
    if etype == 2:
        return jnp.sum(g_l2), g_l2
    # type 0: total is truncated-L1 but the image is the L1 map
    return jnp.sum(g_tr), g_l1


def _inside_mask(H, W, dx, dy):
    y = jnp.arange(H)[:, None] + dy
    x = jnp.arange(W)[None, :] + dx
    return (y >= 0) & (y < H) & (x >= 0) & (x < W)


def print_solution_energy(disp, cc, lo, hi, gmin, p1, p2, debug=True,
                          dump_path=None):
    """Replicates print_solution_energy (mgm_print_energy.h:100-112)."""
    if not debug:
        print()
        return None
    e0, img = evaluate_energy_4connected(disp, cc, lo, hi, gmin, p1=p1, p2=p2,
                                         etype=0)
    e1, _ = evaluate_energy_4connected(disp, cc, lo, hi, gmin, p1=p1, p2=p2,
                                       etype=1)
    e2, _ = evaluate_energy_4connected(disp, cc, lo, hi, gmin, p1=p1, p2=p2,
                                       etype=2)
    print(f" ENERGY L1trunc: {float(e0):.9e}\tL1: {float(e1):.9e}\t"
          f"L2: {float(e2):.9e}")
    if dump_path is not None:
        from ..io import write_image
        import numpy as np
        write_image(dump_path, np.asarray(img))
    return float(e0), float(e1), float(e2)
