"""Fused-path orchestration: bidirectional space assignment, skewed
image preparation, kernel launches, and image-space assembly.

The reference's 8 directional passes (mgm_core.cc:463-471 of
gfacciol/mgm) each have a 4-neighbour causal set.  A pass runs in the
fused cost+wavefront kernel (ops/pallas_fused.py) iff all its first
`mgm` causal deps are strictly causal under one of four schedules on
the UNFLIPPED image: forward or backward scans over skew space A
(t = c + slope*r) or B (t = c + slope*(Rp-1-r)).  A dep (dx, dy) has
front offset dt = dx + slope*dy (A) / dx - slope*dy (B); forward needs
dt < 0, backward dt > 0.  The reference's antipodal pass pairs land in
the same space with opposite scan directions, so the backward launch
accumulates onto the forward launch's output planes (one per
side x space) — no image flips, label reversals or per-pass volumes
exist anywhere, unlike the round-1 flip-only canonicalisation.

Coverage (identical to round 1's): passes 0,1,4,6 at any mgm; 2,3 at
mgm <= 3; 5,7 at mgm == 1; the 22.5-degree knight passes and the rest
fall back to the cost-volume path (ops/aggregate.py).  Slope 1 is used
when it covers the same pass set (no dep with |dt| == 0), shrinking
the skewed arrays ~30%.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import pallas_fused as pf
from .aggregate import PASS_TABLE, aggregate
from .common import INF
from .cost import build_cost_volume, window_mask, _bt_aux

# image-space causal dirs dir1..dir4 per pass (mgm_core.cc:463-471);
# (dx, dy) with dy the row offset
PASS_DIRS = (
    ((-1, 0), (0, -1), (-1, -1), (1, -1)),
    ((1, 0), (0, 1), (1, 1), (-1, 1)),
    ((0, 1), (-1, 0), (-1, 1), (-1, -1)),
    ((0, -1), (1, 0), (1, -1), (1, 1)),
    ((-1, -1), (1, -1), (0, -1), (1, 0)),
    ((1, -1), (1, 1), (1, 0), (0, 1)),
    ((1, 1), (-1, 1), (0, 1), (-1, 0)),
    ((-1, 1), (-1, -1), (-1, 0), (0, -1)),
)

SCHEDULES = (("A", "fwd"), ("A", "bwd"), ("B", "fwd"), ("B", "bwd"))


def _assign(p: int, mgm: int, slope: int):
    """(space, dir, ranks) scheduling pass p's first `mgm` deps, or
    None.  ranks: per-dep (front lag, lane roll); roll = -dy reads the
    dep row's lane.  Preference order keeps low-mgm configs in space A
    (fewer planes)."""
    if p >= len(PASS_DIRS):
        return None  # knight passes stay on the cost-volume path
    deps = PASS_DIRS[p][:mgm]
    for space, d in SCHEDULES:
        ranks = []
        for dx, dy in deps:
            dt = dx + slope * dy if space == "A" else dx - slope * dy
            lag = -dt if d == "fwd" else dt
            if lag <= 0:
                break
            ranks.append((lag, -dy))
        else:
            return space, d, tuple(ranks)
    return None


def fused_spec(p: int, mgm: int):
    """Fusability at full (slope 2) coverage; None -> cost-volume path."""
    return _assign(p, mgm, 2)


def split_passes(ndir: int, mgm: int):
    """(launches, leftover_pids, slope, planes_spaces).

    launches: [("fwd", [(pid, space, ranks, border), ...]),
               ("bwd", [...])] with empty directions dropped;
    border = (need_left, need_right, need_top, need_bottom) from the
    pass's FULL 4-dep set (mgm_core.cc:538-541).
    """
    cand = {p: fused_spec(p, mgm) for p in range(ndir)}
    fused = {p for p, s in cand.items() if s is not None}
    if all(_assign(p, mgm, 1) for p in fused) if fused else False:
        slope = 1
        cand = {p: _assign(p, mgm, 1) for p in fused}
    else:
        slope = 2
    leftover = [p for p in range(ndir) if p not in fused]
    launches = {"fwd": [], "bwd": []}
    spaces = []
    for p in sorted(fused):
        space, d, ranks = cand[p]
        full = PASS_DIRS[p]
        border = (any(dx < 0 for dx, dy in full),
                  any(dx > 0 for dx, dy in full),
                  any(dy < 0 for dx, dy in full),
                  any(dy > 0 for dx, dy in full))
        launches[d].append((p, space, ranks, border))
        if space not in spaces:
            spaces.append(space)
    spaces = [s for s in ("A", "B") if s in spaces]  # A-first plane order
    out = [(d, ms) for d, ms in launches.items() if ms]
    return out, leftover, slope, spaces


def _skew_rows(a, slope: int, t_len: int, fill):
    """(..., R, C) -> (..., R, t_len): out[r, t] = a[r, t - slope*r]
    (fill outside).  Pure pad+reshape on image-sized data."""
    shp = a.shape
    R, C = shp[-2], shp[-1]
    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, t_len + slope - C)],
                constant_values=fill)
    flat = a.reshape(shp[:-2] + (R * (t_len + slope),))
    flat = flat[..., :R * t_len]
    return flat.reshape(shp[:-2] + (R, t_len))


def _skew(a, space: str, slope: int, t_len: int, fill):
    """Space-aware skew: B = row-flip, skew, row-flip back, which gives
    out[r, t] = a[r, t - slope*(Rp-1-r)] on the padded rows."""
    if space == "B":
        return jnp.flip(_skew_rows(jnp.flip(a, -2), slope, t_len, fill), -2)
    return _skew_rows(a, slope, t_len, fill)


def _col_window(a, start: int, width: int, fill):
    """(..., R, C) -> (..., R, width): out[.., c'] = a[.., c' + start]."""
    C = a.shape[-1]
    pl_, pr = max(0, -start), max(0, start + width - C)
    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(pl_, pr)],
                constant_values=fill)
    return jax.lax.slice_in_dim(a, start + pl_, start + pl_ + width,
                                axis=a.ndim - 1)


def run_fused(launches, spaces, left, right, w8, *, sides, L, C, R,
              slope, mgm, p1, p2, mode, nch, tmax, use_fh, use_weights,
              kappa, interpret=False):
    """Run all fused passes: one forward and (if present) one backward
    accumulating kernel launch over planes = sides x spaces.

    left/right: per-side preprocessed image pairs (side n >= 1, the LR
    check's second solve, swaps them).  sides: tuple of (gmin, lo, hi)
    static ints per side.  Returns the (N, H, W, L) per-plane-summed
    volumes assembled to image space, summed over spaces per side (the
    kappa * CC overcount term folded once per side).
    """
    N = len(sides)
    G = 8
    Rp = -(-R // 128) * 128
    rpb = 8 // slope
    RP = -(-Rp // rpb) * rpb          # rows padded for the unskew grid
    T = C + slope * (RP - 1) + 8
    Tp = -(-T // G) * G
    SLAB = -(-(G + L - 1) // 8) * 8
    Tv = Tp + SLAB
    A0 = {"A": 0, "B": slope * (RP - 1)}
    SS = {"A": -1, "B": 1}

    int_img = jnp.issubdtype(left[0].dtype, jnp.integer)
    ifill = 0 if int_img else 0.0

    # ---- planes: one output volume per (side, space) -----------------
    plane_ix = {}
    plane_specs = []
    u_sk, v_sk = [], []
    for space in spaces:
        for n, (gmin, lo, hi) in enumerate(sides):
            plane_ix[(n, space)] = len(plane_specs)
            # the overcount kappa*CC folds once per side, on the first
            # space's forward launch (all spaces share the side's CC)
            fold = (space == spaces[0]) and (kappa != 0.0)
            plane_specs.append((gmin, lo, hi, A0[space], SS[space], fold))
            u_c = jnp.moveaxis(left[n], -1, 0)     # (Cch, R, C)
            v_c = jnp.moveaxis(right[n], -1, 0)
            if RP != R:
                padr = [(0, 0), (0, RP - R), (0, 0)]
                u_c = jnp.pad(u_c, padr, constant_values=ifill)
                v_c = jnp.pad(v_c, padr, constant_values=ifill)
            u_sk.append(_skew(u_c, space, slope, Tp, ifill))
            v_shift = _col_window(v_c, gmin, Tv, ifill)
            v_sk.append(_skew(v_shift, space, slope, Tv, ifill))
    U = jnp.swapaxes(jnp.stack(u_sk), -1, -2)      # (Mp, Cch, Tp, RP)
    V = jnp.swapaxes(jnp.stack(v_sk), -1, -2)

    out = None
    for d, passes in launches:
        combos = []
        mspecs = []
        w_sk = []
        for pid, space, ranks, border in passes:
            for c in ranks:
                if c not in combos:
                    combos.append(c)
        for pid, space, ranks, border in passes:
            for n in range(N):
                mspecs.append((plane_ix[(n, space)],
                               tuple(combos.index(c) for c in ranks),
                               border))
                if use_weights:
                    wch = PASS_TABLE[pid].wch
                    planes = []
                    for c in combos:
                        if c in ranks:
                            wp = w8[n, :, :, wch[ranks.index(c)]]
                        else:
                            wp = jnp.ones((R, C), jnp.float32)
                        if RP != R:
                            wp = jnp.pad(wp, [(0, RP - R), (0, 0)],
                                         constant_values=1.0)
                        planes.append(_skew(wp, space, slope, Tp, 1.0))
                    w_sk.append(jnp.stack(planes))
        W = (jnp.swapaxes(jnp.stack(w_sk), -1, -2) if use_weights
             else None)
        # the kappa*CC fold happens exactly once: in the first launch
        lspecs = (plane_specs if out is None
                  else [s[:5] + (False,) for s in plane_specs])
        out = pf.fused_wavefront(
            U, V, W, out, planes=lspecs, mspecs=mspecs,
            combos=combos, C=C, R_eff=R, L=L, G=G, slope=slope, mgm=mgm,
            mode=mode, nch=nch, tmax=tmax, p1=p1, p2=p2, use_fh=use_fh,
            use_weights=use_weights, kappa=kappa, reverse=(d == "bwd"),
            interpret=interpret)                   # (Mp, Tp, L, RP)

    # ---- assembly: unskew per plane + sum spaces per side ------------
    out = jnp.transpose(out, (0, 3, 1, 2))         # (Mp, RP, Tp, L)
    sp_tags = [0 if plane_specs[i][4] == -1 else 1
               for i in range(len(plane_specs))]
    vols = pf.unskew_planes(out, C, R, slope, sp_tags, interpret)
    total = None
    for space in spaces:
        i0 = plane_ix[(0, space)]     # sides are contiguous per space
        part = vols[i0:i0 + N]
        total = part if total is None else total + part
    return total


@partial(jax.jit, static_argnames=("sides", "L", "ndir", "mgm", "p1", "p2",
                                  "mode", "nch", "trunc_dist", "use_fh",
                                  "use_weights", "fix_overcount",
                                  "backend"))
def mgm_solve_fused(u_p, v_p, w8, s_lo, s_hi, *, sides, L: int, ndir: int,
                    mgm: int, p1: float, p2: float, mode: str, nch: int,
                    trunc_dist: float, use_fh: bool, use_weights: bool,
                    fix_overcount: bool, backend: str = "fused"):
    """One MGM solve from preprocessed images, cost volume fused into
    the recursion.  Semantically identical to solver.mgm_solve on the
    equivalent dense volume (mgm_core.cc:408-613 of gfacciol/mgm), for
    constant per-side label windows.

    u_p, v_p: (H, W, Cch) preprocessed images (uint32 census codes for
      'census'); side n >= 1 (the LR check's right solve) swaps them.
    w8: (N, H, W, 8) edge weights when use_weights.
    s_lo/s_hi: (N, H, W) int32 S/WTA label windows.
    sides: static tuple of (gmin, lo, hi) ints per side.
    Returns (S, disp, cost) exactly as solver.mgm_solve.
    """
    H, W, _ = u_p.shape
    N = len(sides)
    tmax = trunc_dist * nch
    interpret = backend == "interpret"
    agg_backend = "interpret" if interpret else "pallas"

    if mode in ("btad", "btsd"):
        u3 = jnp.concatenate([u_p, *_bt_aux(u_p)], -1)
        v3 = jnp.concatenate([v_p, *_bt_aux(v_p)], -1)
        lefts, rights = [u3, v3][:N], [v3, u3][:N]
    else:
        lefts, rights = [u_p, v_p][:N], [v_p, u_p][:N]

    launches, leftover, slope, spaces = split_passes(ndir, mgm)
    kappa = -float(ndir - 1) if fix_overcount else 0.0

    lsum = None
    if launches:
        lsum = run_fused(
            launches, spaces, lefts, rights, w8, sides=sides, L=L, C=W,
            R=H, slope=slope, mgm=mgm, p1=p1, p2=p2, mode=mode, nch=nch,
            tmax=tmax, use_fh=use_fh, use_weights=use_weights,
            kappa=kappa, interpret=interpret)

    if leftover:
        # the cost-volume builder computes its own BT aux channels, so
        # it gets the raw preprocessed pair, not the concatenated one
        raw_l, raw_r = [u_p, v_p][:N], [v_p, u_p][:N]
        ccs = []
        for n, (gmin, lo, hi) in enumerate(sides):
            lo_a = jnp.full((H, W), lo, jnp.int32)
            hi_a = jnp.full((H, W), hi, jnp.int32)
            ccs.append(build_cost_volume(
                raw_l[n], raw_r[n], lo_a, hi_a, gmin, distance=mode, L=L,
                trunc_dist=trunc_dist, backend=agg_backend))
        cc = jnp.stack(ccs)
        part = aggregate(cc, w8 if use_weights else None, None, None,
                         p1=p1, p2=p2, ndir=ndir, mgm=mgm, use_fh=use_fh,
                         use_weights=use_weights, fh_restrict=False,
                         backend=agg_backend, pids=tuple(leftover))
        if lsum is None and fix_overcount:
            part = part + kappa * cc
        lsum = part if lsum is None else lsum + part

    # ---- S assembly + WTA (solver.py / mgm_core.cc:582-609) ---------
    l_idx = jnp.arange(L, dtype=jnp.int32)
    in_cc = jnp.stack([(l_idx >= lo) & (l_idx <= hi)
                       for (gmin, lo, hi) in sides])[:, None, None, :]
    if fix_overcount:
        # 0 - (NDIR-1)*INFINITY outside the CC window: -inf for ndir>1,
        # NaN (0*inf) for ndir==1, exactly as the dense solver computes
        outside = -INF if ndir > 1 else float("nan")
    else:
        outside = 0.0
    s_raw = jnp.where(in_cc, lsum, outside)
    in_s = window_mask(s_lo, s_hi, L)
    S = jnp.where(in_s, s_raw, INF)

    cand = jnp.where(jnp.isfinite(S), S, INF)
    idx = jnp.argmin(cand, axis=-1)
    cost = jnp.min(cand, axis=-1)
    gmins = jnp.asarray([g for (g, lo, hi) in sides], jnp.int32)
    disp = (gmins[:, None, None] + idx).astype(jnp.float32)
    return S, disp, cost
