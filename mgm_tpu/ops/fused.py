"""Fused-path orchestration: flip-only pass canonicalisation, skewed
image preparation, kernel launch, and image-space assembly.

The reference's 8 directional passes (mgm_core.cc:463-471 of
gfacciol/mgm) each have a 4-neighbour causal set.  A pass can run in
the fused cost+wavefront kernel (ops/pallas_fused.py) iff its first
`mgm` causal dirs map into the canonical upper half {W, N, NW, NE}
under x/y flips ALONE — a transpose would rotate the disparity
displacement onto the row axis and break the kernel's contiguous
v-window reads.  Which passes qualify depends on mgm:

  pass 0 (deps W,N,NW,NE)  : all mgm      (identity)
  pass 1 (deps E,S,SE,SW)  : all mgm      (flip x+y)
  pass 2 (deps S,W,SW,NW)  : mgm <= 3     (flip y)
  pass 3 (deps N,E,NE,SE)  : mgm <= 3     (flip x)
  pass 4 (deps NW,NE,N,E)  : all mgm      (flip x)
  pass 5 (deps NE,SE,E,S)  : mgm == 1     (flip x)
  pass 6 (deps SE,SW,S,W)  : all mgm      (flip y)
  pass 7 (deps SW,NW,W,N)  : mgm == 1     (flip y)

Passes that don't qualify (and the 22.5-degree knight extension) fall
back to the cost-volume path (ops/aggregate.py).  Fusable passes with
the same canonical offset set and slope batch into one kernel along
with both LR-check sides.  Flip_x passes store their label axis
reversed inside the kernel (the v window slice must ascend); the
assembly unreverses before summing in image space.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import pallas_fused as pf
from .aggregate import PASS_TABLE, aggregate
from .common import INF
from .cost import build_cost_volume, window_mask, _bt_aux

# image-space causal dirs dir1..dir4 per pass (mgm_core.cc:463-471)
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
_CANON = {(-1, 0): 0, (0, -1): 1, (-1, -1): 2, (1, -1): 3}


def fused_spec(p: int, mgm: int):
    """(flip_x, flip_y, d2o, border) for pass p at `mgm` coupled dirs,
    or None when the pass needs a transpose.  Prefers a mapping without
    the NE offset (slope-1 wavefronts, ~40% less skew fill)."""
    if p >= len(PASS_DIRS):
        return None  # knight passes stay on the cost-volume path
    dirs = PASS_DIRS[p]
    candidates = []
    for fx in (False, True):
        for fy in (False, True):
            sx, sy = (-1 if fx else 1), (-1 if fy else 1)
            mapped = [(dx * sx, dy * sy) for dx, dy in dirs[:mgm]]
            if not all(d in _CANON for d in mapped):
                continue
            d2o = tuple(_CANON[d] for d in mapped)
            full = [(dx * sx, dy * sy) for dx, dy in dirs]
            border = (any(d[0] < 0 for d in full),   # needs left col
                      any(d[0] > 0 for d in full),   # needs right col
                      any(d[1] < 0 for d in full),   # needs top row
                      any(d[1] > 0 for d in full))   # needs bottom row
            candidates.append((fx, fy, d2o, border))
    if not candidates:
        return None
    for cand in candidates:
        if 3 not in cand[2]:
            return cand
    return candidates[0]


def split_passes(ndir: int, mgm: int):
    """(fused_groups, leftover_pids): fused passes grouped by (offset
    set, slope); leftovers run through the cost-volume path."""
    groups = {}
    leftover = []
    for p in range(ndir):
        spec = fused_spec(p, mgm)
        if spec is None:
            leftover.append(p)
            continue
        offs = tuple(sorted(set(spec[2])))
        slope = 2 if 3 in offs else 1
        groups.setdefault((offs, slope), []).append((p, spec))
    return list(groups.items()), leftover


def _flip_img(a, fx: bool, fy: bool):
    if fy:
        a = jnp.flip(a, axis=0)
    if fx:
        a = jnp.flip(a, axis=1)
    return a


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


def _col_window(a, start: int, width: int, fill):
    """(..., R, C) -> (..., R, width): out[.., c'] = a[.., c' + start]."""
    C = a.shape[-1]
    pl_, pr = max(0, -start), max(0, start + width - C)
    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(pl_, pr)],
                constant_values=fill)
    return jax.lax.slice_in_dim(a, start + pl_, start + pl_ + width,
                                axis=a.ndim - 1)


def run_fused_group(passes, left, right, w8, *, sides, L, C, R, mgm,
                    p1, p2, mode, nch, tmax, use_fh, use_weights,
                    fold_pid, kappa, interpret=False):
    """One fused kernel launch for `passes` = [(pid, spec), ...].

    left/right: per-side preprocessed image pairs: for side n the
    "left" is the reference image of that solve (the LR check's second
    side swaps them).  sides: tuple of (gmin, lo, hi) static ints per
    side.  Returns the (N, H, W, L) sum over the group's passes of the
    aggregated volumes (the designated pass folds kappa * CC).
    """
    N = len(sides)
    offs = tuple(sorted({o for _, s in passes for o in s[2]}))
    slope = 2 if 3 in offs else 1
    G = 8
    Rp = -(-R // 128) * 128
    # T spans the padded lanes plus an 8-column unskew slice margin
    T = C + slope * (Rp - 1) + 8
    Tp = -(-T // G) * G
    SLAB = -(-(G + L - 1) // 8) * 8
    Tv = Tp + SLAB

    int_img = jnp.issubdtype(left[0].dtype, jnp.integer)
    ifill = 0 if int_img else 0.0

    specs = []
    u_sk, v_sk, w_sk = [], [], []
    for pid, (fx, fy, d2o, border) in passes:
        for n, (gmin, lo, hi) in enumerate(sides):
            if fx:
                phase = -(gmin + L - 1)
                lo_s, hi_s = L - 1 - hi, L - 1 - lo
            else:
                phase = gmin
                lo_s, hi_s = lo, hi
            fold = (pid == fold_pid) and (kappa != 0.0)
            specs.append((phase, lo_s, hi_s, border, d2o, fold))

            u_c = _flip_img(left[n], fx, fy)       # (H, W, Cch)
            v_c = _flip_img(right[n], fx, fy)
            u_c = jnp.moveaxis(u_c, -1, 0)         # (Cch, R, C)
            v_c = jnp.moveaxis(v_c, -1, 0)
            if Rp != R:
                padr = [(0, 0), (0, Rp - R), (0, 0)]
                u_c = jnp.pad(u_c, padr, constant_values=ifill)
                v_c = jnp.pad(v_c, padr, constant_values=ifill)
            u_sk.append(_skew_rows(u_c, slope, Tp, ifill))
            v_shift = _col_window(v_c, phase, Tv, ifill)
            v_sk.append(_skew_rows(v_shift, slope, Tv, ifill))

            if use_weights:
                wch = PASS_TABLE[pid].wch
                planes = []
                for o in offs:
                    k = d2o.index(o)
                    wp = _flip_img(w8[n, :, :, wch[k]], fx, fy)
                    if Rp != R:
                        wp = jnp.pad(wp, [(0, Rp - R), (0, 0)],
                                     constant_values=1.0)
                    planes.append(_skew_rows(wp, slope, Tp, 1.0))
                w_sk.append(jnp.stack(planes))

    U = jnp.stack(u_sk)                            # (M, Cch, Tp, Rp)
    # transpose skewed axes into (.., T, R): T stays untiled, rows in lanes
    U = jnp.swapaxes(U, -1, -2)
    V = jnp.swapaxes(jnp.stack(v_sk), -1, -2)
    W = jnp.swapaxes(jnp.stack(w_sk), -1, -2) if use_weights else None

    out = pf.fused_wavefront(
        U, V, W, specs=specs, C=C, R_eff=R, L=L, G=G, slope=slope,
        mgm=mgm, offs=offs, mode=mode, nch=nch, tmax=tmax, p1=p1, p2=p2,
        use_fh=use_fh, use_weights=use_weights, kappa=kappa,
        interpret=interpret)                       # (M, Tp, L, Rp)

    # ---- assembly: unskew + unflip + sum in image space -------------
    out = jnp.transpose(out, (0, 3, 1, 2))         # (M, Rp, Tp, L)
    out = pf.unskew_rows(out, C, R, slope, interpret)  # (M, R, C, L)
    total = None
    m = 0
    for pid, (fx, fy, d2o, border) in passes:
        vol = out[m:m + N]                         # (N, R, C, L)
        if fx:
            vol = jnp.flip(vol, axis=-1)           # storage label order
            vol = jnp.flip(vol, axis=2)
        if fy:
            vol = jnp.flip(vol, axis=1)
        total = vol if total is None else total + vol
        m += N
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

    groups, leftover = split_passes(ndir, mgm)
    kappa = -float(ndir - 1) if fix_overcount else 0.0
    fold_pid = groups[0][1][0][0]

    lsum = None
    for (offs, slope), passes in groups:
        part = run_fused_group(
            passes, lefts, rights, w8, sides=sides, L=L, C=W, R=H,
            mgm=mgm, p1=p1, p2=p2, mode=mode, nch=nch, tmax=tmax,
            use_fh=use_fh, use_weights=use_weights, fold_pid=fold_pid,
            kappa=kappa, interpret=interpret)
        lsum = part if lsum is None else lsum + part

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
