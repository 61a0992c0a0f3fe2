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

Coverage: ALL 8 reference passes fuse at every mgm in 1..4 — passes
0,1,4,6 in the skewed A/B spaces, 2,3 (mgm <= 3) in B, 5,7
(mgm in 2..3) as slope-0 column fronts (space V), and the mgm = 4
holdouts 2,3,5,7 in the PACKED PARITY spaces PA/PB (slope-1/2
wavefronts t = 2c +- r whose lanes hold half-rows — see
pallas_fused._kernel).  Only the 22.5-degree knight passes (9..16)
take the cost-volume path (ops/aggregate.py).  Slope 1 is used when
it covers the same A/B pass set (no dep with |dt| == 0), shrinking
the skewed arrays ~30%.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from . import pallas_fused as pf
from .aggregate import PASS_TABLE, aggregate
from .common import INF
from .cost import build_cost_volume, window_mask, _bt_aux
from .refine import taps_from_S

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

# Space V = slope-0 column fronts (t = c, no skew): passes whose
# coupled deps are all strictly horizontal-causal (|dx| = 1, any dy)
# run as plain left-to-right / right-to-left column scans — this is
# what makes passes 5 and 7 (deps all with dx = +1 / -1 up to mgm = 3,
# mgm_core.cc:468,471) fusable, so ndir = 8 configs at mgm <= 3 (the
# reference's census/trunc-linear benchmarks) never touch the
# cost-volume fallback.
#
# Spaces PA/PB = slope-1/2 ("parity") wavefronts t = 2c + r (PA) /
# t = 2c + (R-1-r) (PB): the only linear schedules under which the
# mgm = 4 dep sets of passes 2/3/5/7 (each mixing a vertical dep with
# both diagonal signs, mgm_core.cc:465-471) are strictly causal —
# pass 2 fwd / 3 bwd in PB, pass 7 fwd / 5 bwd in PA.  Each front
# holds every other image row; the kernel PACKS lanes as half-rows
# (lane rho = row 2*rho + front-parity), so occupancy stays full and
# only the front count grows (T = 2C + R vs C + 2R).  This removes the
# last dense-volume fallback of the reference's default TSGM=4 config.
SCHEDULES = (("A", "fwd"), ("A", "bwd"), ("B", "fwd"), ("B", "bwd"),
             ("V", "fwd"), ("V", "bwd"),
             ("PA", "fwd"), ("PA", "bwd"), ("PB", "fwd"), ("PB", "bwd"))

P_SLOPE = -1  # `slope` tag marking the packed parity group


def _assign(p: int, mgm: int, slope: int):
    """(space, dir, ranks) scheduling pass p's first `mgm` deps, or
    None.  ranks: per-dep (front lag, lane roll) — parity spaces use
    (front lag, dy) since the packed lane roll is front-parity
    dependent (pallas_fused._delta_roll).  Preference order keeps
    low-mgm configs in space A (fewer planes) and reaches for V and
    the parity spaces (extra launch pairs) last."""
    if p >= len(PASS_DIRS):
        return None  # knight passes stay on the cost-volume path
    deps = PASS_DIRS[p][:mgm]
    for space, d in SCHEDULES:
        ranks = []
        for dx, dy in deps:
            if space == "A":
                dt = dx + slope * dy
            elif space == "B":
                dt = dx - slope * dy
            elif space == "V":
                dt = dx
            elif space == "PA":
                dt = 2 * dx + dy
            else:
                dt = 2 * dx - dy
            lag = -dt if d == "fwd" else dt
            if lag <= 0:
                break
            ranks.append((lag, dy) if space in ("PA", "PB")
                         else (lag, -dy))
        else:
            return space, d, tuple(ranks)
    return None


def fused_spec(p: int, mgm: int):
    """Fusability at full (slope 2) coverage; None -> cost-volume path."""
    return _assign(p, mgm, 2)


def split_passes(ndir: int, mgm: int):
    """(groups, leftover_pids).

    groups: up to three (slope, spaces, launches) tuples — the skewed
    group (slope 1 or 2, spaces within {A, B}), the column-front group
    (slope 0, ["V"]) and the packed parity group (slope P_SLOPE = -1,
    spaces within {PA, PB}); launches within a group:
    [("fwd", [(pid, space, ranks, border), ...]), ("bwd", [...])] with
    empty directions dropped; border = (need_left, need_right,
    need_top, need_bottom) from the pass's FULL 4-dep set
    (mgm_core.cc:538-541).  Slope 1 is preferred when it covers the
    same pass set (no skewed dep with |dt| == 0), shrinking the skewed
    arrays ~30%.
    """
    cand = {p: fused_spec(p, mgm) for p in range(ndir)}
    fused = {p for p, s in cand.items() if s is not None}
    in_ab = {p for p in fused if cand[p][0] in ("A", "B")}
    cand1 = {p: _assign(p, mgm, 1) for p in in_ab}
    if in_ab and all(a is not None and a[0] in ("A", "B")
                     for a in cand1.values()):
        cand.update(cand1)
        slope = 1
    else:
        slope = 2
    leftover = [p for p in range(ndir) if p not in fused]
    groups = []
    for kind in ("AB", "V", "P"):
        launches = {"fwd": [], "bwd": []}
        spaces = []
        for p in sorted(fused):
            space, d, ranks = cand[p]
            k = "V" if space == "V" else ("P" if space in ("PA", "PB")
                                          else "AB")
            if k != kind:
                continue
            full = PASS_DIRS[p]
            border = (any(dx < 0 for dx, dy in full),
                      any(dx > 0 for dx, dy in full),
                      any(dy < 0 for dx, dy in full),
                      any(dy > 0 for dx, dy in full))
            launches[d].append((p, space, ranks, border))
            if space not in spaces:
                spaces.append(space)
        if spaces:
            order = {"AB": ("A", "B"), "V": ("V",), "P": ("PA", "PB")}
            spaces = [s for s in order[kind] if s in spaces]
            gslope = {"AB": slope, "V": 0, "P": P_SLOPE}[kind]
            groups.append((gslope, spaces,
                           [(d, ms) for d, ms in launches.items() if ms]))
    return groups, leftover


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


def _pad_rows(a, rows: int, fill):
    """Pad axis -2 up to `rows`."""
    R = a.shape[-2]
    if R == rows:
        return a
    pad = [(0, 0)] * a.ndim
    pad[-2] = (0, rows - R)
    return jnp.pad(a, pad, constant_values=fill)


def _skew_packed(a, space: str, t_len: int, R2: int, fill):
    """(..., R, C) -> (..., R2, t_len) PACKED parity skew: lane rho of
    front t holds pixel (row 2*rho + par, col t//2 - A0 + ssgn*rho)
    with par = (t & 1) ^ (space == "PB"), (A0, ssgn) = (0, -1) for PA
    and (R2 - 1, +1) for PB.  Pure pad/reshape, no gathers."""
    a = _pad_rows(a, 2 * R2, fill)
    if space == "PB":
        a = jnp.flip(a, -2)
    th = t_len // 2
    E = _skew_rows(a[..., 0::2, :], 1, th, fill)
    O = _skew_rows(a[..., 1::2, :], 1, th, fill)
    out = jnp.stack([E, O], axis=-1).reshape(a.shape[:-2] + (R2, t_len))
    if space == "PB":
        out = jnp.flip(out, -2)
    return out


def _ring_packed(v, space: str, th_len: int, R2: int, fill):
    """Phase-shifted right image (..., R, Wv) -> the two per-front-
    parity ring sources (V_even, V_odd), each (..., R2, th_len):
    V_par[rho, tau] = the packed value of front 2*tau + par at lane
    rho (= _skew_packed(v)[rho, 2*tau + par])."""
    v = _pad_rows(v, 2 * R2, fill)
    if space == "PB":
        v = jnp.flip(v, -2)
    E = _skew_rows(v[..., 0::2, :], 1, th_len, fill)
    O = _skew_rows(v[..., 1::2, :], 1, th_len, fill)
    if space == "PB":
        E, O = jnp.flip(E, -2), jnp.flip(O, -2)
    return E, O


def _unskew_rows(a, C: int, slope: int):
    """Inverse of _skew_rows on the last two axes:
    out[..., r, c] = a[..., r, c + slope*r]."""
    shp = a.shape
    R, T = shp[-2], shp[-1]
    flat = a.reshape(shp[:-2] + (R * T,))
    flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, slope * R)])
    out = flat.reshape(shp[:-2] + (R, T + slope))
    return out[..., :C]


def _unskew_packed(pair, C: int, R: int, space: str):
    """Transposed parity outputs ((even, odd), each (Mp, R2, Th, L)) ->
    (Mp, R, C, L) image-space volume."""
    outs = []
    for y in pair:
        z = jnp.transpose(y, (0, 3, 1, 2))         # (Mp, L, R2, Th)
        if space == "PB":
            z = jnp.flip(z, -2)
        z = _unskew_rows(z, C, 1)                  # (Mp, L, R2, C)
        if space == "PB":
            z = jnp.flip(z, -2)
        outs.append(z)
    a, b = outs                                    # even-/odd-front
    if space == "PB":
        a, b = b, a                                # -> even/odd ROWS
    vol = jnp.stack([a, b], axis=3)                # (Mp, L, R2, 2, C)
    Mp, L, R2 = vol.shape[0], vol.shape[1], vol.shape[2]
    vol = vol.reshape(Mp, L, 2 * R2, vol.shape[-1])
    return jnp.transpose(vol, (0, 2, 3, 1))[:, :R]


def _run_group(launches, spaces, left, right, w8, *, sides, L, C, R, RP,
               slope, mgm, p1, p2, mode, nch, tmax, use_fh, use_weights,
               kappa, fold_group, interpret, lohi_px=None,
               fh_restrict=False):
    """Run one geometry group (skewed A/B or column-front V): one
    forward and (if present) one backward accumulating kernel launch
    over planes = sides x spaces.

    left/right: per-side preprocessed image pairs (side n >= 1, the LR
    check's second solve, swaps them).  sides: tuple of (gmin, lo, hi)
    static ints per side.  fold_group: this group's first launch folds
    the kappa * CC overcount term (exactly one group may).
    lohi_px: per-pixel (lo, hi) (N, H, W) int32 label windows replacing
    the constant per-side windows of `sides` (-m/-M, mgm.cc:338-353).
    Returns the NATIVE launch output (Mp, Tp, L, RP): the forward
    launch's planes with the backward launch accumulated in.
    """
    N = len(sides)
    parity = slope == P_SLOPE
    # front-block depth: more fronts per grid step amortise per-step
    # overhead but grow the (Mp, G, L, Rp) in/out blocks; 8 is safe
    # everywhere, 16 is worth trying on large-VMEM parts.  Parity
    # launches need G/2 (the per-ring advance) to stay 8-aligned.
    # Tp rounds up to a 128-lane multiple (not just the G-block): the
    # unskew+WTA relayout puts fronts in LANES, and keeping the native
    # extent 128-aligned makes that relayout a single pure transpose
    # copy (Mosaic's dynamic lane rotate rejects unaligned lane dims;
    # a separate XLA pad op costs a full extra volume pass).  The few
    # extra dead fronts are masked like the G-rounding ones always were.
    from math import lcm
    if parity:
        G = int(os.environ.get("MGM_TPU_FUSED_GP", "16"))
        # half-row lanes; DMA slices need the lane dim 128-aligned
        R2 = -(-(RP // 2) // 128) * 128
        T = 2 * C + 2 * R2 + 8
        Tp = -(-T // (2 * lcm(128, G // 2))) * (2 * lcm(128, G // 2))
        SLAB = -(-(G // 2 + L - 1) // 8) * 8
        Tv = Tp // 2 + SLAB
        A0 = {"PA": 0, "PB": R2 - 1}
        SS = {"PA": -1, "PB": 1}
        PARF = {"PA": 0, "PB": 1}
        kslope = 1
    else:
        G = int(os.environ.get("MGM_TPU_FUSED_G", "8"))
        T = C + slope * (RP - 1) + 8
        Tp = -(-T // lcm(128, G)) * lcm(128, G)
        SLAB = -(-(G + L - 1) // 8) * 8
        Tv = Tp + SLAB
        A0 = {"A": 0, "B": slope * (RP - 1), "V": 0}
        SS = {"A": -1, "B": 1, "V": -1}
        PARF = {"A": 0, "B": 0, "V": 0}
        kslope = slope

    int_img = jnp.issubdtype(left[0].dtype, jnp.integer)
    ifill = 0 if int_img else 0.0

    def skew_in(a, space, t_len, fill):
        if parity:
            return _skew_packed(a, space, t_len, R2, fill)
        return _skew(a, space, slope, t_len, fill)

    # ---- planes: one output volume per (side, space) -----------------
    plane_ix = {}
    plane_specs = []
    u_sk, v_sk = [], []
    lo_sk, hi_sk = [], []
    for space in spaces:
        for n, (gmin, lo, hi) in enumerate(sides):
            plane_ix[(n, space)] = len(plane_specs)
            # the overcount kappa*CC folds once per side, on the fold
            # group's first space's forward launch (all spaces share
            # the side's CC)
            fold = fold_group and (space == spaces[0]) and (kappa != 0.0)
            plane_specs.append((gmin, lo, hi, A0[space], SS[space], fold,
                                PARF[space]))
            u_c = jnp.moveaxis(left[n], -1, 0)     # (Cch, R, C)
            v_c = jnp.moveaxis(right[n], -1, 0)
            if RP != R:
                padr = [(0, 0), (0, RP - R), (0, 0)]
                u_c = jnp.pad(u_c, padr, constant_values=ifill)
                v_c = jnp.pad(v_c, padr, constant_values=ifill)
            u_sk.append(skew_in(u_c, space, Tp, ifill))
            if parity:
                v_shift = _col_window(v_c, gmin, Tv, ifill)
                v_sk.append(_ring_packed(v_shift, space, Tv, R2, ifill))
            else:
                v_shift = _col_window(v_c, gmin, Tv, ifill)
                v_sk.append(_skew(v_shift, space, slope, Tv, ifill))
            if lohi_px is not None:
                # pad cells get the full window: they are masked by the
                # col/row bounds anyway and never trip all-invalid->0
                lo_c = lohi_px[0][n].astype(jnp.int32)
                hi_c = lohi_px[1][n].astype(jnp.int32)
                if RP != R:
                    pr = [(0, RP - R), (0, 0)]
                    lo_c = jnp.pad(lo_c, pr, constant_values=0)
                    hi_c = jnp.pad(hi_c, pr, constant_values=L - 1)
                lo_sk.append(skew_in(lo_c, space, Tp, 0))
                hi_sk.append(skew_in(hi_c, space, Tp, L - 1))
    U = jnp.swapaxes(jnp.stack(u_sk), -1, -2)      # (Mp, Cch, Tp, RP)
    if parity:
        V = (jnp.swapaxes(jnp.stack([p[0] for p in v_sk]), -1, -2),
             jnp.swapaxes(jnp.stack([p[1] for p in v_sk]), -1, -2))
    else:
        V = jnp.swapaxes(jnp.stack(v_sk), -1, -2)
    lohi = None
    if lohi_px is not None:
        lohi = (jnp.swapaxes(jnp.stack(lo_sk), -1, -2),
                jnp.swapaxes(jnp.stack(hi_sk), -1, -2))  # (Mp, Tp, RP)

    # the backward launch ACCUMULATES onto the forward launch's planes
    # via input_output_aliasing.  (Round 4 measured the alternative —
    # separate fwd/bwd volumes with the add deferred to the relayout
    # copy — hoping XLA would fuse add+transpose into one pass; it
    # materialised add, transpose AND pad as three full-volume ops,
    # 16.5 ms vs the accumulate's 4.2 ms read-modify-write.)
    out = None
    first_launch = True
    for d, passes in launches:
        combos = []
        mspecs = []
        w_sk = []
        for pid, space, ranks, border in passes:
            for c in ranks:
                # parity combo keys carry the space's parf: the packed
                # lane roll of a (lag, dy) dep flips between PA and PB
                ck = c + (PARF[space],) if parity else c
                if ck not in combos:
                    combos.append(ck)
        for pid, space, ranks, border in passes:
            cks = [c + (PARF[space],) if parity else c for c in ranks]
            for n in range(N):
                mspecs.append((plane_ix[(n, space)],
                               tuple(combos.index(ck) for ck in cks),
                               border))
                if use_weights:
                    wch = PASS_TABLE[pid].wch
                    planes = []
                    for ck in combos:
                        if ck in cks:
                            wp = w8[n, :, :, wch[cks.index(ck)]]
                        else:
                            wp = jnp.ones((R, C), jnp.float32)
                        if RP != R:
                            wp = jnp.pad(wp, [(0, RP - R), (0, 0)],
                                         constant_values=1.0)
                        planes.append(skew_in(wp, space, Tp, 1.0))
                    w_sk.append(jnp.stack(planes))
        W = (jnp.swapaxes(jnp.stack(w_sk), -1, -2) if use_weights
             else None)
        # the kappa*CC fold happens exactly once: in the first launch
        lspecs = (plane_specs if first_launch
                  else [s[:5] + (False,) + s[6:] for s in plane_specs])
        first_launch = False
        out = pf.fused_wavefront(
            U, V, W, out, planes=lspecs, mspecs=mspecs,
            combos=combos, C=C, R_eff=R, L=L, G=G, slope=kslope, mgm=mgm,
            mode=mode, nch=nch, tmax=tmax, p1=p1, p2=p2, use_fh=use_fh,
            use_weights=use_weights, kappa=kappa, reverse=(d == "bwd"),
            lohi=lohi, fh_restrict=fh_restrict, parity=parity,
            interpret=interpret)                   # (Mp, Tp, L, RP)

    return out  # native (Mp, Tp, L, RP); parity: (even, odd) pair


def run_fused(groups, left, right, w8, *, sides, L, C, R, mgm, p1, p2,
              mode, nch, tmax, use_fh, use_weights, kappa,
              interpret=False, assemble=True, lohi_px=None,
              fh_restrict=False):
    """Run all fused-pass groups (skewed A/B + column-front V), sharing
    one row padding RP so their raw outputs are row-aligned.

    assemble=True: unskew every plane and return the (N, H, W, L)
    per-side sum.  assemble=False: return the raw per-group NATIVE
    outputs [(raw (Mp, Tp_g, L, RP), slope_g, spaces_g), ...] (parity:
    raw is an (even, odd) pair of (Mp, Th_g, L, R2)) for the fused
    unskew+WTA assembly (ops/pallas_fused.unskew_wta_planes).
    """
    N = len(sides)
    Rp = -(-R // 128) * 128
    slope_ab = next((s for s, _, _ in groups if s > 0), 1)
    rpb = 8 // slope_ab
    RP = -(-Rp // rpb) * rpb          # rows padded for the unskew grid
    outs = []
    first = True
    for slope_g, spaces_g, launches_g in groups:
        raw = _run_group(launches_g, spaces_g, left, right, w8,
                         sides=sides, L=L, C=C, R=R, RP=RP, slope=slope_g,
                         mgm=mgm, p1=p1, p2=p2, mode=mode, nch=nch,
                         tmax=tmax, use_fh=use_fh, use_weights=use_weights,
                         kappa=kappa, fold_group=first, interpret=interpret,
                         lohi_px=lohi_px, fh_restrict=fh_restrict)
        first = False
        outs.append((raw, slope_g, spaces_g))
    if not assemble:
        return outs
    return assemble_groups(outs, N=N, C=C, R=R, interpret=interpret)


def assemble_groups(outs, *, N, C, R, interpret=False):
    """Unskew every group's raw NATIVE (Mp, Tp, L, RP) planes and
    return the (N, H, W, L) per-side sum (the materialised-volume
    assembly; the fused unskew+WTA path in mgm_solve_fused skips this
    entirely).  The (0, 3, 1, 2) relayout feeding each unskew absorbs
    the forward+backward launch add."""
    total = None
    for raw, slope_g, spaces_g in outs:
        if slope_g == P_SLOPE:
            # fold parity spaces onto the RUNNING total one at a time:
            # the fused WTA kernel (pallas_fused._wta_kernel) and the
            # sharded pipeline (fused_shard) both sum spaces strictly
            # left-to-right (A,B,V,PA,PB), and bitwise equality across
            # the three assemblies depends on one association order
            for si, sp in enumerate(spaces_g):
                pair = tuple(
                    jnp.transpose(raw[h][si * N:(si + 1) * N],
                                  (0, 3, 1, 2)) for h in range(2))
                vol = _unskew_packed(pair, C, R, sp)
                total = vol if total is None else total + vol
            continue
        elif slope_g == 0:
            # V unskew: t = c, pure slice of the relayout
            part = jnp.transpose(raw, (0, 3, 1, 2))[:, :R, :C, :]
        else:
            rawt = jnp.transpose(raw, (0, 3, 1, 2))
            sp_tags = [0 if s == "A" else 1 for s in spaces_g
                       for _ in range(N)]
            vols = pf.unskew_planes(rawt, C, R, slope_g, sp_tags,
                                    interpret)
            part = vols[:N]
            for si in range(1, len(spaces_g)):
                part = part + vols[si * N:(si + 1) * N]
        total = part if total is None else total + part
    return total


@partial(jax.jit, static_argnames=("sides", "L", "ndir", "mgm", "p1", "p2",
                                  "mode", "nch", "trunc_dist", "use_fh",
                                  "use_weights", "fix_overcount",
                                  "backend", "want_S", "const_sw"))
def mgm_solve_fused(u_p, v_p, w8, s_lo, s_hi, *, sides, L: int, ndir: int,
                    mgm: int, p1: float, p2: float, mode: str, nch: int,
                    trunc_dist: float, use_fh: bool, use_weights: bool,
                    fix_overcount: bool, backend: str = "fused",
                    want_S: bool = True, const_sw: bool = False,
                    lo_px=None, hi_px=None):
    """One MGM solve from preprocessed images, cost volume fused into
    the recursion.  Semantically identical to solver.mgm_solve on the
    equivalent dense volume (mgm_core.cc:408-613 of gfacciol/mgm), for
    constant per-side label windows.

    u_p, v_p: (H, W, Cch) preprocessed images (uint32 census codes for
      'census'); side n >= 1 (the LR check's right solve) swaps them.
      A leading batch axis — (K, H, W, Cch) — solves K independent
      pairs in ONE launch set (`sides` then has K*n_sides entries,
      pair-major): the kernels' plane axis carries any number of
      (pair, side, space) planes, so small problems (scene tiles,
      serving batches) amortise launch and pipeline overheads that
      dominate them individually.
    w8: (N, H, W, 8) edge weights when use_weights (N = len(sides),
      i.e. K*n_sides when batched).
    s_lo/s_hi: (N, H, W) int32 S/WTA label windows, or None when they
      equal the per-side constant windows of `sides` (saves the host
      from materialising them: remote-attached TPUs pay a round-trip
      per eager dispatch).
    sides: static tuple of (gmin, lo, hi) ints per side.
    want_S=False + const_sw=True (caller asserts s_lo/s_hi equal the
    per-side constant windows of `sides`, i.e. no TSGM_ITER tightening)
    enables the fused unskew+WTA assembly: the (N, H, W, L) volume is
    never materialised and S comes back as None.
    lo_px/hi_px: per-pixel (N, H, W) int32 recursion label windows
    (-m/-M images, mgm.cc:338-353); they replace the constant windows
    of `sides` in the in-flight costs (and restrict the FH min-conv
    like the dense path's fh_restrict).
    Returns (S, disp, cost) exactly as solver.mgm_solve.
    """
    H, W = u_p.shape[-3:-1]
    N = len(sides)
    tmax = trunc_dist * nch
    interpret = backend == "interpret"
    agg_backend = "interpret" if interpret else "pallas"

    ups = [u_p] if u_p.ndim == 3 else [u_p[k] for k in range(u_p.shape[0])]
    vps = [v_p] if v_p.ndim == 3 else [v_p[k] for k in range(v_p.shape[0])]
    assert N % len(ups) == 0
    npair = N // len(ups)  # sides per image pair (2 with the LR check)
    lefts, rights = [], []
    for uu, vv in zip(ups, vps):
        if mode in ("btad", "btsd"):
            uu = jnp.concatenate([uu, *_bt_aux(uu)], -1)
            vv = jnp.concatenate([vv, *_bt_aux(vv)], -1)
        lefts += [uu, vv][:npair]
        rights += [vv, uu][:npair]

    groups, leftover = split_passes(ndir, mgm)
    kappa = -float(ndir - 1) if fix_overcount else 0.0
    per_pixel = lo_px is not None
    # per-pixel FH window restriction mirrors aggregate()'s rule:
    # mgm=2 unweighted uses the boundary-fixed full-axis min-conv
    fh_restrict = (use_fh and per_pixel
                   and not (mgm == 2 and not use_weights))
    lohi_px = (lo_px, hi_px) if per_pixel else None

    force_dense_fold = fix_overcount and (
        os.environ.get("MGM_TPU_FOLD", "auto") == "dense")

    # want_S="taps": return the (N, H, 4, W) S taps for subpixel
    # refinement in the S slot — the fused WTA emits them directly, so
    # refining configs skip the materialised volume AND its gather
    want_taps = want_S == "taps"
    if (groups and not leftover and (not want_S or want_taps)
            and const_sw and not force_dense_fold):
        # fused unskew+WTA: skip the unskewed volume entirely
        group_outs = run_fused(
            groups, lefts, rights, w8, sides=sides, L=L, C=W,
            R=H, mgm=mgm, p1=p1, p2=p2, mode=mode, nch=nch,
            tmax=tmax, use_fh=use_fh, use_weights=use_weights,
            kappa=kappa, interpret=interpret, assemble=False)
        if pf.wta_vmem_bytes(group_outs, N) <= int(0.85 * pf.VMEM_LIMIT):
            res = pf.unskew_wta_planes(group_outs, W, H, sides,
                                       interpret, want_taps=want_taps)
            if want_taps:
                disp, cost, taps = res
                return taps, disp, cost
            disp, cost = res
            return None, disp, cost
        # geometry too large for the one-call WTA: materialised assembly
        lsum = assemble_groups(group_outs, N=N, C=W, R=H,
                               interpret=interpret)
        S, disp, cost = assemble_swta(lsum, s_lo, s_hi, sides=sides, L=L,
                                      ndir=ndir,
                                      fix_overcount=fix_overcount)
        if want_taps:
            gm = jnp.asarray([g for (g, lo, hi) in sides], jnp.int32)
            return taps_from_S(S, disp, gm), disp, cost
        return S, disp, cost

    # The WTA overcount fold S[o] += kappa*CC[o] (mgm_core.cc:596-599)
    # goes through the dense leftover volume when one exists: folding it
    # inside the fused kernel is correct on crops but miscompiles at
    # full-scale deep-lag geometry (mgm=4: Rp=512, L=151, lag depth 3
    # gave ~10% wrong disparities, cost errors ~5e2, while kappa=0 is
    # bit-exact — the extra in-kernel multiply-add is the trigger, so
    # it is only used when no dense volume is around to fold on).
    # MGM_TPU_FOLD=dense (trace-time) forces the dense fold even for
    # groups-only configs, materialising CC once just for the fold —
    # the escape hatch if another fused geometry trips the same bug.
    dense_fold = bool(leftover) or force_dense_fold

    def dense_cc():
        """Materialised per-side cost volumes, barriered like
        solver.mgm_solve (keeps the builder and the consumers from
        fusing into the wavefront scan).  The builder computes its own
        BT aux channels, so it gets the raw preprocessed pair, not the
        concatenated one."""
        raw_l = [a for uu, vv in zip(ups, vps) for a in [uu, vv][:npair]]
        raw_r = [a for uu, vv in zip(ups, vps) for a in [vv, uu][:npair]]
        ccs = []
        for n, (gmin, lo, hi) in enumerate(sides):
            if per_pixel:
                lo_a, hi_a = lo_px[n], hi_px[n]
            else:
                lo_a = jnp.full((H, W), lo, jnp.int32)
                hi_a = jnp.full((H, W), hi, jnp.int32)
            ccs.append(build_cost_volume(
                raw_l[n], raw_r[n], lo_a, hi_a, gmin, distance=mode, L=L,
                trunc_dist=trunc_dist, backend=agg_backend))
        return jax.lax.optimization_barrier(jnp.stack(ccs))

    lsum = None
    if groups:
        lsum = run_fused(
            groups, lefts, rights, w8, sides=sides, L=L, C=W,
            R=H, mgm=mgm, p1=p1, p2=p2, mode=mode, nch=nch,
            tmax=tmax, use_fh=use_fh, use_weights=use_weights,
            kappa=0.0 if dense_fold else kappa, interpret=interpret,
            lohi_px=lohi_px, fh_restrict=fh_restrict)

    if dense_fold and not leftover and fix_overcount:
        lsum = lsum + kappa * dense_cc()

    if leftover:
        cc = dense_cc()
        part = aggregate(cc, w8 if use_weights else None, lo_px, hi_px,
                         p1=p1, p2=p2, ndir=ndir, mgm=mgm, use_fh=use_fh,
                         use_weights=use_weights,
                         fh_restrict=use_fh and per_pixel,
                         backend=agg_backend, pids=tuple(leftover))
        part = jax.lax.optimization_barrier(part)
        if fix_overcount:
            part = part + kappa * cc
        lsum = part if lsum is None else lsum + part

    S, disp, cost = assemble_swta(lsum, s_lo, s_hi, sides=sides, L=L,
                                  ndir=ndir, fix_overcount=fix_overcount,
                                  lo_px=lo_px if per_pixel else None,
                                  hi_px=hi_px if per_pixel else None)
    if want_taps:
        gm = jnp.asarray([g for (g, lo, hi) in sides], jnp.int32)
        return taps_from_S(S, disp, gm), disp, cost
    return S, disp, cost


def assemble_swta(lsum, s_lo, s_hi, *, sides, L: int, ndir: int,
                  fix_overcount: bool, lo_px=None, hi_px=None):
    """S assembly + WTA from a (fold-included) aggregated volume sum
    (solver.py / mgm_core.cc:582-609); shared by the single-device
    fused solve and the sharded pipeline (parallel/fused_shard.py).
    Returns (S, disp, cost)."""
    l_idx = jnp.arange(L, dtype=jnp.int32)
    if lo_px is not None:
        in_cc = window_mask(lo_px, hi_px, L)       # (N, H, W, L)
    else:
        in_cc = jnp.stack([(l_idx >= lo) & (l_idx <= hi)
                           for (gmin, lo, hi) in sides])[:, None, None, :]
    if fix_overcount:
        # 0 - (NDIR-1)*INFINITY outside the CC window: -inf for ndir>1,
        # NaN (0*inf) for ndir==1, exactly as the dense solver computes
        outside = -INF if ndir > 1 else float("nan")
    else:
        outside = 0.0
    s_raw = jnp.where(in_cc, lsum, outside)
    in_s = in_cc if s_lo is None else window_mask(s_lo, s_hi, L)
    S = jnp.where(in_s, s_raw, INF)

    cand = jnp.where(jnp.isfinite(S), S, INF)
    idx = jnp.argmin(cand, axis=-1)
    cost = jnp.min(cand, axis=-1)
    gmins = jnp.asarray([g for (g, lo, hi) in sides], jnp.int32)
    disp = (gmins[:, None, None] + idx).astype(jnp.float32)
    return S, disp, cost
