"""Fused cost + wavefront Pallas TPU kernel (bidirectional, flip-free).

The round-1 pipeline materialised the (N, H, W, L) cost volume, skewed
it per pass group, ran the wavefront recursion, and unskewed — every
stage re-touching a volume whose label axis (e.g. L=151) pads to 256
lanes in the tiled HBM layout.  This kernel removes the volume from the
input path entirely, computes costs in-flight from skewed images, and
— unlike its round-1 predecessor — needs NO image flips at all:

  - **Cost on the fly**: in skewed-image space the (pixel, label)
    structure of the cost volume collapses to overlapping windows.  For
    a front t, image row r, the reference's cost c(p, p+(d,0))
    (mgm_costvolume.h:390-422 of gfacciol/mgm) needs u_sk[t, r] and
    v_sk[t + l, r] for l = 0..L-1 — a contiguous sublane slice of a
    skewed, phase-shifted right image.  A ring buffer DMAs only the G
    new columns of v per grid step.
  - **Two skew spaces x two scan directions** replace the round-1
    x/y image flips: space A stores pixel (r, c) at front t = c + s*r,
    space B at t = c + s*(Rp-1-r) (s = slope).  A dependency direction
    (dx, dy) has front offset dt = dx + s*dy in A and dx - s*dy in B;
    a pass is fusable iff all its coupled deps get dt < 0 (forward
    scan) or dt > 0 (backward scan = the same kernel with the grid
    index maps reversed) in some space.  The reference's antipodal
    pass pairs (0,1), (2,3), (4,6), (5,7) (mgm_core.cc:463-471) land
    in the same space with opposite directions, so the backward launch
    ACCUMULATES onto the forward launch's output planes via
    input_output_aliasing — rows, columns and labels all stay in
    image order, and the round-1 assembly flips/reversals vanish.
  - **(M, T, L, R) layout**: fronts T in an untiled dim (the grid walks
    it in blocks of G), labels in sublanes (L pads to a multiple of 8),
    rows in lanes (R pads to 128).  Label +-1 shifts are sublane rolls,
    row +-1 neighbours are lane rolls, the per-pixel Dvec minimum is a
    sublane reduction.

Semantics reproduced exactly (tests/test_fused.py vs the XLA path and
the oracle): truncation at trunc_dist*nch, out-of-image q -> tmax,
all-invalid window -> 0 (mgm_costvolume.h:396-421), +inf outside label
windows (dvec.cc:129), the 1-pixel no-aggregation border over the
pass's full 4-neighbour set (mgm_core.cc:538-541), per-direction
message order (mgm_core.cc:544-576) and the update_cost2 per-term /2
quirk (mgm_core.cc:83-84), and the WTA overcount fold
S[o] -= (NDIR-1)*CC[o] (mgm_core.cc:596-599) computed from the
in-flight CC of one designated plane per side.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")
VMEM_LIMIT = 100 * 1024 * 1024


def _sub_roll(x, off, fill):
    """Shift along the sublane (label) axis -2: out[l] = x[l - off]."""
    r = pltpu.roll(x, shift=off % x.shape[-2], axis=x.ndim - 2)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    L = x.shape[-2]
    if off > 0:
        return jnp.where(idx < off, fill, r)
    return jnp.where(idx >= L + off, fill, r)


def _lane_roll(x, s, fill):
    """Shift along the lane (row) axis -1 by s in {-1, +1}: row r reads
    row r - s (s=+1: row above; s=-1: row below); fill at the edge."""
    r = pltpu.roll(x, shift=s % x.shape[-1], axis=x.ndim - 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if s > 0:
        return jnp.where(idx < s, fill, r)
    return jnp.where(idx >= x.shape[-1] + s, fill, r)


def _sgm_msg(Lk, mk, p1w, p2w):
    """min(Lk[o], min(Lk[o-1],Lk[o+1])+P1w, minLk+P2w) - minLk
    (mgm_core.cc:74-76,113-116)."""
    vlp1 = jnp.minimum(_sub_roll(Lk, 1, INF), _sub_roll(Lk, -1, INF)) + p1w
    return jnp.minimum(jnp.minimum(Lk, vlp1), mk + p2w) - mk


def _fh_msg(Lk, mk, p1w, p2w):
    """Truncated-linear message by min-plus doubling over the label
    (sublane) axis (mgm_core.cc:152-163 in log2(L) vector steps)."""
    L = Lk.shape[-2]
    M = Lk
    s = 1
    while s < L:
        M = jnp.minimum(M, _sub_roll(M, s, INF) + p1w * float(s))
        s *= 2
    s = 1
    while s < L:
        M = jnp.minimum(M, _sub_roll(M, -s, INF) + p1w * float(s))
        s *= 2
    M = jnp.minimum(M, mk + p2w)
    return M - mk


def _unskew_kernel(x_ref, o_ref, *, C, slope, rpb, A0, is_b):
    """Unskew one (plane, row group, lane block): the sublane window of
    row r = rpb*k + j starts at shift s*r = 8k + s*j (space A) or
    s*(Rp-1-r) = A0 - 8k - s*j (space B; A0 = s*(Rp-1), static), so the
    residue mod 8 is static per j and the in-VMEM slice stays static."""
    k = pl.program_id(1)
    for j in range(rpb):
        if is_b:
            c0 = 8 * ((A0 - slope * j) // 8)
            base = pl.multiple_of(c0 - 8 * k, 8)
            res = (A0 - slope * j) % 8
        else:
            base = pl.multiple_of(8 * k, 8)
            res = slope * j
        buf = x_ref[0, j, pl.ds(base, C + 8), :]
        o_ref[0, j] = buf[res:res + C, :]


def _unskew_space(y, C: int, slope: int, is_b: bool, interpret):
    Mp, Rp, T, B = y.shape
    rpb = 8 // slope
    assert Rp % rpb == 0
    BL = min(B, 128)
    nbl = -(-B // BL)
    return pl.pallas_call(
        functools.partial(_unskew_kernel, C=C, slope=slope, rpb=rpb,
                          A0=slope * (Rp - 1), is_b=is_b),
        grid=(Mp, Rp // rpb, nbl),
        in_specs=[pl.BlockSpec((1, rpb, T, BL),
                               lambda i, k, b: (i, k, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rpb, C, BL),
                               lambda i, k, b: (i, k, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Rp, C, B), y.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(y)


def unskew_planes(y, C: int, R: int, slope: int, spaces,
                  interpret=False):
    """(Mp, Rp, T, B) -> (Mp, R, C, B): out[i, r, c] = y[i, r, t(r, c)]
    with t = c + slope*r (space A, tag 0) or c + slope*(Rp-1-r)
    (space B, tag 1).  Planes must be space-contiguous (A first)."""
    nA = sum(1 for s in spaces if s == 0)
    assert tuple(spaces) == (0,) * nA + (1,) * (len(spaces) - nA)
    parts = []
    if nA:
        parts.append(_unskew_space(y[:nA], C, slope, False, interpret))
    if nA < len(spaces):
        parts.append(_unskew_space(y[nA:], C, slope, True, interpret))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return out[:, :R]


def _wta_kernel(*refs, C, slope, rpb, RP, R2, L, TO, sides, have,
                want_taps=False):
    """Fused unskew + cross-space sum + WTA for one row group.

    Replaces unskew -> space-sum -> S-window -> argmin/min
    (mgm_core.cc:582-609) when the caller needs only disp/cost and the
    S/WTA label windows equal the per-side constant CC windows: the
    unskewed (N, H, W, L) volume is never materialised.  Inputs are
    row-group blocks of the (Mp, RP, L, Tp) relayouts of the launch
    outputs — labels stay in SUBLANES (L pads 151 -> 152, not the 256
    LANES of the round-3 layout: a 1.7x pure-padding traffic tax on
    the relayout write and this kernel's read), fronts in lanes.  Per
    row r the values of pixel (r, c) sit at front t = c + shift(r), a
    DYNAMIC LANE ROLL by -shift(r) (supported by Mosaic; dynamic lane
    *slices* are not).  Rolled slabs are summed across spaces
    ("A"/"B"/"V" consume one ref each; packed parity spaces "PA"/"PB"
    an (even, odd) front-parity ref pair whose rows are half-rows) and
    reduced over the label (sublane) axis.  Ties pick the lowest
    label, as jnp.argmin does; an all-invalid window yields idx 0 and
    +inf cost exactly like the dense path.  Outputs land directly in
    image layout (rows x column-lanes)."""
    n_in = sum(2 if sp in ("PA", "PB") else 1 for sp in have)
    in_refs = refs[:n_in]
    if want_taps:
        d_ref, c_ref, t_ref = refs[n_in:]
    else:
        d_ref, c_ref = refs[n_in:]
    k = pl.program_id(0)
    A0B = slope * (RP - 1)
    A0P = R2 - 1  # parity halves' (possibly 128-padded) half-row extent

    def space_slab(rs, n, j, sp):
        """The (L, TO) label x column slab of row rpb*k + j, lanes
        rolled so lane c holds pixel (row, c), cropped to the common
        output extent TO >= C.  No wraparound garbage can reach
        lanes < C: t = c + shift <= C - 1 + A0 < Tp."""
        if sp in ("PA", "PB"):
            parf = 1 if sp == "PB" else 0
            ref = rs[(j & 1) ^ parf]
            rho = (rpb // 2) * k + (j >> 1)
            shift = rho if sp == "PA" else A0P - rho
            y = ref[n, j >> 1]
        else:
            r = rpb * k + j
            shift = (slope * r if sp == "A"
                     else A0B - slope * r if sp == "B" else 0)
            y = rs[0][n, j]
        if sp == "V":
            return y[:, :TO]
        Tp = y.shape[-1]
        y = pltpu.roll(y, shift=jax.lax.rem(Tp - shift, Tp), axis=1)
        return y[:, :TO]

    lab = jax.lax.broadcasted_iota(jnp.int32, (L, TO), 0)
    for n, (gmin, lo, hi) in enumerate(sides):
        in_win = (lab >= lo) & (lab <= hi)
        for j in range(rpb):
            s = None
            i = 0
            for sp in have:
                nr = 2 if sp in ("PA", "PB") else 1
                sl = space_slab(in_refs[i:i + nr], n, j, sp)
                i += nr
                s = sl if s is None else s + sl
            cand = jnp.where(in_win & (s < INF) & (s > -INF), s, INF)
            cost = jnp.min(cand, axis=0, keepdims=True)        # (1, Tp)
            idx = jnp.min(jnp.where(cand == cost, lab, L), axis=0,
                          keepdims=True)
            d_ref[n, pl.ds(j, 1), :] = (gmin + idx).astype(jnp.float32)
            c_ref[n, pl.ds(j, 1), :] = cost
            if want_taps:
                # the 4 S taps S[oc-1 .. oc+2] the subpixel fits read
                # (mgm_refine.h:40-70): RAW window values — every tap a
                # refinement actually uses lies inside the label window
                # (subpixel_refine's `ok` gate), where S == s.  One-hot
                # sublane selects replace the dense path's
                # take_along_axis gather on a materialised S volume.
                oc = jnp.clip(idx, 1, max(L - 3, 1))
                for kk in range(4):
                    pos = jnp.clip(oc - 1 + kk, 0, L - 1)
                    tap = jnp.min(jnp.where(lab == pos, s, INF), axis=0,
                                  keepdims=True)
                    t_ref[n, pl.ds(j, 1), kk] = tap


def wta_vmem_bytes(group_outs, N: int) -> int:
    """Scoped-VMEM estimate for unskew_wta_planes' per-step blocks
    (mirrors its block derivation, x2 for pipeline double-buffering):
    each space ref holds a (N, rpb, L->8-mult sublanes, Tp_g->128-mult
    lanes) row-group block resident at once.  mgm_solve_fused falls
    back to the materialised assembly when this exceeds the budget
    (outsized scenes at mgm=4 skew Tp ~ C + 2R)."""
    has_p = any(s == -1 for _, s, _ in group_outs)
    rpb = 16 if has_p else 8

    def blk(T, L, rows):
        return N * rows * (-(-L // 8) * 8) * (-(-T // 128) * 128) * 4

    total = 0
    for y, slope_g, spaces_g in group_outs:
        if slope_g == -1:
            for _ in spaces_g:
                for half in y:
                    total += blk(half.shape[1], half.shape[2], rpb // 2)
        else:
            total += len(spaces_g) * blk(y.shape[1], y.shape[2], rpb)
    return 2 * total


def unskew_wta_planes(group_outs, C: int, R: int, sides,
                      interpret=False, want_taps=False):
    """Raw fused-launch outputs -> (disp, cost), each (N, R, C)
    float32, N = len(sides); want_taps additionally returns the
    (N, R, 4, C) S taps S[oc-1..oc+2] for subpixel refinement
    (ops/refine.subpixel_refine_taps), so refining configs skip the
    materialised S volume entirely.

    group_outs: [(y, slope_g, spaces_g), ...] as returned by
    run_fused(assemble=False): y is the NATIVE (Mp, Tp_g, L, RP) launch
    output for skewed/V groups and an (even, odd) pair of
    (Mp, Th_g, L, R2) for the packed parity group (slope_g = -1);
    within a group the plane order is space-contiguous, sides
    contiguous within a space.  Each is relayouted here to
    (Mp, RP, L, Tp) — labels in sublanes, fronts in lanes; XLA fuses
    the forward+backward-launch add into this copy."""
    N = len(sides)
    first = group_outs[0][0]
    y0 = first[0] if isinstance(first, tuple) else first
    L = y0.shape[2]
    slope = next((s for _, s, _ in group_outs if s > 0), 1)
    has_p = any(s == -1 for _, s, _ in group_outs)
    RP = next(y.shape[3] for y, s, _ in group_outs if s >= 0) \
        if any(s >= 0 for _, s, _ in group_outs) \
        else 2 * first[0].shape[3]
    # parity halves address rows in pairs; rpb is otherwise free (the
    # dynamic-roll unskew has no per-row alignment constraint)
    rpb = 16 if has_p else 8
    assert RP % rpb == 0
    R2 = next((y[0].shape[3] for y, s, _ in group_outs if s == -1),
              RP // 2)
    def relayout(y):
        """(Mp, T, L, R) -> (Mp, R, L, T): labels to sublanes, fronts
        to lanes — ONE pure transpose copy (run_fused keeps T a
        128-lane multiple precisely so the in-kernel dynamic lane
        rotate, which rejects unaligned LANE dims, needs no pad op;
        unaligned sublanes are fine)."""
        assert y.shape[1] % 128 == 0, "run_fused pads T to 128"
        return jnp.transpose(y, (0, 3, 2, 1))

    args, in_specs, have = [], [], []
    total_bytes = 0
    for y, slope_g, spaces_g in group_outs:
        if slope_g == -1:
            for si, sp in enumerate(spaces_g):
                for half in y:
                    yt = relayout(half)
                    total_bytes += yt.size * 4
                    args.append(yt)
                    in_specs.append(
                        pl.BlockSpec((N, rpb // 2, L, yt.shape[3]),
                                     functools.partial(
                                         lambda k, _si: (_si, k, 0, 0),
                                         _si=si),
                                     memory_space=pltpu.VMEM))
                have.append(sp)
            continue
        assert y.shape[3] == RP
        yt = relayout(y)                           # (Mp, RP, L, Tp)
        total_bytes += yt.size * 4
        for si, sp in enumerate(spaces_g):
            args.append(yt)
            in_specs.append(
                pl.BlockSpec((N, rpb, L, yt.shape[3]),
                             functools.partial(
                                 lambda k, _si: (_si, k, 0, 0),
                                 _si=si),
                             memory_space=pltpu.VMEM))
            have.append(sp if slope_g > 0 else "V")
    order = {"A": 0, "B": 1, "V": 2, "PA": 3, "PB": 4}
    nrefs = [2 if h in ("PA", "PB") else 1 for h in have]
    starts = [sum(nrefs[:i]) for i in range(len(have))]
    perm = sorted(range(len(have)), key=lambda i: order[have[i]])
    args = [args[starts[i] + d] for i in perm for d in range(nrefs[i])]
    in_specs = [in_specs[starts[i] + d] for i in perm
                for d in range(nrefs[i])]
    have = [have[i] for i in perm]
    Tp0 = min(a.shape[3] for a in args)  # disp/cost lane extent (>= C+8)
    out_specs = [pl.BlockSpec((N, rpb, Tp0), lambda k: (0, k, 0),
                              memory_space=pltpu.VMEM)] * 2
    out_shape = [jax.ShapeDtypeStruct((N, RP, Tp0), jnp.float32)] * 2
    if want_taps:
        out_specs.append(pl.BlockSpec((N, rpb, 4, Tp0),
                                      lambda k: (0, k, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N, RP, 4, Tp0),
                                              jnp.float32))
    res = pl.pallas_call(
        functools.partial(_wta_kernel, C=C, slope=slope, rpb=rpb,
                          RP=RP, R2=R2, L=L, TO=Tp0, sides=tuple(sides),
                          have=tuple(have), want_taps=want_taps),
        grid=(RP // rpb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=total_bytes,
            bytes_accessed=total_bytes,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    disp, cost = res[0][:, :R, :C], res[1][:, :R, :C]
    if want_taps:
        return disp, cost, res[2][:, :R, :, :C]
    return disp, cost


def _block_kernel(*refs, planes, mspecs, combos, C, R_eff, L, G, D, slope,
                  p1, p2, mgm, mode, nch, tmax, use_fh, use_weights, kappa,
                  reverse, accumulate, per_pixel, fh_restrict, ship_lane,
                  inject_lane, RPg, use_halo, parity=False):
    """One G-front block of the fused recursion on a device's LOCAL
    rows, with explicit carried state — the building block of the
    sharded pipeline (parallel/fused_shard.py): the surrounding
    lax.scan slices the blocks, ppermutes the shipped boundary rows,
    and staggers devices by one block so every cross-device dependency
    (lag <= D <= G fronts) is satisfied (SURVEY.md 2.9: "device k
    starts its block as soon as it receives the halo row of Lr
    L-vectors").

    Differences from the resident-grid `_kernel`: no ring buffer (the
    v window slab arrives pre-sliced), hist/mins are inputs AND
    outputs, lane rolls at the shard edge read the `halo` track
    (the neighbour's boundary-row messages, indexed by front), and the
    per-front boundary row is emitted for the next device.

    refs: scal (SMEM int32 [t0, r0]: global front/row offsets of this
      block — r0 is the global HALF-row of lane 0 for parity blocks),
      U_blk (Mp, Cch, G, Rl), v_slab (Mp, Cch, SLAB, Rl) (parity: an
      (even, odd) front-parity pair, each (Mp, Cch, SLAB, Rl) over
      HALF-fronts), [W_blk (Ml, ncombo, G, Rl)],
      [lo_blk, hi_blk (Mp, G, Rl)], hist_in (D, Ml, L, Rl),
      mins_in (D, Ml, Rl), halo_f (G+16, Ml, L) — the neighbour's
      boundary rows, front t at index t - t0 + 8 (their cached minima
      are recomputed here: min is order-independent, so the value is
      bitwise the sender's), [acc_blk (Mp, G, L, Rl); parity: an
      (even, odd) pair of (Mp, G//2, L, Rl)];
    outputs: out_blk (same shape rule as acc_blk), hist_out, mins_out,
      ship_f (G, Ml, L).

    Parity blocks use the PACKED layout of the resident `_kernel`:
    lane rho holds image row 2*(r0 + rho) + (pi ^ parf) at front
    parity pi = t & 1; combos are (lag, dy, parf) triples whose lane
    roll is derived per front (_delta_roll); labels step fronts by 2,
    so the v windows come from the two per-front-parity slabs.
    """
    it = iter(refs)
    scal = next(it)
    u_ref = next(it)
    if parity:
        v_slab_e, v_slab_o = next(it), next(it)
    else:
        v_slab = next(it)
    w_ref = next(it) if use_weights else None
    lo_ref = next(it) if per_pixel else None
    hi_ref = next(it) if per_pixel else None
    hist_in, mins_in = next(it), next(it)
    halo_f = next(it) if use_halo else None
    if accumulate:
        acc_refs = (next(it), next(it)) if parity else (next(it),)
    if parity:
        out_e, out_o, hist_out, mins_out, ship_f = it
        outs = (out_e, out_o)
    else:
        out_ref, hist_out, mins_out, ship_f = it

    t0 = scal[0]
    r0 = scal[1]
    Mp = u_ref.shape[0]
    Rl = u_ref.shape[-1]
    hist = [(hist_in[k], mins_in[k]) for k in range(D)]
    lab = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, Rl), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, Rl), 1)

    us = range(G - 1, -1, -1) if reverse else range(G)
    for u in us:
        t = t0 + u
        pi = u & 1  # front parity (t0 is even: G and the stagger are)
        u_t = u_ref[:, :, u, :]
        if parity:
            v_win = (v_slab_e, v_slab_o)[pi][:, :, (u >> 1):(u >> 1) + L, :]
            th = t0 // 2 + (u >> 1)
        else:
            v_win = v_slab[:, :, u:u + L, :]
        raw = _cost_front(u_t, v_win, mode, nch)
        cc, cols, rows_im, wins = [], [], [], []
        for i, (phase, lo, hi, A0, ssgn, fold, parf) in enumerate(planes):
            if parity:
                col = th - A0 + ssgn * (r0 + row)
                row_im = 2 * (r0 + row) + (pi ^ parf)
            else:
                col = t - A0 + ssgn * slope * (r0 + row)
                row_im = r0 + row          # global image rows
            e = jnp.minimum(raw[i], tmax)
            q = col + phase + lab
            e = jnp.where((q >= 0) & (q < C), e, tmax)
            if per_pixel:
                in_win = ((lab >= lo_ref[i, u, :][None, :])
                          & (lab <= hi_ref[i, u, :][None, :]))
            else:
                in_win = (lab >= lo) & (lab <= hi)
            fin = in_win & (e < INF)
            anyfin = jnp.max(fin.astype(jnp.float32), axis=0, keepdims=True)
            e = jnp.where(anyfin > 0, e, 0.0)
            ok = in_win & (col >= 0) & (col < C) & (row_im < R_eff)
            cc.append(jnp.where(ok, e, INF))
            cols.append(col)
            rows_im.append(row_im)
            wins.append(in_win)

        if fh_restrict:
            mask_all = jnp.stack([wins[pi_] for pi_, _, _ in mspecs])

        msgs = []
        for ci, combo in enumerate(combos):
            if parity:
                lag, dy, parf_c = combo
                roll = -_delta_roll(dy, pi ^ parf_c)
            else:
                lag, roll = combo
            f, mn = hist[lag - 1]
            if roll:
                f = _lane_roll(f, roll, INF)
                mn = _lane_roll(mn, roll, INF)
                if use_halo:
                    # the shard-edge lane reads the neighbour device's
                    # boundary row for front t -+ lag instead of INF
                    hidx = u + (lag if reverse else -lag) + 8
                    hrow = halo_f[hidx]                   # (Ml, L)
                    f = jnp.where(lane1[None] == inject_lane,
                                  hrow[:, :, None], f)
                    mn = jnp.where(lane1 == inject_lane,
                                   jnp.min(hrow, axis=-1)[:, None], mn)
            mk = mn[:, None, :]
            if use_weights:
                d = w_ref[:, ci, u, :][:, None, :]
                p1w, p2w = d * p1, d * p2
            else:
                p1w, p2w = p1, p2
            if use_fh:
                fm = jnp.where(mask_all, f, INF) if fh_restrict else f
                msgs.append(_fh_msg(fm, mk, p1w, p2w))
            else:
                msgs.append(_sgm_msg(f, mk, p1w, p2w))

        news = []
        sums = [None] * Mp
        for m, (plane_i, ranks, border) in enumerate(mspecs):
            if mgm == 2 and not use_weights and not use_fh:
                e = msgs[ranks[0]][m] * 0.5 + msgs[ranks[1]][m] * 0.5
            else:
                e = msgs[ranks[0]][m]
                for k in range(1, mgm):
                    e = e + msgs[ranks[k]][m]
                if mgm > 1:
                    e = e / float(mgm)
            need_l, need_r, need_t, need_b = border
            col = cols[plane_i]
            row_im = rows_im[plane_i]
            interior = (col >= (1 if need_l else 0)) & (col < C)
            if need_r:
                interior &= col <= C - 2
            if need_t:
                interior &= row_im >= 1
            if need_b:
                interior &= row_im <= R_eff - 2
            else:
                interior &= row_im < R_eff
            new_m = jnp.where(interior, cc[plane_i] + e, cc[plane_i])
            news.append(new_m)
            sums[plane_i] = (new_m if sums[plane_i] is None
                             else sums[plane_i] + new_m)
        for i, (phase, lo, hi, A0, ssgn, fold, parf) in enumerate(planes):
            o = sums[i] if sums[i] is not None else jnp.zeros_like(cc[i])
            if fold:
                o = o + kappa * cc[i]
            if parity:
                if accumulate:
                    o = acc_refs[pi][i, u >> 1] + o
                outs[pi][i, u >> 1] = o
            else:
                if accumulate:
                    o = acc_refs[0][i, u] + o
                out_ref[i, u] = o
        new = jnp.stack(news)
        new_min = jnp.min(new, axis=-2)
        ship_f[u] = new[:, :, ship_lane]
        hist = [(new, new_min)] + hist[:-1]

    for k in range(D):
        hist_out[k] = hist[k][0]
        mins_out[k] = hist[k][1]


def fused_block(scal, U_blk, v_slab, W_blk, lo_blk, hi_blk, hist, mins,
                halo_f, acc_blk, *, planes, mspecs, combos, C,
                R_eff, L, G, slope, p1, p2, mgm, mode, nch, tmax, use_fh,
                use_weights, kappa, reverse, per_pixel, fh_restrict,
                ship_lane, inject_lane, RPg, parity=False,
                interpret=False):
    """pallas_call wrapper for one sharded-pipeline block (grid-less).
    halo_f=None disables shard-edge injection entirely: lane rolls read
    the plain INF edge fill (the apron-band V/parity pipelines refresh
    neighbour state between blocks instead of injecting per front).
    Parity blocks pass v_slab and acc_blk as (even, odd) front-parity
    pairs and return the out block as such a pair.
    Returns (out_blk, hist', mins', ship_f)."""
    Mp, Cch, _, Rl = U_blk.shape
    D = max(c[0] for c in combos)
    Ml = len(mspecs)
    use_halo = halo_f is not None
    kernel = functools.partial(
        _block_kernel, planes=tuple(planes), mspecs=tuple(mspecs),
        combos=tuple(combos), C=C, R_eff=R_eff, L=L, G=G, D=D, slope=slope,
        p1=float(p1), p2=float(p2), mgm=mgm, mode=mode, nch=nch,
        tmax=float(tmax), use_fh=use_fh, use_weights=use_weights,
        kappa=float(kappa), reverse=reverse, accumulate=acc_blk is not None,
        per_pixel=per_pixel, fh_restrict=fh_restrict, ship_lane=ship_lane,
        inject_lane=inject_lane, RPg=RPg, use_halo=use_halo, parity=parity)
    args = [scal, U_blk]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if parity:
        args += [v_slab[0], v_slab[1]]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    else:
        args.append(v_slab)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if use_weights:
        args.append(W_blk)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if per_pixel:
        args += [lo_blk, hi_blk]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    args += [hist, mins]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    if use_halo:
        args.append(halo_f)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    aliases = {}
    if acc_blk is not None:
        if parity:
            aliases = {len(args): 0, len(args) + 1: 1}
            args += [acc_blk[0], acc_blk[1]]
            in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        else:
            aliases = {len(args): 0}
            args.append(acc_blk)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out_blocks = ([jax.ShapeDtypeStruct((Mp, G // 2, L, Rl), jnp.float32)]
                  * 2 if parity
                  else [jax.ShapeDtypeStruct((Mp, G, L, Rl), jnp.float32)])
    out_shape = out_blocks + [
        jax.ShapeDtypeStruct(hist.shape, jnp.float32),
        jax.ShapeDtypeStruct(mins.shape, jnp.float32),
        jax.ShapeDtypeStruct((G, Ml, L), jnp.float32),
    ]
    res = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    if parity:
        return (res[0], res[1]), res[2], res[3], res[4]
    return res


def _u1(u_t, c):
    """(Mp, Cch, R) -> (Mp, 1, R) channel slice.  Plain slicing: a mixed
    int+newaxis index lowers to an (unsupported >2D) Mosaic gather."""
    return u_t[:, c:c + 1, :]


def _cost_front(u_t, v_win, mode, nch):
    """(Mp, Cch, R) left values + (Mp, Cch, L, R) right windows ->
    (Mp, L, R) raw costs (mgm_costvolume.h:19-133)."""
    acc = None
    if mode in ("ad", "sd"):
        for c in range(nch):
            d = jnp.abs(_u1(u_t, c) - v_win[:, c])
            if mode == "sd":
                d = d * d
            acc = d if acc is None else acc + d
    elif mode == "census":
        for c in range(nch):
            x = _u1(u_t, c) ^ v_win[:, c]
            p = jax.lax.population_count(x)
            acc = p if acc is None else acc + p
        acc = acc.astype(jnp.int32).astype(jnp.float32) * (1.0 / nch)
    elif mode in ("btad", "btsd"):
        # channel blocks [I, Imin, Imax] per side (mgm_costvolume.h:82-110)
        for c in range(nch):
            IL = _u1(u_t, c)
            umin = _u1(u_t, nch + c)
            umax = _u1(u_t, 2 * nch + c)
            IR = v_win[:, c]
            vmin = v_win[:, nch + c]
            vmax = v_win[:, 2 * nch + c]
            dLR = jnp.maximum(0.0, jnp.maximum(IL - vmax, vmin - IL))
            dRL = jnp.maximum(0.0, jnp.maximum(IR - umax, umin - IR))
            bt = jnp.abs(jnp.minimum(dLR, dRL))
            if mode == "btsd":
                bt = bt * bt
            acc = bt if acc is None else acc + bt
    else:
        raise ValueError(mode)
    return acc


def _delta_roll(dy: int, par: int) -> int:
    """Packed-parity lane roll for a dep with row offset `dy` consumed
    at a front whose live row parity is `par`: lane rho holds row
    2*rho + par, the dep's front has parity par ^ (dy & 1), and the
    half-row index shift follows.  dy == 0 keeps the lane."""
    if dy == 0:
        return 0
    return (dy - 1 + 2 * par) // 2


def _kernel(*refs, planes, mspecs, combos, C, R_eff, L, G, D, SLAB, slope,
            p1, p2, mgm, mode, nch, tmax, use_fh, use_weights, kappa,
            reverse, accumulate, NB, per_pixel=False, fh_restrict=False,
            parity=False):
    """One grid step = G consecutive wavefronts for every pass x side in
    the launch.

    planes: per-plane static tuples (phase, lo, hi, A0, ssgn, fold,
      parf) where the canonical column of (front t, row r) is
      col = t - A0 + ssgn*slope*r (A: A0=0, ssgn=-1; B: A0=slope*(Rp-1),
      ssgn=+1), [lo, hi] the label window, phase = gmin of the side, and
      fold marks the plane that accumulates kappa * CC.
      PARITY launches (spaces PA/PB, the slope-1/2 wavefronts t = 2c+r /
      t = 2c+(R-1-r) that schedule the mgm=4 passes 2/3/5/7,
      mgm_core.cc:463-471) use a PACKED layout: lane rho holds image row
      2*rho + par with par = (t&1) ^ parf (PA parf=0, PB parf=1), every
      cell is live, and col = t//2 - A0 + ssgn*rho (A0: PA 0,
      PB R2-1).  Labels step the front by 2, so the v windows live in
      two per-front-parity rings fed from half-row skews.
    mspecs: per-recursion static tuples (plane, ranks, border) with
      ranks = per-coupled-dir indices into `combos` and border =
      (need_left, need_right, need_top, need_bottom) over the pass's
      full 4-neighbour set (mgm_core.cc:538-541).
    combos: distinct (front lag, lane roll) pairs used by this launch;
      parity launches use (front lag, dy, parf) triples — the lane roll
      depends on the front parity and is derived per front.
    reverse: walk fronts from high t to low (backward scan).
    accumulate: an aliased input carries the forward launch's output;
      this launch adds onto it.
    """
    it = iter(refs)
    u_ref = next(it)
    if parity:
        v_hbm_e, v_hbm_o = next(it), next(it)
    else:
        v_hbm = next(it)
    w_ref = next(it) if use_weights else None
    lo_ref = next(it) if per_pixel else None
    hi_ref = next(it) if per_pixel else None
    if accumulate:
        acc_refs = (next(it), next(it)) if parity else (next(it),)
    if parity:
        out_e, out_o, ring_e, ring_o, hist_ref, mins_ref, \
            sem0, sem1, sem2, sem3 = it
    else:
        out_ref, ring_ref, hist_ref, mins_ref, sem0, sem1 = it

    Mp = u_ref.shape[0]
    Ml = len(mspecs)
    step = pl.program_id(0)
    blk = NB - 1 - step if reverse else step
    t0 = blk * G

    # ---- v ring buffer: the cost windows of consecutive fronts -------
    # overlap by all but G columns, so each step DMAs only the G NEW
    # columns (instead of re-fetching the whole (G+L)-wide window, a
    # ~SLAB/G x traffic blowup).  The ring is double-written (slot q
    # also lives at q+SLAB) so every L-wide window is contiguous.
    # Column x lives at slot (x - DELTA) mod SLAB, DELTA chosen so the
    # first step's window starts at slot 0 (forward: DELTA = 0;
    # reverse: first t0 = Tp - G need not be a multiple of SLAB).
    # Parity launches keep TWO rings (front-parity even/odd), each
    # advancing G/2 half-slots per step.
    GH = G // 2
    DELTA = 0 if not reverse else ((NB - 1) * (GH if parity else G)) % SLAB

    def slot(x):
        return pl.multiple_of(jax.lax.rem(x - DELTA + SLAB, SLAB), 8)

    if parity:
        th0 = blk * GH
        base = slot(th0)
        rings = ((ring_e, v_hbm_e, sem0, sem1), (ring_o, v_hbm_o, sem2,
                                                 sem3))

        @pl.when(step == 0)
        def _init():
            for ring, v_hbm_p, s0, s1 in rings:
                cp0 = pltpu.make_async_copy(
                    v_hbm_p.at[:, :, pl.ds(th0, SLAB), :],
                    ring.at[:, :, pl.ds(0, SLAB), :], s0)
                cp1 = pltpu.make_async_copy(
                    v_hbm_p.at[:, :, pl.ds(th0, SLAB), :],
                    ring.at[:, :, pl.ds(SLAB, SLAB), :], s1)
                cp0.start(); cp1.start(); cp0.wait(); cp1.wait()

        @pl.when(step != 0)
        def _advance():
            if reverse:
                src = pl.ds(pl.multiple_of(th0, 8), GH)
                wq = slot(th0)
            else:
                src = pl.ds(pl.multiple_of(th0 + SLAB - GH, 8), GH)
                wq = slot(th0 + SLAB - GH)
            for ring, v_hbm_p, s0, s1 in rings:
                cp0 = pltpu.make_async_copy(
                    v_hbm_p.at[:, :, src, :], ring.at[:, :, pl.ds(wq, GH), :],
                    s0)
                cp1 = pltpu.make_async_copy(
                    v_hbm_p.at[:, :, src, :],
                    ring.at[:, :, pl.ds(wq + SLAB, GH), :], s1)
                cp0.start(); cp1.start(); cp0.wait(); cp1.wait()

        v_steps = (ring_e[:, :, pl.ds(base, GH + L - 1), :],
                   ring_o[:, :, pl.ds(base, GH + L - 1), :])
    else:
        base = slot(t0)

        @pl.when(step == 0)
        def _init():
            cp0 = pltpu.make_async_copy(
                v_hbm.at[:, :, pl.ds(t0, SLAB), :],
                ring_ref.at[:, :, pl.ds(0, SLAB), :], sem0)
            cp1 = pltpu.make_async_copy(
                v_hbm.at[:, :, pl.ds(t0, SLAB), :],
                ring_ref.at[:, :, pl.ds(SLAB, SLAB), :], sem1)
            cp0.start(); cp1.start(); cp0.wait(); cp1.wait()

        @pl.when(step != 0)
        def _advance():
            if reverse:
                src = pl.ds(pl.multiple_of(t0, 8), G)  # new LOW columns
                wq = slot(t0)
            else:
                src = pl.ds(pl.multiple_of(t0 + SLAB - G, 8), G)
                wq = slot(t0 + SLAB - G)
            cp0 = pltpu.make_async_copy(
                v_hbm.at[:, :, src, :], ring_ref.at[:, :, pl.ds(wq, G), :],
                sem0)
            cp1 = pltpu.make_async_copy(
                v_hbm.at[:, :, src, :],
                ring_ref.at[:, :, pl.ds(wq + SLAB, G), :], sem1)
            cp0.start(); cp1.start(); cp0.wait(); cp1.wait()

        # one aligned load per step; per-front windows are static slices
        v_step = ring_ref[:, :, pl.ds(base, G + L - 1), :]

    hist = [(hist_ref[k], mins_ref[k]) for k in range(D)]
    Rp = u_ref.shape[-1]
    lab = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, Rp), 1)

    us = range(G - 1, -1, -1) if reverse else range(G)
    for u in us:
        t = t0 + u
        pi = u & 1  # front parity (t0 = blk*G is even: G is even)
        # ---- fused cost volume front, one per plane -----------------
        u_t = u_ref[:, :, u, :]                    # (Mp, Cch, R)
        if parity:
            v_win = v_steps[pi][:, :, (u >> 1):(u >> 1) + L, :]
            th = t0 // 2 + (u >> 1)
        else:
            v_win = v_step[:, :, u:u + L, :]       # (Mp, Cch, L, R)
        raw = _cost_front(u_t, v_win, mode, nch)
        cc = []
        cols = []
        rows_im = []
        wins = []
        for i, (phase, lo, hi, A0, ssgn, fold, parf) in enumerate(planes):
            if parity:
                col = th - A0 + ssgn * row         # packed: row = rho
                row_im = 2 * row + (pi ^ parf)     # image row of lane
            else:
                col = t - A0 + ssgn * slope * row  # image column (L, R)
                row_im = row
            e = jnp.minimum(raw[i], tmax)
            q = col + phase + lab                  # right-image column
            e = jnp.where((q >= 0) & (q < C), e, tmax)
            if per_pixel:
                in_win = ((lab >= lo_ref[i, u, :][None, :])
                          & (lab <= hi_ref[i, u, :][None, :]))
            else:
                in_win = (lab >= lo) & (lab <= hi)
            # all-invalid window -> 0 (mgm_costvolume.h:410-421)
            fin = in_win & (e < INF)
            anyfin = jnp.max(fin.astype(jnp.float32), axis=0, keepdims=True)
            e = jnp.where(anyfin > 0, e, 0.0)
            # outside the label window / image / padded lanes -> +inf
            ok = in_win & (col >= 0) & (col < C) & (row_im < R_eff)
            cc.append(jnp.where(ok, e, INF))
            cols.append(col)
            rows_im.append(row_im)
            wins.append(in_win)

        if fh_restrict:
            # per-target-pixel window restriction of the FH min-conv
            # input (update_costW_trunclinear, mgm_core.cc:229-281):
            # the mask is the TARGET's window, identical across a
            # recursion's messages, so it batches over Ml like the rest
            mask_all = jnp.stack([wins[pi] for pi, _, _ in mspecs])

        # ---- messages per combo, batched over Ml --------------------
        msgs = []
        for ci, combo in enumerate(combos):
            if parity:
                lag, dy, parf_c = combo
                roll = -_delta_roll(dy, pi ^ parf_c)
            else:
                lag, roll = combo
            f, mn = hist[lag - 1]
            if roll:
                f = _lane_roll(f, roll, INF)
                mn = _lane_roll(mn, roll, INF)
            mk = mn[:, None, :]                    # (Ml, 1, R)
            if use_weights:
                d = w_ref[:, ci, u, :][:, None, :]
                p1w, p2w = d * p1, d * p2
            else:
                p1w, p2w = p1, p2
            if use_fh:
                fm = jnp.where(mask_all, f, INF) if fh_restrict else f
                msgs.append(_fh_msg(fm, mk, p1w, p2w))
            else:
                msgs.append(_sgm_msg(f, mk, p1w, p2w))

        # ---- per-recursion dir-order combine + border rule ----------
        news = []
        sums = [None] * Mp
        for m, (plane_i, ranks, border) in enumerate(mspecs):
            if mgm == 2 and not use_weights and not use_fh:
                # update_cost2 halves each term (mgm_core.cc:83-84)
                e = msgs[ranks[0]][m] * 0.5 + msgs[ranks[1]][m] * 0.5
            else:
                e = msgs[ranks[0]][m]
                for k in range(1, mgm):
                    e = e + msgs[ranks[k]][m]
                if mgm > 1:
                    e = e / float(mgm)
            need_l, need_r, need_t, need_b = border
            col = cols[plane_i]
            row_im = rows_im[plane_i]
            interior = (col >= (1 if need_l else 0)) & (col < C)
            if need_r:
                interior &= col <= C - 2
            if need_t:
                interior &= row_im >= 1
            if need_b:
                interior &= row_im <= R_eff - 2
            else:
                interior &= row_im < R_eff
            new_m = jnp.where(interior, cc[plane_i] + e, cc[plane_i])
            news.append(new_m)
            sums[plane_i] = (new_m if sums[plane_i] is None
                             else sums[plane_i] + new_m)
        for i, (phase, lo, hi, A0, ssgn, fold, parf) in enumerate(planes):
            o = sums[i] if sums[i] is not None else jnp.zeros_like(cc[i])
            if fold:
                o = o + kappa * cc[i]
            if parity:
                if accumulate:
                    o = acc_refs[pi][i, u >> 1] + o
                (out_e, out_o)[pi][i, u >> 1] = o
            else:
                if accumulate:
                    o = acc_refs[0][i, u] + o
                out_ref[i, u] = o
        new = jnp.stack(news)
        hist = [(new, jnp.min(new, axis=-2))] + hist[:-1]

    for k in range(D):
        hist_ref[k] = hist[k][0]
        mins_ref[k] = hist[k][1]


def fused_wavefront(U, V, W_sk, acc, *, planes, mspecs, combos, C, R_eff,
                    L, G, slope, mgm, mode, nch, tmax, p1, p2, use_fh,
                    use_weights, kappa, reverse, lohi=None,
                    fh_restrict=False, parity=False, interpret=False):
    """Run one scan direction of the fused recursion.

    U: (Mp, Cch, Tp, Rp) skewed left images (Tp a multiple of G), one
      per (side, space) plane.  Parity launches use the PACKED layout:
      lanes are half-rows (Rp = R2) and fronts interleave row parities.
    V: (Mp, Cch, Tp + SLAB, Rp) skewed phase-shifted right images (HBM);
      parity launches pass a PAIR (V_even, V_odd) of half-front skews,
      each (Mp, Cch, Tp//2 + SLAB, R2).
    W_sk: (Ml, n_combo, Tp, Rp) per-combo weights or None.
    acc: forward-launch output to accumulate onto (aliased, donated),
      or None: (Mp, Tp, L, Rp), parity: a pair of
      (Mp, Tp//2, L, R2).
    lohi: (LO, HI) skewed (Mp, Tp, Rp) int32 per-pixel label windows, or
      None for the constant per-plane windows of `planes`.
    fh_restrict: restrict the FH min-conv input to the target pixel's
      window (needs lohi).
    Returns the (Mp, Tp, L, Rp) accumulated volumes; parity: the
    (even, odd) pair of (Mp, Tp//2, L, R2) front-parity halves.
    """
    Mp, Cch, Tp, Rp = U.shape
    assert Tp % G == 0
    NB = Tp // G
    D = max(c[0] for c in combos)
    if parity:
        assert G % 2 == 0 and (G // 2) % 8 == 0, "parity needs G mult of 16"
        GH = G // 2
        SLAB = -(-(GH + L - 1) // 8) * 8
        assert V[0].shape[2] >= Tp // 2 + SLAB - GH
    else:
        SLAB = -(-(G + L - 1) // 8) * 8
        assert V.shape[2] >= Tp + SLAB - G

    kernel = functools.partial(
        _kernel, planes=tuple(planes), mspecs=tuple(mspecs),
        combos=tuple(combos), C=C, R_eff=R_eff, L=L, G=G, D=D, SLAB=SLAB,
        slope=slope, p1=float(p1), p2=float(p2), mgm=mgm, mode=mode,
        nch=nch, tmax=float(tmax), use_fh=use_fh, use_weights=use_weights,
        kappa=float(kappa), reverse=reverse, accumulate=acc is not None,
        NB=NB, per_pixel=lohi is not None,
        fh_restrict=fh_restrict and lohi is not None, parity=parity)

    Ml = len(mspecs)
    blk = ((lambda s: (0, NB - 1 - s, 0, 0)) if reverse
           else (lambda s: (0, s, 0, 0)))
    blk3 = ((lambda s: (0, 0, NB - 1 - s, 0)) if reverse
            else (lambda s: (0, 0, s, 0)))
    blk2 = ((lambda s: (0, NB - 1 - s, 0)) if reverse
            else (lambda s: (0, s, 0)))
    if parity:
        args = [U, V[0], V[1]]
        in_specs = [
            pl.BlockSpec((Mp, Cch, G, Rp), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        vdtype = V[0].dtype
    else:
        args = [U, V]
        in_specs = [
            pl.BlockSpec((Mp, Cch, G, Rp), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        vdtype = V.dtype
    aliases = {}
    if use_weights:
        args.append(W_sk)
        in_specs.append(pl.BlockSpec((Ml, W_sk.shape[1], G, Rp), blk3,
                                     memory_space=pltpu.VMEM))
    if lohi is not None:
        for a in lohi:
            args.append(a)
            in_specs.append(pl.BlockSpec((Mp, G, Rp), blk2,
                                         memory_space=pltpu.VMEM))
    if parity:
        GH = G // 2
        if acc is not None:
            aliases = {len(args): 0, len(args) + 1: 1}
            args.extend(acc)
            in_specs.extend([pl.BlockSpec((Mp, GH, L, Rp), blk,
                                          memory_space=pltpu.VMEM)] * 2)
        out_specs = [pl.BlockSpec((Mp, GH, L, Rp), blk,
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [jax.ShapeDtypeStruct((Mp, Tp // 2, L, Rp),
                                          jnp.float32)] * 2
        ring_shapes = [pltpu.VMEM((Mp, Cch, 2 * SLAB, Rp), vdtype)] * 2
        sems = [pltpu.SemaphoreType.DMA] * 4
    else:
        if acc is not None:
            aliases = {len(args): 0}
            args.append(acc)
            in_specs.append(pl.BlockSpec((Mp, G, L, Rp), blk,
                                         memory_space=pltpu.VMEM))
        out_specs = pl.BlockSpec((Mp, G, L, Rp), blk,
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Mp, Tp, L, Rp), jnp.float32)
        ring_shapes = [pltpu.VMEM((Mp, Cch, 2 * SLAB, Rp), vdtype)]
        sems = [pltpu.SemaphoreType.DMA] * 2
    return pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=ring_shapes + [
            pltpu.VMEM((D, Ml, L, Rp), jnp.float32),
            pltpu.VMEM((D, Ml, Rp), jnp.float32),
        ] + sems,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=Tp * Ml * L * Rp * (30 if not use_fh
                                      else 30 + 8 * L.bit_length()),
            bytes_accessed=(Mp * Tp * L * Rp * (2 if acc is not None else 1)
                            + Mp * Cch * Tp * Rp * 2) * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)
