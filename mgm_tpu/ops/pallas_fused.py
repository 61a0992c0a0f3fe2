"""Fused cost + wavefront Pallas TPU kernel.

The round-1 pipeline materialised the (N, H, W, L) cost volume, skewed
it per pass group, ran the wavefront recursion, and unskewed — every
stage re-touching a volume whose label axis (e.g. L=151) pads to 256
lanes in the tiled HBM layout.  This kernel removes the volume from the
input path entirely and fixes the layout:

  - **Cost on the fly**: in skewed-image space the (pixel, label)
    structure of the cost volume collapses to overlapping windows.  For
    a front t, pixel row r, the reference's cost c(p, p+(d,0))
    (mgm_costvolume.h:390-422 of gfacciol/mgm) needs u_sk[t, r] and
    v_sk[t + l, r] for l = 0..L-1 — a contiguous sublane slice of a
    skewed, phase-shifted right image.  The kernel DMAs one (G+L)-deep
    slab of v per grid step and computes the costs of G fronts in VMEM;
    the only full-volume HBM traffic of the whole recursion is the
    single aggregated output write.
  - **(M, T, L, R) layout**: fronts T in an untiled dim (the grid walks
    it in blocks of G), labels in sublanes (L pads to a multiple of 8),
    rows in lanes (R pads to 128).  Label +-1 shifts are sublane rolls,
    the row-above neighbour is a lane shift, the per-pixel Dvec minimum
    is a sublane reduction.
  - **Flip-only canonicalisation** (ops/fused.py FUSED_TABLE): passes
    whose causal neighbours map into {W, N, NW, NE} under x/y flips
    alone keep the disparity displacement on the canonical column axis,
    so one kernel batches every such pass x problem as the M dim.
    Flip_x passes store labels reversed (the window slice must ascend);
    the assembly unreverses them.

Semantics reproduced exactly (tests/test_fused.py vs the XLA path and
the oracle): truncation at trunc_dist*nch, out-of-image q -> tmax,
all-invalid window -> 0 (mgm_costvolume.h:396-421), +inf outside label
windows (dvec.cc:129), the 1-pixel no-aggregation border over the
pass's full 4-neighbour set (mgm_core.cc:538-541), per-direction
message order (mgm_core.cc:544-576) and the update_cost2 per-term /2
quirk (mgm_core.cc:83-84), and the WTA overcount fold
S[o] -= (NDIR-1)*CC[o] (mgm_core.cc:596-599) computed from the
in-flight CC of a designated pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")
VMEM_LIMIT = 100 * 1024 * 1024

# canonical offset id -> (front lag, needs row-above shift), per slope;
# same certificate as ops/pallas_wavefront.py (W=0, N=1, NW=2, NE=3)
OFF_LAG = {
    2: {0: (1, False), 1: (2, True), 2: (3, True), 3: (1, True)},
    1: {0: (1, False), 1: (1, True), 2: (2, True)},
}


def _sub_roll(x, off, fill):
    """Shift along the sublane (label) axis -2: out[l] = x[l - off]."""
    r = pltpu.roll(x, shift=off % x.shape[-2], axis=x.ndim - 2)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    L = x.shape[-2]
    if off > 0:
        return jnp.where(idx < off, fill, r)
    return jnp.where(idx >= L + off, fill, r)


def _row_above(x, fill):
    """Lane shift: row r reads row r-1; row 0 = fill."""
    r = pltpu.roll(x, shift=1, axis=x.ndim - 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(idx == 0, fill, r)


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


def _unskew_kernel(x_ref, o_ref, *, C, slope, rpb):
    k = pl.program_id(1)
    base = pl.multiple_of(8 * k, 8)
    for j in range(rpb):
        # row r = k*rpb + j has shift slope*r = 8k + slope*j: dynamic
        # sublane base 8k + a static residual slice (see
        # ops/pallas_wavefront.py's unskew for the rationale)
        buf = x_ref[:, j, pl.ds(base, C + 8), :]
        o_ref[:, j] = buf[:, slope * j:slope * j + C, :]


def unskew_rows(y, C: int, R: int, slope: int = 2, interpret=False):
    """(M, Rp, T, B) -> (M, R, C, B): out[m, r, c] = y[m, r, slope*r+c].
    Grid over (M, row groups) keeps the VMEM block size independent of
    the pass-batch width M."""
    M, Rp, T, B = y.shape
    rpb = 8 // slope
    assert Rp % rpb == 0
    out = pl.pallas_call(
        functools.partial(_unskew_kernel, C=C, slope=slope, rpb=rpb),
        grid=(M, Rp // rpb),
        in_specs=[pl.BlockSpec((1, rpb, T, B), lambda m, k: (m, k, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rpb, C, B), lambda m, k: (m, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Rp, C, B), y.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(y)
    return out[:, :R]


def _u1(u_t, c):
    """(M, Cch, R) -> (M, 1, R) channel slice.  Plain slicing: a mixed
    int+newaxis index lowers to an (unsupported >2D) Mosaic gather."""
    return u_t[:, c:c + 1, :]


def _cost_front(u_t, v_win, mode, nch):
    """(M, Cch, R) left values + (M, Cch, L, R) right windows ->
    (M, L, R) raw costs (mgm_costvolume.h:19-133)."""
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


def _kernel(*refs, specs, C, R_eff, L, G, D, SLAB, slope, p1, p2, mgm,
            offs, mode, nch, tmax, use_fh, use_weights, kappa):
    """One grid step = G consecutive wavefronts for every pass x problem
    in the group.

    specs: per-m static tuples (phase, lo, hi, border, d2o, fold) where
      phase shifts the v window (label order pre-reversed for flip_x
      passes), [lo, hi] is the storage-order label window, border =
      (need_left, need_right, need_top, need_bottom) from the pass's
      full 4-neighbour set, d2o maps dir rank -> canonical offset, and
      fold marks the pass whose output accumulates kappa * CC.
    """
    it = iter(refs)
    u_ref = next(it)
    v_hbm = next(it)
    w_ref = next(it) if use_weights else None
    out_ref, ring_ref, hist_ref, mins_ref, sem0, sem1 = it

    M = u_ref.shape[0]
    step = pl.program_id(0)
    t0 = step * G

    # ---- v ring buffer: the cost windows of consecutive fronts -------
    # overlap by all but G columns, so each step DMAs only the G NEW
    # columns (instead of re-fetching the whole (G+L)-wide window, a
    # ~SLAB/G x traffic blowup).  The ring is double-written (slot s
    # also lives at s+SLAB) so every L-wide window is contiguous.
    base = pl.multiple_of(jax.lax.rem(t0, SLAB), 8)

    @pl.when(step == 0)
    def _init():
        cp0 = pltpu.make_async_copy(
            v_hbm.at[:, :, pl.ds(0, SLAB), :],
            ring_ref.at[:, :, pl.ds(0, SLAB), :], sem0)
        cp1 = pltpu.make_async_copy(
            v_hbm.at[:, :, pl.ds(0, SLAB), :],
            ring_ref.at[:, :, pl.ds(SLAB, SLAB), :], sem1)
        cp0.start(); cp1.start(); cp0.wait(); cp1.wait()

    @pl.when(step != 0)
    def _advance():
        src = pl.ds(pl.multiple_of(t0 + SLAB - G, 8), G)
        wq = pl.multiple_of(jax.lax.rem(t0 - G, SLAB), 8)
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

    for u in range(G):
        t = t0 + u
        # ---- fused cost volume front (M, L, R) ----------------------
        u_t = u_ref[:, :, u, :]                    # (M, Cch, R)
        v_win = v_step[:, :, u:u + L, :]           # (M, Cch, L, R)
        raw = _cost_front(u_t, v_win, mode, nch)
        col = t - slope * row                      # canonical column (L, R)
        cc_parts = []
        for m, (phase, lo, hi, border, d2o, fold) in enumerate(specs):
            e = jnp.minimum(raw[m], tmax)
            q = col + phase + lab                  # right-image column (L, R)
            e = jnp.where((q >= 0) & (q < C), e, tmax)
            in_win = (lab >= lo) & (lab <= hi)
            # all-invalid window -> 0 (mgm_costvolume.h:410-421)
            fin = in_win & (e < INF)
            anyfin = jnp.max(fin.astype(jnp.float32), axis=0, keepdims=True)
            e = jnp.where(anyfin > 0, e, 0.0)
            # outside the label window / image / padded lanes -> +inf
            ok = in_win & (col >= 0) & (col < C) & (row < R_eff)
            cc_parts.append(jnp.where(ok, e, INF))
        cc_t = jnp.stack(cc_parts)                 # (M, L, R)

        # ---- directional messages per canonical offset --------------
        msgs = {}
        for j, off in enumerate(offs):
            lag, shift = OFF_LAG[slope][off]
            f, mn = hist[lag - 1]
            if shift:
                f, mn = _row_above(f, INF), _row_above(mn, INF)
            mk = mn[:, None, :]                    # (M, 1, R)
            if use_weights:
                d = w_ref[:, j, u, :][:, None, :]  # (M, 1, R)
                p1w, p2w = d * p1, d * p2
            else:
                p1w, p2w = p1, p2
            if use_fh:
                msgs[off] = _fh_msg(f, mk, p1w, p2w)
            else:
                msgs[off] = _sgm_msg(f, mk, p1w, p2w)

        # ---- per-pass dir-order combine + border rule ----------------
        new_parts = []
        out_parts = []
        for m, (phase, lo, hi, border, d2o, fold) in enumerate(specs):
            if mgm == 2 and not use_weights and not use_fh:
                # update_cost2 halves each term (mgm_core.cc:83-84)
                e = msgs[d2o[0]][m] * 0.5 + msgs[d2o[1]][m] * 0.5
            else:
                e = msgs[d2o[0]][m]
                for k in range(1, mgm):
                    e = e + msgs[d2o[k]][m]
                if mgm > 1:
                    e = e / float(mgm)
            need_l, need_r, need_t, need_b = border
            interior = (col >= (1 if need_l else 0)) & (col < C)
            if need_r:
                interior &= col <= C - 2
            if need_t:
                interior &= row >= 1
            if need_b:
                interior &= row <= R_eff - 2
            else:
                interior &= row < R_eff
            new_m = jnp.where(interior, cc_t[m] + e, cc_t[m])
            new_parts.append(new_m)
            out_parts.append(new_m + kappa * cc_t[m] if fold else new_m)
        new = jnp.stack(new_parts)
        out_ref[:, u] = jnp.stack(out_parts)
        hist = [(new, jnp.min(new, axis=-2))] + hist[:-1]

    for k in range(D):
        hist_ref[k] = hist[k][0]
        mins_ref[k] = hist[k][1]


def fused_wavefront(U, V, W_sk, *, specs, C, R_eff, L, G, slope, mgm,
                    offs, mode, nch, tmax, p1, p2, use_fh, use_weights,
                    kappa, interpret=False):
    """Run the fused recursion.

    U: (M, Cch, Tp, Rp) skewed left images (Tp a multiple of G).
    V: (M, Cch, Tp + SLAB, Rp) skewed phase-shifted right images (HBM).
    W_sk: (M, n_off, Tp, Rp) per-offset-rank weights or None.
    Returns (M, Tp, L, Rp) aggregated volumes (the designated pass's
    plane holds Lr + kappa * CC).
    """
    M, Cch, Tp, Rp = U.shape
    assert Tp % G == 0
    D = max(OFF_LAG[slope][o][0] for o in offs)
    SLAB = -(-(G + L - 1) // 8) * 8
    assert V.shape[2] >= Tp + SLAB - G

    kernel = functools.partial(
        _kernel, specs=tuple(specs), C=C, R_eff=R_eff, L=L, G=G, D=D,
        SLAB=SLAB, slope=slope, p1=float(p1), p2=float(p2), mgm=mgm,
        offs=tuple(offs), mode=mode, nch=nch, tmax=float(tmax),
        use_fh=use_fh, use_weights=use_weights, kappa=float(kappa))

    args = [U, V]
    in_specs = [
        pl.BlockSpec((M, Cch, G, Rp), lambda t: (0, 0, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    if use_weights:
        args.append(W_sk)
        in_specs.append(pl.BlockSpec((M, W_sk.shape[1], G, Rp),
                                     lambda t: (0, 0, t, 0),
                                     memory_space=pltpu.VMEM))
    vdtype = V.dtype
    return pl.pallas_call(
        kernel,
        grid=(Tp // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, G, L, Rp), lambda t: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Tp, L, Rp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((M, Cch, 2 * SLAB, Rp), vdtype),
            pltpu.VMEM((D, M, L, Rp), jnp.float32),
            pltpu.VMEM((D, M, Rp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=Tp * M * L * Rp * (30 if not use_fh
                                     else 30 + 8 * L.bit_length()),
            bytes_accessed=(M * Tp * L * Rp + M * Cch * Tp * Rp * 2) * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)
