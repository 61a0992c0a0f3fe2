"""Pallas TPU kernel for the MGM directional wavefront recursion.

One `pallas_call` runs a whole canonical-orientation pass group: the
grid walks the wavefront time axis t = ii + 2*jj (T = C + 2R - 2 steps,
mgm_core.cc:505-511 of gfacciol/mgm) in blocks of G consecutive fronts;
each step streams a (M, R, G, L) slab of the skewed cost volume
HBM->VMEM, chains the G fronts through in-VMEM values (1/2/4-message
min-plus updates fully vectorised over rows x labels), and carries only
the last D fronts plus their per-pixel minima across grid steps in
VMEM scratch with static addressing (the "couple of line buffers" the
reference notes it could use, mgm_core.cc:486).

Layout: the skewed volume keeps its natural (M, R, T, L) form - with
G a multiple of 8 the block (M, R, G, L) satisfies the Mosaic
block-shape rule directly, so no relayout transposes are needed (they
were 25x the kernel's own cost).  Side inputs are passed only when the
config uses them.

Canonical causal offsets (see ops/aggregate.py):
    0 W   -> front t-1, same row     3 NE  -> front t-1, row above
    1 N   -> front t-2, row above    4 WWN -> front t-4, row above
    2 NW  -> front t-3, row above          (knight passes, -O 16)
History depth D = the maximum front lag among the active offsets.
Pass groups whose offsets exclude NE (axis passes at mgm <= 3, all
knight passes) use slope-1 wavefronts (t = ii + jj), shrinking the
skewed volume and scan length ~30%; NE needs the slope-2 schedule
(t = ii + 2*jj) as its causality certificate (mgm_core.cc:505-511).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")
VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MiB VMEM per core


def _skew_kernel(x_ref, o_ref, *, C, fill, slope, rpb):
    # 8/slope rows per step: the dynamic store base 8k is
    # sublane-aligned (Mosaic requires it provably a multiple of 8);
    # each row's residual slope*j shift is a static concat inside a
    # (C+8)-wide buffer
    k = pl.program_id(0)
    base = pl.multiple_of(8 * k, 8)
    A = x_ref.shape[0]
    B = x_ref.shape[3]
    for j in range(rpb):
        row = x_ref[:, j]                            # (A, C, B)
        parts = []
        if slope * j > 0:
            parts.append(jnp.full((A, slope * j, B), fill, x_ref.dtype))
        parts.append(row)
        if 8 - slope * j > 0:
            parts.append(jnp.full((A, 8 - slope * j, B), fill, x_ref.dtype))
        buf = jnp.concatenate(parts, axis=1)
        o_ref[:, j] = jnp.full_like(o_ref[:, j], fill)
        o_ref[:, j, pl.ds(base, C + 8), :] = buf


def skew_p(x, fill, t_round: int = 1, slope: int = 2, interpret=False):
    """(A, R, C, B) -> (A, Rp, T, B) with out[:, r, slope*r+c] =
    x[:, r, c], fill elsewhere; Rp = R rounded to 8/slope rows (fill
    rows appended) and T = C + slope*(Rp-1) (+ store margin) rounded
    up to `t_round`.  A Pallas copy kernel: XLA's pad+reshape lowering
    of the same diagonal relayout runs ~25x slower than the wavefront
    kernel it feeds."""
    A, R, C, B = x.shape
    rpb = 8 // slope
    Rp = -(-R // rpb) * rpb
    T = -(-(C + slope * (Rp - 1) + 8) // t_round) * t_round
    if Rp != R:
        x = jnp.pad(x, [(0, 0), (0, Rp - R), (0, 0), (0, 0)],
                    constant_values=fill)
    return pl.pallas_call(
        functools.partial(_skew_kernel, C=C, fill=fill, slope=slope,
                          rpb=rpb),
        grid=(Rp // rpb,),
        in_specs=[pl.BlockSpec((A, rpb, C, B), lambda k: (0, k, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((A, rpb, T, B), lambda k: (0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, Rp, T, B), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x)


def _unskew_kernel(x_ref, o_ref, *, C, slope, rpb):
    k = pl.program_id(0)
    base = pl.multiple_of(8 * k, 8)
    for j in range(rpb):
        buf = x_ref[:, j, pl.ds(base, C + 8), :]     # (A, C+8, B)
        # the residual slope*j offset is static: a plain slice, no
        # rotate (large-amount sublane rolls lower to catastrophic code)
        o_ref[:, j] = buf[:, slope * j:slope * j + C, :]


def unskew_p(y, C: int, R: int, slope: int = 2, interpret=False):
    """(A, Rp, T, B) -> (A, R, C, B), inverse of `skew_p`."""
    A, Rp, T, B = y.shape
    rpb = 8 // slope
    out = pl.pallas_call(
        functools.partial(_unskew_kernel, C=C, slope=slope, rpb=rpb),
        grid=(Rp // rpb,),
        in_specs=[pl.BlockSpec((A, rpb, T, B), lambda k: (0, k, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((A, rpb, C, B), lambda k: (0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, Rp, C, B), y.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(y)
    return out[:, :R] if Rp != R else out


def _row_shift(x, fill, axis=0):
    """x shifted by +1 along `axis` (row jj reads jj-1); first row = fill."""
    r = pltpu.roll(x, shift=1, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx == 0, fill, r)


def _lane_shift(x, off, fill):
    """x shifted by `off` along the last (label) axis, fill at the edge."""
    r = pltpu.roll(x, shift=off % x.shape[-1], axis=x.ndim - 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    L = x.shape[-1]
    if off > 0:
        return jnp.where(idx < off, fill, r)
    return jnp.where(idx >= L + off, fill, r)


def _sgm_msg(Lk, mk, p1w, p2w):
    """min(Lk[o], min(Lk[o-1],Lk[o+1])+P1w, minLk+P2w) - minLk
    (mgm_core.cc:74-76,113-116)."""
    vlp1 = jnp.minimum(_lane_shift(Lk, 1, INF), _lane_shift(Lk, -1, INF)) + p1w
    return jnp.minimum(jnp.minimum(Lk, vlp1), mk + p2w) - mk


def _fh_msg(Lk, mk, p1w, p2w, win):
    """Truncated-linear message by min-plus doubling over the label axis
    (mgm_core.cc:152-163 computed in log2(L) vector steps)."""
    L = Lk.shape[-1]
    M = jnp.where(win, Lk, INF) if win is not None else Lk
    s = 1
    while s < L:
        M = jnp.minimum(M, _lane_shift(M, s, INF) + p1w * float(s))
        s *= 2
    s = 1
    while s < L:
        M = jnp.minimum(M, _lane_shift(M, -s, INF) + p1w * float(s))
        s *= 2
    M = jnp.minimum(M, mk + p2w)
    return M - mk


# per skew slope: canonical offset id -> (front lag, needs row shift).
# Slope 2 holds for every pass; slope 1 is valid whenever the NE offset
# (same-front on slope 1) is inactive — axis passes with mgm <= 3 and
# all knight passes — and shrinks the skewed volume by ~30%.
OFF_LAG = {
    2: {0: (1, False), 1: (2, True), 2: (3, True), 3: (1, True),
        4: (4, True)},
    1: {0: (1, False), 1: (1, True), 2: (2, True), 4: (3, True)},
}


def max_lag(offs, slope: int) -> int:
    return max(OFF_LAG[slope][o][0] for o in offs)


def _front_update(cc_t, hist, t, *, C, slope, p1, p2, mgm, dir2off, offs,
                  knight, use_fh, use_weights, w_t, win):
    """One wavefront update.  cc_t: (M, R, L); hist: [(front, mins)] for
    t-1 .. t-D; w_t: per-offset-rank (M, R) weights."""
    M, R, L = cc_t.shape
    neigh = {}
    for off in offs:
        lag, shift = OFF_LAG[slope][off]
        f, m = hist[lag - 1]
        if shift:
            f, m = _row_shift(f, INF, 1), _row_shift(m, INF, 1)
        neigh[off] = (f, m)
    msgs = {}
    for rank, off in enumerate(offs):
        Lk, mk = neigh[off]
        mk_ = mk[:, :, None]
        if use_weights:
            d = w_t[rank * M:(rank + 1) * M][:, :, None]  # (M, R, 1)
            p1w, p2w = d * p1, d * p2
        else:
            p1w, p2w = p1, p2
        if use_fh:
            msgs[off] = _fh_msg(Lk, mk_, p1w, p2w, win)
        else:
            msgs[off] = _sgm_msg(Lk, mk_, p1w, p2w)

    if mgm == 2 and not use_weights and not use_fh:
        # update_cost2 halves each term before summing (mgm_core.cc:83-84)
        e = msgs[dir2off[0]] * 0.5 + msgs[dir2off[1]] * 0.5
    else:
        e = msgs[dir2off[0]]
        for k in range(1, mgm):
            e = e + msgs[dir2off[k]]
        if mgm > 1:
            e = e / float(mgm)

    jj = jax.lax.broadcasted_iota(jnp.int32, (M, R, L), 1)
    ii = t - slope * jj
    if knight:
        # no +x offset; the main dir reaches 2 columns left
        interior = (jj >= 1) & (ii >= 2) & (ii <= C - 1)
    else:
        interior = (jj >= 1) & (ii >= 1) & (ii <= C - 2)
    new = jnp.where(interior, cc_t + e, cc_t)
    return new, jnp.min(new, axis=-1)


def _kernel(*refs, C, G, D, slope, p1, p2, mgm, dir2off, offs, knight,
            use_fh, use_weights, fh_restrict, rolled=False):
    """One grid step = G consecutive wavefronts.  Scratch slot k holds
    front base-1-k on entry.

    rolled=False: the G fronts unroll in Python — every access is
    statically addressed (fastest, but FH bodies are ~log2(L)x bigger
    and deep unrolls have OOM-killed the TPU compile helper).
    rolled=True: one fori_loop iteration per front, history carried as
    stacked values, front slices dynamically addressed — a ~Gx smaller
    kernel body that lets FH configs run G=16."""
    it = iter(refs)
    cc_ref = next(it)
    w_ref = next(it) if use_weights else None
    lo_ref = next(it) if fh_restrict else None
    hi_ref = next(it) if fh_restrict else None
    out_ref, prev_ref, mins_ref = it

    base = pl.program_id(0) * G
    M, R, _, L = cc_ref.shape

    def step(u, t, hist):
        win = None
        if fh_restrict:
            lo_t = lo_ref[:, :, u, 0]            # (M, R) int32
            hi_t = hi_ref[:, :, u, 0]
            lab = jax.lax.broadcasted_iota(jnp.int32, (M, R, L), 2)
            win = (lab >= lo_t[:, :, None]) & (lab <= hi_t[:, :, None])
        new, mins = _front_update(
            cc_ref[:, :, u, :], hist, t, C=C, slope=slope, p1=p1,
            p2=p2, mgm=mgm, dir2off=dir2off, offs=offs, knight=knight,
            use_fh=use_fh, use_weights=use_weights,
            w_t=w_ref[:, :, u, 0] if use_weights else None, win=win)
        out_ref[:, :, u, :] = new
        return new, mins

    if not rolled:
        hist = [(prev_ref[k], mins_ref[k]) for k in range(D)]
        for u in range(G):
            new, mins = step(u, base + u, hist)
            hist = [(new, mins)] + hist[:-1]
        for k in range(D):
            prev_ref[k] = hist[k][0]
            mins_ref[k] = hist[k][1]
    else:
        hist_f = jnp.stack([prev_ref[k] for k in range(D)])
        hist_m = jnp.stack([mins_ref[k] for k in range(D)])

        def body(u, carry):
            hist_f, hist_m = carry
            hist = [(hist_f[k], hist_m[k]) for k in range(D)]
            new, mins = step(u, base + u, hist)
            return (jnp.concatenate([new[None], hist_f[:-1]]),
                    jnp.concatenate([mins[None], hist_m[:-1]]))

        hist_f, hist_m = jax.lax.fori_loop(0, G, body, (hist_f, hist_m))
        for k in range(D):
            prev_ref[k] = hist_f[k]
            mins_ref[k] = hist_m[k]


def use_rolled(use_fh: bool) -> bool:
    """Rolled (fori_loop) kernel body, DEFAULT for FH configs: their
    ~log2(L)-x-bigger unrolled bodies are what OOM'd the TPU compile
    helper above G=8, forcing a shallow-block cap and an env escape
    hatch (MGM_TPU_MAX_G, now gone).  MGM_TPU_ROLLED=0 restores the
    unrolled FH body for A/B comparison."""
    return use_fh and os.environ.get("MGM_TPU_ROLLED", "1") != "0"


def wavefront_scan(cc_sk, w_sk, lo_sk, hi_sk, *, C, G, p1, p2, mgm, dir2off,
                   slope=2, knight=False, use_fh=False, use_weights=False,
                   fh_restrict=False, rolled=False, interpret=False):
    """Run the wavefront recursion over a skewed volume.

    cc_sk: (M, R, T, L) skewed canonical costs, T a multiple of G.
    w_sk: (n_off*M, R, T, 1) per-offset-rank weights or None.
    lo_sk/hi_sk: (M, R, T, 1) int32 label windows or None.
    dir2off: offset id per coupled dir (length mgm).
    Returns the aggregated skewed volume, same shape as cc_sk.
    """
    M, R, T, L = cc_sk.shape
    assert T % G == 0
    offs = tuple(sorted(set(dir2off)))
    D = max_lag(offs, slope)
    kernel = functools.partial(
        _kernel, C=C, G=G, D=D, slope=slope, p1=float(p1), p2=float(p2),
        mgm=mgm, dir2off=tuple(dir2off), offs=offs, knight=knight,
        use_fh=use_fh, use_weights=use_weights, fh_restrict=fh_restrict,
        rolled=rolled)
    args = [cc_sk]
    in_specs = [pl.BlockSpec((M, R, G, L), lambda t: (0, 0, t, 0),
                             memory_space=pltpu.VMEM)]
    if use_weights:
        n_off_m = w_sk.shape[0]
        args.append(w_sk)
        in_specs.append(pl.BlockSpec((n_off_m, R, G, 1),
                                     lambda t: (0, 0, t, 0),
                                     memory_space=pltpu.VMEM))
    if fh_restrict:
        args += [lo_sk, hi_sk]
        in_specs += [pl.BlockSpec((M, R, G, 1), lambda t: (0, 0, t, 0),
                                  memory_space=pltpu.VMEM)] * 2
    flops_step = M * R * L * (20 if not use_fh else 24 + 8 * L.bit_length())
    return pl.pallas_call(
        kernel,
        grid=(T // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, R, G, L), lambda t: (0, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, R, T, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, M, R, L), jnp.float32),
            pltpu.VMEM((D, M, R), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_step * T,
            bytes_accessed=2 * M * R * T * L * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)


def pick_block(R: int, L: int, heavy: bool = False):
    """(G, m_max): wavefront block depth and the largest pass-x-problem
    chunk whose working set fits VMEM.  Budget: double-buffered in+out
    G-deep slabs + 4 resident fronts + ~12 front-sized intermediates;
    the in-VMEM tile pads (G, L) blocks to (8, 128) multiples."""
    lanes = -(-L // 128) * 128
    per_front = R * lanes * 4
    # deeper blocks amortise per-step overhead; prefer more work per
    # call (G*M), then fewer chunks (larger M).  G capped at 16
    # ((8,4) and (32,*) OOM the TPU compile helper).  The budget is
    # 4G in/out double-buffered fronts + history + ~9 live
    # intermediates (front-sized, not G-scaled).
    g_cap = 16
    if heavy:
        # unrolled FH min-conv bodies (MGM_TPU_ROLLED=0) are
        # ~log2(L) x bigger; deep unrolls OOM the TPU compile helper
        g_cap = 8
    for G, M in ((16, 2), (8, 2), (16, 1), (8, 1)):
        if G <= g_cap and (4 * G + 13) * M * per_front <= VMEM_LIMIT:
            return G, M
    if (4 * 8 + 13) * per_front > VMEM_LIMIT:
        raise ValueError(
            f"wavefront working set for R={R}, L={L} exceeds the VMEM "
            f"budget even at G=8; shard the rows across devices "
            f"(parallel.halo.halo_aggregate) or tile the image")
    return min(8, g_cap), 1
