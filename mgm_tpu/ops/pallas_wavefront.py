"""Pallas TPU kernel for the MGM directional wavefront recursion.

One `pallas_call` runs a whole canonical-orientation pass group: the
grid is the wavefront time axis t = ii + 2*jj (T = C + 2R - 2 steps,
mgm_core.cc:505-511 of gfacciol/mgm); each step streams one skewed
front (M, R, L) of the cost volume HBM->VMEM, computes the
1/2/4-message min-plus update fully vectorised over (rows x labels),
and keeps the previous three fronts plus their per-pixel minima
resident in VMEM scratch (the "couple of line buffers" the reference
notes it could use, mgm_core.cc:486).

Data layout: skewed volumes are wavefront-time-major, (T, M, R, L) with
blocks (1, M, R, L), so the trailing (rows, labels) dims are whole (the
Mosaic block-shape rule) and HBM tile padding stays minimal.  The
weight and label-window side inputs are passed only when the config
uses them - placeholder arrays would pay real HBM.

Canonical causal offsets (see ops/aggregate.py):
    W  -> front t-1, same row        NE -> front t-1, row above
    N  -> front t-2, row above       NW -> front t-3, row above
so three front slots of history suffice; slot (t mod 3) is rewritten
with the new front after its t-3 value has been consumed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")
VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MiB VMEM per core


def _row_shift(x, fill, axis):
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


def _front_update(cc_t, hist, t, *, C, R, p1, p2, mgm, dir2off, use_fh,
                  use_weights, w_t, win):
    """One wavefront update.  hist = [(front, mins)] for t-1, t-2, t-3;
    returns (new_front, new_mins)."""
    M, _, L = cc_t.shape
    (f1, m1), (f2, m2), (f3, m3) = hist
    # offset index -> (front, min): 0=W, 1=N, 2=NW, 3=NE
    neigh = {
        0: (f1, m1),
        1: (_row_shift(f2, INF, 1), _row_shift(m2, INF, 1)),
        2: (_row_shift(f3, INF, 1), _row_shift(m3, INF, 1)),
        3: (_row_shift(f1, INF, 1), _row_shift(m1, INF, 1)),
    }
    msgs = {}
    for off in sorted(set(dir2off)):
        Lk, mk = neigh[off]
        mk_ = mk[:, :, None]
        if use_weights:
            d = w_t[:, off, :][:, :, None]       # (M, R, 1)
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
    ii = t - 2 * jj
    interior = (jj >= 1) & (ii >= 1) & (ii <= C - 2)
    new = jnp.where(interior, cc_t + e, cc_t)
    return new, jnp.min(new, axis=-1)


def _kernel(*refs, C, R, G, p1, p2, mgm, dir2off, use_fh, use_weights,
            fh_restrict):
    """One grid step processes G consecutive wavefronts.  Within the
    block, fronts chain through in-VMEM values; only the last three are
    carried across grid steps in scratch slots 0/1/2 (slot k = front
    base-1-k), so every memory access has a static address."""
    it = iter(refs)
    cc_ref = next(it)
    w_ref = next(it) if use_weights else None
    lo_ref = next(it) if fh_restrict else None
    hi_ref = next(it) if fh_restrict else None
    out_ref, prev_ref, mins_ref = it

    base = pl.program_id(0) * G
    hist = [(prev_ref[0], mins_ref[0]),
            (prev_ref[1], mins_ref[1]),
            (prev_ref[2], mins_ref[2])]
    M, _, L = cc_ref.shape[1:]
    for u in range(G):
        win = None
        if fh_restrict:
            lo_t = lo_ref[u]                     # (M, R) int32
            hi_t = hi_ref[u]
            lab = jax.lax.broadcasted_iota(jnp.int32, (M, R, L), 2)
            win = (lab >= lo_t[:, :, None]) & (lab <= hi_t[:, :, None])
        new, mins = _front_update(
            cc_ref[u], hist, base + u, C=C, R=R, p1=p1, p2=p2, mgm=mgm,
            dir2off=dir2off, use_fh=use_fh, use_weights=use_weights,
            w_t=w_ref[u] if use_weights else None, win=win)
        out_ref[u] = new
        hist = [(new, mins), hist[0], hist[1]]
    for k in range(3):
        prev_ref[k] = hist[k][0]
        mins_ref[k] = hist[k][1]


def wavefront_scan(cc_sk, w_sk, lo_sk, hi_sk, *, C, G, p1, p2, mgm, dir2off,
                   use_fh, use_weights, fh_restrict, interpret=False):
    """Run the wavefront recursion over a skewed volume.

    cc_sk: (T, M, R, L) skewed canonical costs (wavefront-time-major),
        T a multiple of the block depth G.
    w_sk: (T, M, 4, R) per-offset weights or None.
    lo_sk/hi_sk: (T, M, R) int32 label windows or None.
    Returns the aggregated skewed volume, same shape as cc_sk.
    """
    T, M, R, L = cc_sk.shape
    assert T % G == 0
    kernel = functools.partial(
        _kernel, C=C, R=R, G=G, p1=float(p1), p2=float(p2), mgm=mgm,
        dir2off=tuple(dir2off), use_fh=use_fh, use_weights=use_weights,
        fh_restrict=fh_restrict)
    args = [cc_sk]
    in_specs = [pl.BlockSpec((G, M, R, L), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if use_weights:
        args.append(w_sk)
        in_specs.append(pl.BlockSpec((G, M, 4, R), lambda t: (t, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    if fh_restrict:
        args += [lo_sk, hi_sk]
        in_specs += [pl.BlockSpec((G, M, R), lambda t: (t, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    flops_step = M * R * L * (20 if not use_fh else 24 + 8 * L.bit_length())
    return pl.pallas_call(
        kernel,
        grid=(T // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, M, R, L), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, M, R, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, M, R, L), jnp.float32),
            pltpu.VMEM((3, M, R), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_step * T,
            bytes_accessed=2 * M * R * T * L * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)


def pick_block(R: int, L: int):
    """(G, m_max): wavefront block depth and the largest pass-x-problem
    chunk whose working set fits VMEM.  Budget: double-buffered in+out
    blocks (4 G-deep buffers) + 3 resident fronts + ~12 block-sized
    intermediates, trailing (R, L) dims padded to the (8, 128) tile."""
    lanes = -(-L // 128) * 128
    subl = -(-R // 8) * 8
    per_m = subl * lanes * 4
    for G in (8, 4, 2, 1):
        for M in (8, 4, 2, 1):
            if (4 * G + 15) * M * per_m <= VMEM_LIMIT:
                return G, M
    return 1, 1
