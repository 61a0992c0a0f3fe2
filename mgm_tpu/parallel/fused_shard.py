"""Row-sharded fused cost+wavefront pipeline (multi-chip Pallas).

compute_disparity(mesh=...) previously dropped to the XLA lax.scan
solver whenever a mesh was given, forfeiting the fused Pallas kernels'
~10x single-chip speedup.  This module runs the SAME fused recursion
(ops/pallas_fused.py semantics, mgm_core.cc:408-613 of gfacciol/mgm)
inside shard_map, covering every fusable pass group — the A/B skew
spaces, the column-front space V, and the packed parity spaces PA/PB
(the mgm=4 schedules of passes 2/3/5/7) — i.e. every reference config
at any ndir in 1..8 and any mgm; only the 22.5-degree knight passes
(ndir=16) and NCC fall back to the XLA mesh path:

  - image rows are sharded over the 1-D mesh ("y"); every device holds
    Rl rows (a multiple of 128 — the lane tiling) and steps the fused
    block kernel (pallas_fused._block_kernel) over G-front blocks with
    explicitly carried (hist, mins) state.
  - **A/B skew groups** (slope 1/2 anti-diagonal wavefronts): device k
    builds its local slice of the GLOBALLY-skewed planes (the skew
    offset slope*r0 enters as a device-dependent dynamic shift) and
    processes front-block sigma - stag(k) at superstep sigma, with
    stag = k when the launch's lane rolls read the row ABOVE
    (information flows down the mesh) and n-1-k when they read BELOW.
    Adjacent devices are exactly ONE block apart, and every
    cross-device dependency reaches back at most D <= 3 < G fronts, so
    the upstream device's boundary rows for a block are always shipped
    one superstep before they are consumed — SURVEY.md 2.9's "device k
    starts its block as soon as it receives the halo row of Lr
    L-vectors", at block granularity.  Per superstep each device
    ppermutes the (G, Ml, L) boundary-row messages it just computed
    into the downstream device's halo TRACK (indexed by front).  A
    launch never mixes roll directions here: in the A/B skew spaces a
    pass's lane-roll sign always agrees with its scan direction's
    pipeline flow (the skew direction is what MAKES the deps causal).
  - **V group** (slope-0 column fronts: passes 5/7 at mgm in 2..3,
    whose deps are strictly horizontal-causal but read rows BOTH above
    and below — bidirected, so no one-way stagger exists): devices run
    in LOCKSTEP over B-front blocks on an APRON-extended lane range of
    B rows borrowed from each neighbour.  Within a block no
    communication happens; edge-fill corruption creeps inward at most
    one lane per front, so after B fronts only the aprons are stale
    and the interior is EXACT.  Between blocks each device ppermutes
    its (still-exact) interior boundary bands of the carried
    (hist, mins) state into the neighbours' aprons — two B-row-deep
    refreshes per superstep instead of per-front bidirected halos.
    Junk in out-of-image aprons (mesh edges) is structurally inert:
    every V-group pass's full dep set spans both row signs
    (mgm_core.cc:468,471), so its 1-pixel border rule
    (mgm_core.cc:538-541) discards exactly the messages that could
    consume an out-of-image row.

  - **Packed parity group** (slope-1/2 wavefronts t = 2c +- r, lanes =
    half-rows: the mgm=4 schedules of passes 2/3/5/7, also bidirected)
    runs the same lockstep apron scheme as V in the PACKED geometry:
    aprons are B_h half-row lanes (= 2*B_h image rows) deep, packed
    lane rolls move at most one lane per front, and both spaces ride
    one launch per direction exactly like the resident kernel
    (run_p_group).

The halo tracks / apron refreshes carry the full Dvec state (cached
minima are recomputed from the shipped rows; min is order-independent),
and every assembly sums spaces in one association order
(A,B,V,PA,PB left-to-right), so the sharded run is BITWISE-equal to
the single-device fused kernels.

Wall-clock: A/B supersteps = NB + n - 1 vs NB single-device (pipeline
fill), V/parity supersteps = NB_v with a 2B/Rl lane-apron recompute
overhead; efficiency grows with rows/device (the large-scene regime
the mesh path exists for).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ._shard_map import shard_map

from ..ops import pallas_fused as pf
from ..ops.fused import (PASS_TABLE, P_SLOPE, split_passes, _skew_rows,
                         _col_window, _bt_aux)
from ..ops.common import INF

AXIS = "y"


def _shift_t(x, off, fill, maxoff: int):
    """Shift the last axis by a traced `off` (|off| <= maxoff):
    out[..., t] = x[..., t - off] with `fill` outside."""
    pad = [(0, 0)] * (x.ndim - 1) + [(maxoff, maxoff)]
    padded = jnp.pad(x, pad, constant_values=fill)
    start = (0,) * (x.ndim - 1) + (maxoff - off,)
    return jax.lax.dynamic_slice(padded, start, x.shape)


def _local_skew_packed(a, space: str, t_len: int, fill, rho0, R2lap: int,
                       R2g: int):
    """(..., 2*R2lap, W) local image rows (starting at global row
    2*rho0) -> (..., R2lap, t_len) local lane slice of the GLOBAL
    packed parity skew (ops/fused._skew_packed): local pad/reshape
    skew plus one device-dependent dynamic shift along t."""
    if space == "PB":
        a = jnp.flip(a, -2)
        off = R2g - R2lap - rho0
    else:
        off = rho0
    maxoff = R2g + 2 * R2lap
    th = t_len // 2
    E = _shift_t(_skew_rows(a[..., 0::2, :], 1, th, fill), off, fill,
                 maxoff)
    O = _shift_t(_skew_rows(a[..., 1::2, :], 1, th, fill), off, fill,
                 maxoff)
    out = jnp.stack([E, O], axis=-1).reshape(a.shape[:-2]
                                             + (R2lap, t_len))
    if space == "PB":
        out = jnp.flip(out, -2)
    return out


def _local_ring_packed(v, space: str, th_len: int, fill, rho0,
                       R2lap: int, R2g: int):
    """Local lane slice of the two per-front-parity ring sources
    (ops/fused._ring_packed), each (..., R2lap, th_len)."""
    if space == "PB":
        v = jnp.flip(v, -2)
        off = R2g - R2lap - rho0
    else:
        off = rho0
    maxoff = R2g + 2 * R2lap
    E = _shift_t(_skew_rows(v[..., 0::2, :], 1, th_len, fill), off, fill,
                 maxoff)
    O = _shift_t(_skew_rows(v[..., 1::2, :], 1, th_len, fill), off, fill,
                 maxoff)
    if space == "PB":
        E, O = jnp.flip(E, -2), jnp.flip(O, -2)
    return E, O


def _local_unskew_packed(pair, C: int, space: str, rho0, R2lap: int,
                         R2g: int, B_h: int, Rl: int):
    """Transposed parity half outputs ((even, odd), each
    (Mp, R2lap, Th, L)) -> (Mp, Rl, C, L) image-space volume of the
    device's own rows (aprons dropped): the local counterpart of
    ops/fused._unskew_packed with the device's global half-row offset
    applied as a dynamic shift."""
    if space == "PB":
        off = R2g - R2lap - rho0
    else:
        off = rho0
    maxoff = R2g + 2 * R2lap
    outs = []
    for y in pair:
        z = jnp.transpose(y, (0, 3, 1, 2))         # (Mp, L, R2lap, Th)
        if space == "PB":
            z = jnp.flip(z, -2)
        # pre-shift tau by `off`, then the local slope-1 unskew:
        # out[rho, c] = z[rho, c + rho + off]
        z = _shift_t(z, -off, 0.0, maxoff)
        Mp, L, _, Th = z.shape
        flat = z.reshape(Mp, L, R2lap * Th)
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, R2lap)))
        z = flat.reshape(Mp, L, R2lap, Th + 1)[..., :C]
        if space == "PB":
            z = jnp.flip(z, -2)
        outs.append(z)
    a, b = outs                                    # even-/odd-front
    if space == "PB":
        a, b = b, a                                # -> even/odd ROWS
    vol = jnp.stack([a, b], axis=3)                # (Mp, L, R2lap, 2, C)
    Mp, L = vol.shape[0], vol.shape[1]
    vol = vol.reshape(Mp, L, 2 * R2lap, C)
    vol = jnp.transpose(vol, (0, 2, 3, 1))         # (Mp, rows, C, L)
    return jax.lax.slice_in_dim(vol, 2 * B_h, 2 * B_h + Rl, axis=1)


def sharded_eligible(ndir: int, mgm: int, distance: str) -> bool:
    """True when every pass schedules into a group the sharded runner
    covers: the A/B skew spaces (staggered pipeline), the column-front
    space V, or the packed parity spaces (both lockstep apron
    pipelines) — i.e. every fusable config, ndir <= 8 at any mgm.
    Only the knight passes (ndir = 16) and NCC fall back to the XLA
    mesh path."""
    if distance == "ncc":
        return False
    groups, leftover = split_passes(ndir, mgm)
    return not leftover and bool(groups)


def _local_skew(a, space: str, slope: int, t_len: int, fill, r0, Rl: int,
                RPg: int):
    """(..., Rl, W) local rows -> (..., Rl, t_len) slice of the GLOBAL
    skew: cell (r_loc, c) lands at t = c + slope*(r0 + r_loc) (A) or
    c + slope*(RPg - 1 - r0 - r_loc) (B).  Local pad/reshape skew plus
    one device-dependent dynamic shift along t.  slope == 0 (space V)
    degenerates to a plain column pad."""
    if space == "B":
        base = jnp.flip(_skew_rows(jnp.flip(a, -2), slope, t_len, fill), -2)
        off = slope * (RPg - Rl - r0)
    else:
        base = _skew_rows(a, slope, t_len, fill)
        off = slope * r0
    if slope == 0:
        return base
    maxoff = slope * RPg
    pad = [(0, 0)] * (a.ndim - 1) + [(maxoff, 0)]
    padded = jnp.pad(base, pad, constant_values=fill)
    start = (0,) * (a.ndim - 1) + (maxoff - off,)
    return jax.lax.dynamic_slice(padded, start, a.shape[:-1] + (t_len,))


def _local_unskew(y, C: int, slope: int, off):
    """(N, Rl, Tp, L) transposed launch output -> (N, Rl, C, L):
    out[r, c] = y[r, c + off + slope*r] (off traced per device)."""
    N, Rl, Tp, L = y.shape
    if slope == 0:
        return y[:, :, :C, :]
    flat = y.reshape(N, Rl * Tp, L)
    flat = jnp.pad(flat, ((0, 0), (0, slope * Rl), (0, 0)))
    z = flat.reshape(N, Rl, Tp + slope, L)
    return jax.lax.dynamic_slice(z, (0, 0, off, 0), (N, Rl, C, L))


def _extend_rows(a, fill, axis: int, nb: int, k, n: int):
    """Apron-extend `a` (rows on `axis`) with `nb` boundary rows from
    each neighbour device; mesh-edge aprons get `fill` (inert: the
    V/parity passes' both-sign border rules discard every message
    adjacent to an out-of-image row)."""
    ax = axis % a.ndim
    R_ = a.shape[ax]
    topsrc = jax.lax.slice_in_dim(a, R_ - nb, R_, axis=ax)
    botsrc = jax.lax.slice_in_dim(a, 0, nb, axis=ax)
    top = jax.lax.ppermute(topsrc, AXIS,
                           [(i, (i + 1) % n) for i in range(n)])
    bot = jax.lax.ppermute(botsrc, AXIS,
                           [(i, (i - 1) % n) for i in range(n)])
    top = jnp.where(jnp.equal(k, 0), fill, top)
    bot = jnp.where(jnp.equal(k, n - 1), fill, bot)
    return jnp.concatenate([top, a, bot], axis=ax)


def _refresh_aprons(x, nb: int, inner: int, k, n: int):
    """Between lockstep blocks: ship my interior boundary bands (still
    exact) into the neighbours' aprons of the carried state `x`
    (lanes minor: [0, nb) top apron, [nb, nb+inner) interior,
    [nb+inner, inner+2nb) bottom apron)."""
    sd = jax.lax.slice_in_dim(x, inner, inner + nb, axis=-1)
    su = jax.lax.slice_in_dim(x, nb, 2 * nb, axis=-1)
    rt = jax.lax.ppermute(sd, AXIS, [(i, (i + 1) % n) for i in range(n)])
    rb = jax.lax.ppermute(su, AXIS, [(i, (i - 1) % n) for i in range(n)])
    rt = jnp.where(jnp.equal(k, 0), INF, rt)
    rb = jnp.where(jnp.equal(k, n - 1), INF, rb)
    x = jax.lax.dynamic_update_slice_in_dim(x, rt, 0, axis=-1)
    return jax.lax.dynamic_update_slice_in_dim(x, rb, nb + inner, axis=-1)


def _launch_setup(passes, sides):
    """Static (combos, mspecs, rolls) for one (space, dir) sub-launch;
    combos are the distinct (front lag, lane roll) pairs, mspecs the
    per-(pass, side) recursion specs indexing into them."""
    combos, mspecs = [], []
    rolls = set()
    for pid, space, ranks, border in passes:
        for c in ranks:
            rolls.add(c[1])
            if c not in combos:
                combos.append(c)
    for pid, space, ranks, border in passes:
        for n in range(len(sides)):
            mspecs.append((n, tuple(combos.index(c) for c in ranks),
                           border))
    rolls.discard(0)
    return combos, mspecs, rolls


@partial(jax.jit, static_argnames=("mesh", "sides", "L", "ndir", "mgm",
                                   "p1", "p2", "mode", "nch", "trunc_dist",
                                   "use_fh", "use_weights", "fix_overcount",
                                   "per_pixel", "h_real", "interpret"))
def sharded_fused_lsum(u_p, v_p, w8, lo_px, hi_px, *, mesh: Mesh,
                       sides, L: int, ndir: int, mgm: int, p1: float,
                       p2: float, mode: str, nch: int, trunc_dist: float,
                       use_fh: bool, use_weights: bool,
                       fix_overcount: bool, per_pixel: bool,
                       h_real: int, interpret: bool = False):
    """The fused directional recursion, row-sharded: returns the
    (N, Hp, W, L) sum of aggregated Lr volumes (with the kappa*CC
    overcount term folded in when fix_overcount), sharded on rows.

    u_p, v_p: (Hp, W, Cch) preprocessed images, Hp = n_dev * Rl with
    Rl a multiple of 128 (stereo.compute_disparity pads); fake bottom
    rows are inert (the kernel's R_eff masks reproduce the true-border
    semantics, so real rows equal the single-device fused run bitwise).
    """
    n = mesh.devices.size
    Hp, W, _ = u_p.shape
    assert Hp % n == 0
    Rl = Hp // n
    RPg = Hp
    C = W
    N = len(sides)
    tmax = trunc_dist * nch
    kappa = -float(ndir - 1) if fix_overcount else 0.0

    groups, leftover = split_passes(ndir, mgm)
    assert not leftover and groups, "caller must gate on sharded_eligible"
    # bigger blocks than the resident single-device kernel: every
    # superstep pays XLA slab slicing + a kernel launch + a ppermute,
    # so amortise over more fronts (the grid-less block kernel holds
    # one block's working set at a time, so VMEM allows it)
    G = int(os.environ.get("MGM_TPU_SFUSED_G", "32"))

    if mode in ("btad", "btsd"):
        u3 = jnp.concatenate([u_p, *_bt_aux(u_p)], -1)
        v3 = jnp.concatenate([v_p, *_bt_aux(v_p)], -1)
        lefts, rights = [u3, v3][:N], [v3, u3][:N]
    else:
        lefts, rights = [u_p, v_p][:N], [v_p, u_p][:N]
    lefts = jnp.stack(lefts)     # (N, Hp, W, Cch)
    rights = jnp.stack(rights)
    int_img = jnp.issubdtype(lefts.dtype, jnp.integer)
    ifill = 0 if int_img else 0.0

    w_dummy = w8 if use_weights else jnp.zeros((N, Hp, W, 8), jnp.float32)
    lo_d = lo_px if per_pixel else jnp.zeros((N, Hp, W), jnp.int32)
    hi_d = hi_px if per_pixel else jnp.zeros((N, Hp, W), jnp.int32)
    fh_restrict = (use_fh and per_pixel
                   and not (mgm == 2 and not use_weights))

    def body(lefts_l, rights_l, w_l, lo_l, hi_l):
        k = jax.lax.axis_index(AXIS)
        r0 = k * Rl

        def skew_plane(space, slope, Tp, SLABW, arrs, rl, rr0):
            """Per-side skewed U, V(+phase), lo/hi for one space;
            arrs = (lefts, rights, lo, hi) at the local lane extent
            rl (Rl, or the apron-extended Rl + 2B for space V)."""
            le, ri, lo_a, hi_a = arrs
            us, vs, los, his = [], [], [], []
            for ni, (gmin, lo, hi) in enumerate(sides):
                u_c = jnp.moveaxis(le[ni], -1, 0)      # (Cch, rl, W)
                v_c = jnp.moveaxis(ri[ni], -1, 0)
                us.append(_local_skew(u_c, space, slope, Tp, ifill, rr0,
                                      rl, RPg))
                v_sh = _col_window(v_c, gmin, Tp + SLABW, ifill)
                vs.append(_local_skew(v_sh, space, slope, Tp + SLABW,
                                      ifill, rr0, rl, RPg))
                if per_pixel:
                    los.append(_local_skew(lo_a[ni], space, slope, Tp, 0,
                                           rr0, rl, RPg))
                    his.append(_local_skew(hi_a[ni], space, slope, Tp,
                                           L - 1, rr0, rl, RPg))
            U = jnp.swapaxes(jnp.stack(us), -1, -2)   # (N, Cch, Tp, rl)
            V = jnp.swapaxes(jnp.stack(vs), -1, -2)
            LOs = (jnp.swapaxes(jnp.stack(los), -1, -2) if per_pixel
                   else None)
            HIs = (jnp.swapaxes(jnp.stack(his), -1, -2) if per_pixel
                   else None)
            return U, V, LOs, HIs

        def weights_skew(space, slope, Tp, pids, combos, mspecs, w_a, rl,
                         rr0):
            if not use_weights:
                return None
            w_sk = []
            for m, (ni, ranks, border) in enumerate(mspecs):
                pid = pids[m // N]
                wch = PASS_TABLE[pid].wch
                # rank r is dir index; combos[ranks[r]] is its combo
                planes = []
                for ci, c in enumerate(combos):
                    if ci in ranks:
                        wp = w_a[ni, :, :, wch[ranks.index(ci)]]
                    else:
                        wp = jnp.ones((rl, W), jnp.float32)
                    planes.append(_local_skew(wp, space, slope, Tp, 1.0,
                                              rr0, rl, RPg))
                w_sk.append(jnp.stack(planes))
            return jnp.swapaxes(jnp.stack(w_sk), -1, -2)  # (Ml, nc, Tp, rl)

        total = None
        fold_done = False
        for slope, spaces, launches in groups:
            fold_group = kappa != 0.0 and not fold_done
            fold_done = fold_done or fold_group
            arrs = (lefts_l, rights_l, lo_l, hi_l)
            if slope > 0:
                vol = run_ab_group(spaces, launches, fold_group,
                                   skew_plane, weights_skew, arrs, w_l,
                                   k, r0)
            elif slope == 0:
                vol = run_v_group(spaces, launches, fold_group,
                                  skew_plane, weights_skew, arrs, w_l,
                                  k, r0)
            else:
                # parity spaces fold into the RUNNING total one at a
                # time: the resident WTA kernel sums spaces strictly
                # left-to-right (A,B,V,PA,PB — pallas_fused.py:336),
                # so ((AB+V)+PA)+PB, never (AB+V)+(PA+PB); bitwise
                # equality with the single-device path depends on it
                total = run_p_group(spaces, launches, fold_group, arrs,
                                    w_l, k, r0, total)
                continue
            total = vol if total is None else total + vol
        return total

    def run_ab_group(spaces, launches, fold_group, skew_plane,
                     weights_skew, arrs, w_l, k, r0):
        """Staggered one-way pipeline with per-superstep ppermuted
        boundary-row tracks (single-signed lane rolls)."""
        slope = next(s for s, _, _ in groups if s > 0)
        T = C + slope * (RPg - 1) + 8
        Tp = -(-T // G) * G
        NB = Tp // G
        SLABW = -(-(G + L - 1) // 8) * 8
        A0 = {"A": 0, "B": slope * (RPg - 1)}
        SS = {"A": -1, "B": 1}

        # per-(space, dir) sub-launches with static setups
        subs = []
        fold_space = spaces[0] if fold_group else None
        for d, ms in launches:
            for space in spaces:
                passes = [m for m in ms if m[1] == space]
                if not passes:
                    continue
                combos, mspecs, rolls = _launch_setup(passes, sides)
                assert rolls <= {1} or rolls <= {-1}, \
                    "A/B launches have single-signed lane rolls"
                down = 1 in rolls or not rolls
                Dk = max(c[0] for c in combos)
                subs.append((space, d, tuple(p[0] for p in passes),
                             tuple(combos), tuple(mspecs), down, Dk))

        space_arrays = {s: skew_plane(s, slope, Tp, SLABW, arrs, Rl, r0)
                        for s in spaces}
        # one trailing trash block absorbs invalid-superstep writes
        outs = {s: jnp.zeros((N, Tp + G, L, Rl), jnp.float32)
                for s in spaces}

        for space, d, pids, combos, mspecs, down, Dk in subs:
            U, V, LOs, HIs = space_arrays[space]
            Wk = weights_skew(space, slope, Tp, pids, combos, mspecs,
                              w_l, Rl, r0)
            reverse = d == "bwd"
            accumulate = d == "bwd"  # fwd ran first into outs[space]
            fold = (space == fold_space) and (d == "fwd")
            planes = tuple(
                (gmin, lo, hi, A0[space], SS[space], fold, 0)
                for (gmin, lo, hi) in sides)
            Ml = len(mspecs)
            stag = k if down else (n - 1) - k
            ship_lane = Rl - 1 if down else 0
            inject_lane = 0 if down else Rl - 1
            perm = ([(i, (i + 1) % n) for i in range(n)] if down
                    else [(i, (i - 1) % n) for i in range(n)])
            edge = 0 if down else n - 1

            def step(carry, sigma, U=U, V=V, Wk=Wk, LOs=LOs, HIs=HIs,
                     planes=planes, combos=combos, mspecs=mspecs,
                     reverse=reverse, accumulate=accumulate, stag=stag,
                     ship_lane=ship_lane, inject_lane=inject_lane,
                     perm=perm, edge=edge, Ml=Ml):
                out, hist, mins, track = carry
                blk = sigma - stag
                valid = (blk >= 0) & (blk < NB)
                blkc = jnp.clip(blk, 0, NB - 1)
                beff = (NB - 1 - blkc) if reverse else blkc
                t0 = beff * G
                scal = jnp.stack([t0, r0]).astype(jnp.int32)
                U_blk = jax.lax.dynamic_slice_in_dim(U, t0, G, axis=2)
                v_slab = jax.lax.dynamic_slice_in_dim(V, t0, SLABW, axis=2)
                W_blk = (jax.lax.dynamic_slice_in_dim(Wk, t0, G, axis=2)
                         if use_weights else None)
                lo_blk = (jax.lax.dynamic_slice_in_dim(LOs, t0, G, axis=1)
                          if per_pixel else None)
                hi_blk = (jax.lax.dynamic_slice_in_dim(HIs, t0, G, axis=1)
                          if per_pixel else None)
                halo = jax.lax.dynamic_slice_in_dim(track, t0, G + 16,
                                                    axis=0)
                # fwd launches write every valid block exactly once:
                # invalid steps go to the trash block at Tp instead of
                # a read-modify-write (bwd needs the read anyway: it
                # accumulates onto the forward output)
                wpos = jnp.where(valid, t0, Tp)
                out_cur = (jax.lax.dynamic_slice_in_dim(out, t0, G, axis=1)
                           if accumulate else None)
                ob, h2, m2, ship = pf.fused_block(
                    scal, U_blk, v_slab, W_blk, lo_blk, hi_blk, hist, mins,
                    halo, out_cur if accumulate else None,
                    planes=planes, mspecs=mspecs, combos=combos, C=C,
                    R_eff=h_real, L=L, G=G, slope=slope, p1=p1, p2=p2,
                    mgm=mgm, mode=mode, nch=nch, tmax=tmax, use_fh=use_fh,
                    use_weights=use_weights, kappa=kappa, reverse=reverse,
                    per_pixel=per_pixel, fh_restrict=fh_restrict,
                    ship_lane=ship_lane, inject_lane=inject_lane, RPg=RPg,
                    interpret=interpret)
                if accumulate:
                    ob = jnp.where(valid, ob, out_cur)
                    wpos = t0
                hist = jnp.where(valid, h2, hist)
                mins = jnp.where(valid, m2, mins)
                out = jax.lax.dynamic_update_slice_in_dim(out, ob, wpos,
                                                          axis=1)
                ship = jnp.where(valid, ship, INF)
                recv = jax.lax.ppermute(ship, AXIS, perm)
                recv = jnp.where(jnp.equal(k, edge), INF, recv)
                nb = blk + 1
                nvalid = (nb >= 0) & (nb < NB)
                nbc = jnp.clip(nb, 0, NB - 1)
                nbeff = (NB - 1 - nbc) if reverse else nbc
                pos = nbeff * G + 8
                cur = jax.lax.dynamic_slice_in_dim(track, pos, G, axis=0)
                track = jax.lax.dynamic_update_slice_in_dim(
                    track, jnp.where(nvalid, recv, cur), pos, axis=0)
                return (out, hist, mins, track), None

            init = (outs[space],
                    jnp.full((Dk, Ml, L, Rl), INF, jnp.float32),
                    jnp.full((Dk, Ml, Rl), INF, jnp.float32),
                    jnp.full((Tp + 16, Ml, L), INF, jnp.float32))
            (o, _, _, _), _ = jax.lax.scan(
                step, init, jnp.arange(NB + n - 1, dtype=jnp.int32))
            outs[space] = o

        # local unskew + cross-space sum -> (N, Rl, C, L)
        total = None
        for space in spaces:
            y = jnp.transpose(outs[space][:, :Tp], (0, 3, 1, 2))
            if space == "B":
                y = jnp.flip(y, 1)
                off = slope * (RPg - Rl - r0)
            else:
                off = slope * r0
            vol = _local_unskew(y, C, slope, off)
            if space == "B":
                vol = jnp.flip(vol, 1)
            total = vol if total is None else total + vol
        return total

    def run_v_group(spaces, launches, fold_group, skew_plane,
                    weights_skew, arrs, w_l, k, r0):
        """Lockstep apron-band pipeline for the column-front group
        (slope 0, bidirected lane rolls): every device processes every
        block at the same superstep over Rl + 2B lanes (B apron rows
        from each neighbour), then refreshes the aprons of the carried
        (hist, mins) from the neighbours' exact interiors.  Corruption
        from the apron edge creeps <= 1 lane per front, so B = block
        depth keeps the interior bitwise-exact."""
        assert spaces == ["V"] or tuple(spaces) == ("V",)
        B = int(os.environ.get("MGM_TPU_SFUSED_GV", str(G)))
        B = max(8, min(B - B % 8, Rl))  # aprons cannot exceed the shard
        Rlap = Rl + 2 * B
        T = C + 8
        Tp = -(-T // B) * B
        NBv = Tp // B
        SLABW = -(-(B + L - 1) // 8) * 8

        def extend(a, fill, axis):
            return _extend_rows(a, fill, axis, B, k, n)

        le, ri, lo_a, hi_a = arrs
        fill_img = jnp.asarray(ifill, le.dtype)
        arrs_ap = (extend(le, fill_img, -3), extend(ri, fill_img, -3),
                   extend(lo_a, 0, -2) if per_pixel else lo_a,
                   extend(hi_a, L - 1, -2) if per_pixel else hi_a)
        w_ap = extend(w_l, 1.0, -3) if use_weights else w_l
        r0ap = r0 - B

        U, V, LOs, HIs = skew_plane("V", 0, Tp, SLABW, arrs_ap, Rlap, r0ap)
        out = jnp.zeros((N, Tp, L, Rlap), jnp.float32)

        for d, passes in launches:
            for pid, space, ranks, border in passes:
                # the junk out-of-image aprons at the mesh edges rely
                # on the border rule discarding every message adjacent
                # to an out-of-image row (see module docstring)
                assert border[2] and border[3], \
                    "V-group passes must mask both row borders"
            combos, mspecs, rolls = _launch_setup(passes, sides)
            Wk = weights_skew("V", 0, Tp, tuple(p[0] for p in passes),
                              combos, mspecs, w_ap, Rlap, r0ap)
            reverse = d == "bwd"
            accumulate = d == "bwd"
            fold = fold_group and (d == "fwd")
            planes = tuple((gmin, lo, hi, 0, -1, fold, 0)
                           for (gmin, lo, hi) in sides)
            Ml = len(mspecs)
            Dk = max(c[0] for c in combos)

            def vstep(carry, blk, U=U, V=V, Wk=Wk, LOs=LOs, HIs=HIs,
                      planes=planes, combos=combos, mspecs=mspecs,
                      reverse=reverse, accumulate=accumulate, Ml=Ml):
                out, hist, mins = carry
                beff = (NBv - 1 - blk) if reverse else blk
                t0 = beff * B
                scal = jnp.stack([t0, jnp.asarray(r0ap)]).astype(jnp.int32)
                U_blk = jax.lax.dynamic_slice_in_dim(U, t0, B, axis=2)
                v_slab = jax.lax.dynamic_slice_in_dim(V, t0, SLABW, axis=2)
                W_blk = (jax.lax.dynamic_slice_in_dim(Wk, t0, B, axis=2)
                         if use_weights else None)
                lo_blk = (jax.lax.dynamic_slice_in_dim(LOs, t0, B, axis=1)
                          if per_pixel else None)
                hi_blk = (jax.lax.dynamic_slice_in_dim(HIs, t0, B, axis=1)
                          if per_pixel else None)
                out_cur = (jax.lax.dynamic_slice_in_dim(out, t0, B, axis=1)
                           if accumulate else None)
                ob, h2, m2, _ = pf.fused_block(
                    scal, U_blk, v_slab, W_blk, lo_blk, hi_blk, hist, mins,
                    None, out_cur,
                    planes=planes, mspecs=mspecs, combos=combos, C=C,
                    R_eff=h_real, L=L, G=B, slope=0, p1=p1, p2=p2,
                    mgm=mgm, mode=mode, nch=nch, tmax=tmax, use_fh=use_fh,
                    use_weights=use_weights, kappa=kappa, reverse=reverse,
                    per_pixel=per_pixel, fh_restrict=fh_restrict,
                    ship_lane=0, inject_lane=0, RPg=RPg,
                    interpret=interpret)
                out = jax.lax.dynamic_update_slice_in_dim(out, ob, t0,
                                                          axis=1)
                # apron refresh: my interior boundary bands (exact) ->
                # the neighbours' aprons, for both hist and mins
                return (out, _refresh_aprons(h2, B, Rl, k, n),
                        _refresh_aprons(m2, B, Rl, k, n)), None

            init = (out,
                    jnp.full((Dk, Ml, L, Rlap), INF, jnp.float32),
                    jnp.full((Dk, Ml, Rlap), INF, jnp.float32))
            (out, _, _), _ = jax.lax.scan(
                vstep, init, jnp.arange(NBv, dtype=jnp.int32))

        y = jnp.transpose(out, (0, 3, 1, 2))       # (N, Rlap, Tp, L)
        return _local_unskew(y[:, B:B + Rl], C, 0, 0)

    def run_p_group(spaces, launches, fold_group, arrs, w_l, k, r0,
                    total):
        """Lockstep apron pipeline for the PACKED PARITY group (the
        slope-1/2 wavefronts t = 2c +- r scheduling the mgm = 4 dep
        sets of passes 2/3/5/7; lanes hold half-rows — see
        ops/pallas_fused._kernel).  Same structure as run_v_group —
        devices advance block-by-block together, aprons of B_h
        half-row lanes refresh between blocks (packed rolls move <= 1
        lane per front) — with the packed geometry: both spaces ride
        one launch per direction (multi-space planes, like the
        resident kernel), and the apron borrows 2*B_h IMAGE rows."""
        Gp = int(os.environ.get("MGM_TPU_SFUSED_GP", "32"))
        Gp = max(16, min(Gp - Gp % 16, Rl // 2))
        B_h = Gp            # apron depth in half-row lanes
        R2l = Rl // 2
        R2lap = R2l + 2 * B_h
        R2g = -(-(RPg // 2) // 128) * 128
        T = 2 * C + 2 * R2g + 8
        Tp = -(-T // (2 * Gp)) * (2 * Gp)
        NBp = Tp // Gp
        GH = Gp // 2
        SLABW = -(-(GH + L - 1) // 8) * 8
        A0 = {"PA": 0, "PB": R2g - 1}
        SS = {"PA": -1, "PB": 1}
        PARF = {"PA": 0, "PB": 1}
        rho0 = (r0 - 2 * B_h) // 2  # global half-row of local lane 0

        le, ri, lo_a, hi_a = arrs
        fill_img = jnp.asarray(ifill, le.dtype)
        le = _extend_rows(le, fill_img, -3, 2 * B_h, k, n)
        ri = _extend_rows(ri, fill_img, -3, 2 * B_h, k, n)
        if per_pixel:
            lo_a = _extend_rows(lo_a, 0, -2, 2 * B_h, k, n)
            hi_a = _extend_rows(hi_a, L - 1, -2, 2 * B_h, k, n)
        w_ap = (_extend_rows(w_l, 1.0, -3, 2 * B_h, k, n) if use_weights
                else w_l)

        # plane order mirrors ops/fused._run_group: spaces-major,
        # sides within a space
        plane_ix = {}
        plane_specs = []
        u_sk, v_sk, lo_sk, hi_sk = [], [], [], []
        for space in spaces:
            for ni, (gmin, lo, hi) in enumerate(sides):
                plane_ix[(ni, space)] = len(plane_specs)
                fold = (fold_group and space == spaces[0])
                plane_specs.append((gmin, lo, hi, A0[space], SS[space],
                                    fold, PARF[space]))
                u_c = jnp.moveaxis(le[ni], -1, 0)  # (Cch, rows, W)
                v_c = jnp.moveaxis(ri[ni], -1, 0)
                u_sk.append(_local_skew_packed(u_c, space, Tp, ifill,
                                               rho0, R2lap, R2g))
                v_sh = _col_window(v_c, gmin, Tp // 2 + SLABW, ifill)
                v_sk.append(_local_ring_packed(v_sh, space,
                                               Tp // 2 + SLABW, ifill,
                                               rho0, R2lap, R2g))
                if per_pixel:
                    lo_sk.append(_local_skew_packed(
                        lo_a[ni], space, Tp, 0, rho0, R2lap, R2g))
                    hi_sk.append(_local_skew_packed(
                        hi_a[ni], space, Tp, L - 1, rho0, R2lap, R2g))
        U = jnp.swapaxes(jnp.stack(u_sk), -1, -2)  # (Mp, Cch, Tp, R2lap)
        Ve = jnp.swapaxes(jnp.stack([p[0] for p in v_sk]), -1, -2)
        Vo = jnp.swapaxes(jnp.stack([p[1] for p in v_sk]), -1, -2)
        LOs = (jnp.swapaxes(jnp.stack(lo_sk), -1, -2) if per_pixel
               else None)
        HIs = (jnp.swapaxes(jnp.stack(hi_sk), -1, -2) if per_pixel
               else None)
        Mp = len(plane_specs)
        outs = [jnp.zeros((Mp, Tp // 2, L, R2lap), jnp.float32)] * 2

        for d, passes in launches:
            for pid, space, ranks, border in passes:
                assert border[2] and border[3], \
                    "parity passes must mask both row borders"
            combos, mspecs, w_sk = [], [], []
            for pid, space, ranks, border in passes:
                for c in ranks:
                    ck = c + (PARF[space],)
                    if ck not in combos:
                        combos.append(ck)
            for pid, space, ranks, border in passes:
                cks = [c + (PARF[space],) for c in ranks]
                for ni in range(N):
                    mspecs.append((plane_ix[(ni, space)],
                                   tuple(combos.index(ck) for ck in cks),
                                   border))
                    if use_weights:
                        wch = PASS_TABLE[pid].wch
                        planes_w = []
                        for ck in combos:
                            if ck in cks:
                                wp = w_ap[ni, :, :, wch[cks.index(ck)]]
                            else:
                                wp = jnp.ones((Rl + 4 * B_h, W),
                                              jnp.float32)
                            planes_w.append(_local_skew_packed(
                                wp, space, Tp, 1.0, rho0, R2lap, R2g))
                        w_sk.append(jnp.stack(planes_w))
            Wk = (jnp.swapaxes(jnp.stack(w_sk), -1, -2) if use_weights
                  else None)
            reverse = d == "bwd"
            accumulate = d == "bwd"
            Ml = len(mspecs)
            Dk = max(c[0] for c in combos)

            def pstep(carry, blk, Wk=Wk, combos=tuple(combos),
                      mspecs=tuple(mspecs), reverse=reverse,
                      accumulate=accumulate, Ml=Ml):
                oute, outo, hist, mins = carry
                beff = (NBp - 1 - blk) if reverse else blk
                t0 = beff * Gp
                th0 = t0 // 2
                scal = jnp.stack([t0, jnp.asarray(rho0)]) \
                    .astype(jnp.int32)
                U_blk = jax.lax.dynamic_slice_in_dim(U, t0, Gp, axis=2)
                ve = jax.lax.dynamic_slice_in_dim(Ve, th0, SLABW, axis=2)
                vo = jax.lax.dynamic_slice_in_dim(Vo, th0, SLABW, axis=2)
                W_blk = (jax.lax.dynamic_slice_in_dim(Wk, t0, Gp, axis=2)
                         if use_weights else None)
                lo_blk = (jax.lax.dynamic_slice_in_dim(LOs, t0, Gp,
                                                       axis=1)
                          if per_pixel else None)
                hi_blk = (jax.lax.dynamic_slice_in_dim(HIs, t0, Gp,
                                                       axis=1)
                          if per_pixel else None)
                acc = None
                if accumulate:
                    acc = (jax.lax.dynamic_slice_in_dim(oute, th0, GH,
                                                        axis=1),
                           jax.lax.dynamic_slice_in_dim(outo, th0, GH,
                                                        axis=1))
                ob, h2, m2, _ = pf.fused_block(
                    scal, U_blk, (ve, vo), W_blk, lo_blk, hi_blk, hist,
                    mins, None, acc,
                    planes=tuple(plane_specs), mspecs=mspecs,
                    combos=combos, C=C, R_eff=h_real, L=L, G=Gp, slope=1,
                    p1=p1, p2=p2, mgm=mgm, mode=mode, nch=nch, tmax=tmax,
                    use_fh=use_fh, use_weights=use_weights, kappa=kappa,
                    reverse=reverse, per_pixel=per_pixel,
                    fh_restrict=fh_restrict, ship_lane=0, inject_lane=0,
                    RPg=RPg, parity=True, interpret=interpret)
                oute = jax.lax.dynamic_update_slice_in_dim(
                    oute, ob[0], th0, axis=1)
                outo = jax.lax.dynamic_update_slice_in_dim(
                    outo, ob[1], th0, axis=1)
                return (oute, outo, _refresh_aprons(h2, B_h, R2l, k, n),
                        _refresh_aprons(m2, B_h, R2l, k, n)), None

            init = (outs[0], outs[1],
                    jnp.full((Dk, Ml, L, R2lap), INF, jnp.float32),
                    jnp.full((Dk, Ml, R2lap), INF, jnp.float32))
            (oe, oo, _, _), _ = jax.lax.scan(
                pstep, init, jnp.arange(NBp, dtype=jnp.int32))
            outs = [oe, oo]

        # local unskew per space, folded one space at a time onto the
        # caller's running total (resident space-sum order)
        for si, space in enumerate(spaces):
            pair = tuple(
                jnp.transpose(o[si * N:(si + 1) * N], (0, 3, 1, 2))
                for o in outs)                     # (N, R2lap, Th, L)
            vol = _local_unskew_packed(pair, C, space, rho0, R2lap,
                                       R2g, B_h, Rl)
            total = vol if total is None else total + vol
        return total

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, AXIS, None, None), P(None, AXIS, None, None),
                  P(None, AXIS, None, None), P(None, AXIS, None),
                  P(None, AXIS, None)),
        out_specs=P(None, AXIS, None, None),
        check_rep=False)
    sh = lambda *spec: NamedSharding(mesh, P(*spec))
    lefts = jax.lax.with_sharding_constraint(lefts, sh(None, AXIS))
    rights = jax.lax.with_sharding_constraint(rights, sh(None, AXIS))
    return fn(lefts, rights, w_dummy, lo_d, hi_d)
