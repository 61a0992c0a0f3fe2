"""Dense cost-volume construction.

Implements the builder semantics of mgm_costvolume.h:337-424 on dense
(H, W, L) float32 volumes over the global label axis:
  - label index l corresponds to disparity d = gmin + l
  - q outside the target image => cost = trunc_dist * nch
  - all costs truncated at trunc_dist * nch
  - +inf outside each pixel's [lo, hi] label window (Dvec semantics)
  - pixels whose whole window is non-finite are reset to 0
Cost functions (mgm_costvolume.h:19-165): ad, sd, census (on packed
codes), ncc (clipped, x64), btad, btsd.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import INF, fmin3, shift_fill


def window_mask(lo, hi, L):
    """(..., H, W) int windows -> (..., H, W, L) bool mask."""
    l_idx = jnp.arange(L, dtype=jnp.int32)
    return (l_idx >= lo[..., None]) & (l_idx <= hi[..., None])


def _gather_cols(a, qx):
    """a: (H, W, C); qx: (W, L) int -> (H, W, L, C) = a[:, qx, :]."""
    return a[:, jnp.clip(qx, 0, a.shape[1] - 1), :]


def _bt_aux(a):
    """Per-channel 3-tap min/max of half-sample shifts (BTAD,
    mgm_costvolume.h:82-110)."""
    H, W, C = a.shape
    x = jnp.arange(W)[None, :, None]
    ap = jnp.where(x < W - 1, (a + shift_fill(a, -1, 1, 0.0)) * 0.5, a)
    am = jnp.where(x >= 1, (a + shift_fill(a, 1, 1, 0.0)) * 0.5, a)
    amin = fmin3(am, ap, a)
    amax = -fmin3(-am, -ap, -a)
    return amin, amax


def _box(a, hw):
    """Separable windowed sum over (2hw+1)^2, zero outside image."""
    out = a
    for axis in (0, 1):
        acc = out
        for s in range(1, hw + 1):
            acc = acc + shift_fill(out, s, axis, 0.0) + shift_fill(out, -s, axis, 0.0)
        out = acc
    return out


def pointwise_costs(u, v, qx, distance: str, ncc_win: int):
    """Raw per-(pixel,label) matching costs, before truncation/masking.

    u, v: (H, W, C) preprocessed images (uint32 census codes for
    'census').  qx: (W, L) target column per (x, l).  Returns (H, W, L).
    """
    if distance == "census":
        cu = u[:, :, None, :]                       # (H, W, 1, nw)
        cv = _gather_cols(v, qx)                    # (H, W, L, nw)
        ham = jnp.sum(jax.lax.population_count(cu ^ cv), axis=-1)
        return ham.astype(jnp.float32) * jnp.float32(1.0 / u.shape[2])

    if distance in ("ad", "sd"):
        diff = jnp.abs(u[:, :, None, :] - _gather_cols(v, qx))
        if distance == "sd":
            diff = diff * diff
        return jnp.sum(diff, axis=-1)

    if distance in ("btad", "btsd"):
        umin, umax = _bt_aux(u)
        vmin, vmax = _bt_aux(v)
        IL = u[:, :, None, :]
        IR = _gather_cols(v, qx)
        vmin_g, vmax_g = _gather_cols(vmin, qx), _gather_cols(vmax, qx)
        umin_b, umax_b = umin[:, :, None, :], umax[:, :, None, :]
        zero = jnp.float32(0)
        dLR = -fmin3(zero, -(IL - vmax_g), -(vmin_g - IL))
        dRL = -fmin3(zero, -(IR - umax_b), -(umin_b - IR))
        bt = jnp.abs(jnp.minimum(dLR, dRL))
        if distance == "btsd":
            bt = bt * bt
        return jnp.sum(bt, axis=-1)

    if distance == "ncc":
        return _ncc_costs(u, v, qx, ncc_win)

    raise ValueError(f"unknown distance {distance}")


def _ncc_costs(u, v, qx, win):
    """Clipped NCC x64 (mgm_costvolume.h:137-165); windows touching the
    image border are +inf (valnan semantics)."""
    H, W, C = u.shape
    hw = win // 2
    n = jnp.float32((2 * hw + 1) ** 2)
    x = jnp.arange(W)
    p_ok = (x >= hw) & (x < W - hw)
    if H <= 2 * hw:
        return jnp.full((H, W, qx.shape[1]), INF, jnp.float32)
    y_ok = (jnp.arange(H) >= hw) & (jnp.arange(H) < H - hw)
    mu1 = _box(u, hw) / n
    s1 = _box(u * u, hw) / n
    mu2 = _box(v, hw) / n
    s2 = _box(v * v, hw) / n
    var1 = s1 - mu1 * mu1

    def per_label(qx_col):
        # qx_col: (W,) target columns for this label
        q_ok = (qx_col >= hw) & (qx_col < W - hw)
        vg = v[:, jnp.clip(qx_col, 0, W - 1), :]
        mu2g = mu2[:, jnp.clip(qx_col, 0, W - 1), :]
        s2g = s2[:, jnp.clip(qx_col, 0, W - 1), :]
        prod = _box(u * vg, hw) / n
        denom = jnp.sqrt(jnp.maximum(jnp.float32(1e-7),
                                     var1 * (s2g - mu2g * mu2g)))
        ncc = jnp.sum((prod - mu1 * mu2g) / denom, axis=-1)
        clipped = (C - jnp.clip(ncc, 0.0, float(C))) * jnp.float32(64)
        ok = p_ok[None, :] & q_ok[None, :] & y_ok[:, None]
        return jnp.where(ok, clipped, INF)

    costs = jax.lax.map(per_label, qx.T)  # (L, H, W)
    return jnp.moveaxis(costs, 0, -1)


@partial(jax.jit, static_argnames=("distance", "L", "trunc_dist", "ncc_win"))
def build_cost_volume(u, v, lo, hi, gmin, *, distance: str, L: int,
                      trunc_dist: float, ncc_win: int = 3):
    """Dense (H, W, L) cost volume.

    u, v: preprocessed images (H, W, C); lo/hi: (H, W) int32 label
    windows; gmin: scalar int, disparity of label 0.
    """
    H, W, C = u.shape
    tmax = jnp.float32(trunc_dist * C)
    d = gmin + jnp.arange(L, dtype=jnp.int32)          # (L,) disparities
    qx = jnp.arange(W, dtype=jnp.int32)[:, None] + d[None, :]   # (W, L)
    valid_q = (qx >= 0) & (qx < W)

    e = pointwise_costs(u, v, qx, distance, ncc_win)
    e = jnp.where(valid_q[None], e, tmax)
    e = jnp.minimum(e, tmax)

    in_win = window_mask(lo, hi, L)
    allinvalid = ~jnp.any(in_win & jnp.isfinite(e), axis=-1, keepdims=True)
    e = jnp.where(allinvalid, 0.0, e)
    return jnp.where(in_win, e, INF).astype(jnp.float32)
