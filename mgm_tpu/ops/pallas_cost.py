"""Pallas TPU kernel for dense cost-volume construction.

Grid over labels: step l computes the (H, W) cost slab for disparity
gmin + l from the left image and a column-shifted slice of the
edge-padded right image, entirely in VMEM (both images fit comfortably;
the shift is a dynamic slice, never a gather - TPU gathers are
pathologically slow and the XLA alternatives compile poorly on this
toolchain).  Channel-major (C, H, W) layout keeps the big (H, W) dims
in the tiled positions.

Implements the pointwise cost families of mgm_costvolume.h:19-133 of
gfacciol/mgm: ad, sd, census (popcount of XOR'd packed codes, x 1/nw),
Birchfield-Tomasi ad/sd (precomputed 3-tap min/max passed as extra
channels).  NCC keeps an XLA path (it needs box filters per label).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT = 100 * 1024 * 1024


LB = 8  # labels per grid step (amortises per-step overhead)


def _kernel(u_ref, v_ref, out_ref, *, mode, C, W, left, gmin):
    l0 = pl.program_id(0) * LB
    for dl in range(LB):
        start = left + gmin + l0 + dl
        sh = v_ref[pl.ds(start, W)]              # (W, Ck, H)
        acc = None
        if mode in ("ad", "sd"):
            for c in range(C):
                d = jnp.abs(u_ref[:, c, :] - sh[:, c, :])
                if mode == "sd":
                    d = d * d
                acc = d if acc is None else acc + d
        elif mode == "census":
            for c in range(C):  # C = number of packed words here
                x = u_ref[:, c, :] ^ sh[:, c, :]
                p = jax.lax.population_count(x)
                acc = p if acc is None else acc + p
            # Mosaic lacks a direct uint32->f32 cast; popcounts fit int32
            acc = acc.astype(jnp.int32).astype(jnp.float32) * (1.0 / C)
        elif mode in ("btad", "btsd"):
            # channel blocks: [I, Imin, Imax] for each side
            for c in range(C):
                IL = u_ref[:, c, :]
                uminc = u_ref[:, C + c, :]
                umaxc = u_ref[:, 2 * C + c, :]
                IR = sh[:, c, :]
                vminc = sh[:, C + c, :]
                vmaxc = sh[:, 2 * C + c, :]
                zero = 0.0
                dLR = jnp.maximum(zero, jnp.maximum(IL - vmaxc, vminc - IL))
                dRL = jnp.maximum(zero, jnp.maximum(IR - umaxc, uminc - IR))
                bt = jnp.abs(jnp.minimum(dLR, dRL))
                if mode == "btsd":
                    bt = bt * bt
                acc = bt if acc is None else acc + bt
        else:
            raise ValueError(mode)
        out_ref[dl] = acc


def _vmem_bytes(W, Wp, Ck, HB):
    """Working-set estimate for one grid step: both image slabs resident
    (fetched once, constant index map) + double-buffered output blocks
    + headroom for the kernel's live intermediates."""
    ckp = -(-Ck // 8) * 8
    hp = -(-HB // 128) * 128
    imgs = (W + Wp) * ckp * hp * 4
    outs = 2 * LB * (-(-W // 8) * 8) * hp * 4
    return imgs + outs + 4 * LB * hp * 8 * 4


def pointwise_volume(u_t, v_pad_t, *, mode: str, C: int, W: int, L: int,
                     left: int, gmin: int, interpret=False):
    """u_t: (W, Ck, H) column-major left image; v_pad_t: (Wp, Ck, H)
    edge-padded right image (the label shift is a dynamic slice of the
    untiled leading axis).  Returns (L, W, H) float32 raw costs.

    Large images are chunked over rows (a second grid axis) so the
    VMEM working set stays under budget at any image size."""
    W_, Ck, H = u_t.shape
    Lp = -(-L // LB) * LB
    # pad the shift range so the padded labels stay in bounds
    v_pad_t = jnp.pad(v_pad_t, [(0, Lp - L), (0, 0), (0, 0)], mode="edge")
    Wp = v_pad_t.shape[0]
    # shrink the row chunk until the working set fits the VMEM budget
    HB = -(-H // 128) * 128
    while HB > 128 and _vmem_bytes(W, Wp, Ck, HB) > VMEM_LIMIT:
        HB -= 128
    Hp = -(-H // HB) * HB
    if Hp != H:
        u_t = jnp.pad(u_t, [(0, 0), (0, 0), (0, Hp - H)])
        v_pad_t = jnp.pad(v_pad_t, [(0, 0), (0, 0), (0, Hp - H)])
    kernel = functools.partial(_kernel, mode=mode, C=C, W=W, left=left,
                               gmin=gmin)
    out = pl.pallas_call(
        kernel,
        grid=(Lp // LB, Hp // HB),
        in_specs=[
            pl.BlockSpec((W, Ck, HB), lambda l, h: (0, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, Ck, HB), lambda l, h: (0, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LB, W, HB), lambda l, h: (l, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Lp, W, Hp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=Lp * H * W * C * 4,
            bytes_accessed=(2 * Ck * H * W + Lp * H * W) * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(u_t, v_pad_t)
    return out[:L, :, :H]
