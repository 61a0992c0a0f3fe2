"""Adaptive P1/P2 edge weights (mgm_weights.h:26-85).

8 channels in neighbour order W, E, S, N, NW, NE, SE, SW; weight = aP
where the mean squared channel intensity difference to that neighbour is
< thresh^2, else 1; out-of-image neighbours get 1.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import shift_fill

# (dx, dy) per channel, mgm_weights.h:69
SCANS = ((-1, 0), (1, 0), (0, 1), (0, -1), (-1, -1), (1, -1), (1, 1), (-1, 1))


@partial(jax.jit, static_argnames=())
def compute_weights(img, a_p, thresh):
    """img: (H, W, C) -> (H, W, 8) float32."""
    H, W, C = img.shape
    planes = []
    for dx, dy in SCANS:
        nb = shift_fill(shift_fill(img, -dy, 0, jnp.nan), -dx, 1, jnp.nan)
        diff = img - nb
        delta = jnp.sum(diff * diff, axis=-1) / jnp.float32(C)
        inside = ~jnp.isnan(delta)
        w = jnp.where(jnp.abs(delta) < thresh * thresh, a_p, 1.0)
        planes.append(jnp.where(inside, w, 1.0))
    return jnp.stack(planes, axis=-1).astype(jnp.float32)
