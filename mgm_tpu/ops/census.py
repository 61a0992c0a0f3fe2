"""Census transform as bit-packed uint32 words.

The reference packs per-pixel `center < neighbour` bits into bytes and
re-interprets groups of 4 bytes as floats (census_tools.cc:38-99); the
census *distance* is then the Hamming distance of the packed words
divided by the number of words (mgm_costvolume.h:65-78).  Since only the
total popcount of the XOR matters, any fixed bit->word assignment is
equivalent; we pack bits in the same (channel, dy, dx) enumeration order
into ceil(nbits/32) uint32 lanes, which yields exactly the reference's
word count (nbits is always a multiple of 8 for odd windows).
"""
from __future__ import annotations

import jax.numpy as jnp

from .common import shift_fill


def census_words(nch: int, winradius: int) -> int:
    side = 2 * winradius + 1
    nbits = nch * (side * side - 1)
    return (nbits + 31) // 32


def census_transform(img: jnp.ndarray, winradius: int) -> jnp.ndarray:
    """(H, W, C) float -> (H, W, nwords) uint32 census codes.

    Out-of-image neighbours compare as NaN, and `a < NaN` is false
    (census_tools.cc:29-53), so those bits are 0.
    """
    H, W, C = img.shape
    nwords = census_words(C, winradius)
    words = [jnp.zeros((H, W), jnp.uint32) for _ in range(nwords)]
    k = 0
    for l in range(C):
        center = img[:, :, l]
        for j in range(-winradius, winradius + 1):
            for i in range(-winradius, winradius + 1):
                if i == 0 and j == 0:
                    continue
                # neighbour value; out-of-image -> NaN -> bit 0
                nb = shift_fill(shift_fill(center, -j, 0, jnp.nan), -i, 1, jnp.nan)
                bit = (center < nb).astype(jnp.uint32)
                words[k // 32] = words[k // 32] | (bit << jnp.uint32(k % 32))
                k += 1
    return jnp.stack(words, axis=-1)
