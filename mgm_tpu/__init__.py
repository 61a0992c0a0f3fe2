"""mgm_tpu: a TPU-native MGM (More Global Matching) stereo / MRF engine.

A from-scratch JAX/XLA implementation with the full capability surface
of the reference gfacciol/mgm C++ program: cost volumes (ad, sd, census,
ncc, btad, btsd), prefilters (census, sobelx, gblur), the MGM
multi-neighbour scanline recursion over 1..8 directions with SGM or
truncated-linear potentials and adaptive edge weights, subpixel
refinement, median / left-right-consistency post-processing, and a
generic grid-MRF solver API.
"""
from .config import MGMConfig
from .stereo import compute_disparity
from .mrf import solve_mrf

__version__ = "0.1.0"
__all__ = ["MGMConfig", "compute_disparity", "solve_mrf"]
