"""mgm_tpu: a TPU-native MGM (More Global Matching) stereo / MRF engine.

A from-scratch JAX/XLA implementation with the full capability surface
of the reference gfacciol/mgm C++ program: cost volumes (ad, sd, census,
ncc, btad, btsd), prefilters (census, sobelx, gblur), the MGM
multi-neighbour scanline recursion over 1..8 directions with SGM or
truncated-linear potentials and adaptive edge weights, subpixel
refinement, median / left-right-consistency post-processing, and a
generic grid-MRF solver API.
"""
import os as _os

# persistent compilation cache: the TPU toolchain's compile times are
# high-variance (remote compile service); caching makes every config
# compile at most once per machine.  Override with JAX_COMPILATION_CACHE_DIR.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/mgm_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

from .config import MGMConfig
from .stereo import compute_disparity
from .mrf import solve_mrf

__version__ = "0.1.0"
__all__ = ["MGMConfig", "compute_disparity", "solve_mrf"]
