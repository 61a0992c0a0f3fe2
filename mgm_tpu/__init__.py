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


def _configure_compilation_cache():
    """jax may already be imported when this package loads (some
    environments preload it from sitecustomize), in which case the env
    vars above were read too late — set the config values directly."""
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          _os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(_os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))

    # honour JAX_PLATFORMS even under a sitecustomize jax preload (the
    # env var is read at import, which already happened); a config
    # update still wins as long as no backend has been initialised
    plat = _os.environ.get("JAX_PLATFORMS")
    if plat and jax.config.jax_platforms != plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # backend already initialised: leave as-is
            pass


_configure_compilation_cache()


def _enable_cache_on_experimental_platforms():
    """jax gates the persistent compile cache on a platform allowlist
    (tpu/gpu/cpu/neuron); experimental PJRT platforms (e.g. remote-attached
    TPU tunnels) are excluded even when their backend serializes
    executables fine.  Compiles there go through a remote service with
    2-40 min queueing variance, which is exactly where caching matters
    most, so opt such backends in when they support serialization."""
    try:
        import jax

        from jax._src import compilation_cache as _cc

        # feature-detect every internal the shim touches up front: if
        # any moved in a newer jax, leave the stock behaviour alone
        # (worst case: no persistent cache on experimental platforms).
        # Verified against the pinned jax in this image (0.8.x); the
        # version guard cuts the shim off before internals can drift far.
        _orig = _cc.is_cache_used
        _enabled = _cc._is_cache_enabled
        _mutex = _cc._cache_initialized_mutex
        assert hasattr(_mutex, "__enter__")
        assert hasattr(_cc, "_cache_checked") and hasattr(_cc, "_cache_used")
        assert tuple(int(x) for x in jax.__version__.split(".")[:2]) < (0, 10)

        def _is_cache_used(backend):
            if (_enabled()
                    and getattr(backend, "supports_executable_serialization",
                                True)):
                with _mutex:
                    _cc._cache_checked = True
                    _cc._cache_used = True
                return True
            return _orig(backend)

        _cc.is_cache_used = _is_cache_used
    except Exception:  # pragma: no cover - jax internals moved; fall back
        pass


_enable_cache_on_experimental_platforms()

from .config import MGMConfig
from .stereo import compute_disparity, compute_disparity_batch
from .mrf import solve_mrf
from .runner import tiled_disparity

__version__ = "0.3.0"
__all__ = ["MGMConfig", "compute_disparity", "compute_disparity_batch",
           "solve_mrf", "tiled_disparity"]
