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
#
# CPU-only runs (JAX_PLATFORMS=cpu: the test suite, the driver's
# multichip dryrun) get NO persistent cache: XLA:CPU AOT executable
# (de)serialization is unreliable on this jaxlib build — observed
# SIGSEGV inside serialize-at-cache-write, SIGSEGV inside
# deserialize-at-cache-read, and "Compile machine features ... not
# supported on the host ... could lead to execution errors such as
# SIGILL" warnings on every load (the VM's advertised and actual ISA
# feature sets disagree).  In-process jit caching still applies; only
# cross-run persistence is off.  TPU-attached runs keep the shared
# directory — their entries are device programs and the expensive
# remote-service compiles must stay warm.
_CPU_ONLY = _os.environ.get("JAX_PLATFORMS", "") == "cpu"
if not _CPU_ONLY:
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                           _os.path.expanduser("~/.cache/mgm_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def _configure_compilation_cache():
    """jax may already be imported when this package loads (some
    environments preload it from sitecustomize), in which case the env
    vars above were read too late — set the config values directly."""
    import jax

    if _CPU_ONLY:
        jax.config.update("jax_enable_compilation_cache", False)
    elif jax.config.jax_compilation_cache_dir is None:
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


def _atomic_cache_writes():
    """jax's persistent-cache writes are a bare `write_bytes`
    (jax._src.lru_cache.LRUCache.put): a process killed mid-write —
    `timeout`-bounded runs are routine on this toolchain — leaves a
    TRUNCATED entry, and XLA's executable deserializer SEGFAULTS on it
    at the next read, bricking every later run that hits the key
    (observed twice on this image).  Route the write through a temp
    file + os.replace (atomic within the cache directory)."""
    try:
        import os
        import time

        from jax._src import lru_cache as _lru

        csuf, asuf = _lru._CACHE_SUFFIX, _lru._ATIME_SUFFIX
        assert isinstance(csuf, str) and isinstance(asuf, str)
        assert hasattr(_lru.LRUCache, "_evict_if_needed")
        import jax

        assert tuple(int(x) for x in jax.__version__.split(".")[:2]) < (0, 10)

        def put(self, key: str, val: bytes) -> None:
            if not key:
                raise ValueError("key cannot be empty")
            if self.eviction_enabled and len(val) > self.max_size:
                return
            cache_path = self.path / f"{key}{csuf}"
            if self.eviction_enabled:
                self.lock.acquire(timeout=self.lock_timeout_secs)
            try:
                if cache_path.exists():
                    return
                self._evict_if_needed(additional_size=len(val))
                tmp = self.path / f"{key}.{os.getpid()}.tmp"
                tmp.write_bytes(val)
                os.replace(tmp, cache_path)
                if self.eviction_enabled:
                    ts = time.time_ns().to_bytes(8, "little")
                    (self.path / f"{key}{asuf}").write_bytes(ts)
            finally:
                if self.eviction_enabled:
                    self.lock.release()

        _lru.LRUCache.put = put
    except Exception:  # pragma: no cover - jax internals moved
        pass


_atomic_cache_writes()


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
