"""Device (JAX/XLA/Pallas) compute substrate.

Importing this package enables the persistent XLA compilation cache: the
prover's kernels (MSM chunk programs, NTT stages, fixed-base tables) are
heavyweight compiles (minutes) but fully shape-stable, so they amortize to
zero across processes.
"""

import os


def _enable_compile_cache():
    try:
        import jax
        cache_dir = os.environ.get(
            "POLYMATH_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "polymath_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 0.0: cache everything — this host's XLA:CPU compiles of even tiny
        # limb-math programs run multiple seconds, and the threshold was
        # observed to skip multi-minute modules.  Honour explicit env
        # overrides (JAX_PERSISTENT_CACHE_*): writing multi-100MB XLA:CPU
        # entries has segfaulted inside the serialize+compress path, and
        # raising the threshold via env is the escape hatch.
        if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
        if "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES" not in os.environ:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


_enable_compile_cache()


def backend_available() -> bool:
    try:
        import jax  # noqa: F401
        return True
    except Exception:
        return False
