"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4).

NB: the axon sitecustomize registers the remote-TPU backend at interpreter
start and overrides platform selection, so env vars alone are not enough —
the jax.config updates below win as long as no backend was initialized.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# XLA:CPU AOT cache loads log a non-fatal machine-feature ERROR pair per
# entry (~3 KB each; the entries still load) — silence C++ logs in tests
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# r4 disabled cache WRITES from test runs entirely: persisting the MiMC
# device-e2e d-MSM program segfaulted inside XLA's C++
# executable.serialize() (the 2 GB protobuf ceiling on that one CPU
# executable).  r5 capped the CPU MSM chunk at 2^12 (ops/msm.py
# CPU_MAX_CHUNK), which removes that program class — every CPU program
# the suite compiles is now far below the ceiling, so writes are safe
# again and the suite warms its own cache across runs (r4 VERDICT #3:
# the blanket disable made every cold run recompile ~25 min of XLA:CPU).
# Keep a modest floor so trivial sub-second programs don't churn disk.
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    # The env var above is NOT picked up here: the axon sitecustomize
    # imports jax at interpreter start, before conftest runs, so the
    # config default was already captured.  Set it explicitly — using the
    # env value, so an explicit user override still wins.
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))
except ImportError:
    pass
