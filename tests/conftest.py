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
# Writing very large XLA:CPU executables to the persistent cache
# segfaults inside the serialize+compress path (reproduced twice on the
# MiMC device-e2e d-MSM program).  Cache READS are unaffected by this
# threshold, so warm entries still load; only multi-minute compiles go
# unpersisted from test runs (polymath_tpu.ops honours this env).
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "120")
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
except ImportError:
    pass
