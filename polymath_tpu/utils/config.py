"""Global device-path configuration."""

from __future__ import annotations

import os
from functools import lru_cache


@lru_cache(maxsize=1)
def on_tpu() -> bool:
    try:
        import jax
        return any(d.platform in ("tpu", "axon") for d in jax.devices())
    except Exception:
        return False


@lru_cache(maxsize=1)
def use_pallas() -> bool:
    """Fused Pallas point kernels: on TPU by default; force with env."""
    env = os.environ.get("POLYMATH_PALLAS", "")
    if env in ("0", "off", "false"):
        return False
    if env in ("1", "on", "true"):
        return True
    return on_tpu()


def pallas_interpret() -> bool:
    """Interpret mode (CPU testing of the Pallas path)."""
    return not on_tpu()
