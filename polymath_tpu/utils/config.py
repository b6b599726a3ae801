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


def device_sync(x):
    """Force execution of everything queued up to (and including) x.

    PJRT allocates program OUTPUT buffers at async dispatch time, so a
    python loop that queues dozens of chunk programs pre-allocates all
    their outputs at once and OOMs HBM long before execution frees
    anything (observed: 2^20-constraint setup queues ~96 fixed-base
    chunks = ~21 GB of pending outputs on a 16 GB chip).  Throttle such
    loops with this call.  NB: jax.block_until_ready is NOT sufficient
    through the remote-TPU tunnel — only a (tiny) D2H pull is.
    """
    import numpy as np
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    try:
        np.asarray(leaf.reshape(-1)[:1])
    except Exception:
        jax.block_until_ready(leaf)
    return x
