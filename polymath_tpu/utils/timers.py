"""Phase-scoped wall-clock timers (ark-std start_timer!/end_timer! analogue).

The reference wraps every generator/prover phase in `ark_std` timers that
print only when the `print-trace` Cargo feature is on
(/root/reference/src/generator.rs:28-148, prover.rs:32-61,
Cargo.toml:51).  Same contract here: no-ops unless the env var
POLYMATH_TRACE is set (to any non-empty value other than 0/off/false).

On TPU the same scope also opens a ``jax.profiler.TraceAnnotation`` so the
phases show up as named spans in captured profiler traces (SURVEY.md §5).

Usage::

    with phase("prover::ntt u,w"):
        ...

Nested phases indent like the reference's timer output.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
import sys
import time

# contextvar (not a module global) so interleaved phases from threads or
# async host callbacks keep correct per-context indentation.
_DEPTH = contextvars.ContextVar("polymath_phase_depth", default=0)


def trace_enabled() -> bool:
    return os.environ.get("POLYMATH_TRACE", "") not in ("", "0", "off",
                                                        "false")


def sync(x):
    """Block on async JAX dispatch when tracing, so phase() scopes measure
    device execution like the reference's synchronous ark-std timers
    (otherwise stage time is attributed to the next blocking op).  Returns
    its argument; a no-op when tracing is off.  Uses a tiny D2H pull —
    block_until_ready does not actually wait through the remote-TPU
    tunnel (see utils.config.device_sync)."""
    if trace_enabled():
        try:
            from .config import device_sync
            device_sync(x)
        except Exception:
            pass
    return x


@contextlib.contextmanager
def phase(label: str):
    if not trace_enabled():
        yield
        return
    try:
        import jax
        ann = jax.profiler.TraceAnnotation(label)
    except Exception:
        ann = contextlib.nullcontext()
    depth = _DEPTH.get()
    indent = "  " * depth
    print(f"{indent}Start: {label}", file=sys.stderr)
    tok = _DEPTH.set(depth + 1)
    t0 = time.time()
    try:
        with ann:
            yield
    finally:
        _DEPTH.reset(tok)
        dt = time.time() - t0
        human = f"{dt*1e3:.3f}ms" if dt < 1 else f"{dt:.3f}s"
        print(f"{indent}End:   {label} {human}", file=sys.stderr)
