"""Fixed-base batch scalar multiplication on device (SRS generation).

Replaces the reference generator's per-element full scalar mul
(generator.rs:169-177, ~12n scalar muls) with a shared windowed table of
the G1 generator: table build is 2^c sequential batched adds (vectorized
across windows), application is `windows` gather+add steps per element —
O(windows) group adds per SRS element instead of O(256) doublings.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath import bls12_381 as bls
from ..hostmath.bls12_381 import R
from .limbs import FR_SPEC, FQ_SPEC, ints_to_limbs
from .field_jax import FR, FQ
from .curve_jax import (
    jac_identity, jac_add, jac_double, affine_to_jac, select_point,
    points_to_device,
)

FB_C = 8                      # window width for the fixed-base table
FB_WINDOWS = 256 // FB_C      # 32 windows covers 256 bits


@lru_cache(maxsize=1)
def _g1_table():
    """(3 coords of (L, FB_WINDOWS, 2^c)) jacobian table:
    T[w][d] = d * 2^(c w) * G."""
    # window bases 2^(c w) G computed on host (cheap, 256 doublings total)
    bases = []
    cur = bls.G1.gen
    for w in range(FB_WINDOWS):
        bases.append(cur)
        for _ in range(FB_C):
            cur = bls.G1.double(cur)
    bx, by = points_to_device(bases)            # (L, W)
    bj = affine_to_jac((bx, by))

    def build(bj):
        col = jac_identity((FB_WINDOWS,))

        def step(carry, _):
            nxt = jac_add(carry, bj)
            return nxt, carry

        _, cols = jax.lax.scan(step, col, None, length=1 << FB_C)
        # cols: each coord (2^c, L, W) -> (W, L, 2^c) for scan-over-windows
        return tuple(jnp.moveaxis(a, 0, -1).transpose(1, 0, 2) for a in cols)

    return jax.jit(build)(bj)


def _digits_256(scalars, c: int, windows: int):
    return FR.window_digits(scalars, c, windows)


@lru_cache(maxsize=None)
def _apply_jit(n: int):
    def apply(table, digits):
        """table: tuple of (W, L, 2^c); digits: (W, n) -> jacobian points.
        lax.scan over windows keeps the graph to a single jac_add."""
        acc0 = jac_identity((n,))

        def body(acc, xs):
            d, tx, ty, tz = xs
            entry = (tx[:, d], ty[:, d], tz[:, d])
            return jac_add(acc, entry), None

        acc, _ = jax.lax.scan(body, acc0, (digits,) + tuple(table))
        return acc
    return jax.jit(apply)


def batch_inverse_fq(x):
    """Batch inversion of nonzero Fq elements (L, n) by Fermat.

    Compile-lean by design: ``FQ.inv`` is a lax.scan over exponent bits
    whose body holds exactly two mont_mul instances, keeping the compiled
    graph a constant size independent of n (measured cold compile+run is
    reported by kernel_metrics.py rather than claimed here).  (A
    Montgomery-trick prefix/suffix product halves
    the arithmetic but XLA unrolls associative_scan into ~2 log n distinct
    mont_mul graphs — two minutes of compile for a sub-millisecond op.
    On TPU the scan's extra multiplies are bandwidth-trivial.)
    """
    return FQ.inv(x)


def jac_to_affine_batch(p):
    """Jacobian -> affine (X, Y) via batch inversion.

    Identity entries (Z = 0) come out as (0, 0) for free: Fermat gives
    0^(p-2) = 0, so X*zinv^2 = Y*zinv^3 = 0 — exactly the affine identity
    encoding affine_to_jac expects back."""
    X, Y, Z = p
    zinv = batch_inverse_fq(Z)
    zinv2 = FQ.mont_sqr(zinv)
    return FQ.mont_mul(X, zinv2), FQ.mont_mul(Y, FQ.mont_mul(zinv2, zinv))


@lru_cache(maxsize=None)
def _to_affine_jit(n: int):
    return jax.jit(jac_to_affine_batch)


FB_CHUNK = 1 << 18


def fixed_base_mul(scalars, chunk: int = FB_CHUNK):
    """scalars: (16, N) canonical Fr limbs -> affine (X, Y) device arrays
    (24, N).  All scalars must be nonzero (SRS exponents always are)."""
    from ..utils.config import on_tpu

    table = _g1_table()
    n = scalars.shape[-1]
    if n <= chunk:
        # pad to a power of two so compiled programs are shared across SRS
        # vector sizes; pad scalars are 1 (nonzero), discarded.  Floor 4096
        # on TPU (few shared programs); 256 on CPU, where XLA compiles of
        # the scan-CIOS point graphs scale badly with width (an hour+ at
        # 4096 on a 2-core host).
        floor = 12 if on_tpu() else 8
        n_pad = 1 << max(floor, (n - 1).bit_length())
        if n_pad != n:
            one = jnp.zeros((16, n_pad - n), jnp.uint32).at[0].set(1)
            scalars = jnp.concatenate([scalars, one], axis=1)
    from ..utils.config import device_sync

    outs_x, outs_y = [], []
    total = scalars.shape[-1]
    for start in range(0, total, chunk):
        end = min(start + chunk, total)
        size = end - start
        cs = scalars[:, start:end]
        if size < chunk and total > chunk:
            pad = chunk - size
            # pad with scalar 1 (safe: nonzero, discarded after)
            one = jnp.zeros((16, pad), jnp.uint32).at[0].set(1)
            cs = jnp.concatenate([cs, one], axis=1)
        digits = _digits_256(cs, FB_C, FB_WINDOWS)
        acc = _apply_jit(cs.shape[-1])(table, digits)
        ax, ay = _to_affine_jit(cs.shape[-1])(acc)
        # throttle async dispatch: each pending chunk holds ~226 MB of
        # pre-allocated jacobian outputs (see utils.config.device_sync)
        device_sync(ay)
        outs_x.append(ax[:, :size])
        outs_y.append(ay[:, :size])
    if len(outs_x) == 1:
        return outs_x[0][:, :n], outs_y[0][:, :n]
    return (jnp.concatenate(outs_x, axis=1)[:, :n],
            jnp.concatenate(outs_y, axis=1)[:, :n])


def fixed_base_mul_ints(scalar_ints, chunk: int = FB_CHUNK):
    sc = jnp.asarray(ints_to_limbs([s % R for s in scalar_ints], FR_SPEC.L))
    return fixed_base_mul(sc, chunk)
