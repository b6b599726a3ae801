"""Fused Pallas TPU kernels for bulk Fr field ops (NTT butterflies,
elementwise products, Montgomery codecs).

Same limb-list discipline as pallas_curve.py: (16, rows, 256) blocks,
limbs as (8, 256) tiles, scalar-literal constants.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import pallas_interpret, use_pallas
from .limbs import FR_SPEC
from .ll import LL_FR

L = FR_SPEC.L
LANES = 256
ROWS = 8
BLOCK = LANES * ROWS


def _bfly_kernel(lo_ref, hi_ref, tw_ref, olo_ref, ohi_ref):
    lo = LL_FR.split(lo_ref[...])
    hi = LL_FR.split(hi_ref[...])
    tw = LL_FR.split(tw_ref[...])
    t = LL_FR.mont_mul(hi, tw)
    olo_ref[...] = LL_FR.join(LL_FR.add(lo, t))
    ohi_ref[...] = LL_FR.join(LL_FR.sub(lo, t))


def _mul_kernel(a_ref, b_ref, o_ref):
    a = LL_FR.split(a_ref[...])
    b = LL_FR.split(b_ref[...])
    o_ref[...] = LL_FR.join(LL_FR.mont_mul(a, b))


def _sqr_kernel(a_ref, o_ref):
    a = LL_FR.split(a_ref[...])
    o_ref[...] = LL_FR.join(LL_FR.mont_sqr(a))


def _spec():
    return pl.BlockSpec((L, ROWS, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


@lru_cache(maxsize=None)
def _bfly_call(rows_total: int):
    spec = _spec()
    return jax.jit(pl.pallas_call(
        _bfly_kernel,
        grid=(pl.cdiv(rows_total, ROWS),),
        in_specs=[spec] * 3,
        out_specs=(spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, rows_total, LANES), jnp.uint32)
            for _ in range(2)),
        interpret=pallas_interpret(),
    ))


@lru_cache(maxsize=None)
def _mul_call(rows_total: int):
    spec = _spec()
    return jax.jit(pl.pallas_call(
        _mul_kernel,
        grid=(pl.cdiv(rows_total, ROWS),),
        in_specs=[spec] * 2,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, rows_total, LANES), jnp.uint32),
        interpret=pallas_interpret(),
    ))


@lru_cache(maxsize=None)
def _sqr_call(rows_total: int):
    spec = _spec()
    return jax.jit(pl.pallas_call(
        _sqr_kernel,
        grid=(pl.cdiv(rows_total, ROWS),),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, rows_total, LANES), jnp.uint32),
        interpret=pallas_interpret(),
    ))


def _blockify(a, n):
    pad = (-n) % LANES
    a = a.reshape(L, n)
    if pad:
        a = jnp.concatenate([a, jnp.zeros((L, pad), jnp.uint32)], axis=1)
    return a.reshape(L, -1, LANES)


def _deblockify(a, shape, n):
    return a.reshape(L, -1)[:, :n].reshape(shape)


def fr_butterfly(lo, hi, tw):
    """(lo + tw*hi, lo - tw*hi) on equal-shaped (16, ...) Fr batches."""
    shape = lo.shape
    n = int(np.prod(shape[1:]))
    if not use_pallas() or n < LANES:
        from .field_jax import FR
        t = FR.mont_mul(hi, tw)
        return FR.add(lo, t), FR.sub(lo, t)
    lo_b = _blockify(lo, n)
    hi_b = _blockify(hi, n)
    tw_b = _blockify(jnp.broadcast_to(tw, shape), n)
    olo, ohi = _bfly_call(lo_b.shape[1])(lo_b, hi_b, tw_b)
    return _deblockify(olo, shape, n), _deblockify(ohi, shape, n)


def fr_mul(a, b):
    """Elementwise Montgomery product on (16, ...) Fr batches."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    n = int(np.prod(shape[1:]))
    if not use_pallas() or n < LANES:
        from .field_jax import FR
        return FR.mont_mul(a, b)
    a_b = _blockify(jnp.broadcast_to(a, shape), n)
    b_b = _blockify(jnp.broadcast_to(b, shape), n)
    return _deblockify(_mul_call(a_b.shape[1])(a_b, b_b), shape, n)


def fr_sqr(a):
    shape = a.shape
    n = int(np.prod(shape[1:]))
    if not use_pallas() or n < LANES:
        from .field_jax import FR
        return FR.mont_mul(a, a)
    a_b = _blockify(a, n)
    return _deblockify(_sqr_call(a_b.shape[1])(a_b), shape, n)
