"""Fused Pallas TPU kernels for G1 Jacobian arithmetic (limb-list form).

One `pallas_call` per batched point operation.  Internals use the
limb-list engine (ll.py): each limb is an (8, C) tile, limb shifts are
Python list reindexing, constants are scalar literals — no cross-sublane
relayouts, no captured array constants, pure VPU elementwise code.

Block layout: batched points are reshaped (24, N) -> (24, N/C, C) and
blocked (24, 8, C): 8*C points per kernel instance.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import pallas_interpret
from .limbs import FQ_SPEC
from .ll import LL_FQ, ll_jac_add, ll_jac_double, ll_jac_madd

L = FQ_SPEC.L
LANES = 256
ROWS = 8
BLOCK_PTS = LANES * ROWS  # 2048 points per kernel instance


def _add_kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
    p = tuple(LL_FQ.split(r[...]) for r in (x1, y1, z1))
    q = tuple(LL_FQ.split(r[...]) for r in (x2, y2, z2))
    rx, ry, rz = ll_jac_add(p, q)
    ox[...] = LL_FQ.join(rx)
    oy[...] = LL_FQ.join(ry)
    oz[...] = LL_FQ.join(rz)


def _double_kernel(x1, y1, z1, ox, oy, oz):
    p = tuple(LL_FQ.split(r[...]) for r in (x1, y1, z1))
    rx, ry, rz = ll_jac_double(p)
    ox[...] = LL_FQ.join(rx)
    oy[...] = LL_FQ.join(ry)
    oz[...] = LL_FQ.join(rz)


def _madd_kernel(fast: bool, packed: bool = False):
    def kernel(x1, y1, z1, x2, y2, *outs):
        p = tuple(LL_FQ.split(r[...]) for r in (x1, y1, z1))
        if packed:
            leaf = tuple(LL_FQ.split_packed(r[...]) for r in (x2, y2))
        else:
            leaf = tuple(LL_FQ.split(r[...]) for r in (x2, y2))
        (rx, ry, rz), err = ll_jac_madd(p, leaf, fast=fast)
        outs[0][...] = LL_FQ.join(rx)
        outs[1][...] = LL_FQ.join(ry)
        outs[2][...] = LL_FQ.join(rz)
        if fast:
            outs[3][...] = err.astype(jnp.uint32)
    return kernel


def _specs(rows_total: int):
    spec = pl.BlockSpec((L, ROWS, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return spec


# NB: the pallas_call callables are wrapped in jax.jit so the (large,
# fully unrolled) kernel body is traced ONCE per shape and every later
# call site inside an outer trace reuses the cached jaxpr as a call —
# without this, each jac_add instance in an MSM graph re-traces ~50k
# primitives (measured: 795k trace events / ~270 s of pure tracing for
# one MSM chunk program).

@lru_cache(maxsize=None)
def _add_call(rows_total: int):
    spec = _specs(rows_total)
    return jax.jit(pl.pallas_call(
        _add_kernel,
        grid=(pl.cdiv(rows_total, ROWS),),
        in_specs=[spec] * 6,
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, rows_total, LANES), jnp.uint32)
            for _ in range(3)),
        interpret=pallas_interpret(),
    ))


@lru_cache(maxsize=None)
def _double_call(rows_total: int):
    spec = _specs(rows_total)
    return jax.jit(pl.pallas_call(
        _double_kernel,
        grid=(pl.cdiv(rows_total, ROWS),),
        in_specs=[spec] * 3,
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, rows_total, LANES), jnp.uint32)
            for _ in range(3)),
        interpret=pallas_interpret(),
    ))


@lru_cache(maxsize=None)
def _madd_call(rows_total: int, fast: bool, packed: bool = False):
    spec = _specs(rows_total)
    errspec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    leafspec = spec
    if packed:
        leafspec = pl.BlockSpec((L // 2, ROWS, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    out_specs = (spec, spec, spec) + ((errspec,) if fast else ())
    out_shape = tuple(
        jax.ShapeDtypeStruct((L, rows_total, LANES), jnp.uint32)
        for _ in range(3))
    if fast:
        out_shape += (jax.ShapeDtypeStruct((rows_total, LANES), jnp.uint32),)
    return jax.jit(pl.pallas_call(
        _madd_kernel(fast, packed),
        grid=(pl.cdiv(rows_total, ROWS),),
        in_specs=[spec] * 3 + [leafspec] * 2,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=pallas_interpret(),
    ))


def _to_blocks(p, lead: int = L):
    """(lead, ...batch) -> (lead, rows, LANES) padded; returns
    (arrays, shape, n)."""
    shape = p[0].shape
    n = int(np.prod(shape[1:]))
    pad = (-n) % LANES
    out = []
    for a in p:
        a = a.reshape(lead, n)
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((lead, pad), jnp.uint32)], axis=1)
        out.append(a.reshape(lead, -1, LANES))
    return tuple(out), shape, n


def _from_blocks(arrs, shape, n):
    return tuple(a.reshape(L, -1)[:, :n].reshape(shape) for a in arrs)


def jac_add_fused(p, q):
    """p, q: equal-shaped jacobian coord tuples (L, ...batch)."""
    pb, shape, n = _to_blocks(p)
    qb, _, _ = _to_blocks(q)
    rows_total = pb[0].shape[1]
    out = _add_call(rows_total)(*pb, *qb)
    return _from_blocks(out, shape, n)


def jac_double_fused(p):
    pb, shape, n = _to_blocks(p)
    rows_total = pb[0].shape[1]
    out = _double_call(rows_total)(*pb)
    return _from_blocks(out, shape, n)


def jac_madd_fused(p, leaf, fast: bool = False):
    """p jacobian (3 coords), leaf affine (2 coords), equal batch shapes.
    Returns ((X, Y, Z), err) with err a bool batch array when fast else
    None."""
    pb, shape, n = _to_blocks(p)
    lb, _, _ = _to_blocks(leaf)
    rows_total = pb[0].shape[1]
    out = _madd_call(rows_total, fast)(*pb, *lb)
    pt = _from_blocks(out[:3], shape, n)
    err = None
    if fast:
        e = out[3].reshape(-1)[:n].reshape(shape[1:])
        err = e != 0
    return pt, err


def jac_madd_fused_packed(p, leaf_packed, fast: bool = False):
    """Like jac_madd_fused but the affine leaves arrive 16-bit-packed:
    (L/2, ...batch) uint32 rows holding limb pairs (2k | 2k+1 << 16).
    Leaves stay packed through HBM/VMEM (half the gather and scan-leaf
    bytes of the MSM hot loop); the kernel unpacks at register level."""
    pb, shape, n = _to_blocks(p)
    lb, _, _ = _to_blocks(leaf_packed, lead=L // 2)
    rows_total = pb[0].shape[1]
    out = _madd_call(rows_total, fast, packed=True)(*pb, *lb)
    pt = _from_blocks(out[:3], shape, n)
    err = None
    if fast:
        e = out[3].reshape(-1)[:n].reshape(shape[1:])
        err = e != 0
    return pt, err
