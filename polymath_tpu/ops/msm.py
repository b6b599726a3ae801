"""Pippenger-style variable-base G1 MSM on device.

Replaces arkworks ``VariableBaseMSM::msm_unchecked`` (reference
prover.rs:379-384, the dominant prover cost: ~12n point-scalar products per
proof across 8 MSMs, SURVEY.md §2.3).

TPU formulation — no data-dependent scatter exists on TPU, so classic
bucket accumulation is recast as sort + prefix-scan + threshold gather:

  per window w (c-bit digits):
    1. d_i = digit_w(s_i); sort points by d_i descending (argsort+gather);
    2. inclusive prefix sums PS_k of sorted points via
       ``jax.lax.associative_scan`` over the batched Jacobian add;
    3. sum_i d_i P_i = sum_{t=1}^{2^c-1} PS_{count(d >= t)} — a histogram/
       cumsum gives the counts, a gather + balanced tree-add finishes.
  window results combine by Horner: acc = 2^c acc + W_w.

Large inputs stream through fixed-size chunks (bounds scan memory and lets
XLA reuse one compiled program); per-window partial sums add across chunks.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath.bls12_381 import R
from .limbs import FR_SPEC, FQ_SPEC, ints_to_limbs
from .field_jax import FR, FQ
from .curve_jax import (
    jac_identity, jac_add, jac_double, affine_to_jac, select_point,
    points_to_device, jac_to_host, prefix_scan_jac, fold_sum_jac,
)

SCALAR_BITS = 255


def _window_params(n: int):
    """Pick window width c and count for an n-point MSM."""
    if n <= 32:
        c = 4
    else:
        c = min(16, max(4, int(np.log2(max(n, 2))) - 2))
    windows = (SCALAR_BITS + c - 1) // c
    return c, windows


def _digits(scalars, c: int, windows: int):
    """scalars: (16, N) canonical Fr limbs -> (windows, N) int32 digits."""
    return FR.window_digits(scalars, c, windows)


def _msm_chunk(xs, ys, scalars, c: int, windows: int):
    """One chunk: returns jacobian partial sums with trailing axis
    length `windows`.  All windows are processed as one batched axis
    (shape (L, W, n)) so the graph holds a single set of point-add
    instances regardless of window count."""
    n = xs.shape[-1]
    digits = _digits(scalars, c, windows)            # (W, n)
    order = jnp.argsort(-digits, axis=-1)            # descending per window
    d_sorted = jnp.take_along_axis(digits, order, axis=-1)
    px = xs[:, order]                                # (L, W, n)
    py = ys[:, order]
    pj = affine_to_jac((px, py))
    # digit-0 points contribute nothing; mask to identity (also covers
    # padded garbage entries)
    live = d_sorted > 0
    pj = select_point(live, pj, jac_identity((windows, n)))
    ps = prefix_scan_jac(pj)
    # per-window counts of digits >= t for t = 1..2^c-1
    flat = (d_sorted + (jnp.arange(windows, dtype=jnp.int32)[:, None] << c))
    hist = jnp.bincount(flat.reshape(-1), length=windows << c)
    hist = hist.reshape(windows, 1 << c)
    cnt = (n - jnp.cumsum(hist, axis=-1))[:, :-1]    # (W, 2^c - 1)
    pos = jnp.clip(cnt - 1, 0, n - 1)
    gathered = tuple(
        jnp.take_along_axis(a, pos[None], axis=-1) for a in ps)
    gathered = select_point(cnt > 0, gathered,
                            jac_identity((windows, (1 << c) - 1)))
    wsum = fold_sum_jac(gathered)                    # (L, W, 1)
    return tuple(a[..., 0] for a in wsum)


def _horner_windows_host(wsums, c: int, windows: int):
    """acc = sum_w 2^(c w) W_w, Horner from the top window.  Host-side:
    `windows` points is O(windows * c) tiny group ops — not worth a device
    program (and a batch-1 device graph would dominate compile time)."""
    from ..hostmath import bls12_381 as bls
    pts = jac_to_host(wsums)  # list of affine, one per window
    acc = None
    for w in range(windows - 1, -1, -1):
        if acc is not None:
            for _ in range(c):
                acc = bls.G1.double(acc)
        acc = bls.G1.add(acc, pts[w])
    return acc


@lru_cache(maxsize=None)
def _msm_chunk_jit(n: int, c: int, windows: int):
    f = lambda xs, ys, sc: _msm_chunk(xs, ys, sc, c, windows)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _pair_add_jit():
    return jax.jit(jac_add_core_wrap)


def jac_add_core_wrap(p, q):
    from .curve_jax import jac_add_core
    return jac_add_core(p, q)


DEFAULT_CHUNK = 1 << 17
MIN_CHUNK = 1 << 12


def msm_device(xs, ys, scalars, chunk: int | None = None):
    """MSM over device arrays -> host affine point.

    xs, ys: (24, N) affine Montgomery limbs; scalars: (16, N) canonical
    (non-Montgomery) Fr limbs.

    Every call is padded up to a whole number of fixed-size chunks so a
    handful of compiled chunk programs (power-of-two sizes between
    MIN_CHUNK and DEFAULT_CHUNK) serve every MSM in the protocol
    regardless of circuit size.  On this target the compile:run cost
    ratio is ~10^4:1 (a jac_add graph alone costs ~50 s of XLA/Mosaic
    compile vs <1 ms of runtime), so wasting up to chunk-1 points of
    compute per call is far cheaper than compiling per exact shape.
    Zero-digit masking makes pad entries inert regardless of the padded
    point coordinates.
    """
    n = xs.shape[-1]
    if n == 0:
        return None  # MSM over the empty set = G1 identity (host convention)
    if chunk is None:
        from ..utils.config import on_tpu
        if on_tpu():
            # one chunk size = ONE compiled program for every MSM in the
            # protocol (each distinct chunk class costs ~5 min of XLA/
            # Mosaic compile; padding costs <0.5 s of VPU time)
            chunk = DEFAULT_CHUNK
        else:
            # CPU (tests/small circuits): pad less, compile small
            chunk = min(DEFAULT_CHUNK,
                        max(MIN_CHUNK, 1 << (n - 1).bit_length()))
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        pad = n_pad - n
        xs = jnp.concatenate([xs, jnp.zeros((xs.shape[0], pad), jnp.uint32)], 1)
        ys = jnp.concatenate([ys, jnp.zeros((ys.shape[0], pad), jnp.uint32)], 1)
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((scalars.shape[0], pad), jnp.uint32)], 1)
        n = n_pad
    c, windows = _window_params(chunk)
    wsums = None
    for start in range(0, n, chunk):
        end = start + chunk
        part = _msm_chunk_jit(chunk, c, windows)(
            xs[:, start:end], ys[:, start:end], scalars[:, start:end])
        wsums = part if wsums is None else _pair_add_jit()(wsums, part)
    return _horner_windows_host(wsums, c, windows)


DEVICE_MSM_MIN = 256  # below this the host Pippenger wins (no compile)


def msm_host_points(points, scalars_int, chunk: int | None = None):
    """Convenience: host affine points + int scalars -> host affine result."""
    if not points or not scalars_int:
        return None
    n = min(len(points), len(scalars_int))
    if n < DEVICE_MSM_MIN:
        from ..hostmath import bls12_381 as bls
        return bls.G1.msm(points[:n], [s % R for s in scalars_int[:n]])
    xs, ys = points_to_device(points[:n])
    sc = jnp.asarray(ints_to_limbs([s % R for s in scalars_int[:n]], FR_SPEC.L))
    return msm_device(xs, ys, sc, chunk)
