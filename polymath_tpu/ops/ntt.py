"""Radix-2 NTT over Fr on device (single chip).

Semantics match arkworks ``Radix2EvaluationDomain`` (SURVEY.md §2.2):
natural-order DFT ``evals[i] = sum_j coeffs[j] w^(ij)`` with the canonical
2-adic root derived from GENERATOR=7; iNTT scales by n^-1.

Structure: bit-reversal gather (one precomputed permutation) followed by
log2(n) fused DIT stages expressed as reshapes — no data-dependent gathers,
so XLA lays every stage out as pure VPU work over the (L, n) limb array.
Twiddle tables are built on device by doubling (log n steps, n total
mont_muls) and cached per domain size.

Replaces reference prover.rs FFT call sites: poly_coeffs (iFFT,
prover.rs:239-243), square_polynomial (FFT/iFFT at 2n, prover.rs:315-328).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath.bls12_381 import R, FR_TWO_ADICITY, FR_TWO_ADIC_ROOT
from .limbs import FR_SPEC, int_to_limbs
from .field_jax import FR


def domain_omega(n: int) -> int:
    """Canonical n-th root of unity (arkworks group_gen)."""
    log_n = n.bit_length() - 1
    assert n == 1 << log_n and log_n <= FR_TWO_ADICITY
    return pow(FR_TWO_ADIC_ROOT, 1 << (FR_TWO_ADICITY - log_n), R)


@lru_cache(maxsize=None)
def _bitrev_indices(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _twiddle_table(n: int, inverse: bool):
    """(L, n/2) Montgomery-form powers of omega_n (or its inverse)."""
    omega = domain_omega(n)
    if inverse:
        omega = pow(omega, R - 2, R)

    def build():
        tbl = FR.ones_mont((1,))
        k = 1
        while k < n // 2:
            factor = jnp.asarray(
                int_to_limbs(FR_SPEC.to_mont_int(pow(omega, k, R)), FR_SPEC.L),
                jnp.uint32)[:, None]
            tbl = jnp.concatenate([tbl, FR.mont_mul(tbl, factor)], axis=1)
            k *= 2
        return tbl

    if n // 2 == 0:
        return FR.ones_mont((1,))
    tbl = jax.jit(build)()
    return jax.device_put(tbl)


def _ntt_impl(a, n: int, inverse: bool):
    """Core NTT on (L, n) Montgomery limbs; traceable, static n.

    Each stage is one fused butterfly kernel (pallas_field.fr_butterfly)
    over the reshaped (L, nb, m) views — pure reshapes, no gathers.
    """
    from .pallas_field import fr_butterfly, fr_mul
    tbl = _twiddle_table(n, inverse)
    L = FR_SPEC.L
    a = a[:, _bitrev_indices(n)]
    m = 1
    while m < n:
        stride = n // (2 * m)
        tw = jax.lax.slice(tbl, (0, 0), (L, n // 2), (1, stride))  # (L, m)
        a = a.reshape(L, -1, 2, m)
        lo = a[:, :, 0, :]
        hi = a[:, :, 1, :]
        nlo, nhi = fr_butterfly(lo, hi, tw[:, None, :])
        a = jnp.stack([nlo, nhi], axis=2)
        a = a.reshape(L, n)
        m *= 2
    if inverse:
        n_inv = jnp.asarray(
            int_to_limbs(FR_SPEC.to_mont_int(pow(n, R - 2, R)), L),
            jnp.uint32)[:, None]
        a = fr_mul(a, n_inv)
    return a


@lru_cache(maxsize=None)
def _ntt_jit(n: int, inverse: bool):
    return jax.jit(lambda a: _ntt_impl(a, n, inverse))


def ntt(a, inverse: bool = False):
    """NTT/iNTT of (L, n) Montgomery-form Fr limbs (n a power of two)."""
    n = a.shape[1]
    return _ntt_jit(n, inverse)(a)


def ntt_trace(a, inverse: bool = False):
    """Traceable variant for embedding inside larger jitted pipelines."""
    return _ntt_impl(a, a.shape[1], inverse)


# -- polynomial helpers on device ------------------------------------------

def powers_of(x_mont, n: int):
    """(L, n) Montgomery powers [1, x, x^2, ...] by doubling.

    x_mont: (L,) or (L, 1) Montgomery-form scalar.
    """
    x_mont = x_mont.reshape(FR_SPEC.L, 1)
    tbl = FR.ones_mont((1,))
    k = 1
    cur = x_mont
    while k < n:
        take = min(k, n - k)
        tbl = jnp.concatenate(
            [tbl, FR.mont_mul(tbl[:, :take], cur)], axis=1)
        cur = FR.mont_mul(cur, cur)
        k *= 2
    return tbl


def poly_eval_device(coeffs, x_mont):
    """Evaluate a polynomial given (L, n) Montgomery coeffs at scalar x:
    dot(coeffs, powers(x)) with lazy-sum reduction."""
    n = coeffs.shape[1]
    pw = powers_of(x_mont, n)
    prods = FR.mont_mul(coeffs, pw)
    return FR.sum_reduce(prods, axis=1)
