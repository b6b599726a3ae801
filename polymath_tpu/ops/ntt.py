"""Radix-2 NTT over Fr on device (single chip).

Semantics match arkworks ``Radix2EvaluationDomain`` (SURVEY.md §2.2):
natural-order DFT ``evals[i] = sum_j coeffs[j] w^(ij)`` with the canonical
2-adic root derived from GENERATOR=7; iNTT scales by n^-1.

Structure (round 2 redesign — the round-1 per-stage XLA formulation kept
the whole (16, n) array live per fused stage and OOM'd scoped VMEM at
n = 2^19):

  * ``ntt_local_batched`` — ONE Pallas kernel runs all log2(nl) DIT stages
    of an nl <= 2048 transform entirely in VMEM, gridded over the batch
    axis.  Butterflies are expressed with lane rolls + selects (no
    reshapes, no cross-sublane relayouts): for stage half-width m,
    t = a*tw; lo' = a + roll(t, -m); hi' = roll(a, +m) - t.
  * sizes above 2048 use the Bailey 4-step split n = n1*n2: batched
    column NTTs, outer twiddle multiply (w^(j2*k1), with n^-1 folded in
    for the inverse), batched row NTTs, transpose.  Max n = 2^22.

All tables (bit-reversal, stage twiddles, outer twiddles) are computed
in-graph from iota + the on-device power ladder, so jitted callers embed
no large host constants.

Replaces reference prover.rs FFT call sites: poly_coeffs (iFFT,
prover.rs:239-243), square_polynomial (FFT/iFFT at 2n, prover.rs:315-328).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hostmath.bls12_381 import R, FR_TWO_ADICITY, FR_TWO_ADIC_ROOT
from ..utils.config import pallas_interpret
from .limbs import FR_SPEC, int_to_limbs
from .field_jax import FR
from .ll import LL_FR

L = FR_SPEC.L
MAX_LOCAL = 2048   # largest single-kernel transform (VMEM-bounded)
RB = 8             # batch rows per kernel instance (sublane tile)


def domain_omega(n: int) -> int:
    """Canonical n-th root of unity (arkworks group_gen)."""
    log_n = n.bit_length() - 1
    assert n == 1 << log_n and log_n <= FR_TWO_ADICITY
    return pow(FR_TWO_ADIC_ROOT, 1 << (FR_TWO_ADICITY - log_n), R)


def _mont_limbs(v: int) -> np.ndarray:
    return np.asarray(int_to_limbs(FR_SPEC.to_mont_int(v % R), L),
                      np.uint32)[:, None]


def _bitrev_device(n: int):
    """In-graph bit-reversal permutation indices (int32, length n)."""
    log_n = n.bit_length() - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    rev = jnp.zeros((n,), jnp.int32)
    for b in range(log_n):
        rev = rev | (((idx >> b) & 1) << (log_n - 1 - b))
    return rev


@lru_cache(maxsize=None)
def _stage_indices(nl: int) -> np.ndarray:
    """(S, nl) int32: twiddle-ladder index per stage and lane position.

    Stage s (half-width m = 2^s) needs w_{2m}^(p mod m) at lane p, which
    is ladder entry ((p & (m-1)) * nl/(2m)) of the nl-entry power table.
    """
    S = nl.bit_length() - 1
    p = np.arange(nl, dtype=np.int64)
    rows = []
    for s in range(S):
        m = 1 << s
        rows.append(((p & (m - 1)) * (nl // (2 * m))).astype(np.int32))
    return np.stack(rows) if rows else np.zeros((0, nl), np.int32)


def _local_ntt_kernel(S: int, nl: int):
    def kernel(x_ref, tw_ref, o_ref):
        a = [x_ref[i] for i in range(L)]          # each (RB, nl)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (RB, nl), 1)
        for s in range(S):
            m = 1 << s
            tw = [tw_ref[i, s] for i in range(L)]  # (1, nl)
            t = LL_FR.mont_mul(a, tw)
            t_lo = [pltpu.roll(v, nl - m, axis=1) for v in t]
            a_hi = [pltpu.roll(v, m, axis=1) for v in a]
            add = LL_FR.add(a, t_lo)
            sub = LL_FR.sub(a_hi, t)
            is_lo = (lane & np.uint32(m)) == 0
            a = LL_FR.select(is_lo, add, sub)
        o_ref[...] = LL_FR.join(a)
    return kernel


@lru_cache(maxsize=None)
def _local_ntt_call(rows_total: int, nl: int):
    S = nl.bit_length() - 1
    xspec = pl.BlockSpec((L, RB, nl), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec((L, max(S, 1), 1, nl), lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        _local_ntt_kernel(S, nl),
        grid=(pl.cdiv(rows_total, RB),),
        in_specs=[xspec, twspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((L, rows_total, nl), jnp.uint32),
        interpret=pallas_interpret(),
    ))


def _local_ntt_jnp(x, tw, nl: int):
    """XLA fallback of the fused kernel (same roll/select butterflies on
    the scanned field ops — compile-lean for CPU testing).
    x: (L, B, nl) bit-reversed; tw: (L, S, nl)."""
    S = nl.bit_length() - 1
    lane = jnp.arange(nl, dtype=jnp.uint32)[None, None, :]
    for s in range(S):
        m = 1 << s
        t = FR.mont_mul(x, tw[:, s, None, :])
        t_lo = jnp.roll(t, -m, axis=2)
        a_hi = jnp.roll(x, m, axis=2)
        add = FR.add(x, t_lo)
        sub = FR.sub(a_hi, t)
        is_lo = (lane & np.uint32(m)) == 0
        x = jnp.where(is_lo, add, sub)
    return x


def ntt_local_batched(x, inverse: bool, scaled: bool = True):
    """NTT along the LAST axis of (L, B, nl), nl <= MAX_LOCAL a power of 2.

    ``scaled``: multiply by nl^-1 when inverse (the arkworks iFFT rule;
    pass False when a caller folds the scale elsewhere)."""
    from ..utils.config import use_pallas
    from .pallas_field import fr_mul

    _, B, nl = x.shape
    assert nl <= MAX_LOCAL and nl & (nl - 1) == 0
    if nl == 1:
        return x
    S = nl.bit_length() - 1

    omega = domain_omega(nl)
    if inverse:
        omega = pow(omega, R - 2, R)

    # twiddle tensor from the on-device power ladder (no host tables)
    pw = powers_of(jnp.asarray(_mont_limbs(omega)), nl)        # (L, nl)
    tw = pw[:, jnp.asarray(_stage_indices(nl))]                # (L, S, nl)

    x = jnp.take(x, _bitrev_device(nl), axis=2)
    if use_pallas():
        pad = (-B) % RB
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((L, pad, nl), jnp.uint32)], axis=1)
        out = _local_ntt_call(x.shape[1], nl)(x, tw.reshape(L, S, 1, nl))
        if pad:
            out = out[:, :B]
    else:
        out = _local_ntt_jnp(x, tw, nl)
    if inverse and scaled:
        out = fr_mul(out, jnp.asarray(_mont_limbs(pow(nl, R - 2, R)))[:, None])
    return out


def _ntt_4step(a, n: int, inverse: bool):
    """Bailey decomposition n = n1*n2 (j = j2 + n2*j1, k = k1 + n1*k2):
    NTT_n1 over j1, twiddle w^(j2*k1), NTT_n2 over j2, transpose out."""
    from .pallas_field import fr_mul

    log_n = n.bit_length() - 1
    n1 = 1 << ((log_n + 1) // 2)
    n2 = n // n1
    assert n1 <= MAX_LOCAL and n2 <= MAX_LOCAL, "n too large (max 2^22)"

    omega = domain_omega(n)
    if inverse:
        omega = pow(omega, R - 2, R)

    X = jnp.swapaxes(a.reshape(L, n1, n2), 1, 2)    # (L, n2, n1) [j2, j1]
    X = ntt_local_batched(X, inverse, scaled=False)  # [j2, k1]

    # outer twiddle w^(j2*k1) via index math (uint32 wrap * is exact mod n
    # because n | 2^32), gathered from the device power ladder
    pw = powers_of(jnp.asarray(_mont_limbs(omega)), n)          # (L, n)
    j2 = jax.lax.broadcasted_iota(jnp.uint32, (n2, n1), 0)
    k1 = jax.lax.broadcasted_iota(jnp.uint32, (n2, n1), 1)
    idx = ((j2 * k1) & np.uint32(n - 1)).astype(jnp.int32)
    tw = pw[:, idx]                                             # (L, n2, n1)
    if inverse:
        tw = fr_mul(tw, jnp.asarray(_mont_limbs(pow(n, R - 2, R)))[:, None])
    X = fr_mul(X, tw)

    X = jnp.swapaxes(X, 1, 2)                        # (L, n1, n2) [k1, j2]
    X = ntt_local_batched(X, inverse, scaled=False)  # [k1, k2]
    return jnp.swapaxes(X, 1, 2).reshape(L, n)       # k = k1 + n1*k2


def _ntt_impl(a, n: int, inverse: bool):
    """Core NTT on (L, n) Montgomery limbs; traceable, static n."""
    if n == 1:
        return a
    if n <= MAX_LOCAL:
        return ntt_local_batched(
            a.reshape(L, 1, n), inverse, scaled=True).reshape(L, n)
    return _ntt_4step(a, n, inverse)


@lru_cache(maxsize=None)
def _ntt_jit(n: int, inverse: bool):
    from .aot import aot_jit
    return aot_jit(lambda a: _ntt_impl(a, n, inverse),
                   f"ntt-{n}-{'inv' if inverse else 'fwd'}")


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

    x_mont: (L,) or (L, 1) Montgomery-form scalar.  The doubling muls go
    through the fused Pallas kernel (pallas_field.fr_mul) — the XLA
    scan-CIOS form holds ~6x the operand size in loop temporaries, which
    matters for the ~10n-element SRS power table.
    """
    from .pallas_field import fr_mul

    x_mont = x_mont.reshape(FR_SPEC.L, 1)
    tbl = FR.ones_mont((1,))
    k = 1
    cur = x_mont
    while k < n:
        take = min(k, n - k)
        tbl = jnp.concatenate(
            [tbl, fr_mul(tbl[:, :take], cur)], axis=1)
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
