"""Vectorized Montgomery field arithmetic in JAX (the device substrate).

Every bulk field operation of the prover/generator — NTT butterflies, curve
formulas inside MSM, polynomial algebra — reduces to the ops here, applied
to ``(L, ...batch)`` uint32 limb arrays in Montgomery form (see limbs.py).

Algorithm: interleaved CIOS Montgomery multiplication with a **redundant
accumulator**.  Per limb step the accumulator only absorbs split 16-bit
product halves (each < 2^16), so limbs grow to at most ~2^16 * (4*L) ≈ 2^23
over the whole loop and a single final carry propagation suffices — no
per-step carry chains, everything stays in uint32 VPU lanes.

Bounds (L=24, Fq): per step each column gains <= 4*(2^16-1) plus a shifted
carry < 2^9; over 24 steps < 24 * 2^18 + 2^16 < 2^23.  Safe margin to 2^32.

All functions broadcast over trailing batch dims; shapes (L, ...a) op
(L, ...b) -> (L, broadcast(...a, ...b)).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import FieldSpec, LIMB_BITS, LIMB_MASK, FR_SPEC, FQ_SPEC


class FieldOps:
    """Device field ops for one FieldSpec.  Methods are pure jnp functions
    (traceable; call under jit)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.L
        # constants as NUMPY so they inline as literals everywhere —
        # including inside Pallas kernel bodies (device-array constants
        # would be captured closures, which pallas_call rejects)
        self._p = np.asarray(spec.p_limbs, np.uint32)
        self._r2 = np.asarray(spec.r2, np.uint32)
        self._one_mont = np.asarray(spec.one_mont, np.uint32)
        self._n0inv = np.uint32(spec.n0inv)

    #: When True (set while tracing Pallas kernel bodies), field constants
    #: are emitted as per-limb scalar literals via jnp.full — pallas_call
    #: rejects closure-captured array constants, but scalar literals inline.
    INLINE_CONSTS = False

    # -- shape helpers -----------------------------------------------------
    def _const(self, limbs, batch_ndim):
        arr = np.asarray(limbs, np.uint32).reshape((self.L,) + (1,) * batch_ndim)
        if FieldOps.INLINE_CONSTS:
            shape = (1,) + (1,) * batch_ndim
            cols = [jnp.full(shape, int(v), jnp.uint32)
                    for v in arr.reshape(self.L)]
            return jnp.concatenate(cols, axis=0)
        return arr

    def zeros(self, shape):
        return jnp.zeros((self.L,) + tuple(shape), jnp.uint32)

    def ones_mont(self, shape):
        return jnp.broadcast_to(
            self._const(self.spec.one_mont, len(shape)), (self.L,) + tuple(shape)
        ).astype(jnp.uint32)

    # -- carry / compare machinery ----------------------------------------
    def carry(self, t):
        """Full carry propagation: (K, ...) limbs (< 2^32) -> canonical
        16-bit limbs, same K.  Final carry must vanish (guaranteed by
        callers' bounds)."""
        K = t.shape[0]
        c = jnp.zeros(t.shape[1:], jnp.uint32)
        out = []
        for i in range(K):
            v = t[i] + c
            out.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        return jnp.stack(out)

    def _sub_chain(self, a, b):
        """a - b limbwise with borrow; returns (diff, borrow_out).
        a, b canonical 16-bit limbs, same leading K."""
        K = a.shape[0]
        borrow = jnp.zeros(a.shape[1:], jnp.uint32)
        out = []
        for i in range(K):
            v = a[i] + np.uint32(1 << LIMB_BITS) - b[i] - borrow
            out.append(v & LIMB_MASK)
            borrow = np.uint32(1) - (v >> LIMB_BITS)
        return jnp.stack(out), borrow

    def cond_sub_p(self, t):
        """t (K >= L limbs, canonical, value < 2p) -> t mod p as L limbs."""
        K = t.shape[0]
        bnd = len(t.shape) - 1
        p_ext = jnp.concatenate(
            [jnp.broadcast_to(self._const(self.spec.p_limbs, bnd),
                              (self.L,) + t.shape[1:]),
             jnp.zeros((K - self.L,) + t.shape[1:], jnp.uint32)], axis=0)
        diff, borrow = self._sub_chain(t, p_ext)
        keep = (borrow != 0)  # borrow set -> t < p -> keep t
        return jnp.where(keep[None], t, diff)[: self.L]

    # -- ring ops ----------------------------------------------------------
    def add(self, a, b):
        s = a + b  # limbs < 2^17
        s = jnp.concatenate([s, jnp.zeros((1,) + s.shape[1:], jnp.uint32)])
        return self.cond_sub_p(self.carry(s))

    def sub(self, a, b):
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a = jnp.broadcast_to(a, (self.L,) + shape)
        b = jnp.broadcast_to(b, (self.L,) + shape)
        p = self._const(self.spec.p_limbs, len(shape))
        t = a + p  # limbs < 2^17; value = a + p, always >= b
        t = jnp.concatenate([t, jnp.zeros((1,) + shape, jnp.uint32)])
        t = self.carry(t)
        b_ext = jnp.concatenate([b, jnp.zeros((1,) + shape, jnp.uint32)])
        diff, _ = self._sub_chain(t, b_ext)
        return self.cond_sub_p(diff)

    def neg(self, a):
        z = self.zeros(a.shape[1:])
        return self.sub(z, a)

    def mont_mul(self, a, b):
        """Montgomery product: a*b*R^-1 mod p (operands in Montgomery form).

        Interleaved CIOS, redundant accumulator, no per-step carries.
        The outer limb loop is a ``lax.scan`` over a's limb axis, so the
        emitted graph holds ONE step body (~15 ops) instead of L unrolled
        copies — compile-lean for every XLA consumer (the fused Pallas
        kernels use the unrolled limb-list engine in ll.py instead).
        """
        L = self.L
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        bnd = len(shape)
        a = jnp.broadcast_to(a, (L,) + shape)
        b = jnp.broadcast_to(b, (L,) + shape)
        p = self._const(self.spec.p_limbs, bnd)
        zero1 = jnp.zeros((1,) + shape, jnp.uint32)
        t0 = jnp.zeros((L + 1,) + shape, jnp.uint32)
        n0inv = self._n0inv

        # NB: no .at[].add here — scatter has no Mosaic lowering; use
        # shifted concats (equivalent, and fuses as pure vector ops).
        def step(t, ai):
            p1 = ai[None] * b                      # 16x16 -> exact uint32
            t = t + jnp.concatenate([p1 & LIMB_MASK, zero1], axis=0) \
                  + jnp.concatenate([zero1, p1 >> LIMB_BITS], axis=0)
            m = (t[0] * n0inv) & LIMB_MASK         # low 16 bits exact
            p2 = m[None] * p
            t = t + jnp.concatenate([p2 & LIMB_MASK, zero1], axis=0) \
                  + jnp.concatenate([zero1, p2 >> LIMB_BITS], axis=0)
            carry0 = t[:1] >> LIMB_BITS            # t[0] & MASK == 0 now
            t = jnp.concatenate([t[1:2] + carry0, t[2:], zero1], axis=0)
            return t, None

        t, _ = jax.lax.scan(step, t0, a)
        return self.cond_sub_p(self.carry(t))

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def redc_wide(self, t):
        """Montgomery REDC of a wide canonical value: t (K <= 2L limbs,
        16-bit canonical, value < R*p) -> t * R^-1 mod p as L limbs.

        Used to reduce lazy (unreduced) sums of Montgomery-form elements:
        ``mont_mul(redc_wide(V), R2) == V mod p``.
        """
        L = self.L
        K = t.shape[0]
        shape = t.shape[1:]
        p = self._const(self.spec.p_limbs, len(shape))
        if K < L + 1:
            t = jnp.concatenate(
                [t, jnp.zeros((L + 1 - K,) + shape, jnp.uint32)], axis=0)
            K = L + 1
        zero1 = jnp.zeros((1,) + shape, jnp.uint32)
        zrest = jnp.zeros((K - L - 1,) + shape, jnp.uint32)
        n0inv = self._n0inv

        def step(t, _):
            m = (t[0] * n0inv) & LIMB_MASK
            p2 = m[None] * p
            add = jnp.concatenate([p2 & LIMB_MASK, zero1], axis=0) \
                + jnp.concatenate([zero1, p2 >> LIMB_BITS], axis=0)
            if K > L + 1:
                add = jnp.concatenate([add, zrest], axis=0)
            t = t + add
            carry0 = t[:1] >> LIMB_BITS
            t = jnp.concatenate([t[1:2] + carry0, t[2:], zero1], axis=0)
            return t, None

        t, _ = jax.lax.scan(step, t, None, length=L)
        # value now < p + p = 2p (since input < R*p)
        return self.cond_sub_p(self.carry(t[: L + 1]))

    def sum_reduce(self, x, axis=-1):
        """Sum Montgomery-form elements along a batch axis, exactly mod p.

        x: (L, ...) canonical limbs.  Lazily accumulates limbs in uint32
        (chunks of <= 2^15 summands keep limb sums < 2^31), carries, and
        finishes with redc_wide + R2 fix-up.  Returns (L, ...) with the
        summed axis removed.
        """
        L = self.L
        if axis < 0:
            axis = x.ndim + axis
        assert axis > 0, "axis 0 is the limb axis"
        # move target axis to the end
        x = jnp.moveaxis(x, axis, -1)
        K = x.shape[0]
        extra = 0
        while x.shape[-1] > 1:
            n = x.shape[-1]
            chunk = min(n, 1 << 15)
            pad = (-n) % chunk
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros(x.shape[:-1] + (pad,), jnp.uint32)], axis=-1)
            x = x.reshape(x.shape[:-1] + (-1, chunk)).sum(axis=-1, dtype=jnp.uint32)
            # limbs now < 2^31; value grew by <= 2^15: carry into +1 limb
            x = jnp.concatenate(
                [x, jnp.zeros((1,) + x.shape[1:], jnp.uint32)], axis=0)
            x = self.carry(x)
            extra += 1
            assert x.shape[0] <= 2 * L, "sum too deep for single REDC"
        x = x[..., 0]
        red = self.redc_wide(x)
        return self.mont_mul(red, self._const(self.spec.r2, red.ndim - 1))

    # -- Montgomery domain codecs (device side) ---------------------------
    def to_mont(self, a):
        return self.mont_mul(a, self._const(self.spec.r2, len(a.shape) - 1))

    def from_mont(self, a):
        one = jnp.concatenate(
            [jnp.ones((1,) + a.shape[1:], jnp.uint32),
             jnp.zeros((self.L - 1,) + a.shape[1:], jnp.uint32)], axis=0)
        return self.mont_mul(a, one)

    # -- exponentiation ----------------------------------------------------
    def pow_fixed(self, a, exponent: int):
        """a^exponent (a in Montgomery form, static Python-int exponent).
        Square-and-multiply via lax.scan over exponent bits (LSB first)."""
        nbits = max(exponent.bit_length(), 1)
        bits = jnp.asarray(
            np.array([(exponent >> i) & 1 for i in range(nbits)], np.uint32))
        acc0 = self.ones_mont(a.shape[1:])

        def body(carry, bit):
            acc, base = carry
            mul = self.mont_mul(acc, base)
            acc = jnp.where((bit != 0)[None], mul, acc)
            base = self.mont_mul(base, base)
            return (acc, base), None

        (acc, _), _ = jax.lax.scan(body, (acc0, a), bits)
        return acc

    def inv(self, a):
        """Batch inversion by Fermat (a^(p-2)); a must be nonzero."""
        return self.pow_fixed(a, self.spec.modulus - 2)

    # -- predicates --------------------------------------------------------
    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    # -- scalar bit access (for MSM windowing; canonical NON-Montgomery) --
    def window_digits(self, scalars, c: int, num_windows: int):
        """scalars: (L, N) canonical (not Montgomery) limbs.  Returns
        (num_windows, N) int32 window digits of width c bits.  Requires
        c <= 16 and windows aligned within limb pairs handled via 32-bit
        reconstruction."""
        L, N = scalars.shape
        s = scalars.astype(jnp.uint32)
        digits = []
        for w in range(num_windows):
            bit0 = w * c
            limb = bit0 // LIMB_BITS
            off = bit0 % LIMB_BITS
            lo = s[limb] if limb < L else jnp.zeros((N,), jnp.uint32)
            hi = s[limb + 1] if limb + 1 < L else jnp.zeros((N,), jnp.uint32)
            both = (lo | (hi << LIMB_BITS)) if off + c > LIMB_BITS else lo
            # note: (hi << 16) keeps low half of hi in bits 16..31
            d = (both >> off) & np.uint32((1 << c) - 1)
            digits.append(d)
        return jnp.stack(digits).astype(jnp.int32)


FR = FieldOps(FR_SPEC)
FQ = FieldOps(FQ_SPEC)
