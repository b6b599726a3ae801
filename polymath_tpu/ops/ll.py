"""Limb-list field engine for Pallas TPU kernel bodies.

The array-form engine (field_jax) keeps limbs on a leading axis; inside a
kernel every CIOS step then concatenates along the sublane axis, which
Mosaic lowers to cross-sublane relayouts — measured ~50x off VPU peak.

Here a field element is a **Python list of L arrays**, each a well-tiled
(8, C) uint32 block.  Limb shifts become list re-indexing (free at trace
time); every emitted op is a pure elementwise VPU instruction on aligned
tiles; all field constants are scalar literals.  Same CIOS algorithm and
bounds as field_jax.mont_mul.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .limbs import FieldSpec, LIMB_BITS, LIMB_MASK, FR_SPEC, FQ_SPEC

_M = np.uint32(LIMB_MASK)
_B16 = np.uint32(1 << LIMB_BITS)


class LLOps:
    """Limb-list field arithmetic for one FieldSpec (kernel-body use)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.L
        self.p_ints = [int(v) for v in spec.p_limbs]
        self.one_ints = [int(v) for v in spec.one_mont]
        self.n0inv = np.uint32(spec.n0inv)

    # -- conversions between array form (L, ...) and list form -------------
    def split(self, v):
        return [v[i] for i in range(self.L)]

    def split_packed(self, v):
        """(L/2, ...) uint32 rows, each packing limbs (2k | 2k+1 << 16),
        -> limb list of length L.  Point data travels packed through HBM
        (gathers/DMA at half the bytes); the unpack is 2 VPU ops per limb
        pair at register level."""
        out = []
        for k in range(self.L // 2):
            out.append(v[k] & _M)
            out.append(v[k] >> LIMB_BITS)
        return out

    def join(self, lst):
        return jnp.stack(lst)

    def zeros(self, like):
        z = jnp.zeros_like(like)
        return [z] * self.L

    def ones_mont(self, like):
        return [jnp.full_like(like, np.uint32(c)) for c in self.one_ints]

    # -- carry / compare ----------------------------------------------------
    def carry(self, t):
        """Full carry propagation of a redundant list (limbs < 2^32)."""
        out = []
        c = None
        for v in t:
            v = v if c is None else v + c
            out.append(v & _M)
            c = v >> LIMB_BITS
        return out

    def cond_sub_p(self, t):
        """t: canonical list (K >= L limbs, value < 2p) -> mod p, L limbs."""
        K = len(t)
        borrow = None
        diff = []
        for i in range(K):
            pi = np.uint32(self.p_ints[i]) if i < self.L else np.uint32(0)
            v = t[i] + (_B16 - pi) if borrow is None else t[i] + (_B16 - pi) - borrow
            diff.append(v & _M)
            borrow = np.uint32(1) - (v >> LIMB_BITS)
        keep = borrow != 0  # borrow -> t < p -> keep t
        return [jnp.where(keep, a, d) for a, d in zip(t[: self.L], diff[: self.L])]

    # -- ring ops ------------------------------------------------------------
    def add(self, a, b):
        s = [x + y for x, y in zip(a, b)]
        s.append(jnp.zeros_like(a[0]))
        return self.cond_sub_p(self.carry(s))

    def sub(self, a, b):
        t = [x + np.uint32(self.p_ints[i]) for i, x in enumerate(a)]
        t.append(jnp.zeros_like(a[0]))
        t = self.carry(t)
        borrow = None
        diff = []
        for i in range(self.L + 1):
            bi = b[i] if i < self.L else jnp.zeros_like(a[0])
            v = t[i] + _B16 - bi if borrow is None else t[i] + _B16 - bi - borrow
            diff.append(v & _M)
            borrow = np.uint32(1) - (v >> LIMB_BITS)
        return self.cond_sub_p(diff)

    def neg(self, a):
        return self.sub(self.zeros(a[0]), a)

    def mont_mul(self, a, b):
        """CIOS with redundant accumulator; see field_jax.mont_mul bounds."""
        L = self.L
        zero = jnp.zeros_like(a[0])
        t = [zero] * (L + 1)
        for i in range(L):
            ai = a[i]
            for j in range(L):
                pj = ai * b[j]
                t[j] = t[j] + (pj & _M)
                t[j + 1] = t[j + 1] + (pj >> LIMB_BITS)
            m = (t[0] * self.n0inv) & _M
            for j in range(L):
                pc = np.uint32(self.p_ints[j])
                pj = m * pc
                t[j] = t[j] + (pj & _M)
                t[j + 1] = t[j + 1] + (pj >> LIMB_BITS)
            carry0 = t[0] >> LIMB_BITS
            t = t[1:] + [zero]
            t[0] = t[0] + carry0
        return self.cond_sub_p(self.carry(t))

    def mont_sqr(self, a):
        """Dedicated Montgomery squaring: SOS with symmetric cross terms
        (each a_i*a_j, j > i, computed once and added twice) followed by
        the L-step Montgomery reduction — L(L+1)/2 + L^2 limb products vs
        mont_mul's 2L^2 (~0.76x; the MSM madd is 8M+3S, the double 2M+5S,
        so point kernels win a further ~6-15%).

        Accumulator bounds: t[k] collects <= L doubled lo/hi halves
        (< 2^17 each) from the square phase (< 2^21.6 for L = 24) plus
        2 halves per reduction step (+ L * 2^17), all < 2^23 — well under
        the uint32 lane, same headroom argument as field_jax.mont_mul.
        """
        L = self.L
        zero = jnp.zeros_like(a[0])
        t = [zero] * (2 * L + 1)
        for i in range(L):
            pj = a[i] * a[i]
            t[2 * i] = t[2 * i] + (pj & _M)
            t[2 * i + 1] = t[2 * i + 1] + (pj >> LIMB_BITS)
            for j in range(i + 1, L):
                pj = a[i] * a[j]
                lo2 = (pj & _M) + (pj & _M)
                hi2 = (pj >> LIMB_BITS) + (pj >> LIMB_BITS)
                t[i + j] = t[i + j] + lo2
                t[i + j + 1] = t[i + j + 1] + hi2
        for _ in range(L):
            m = (t[0] * self.n0inv) & _M
            for j in range(L):
                pc = np.uint32(self.p_ints[j])
                pj = m * pc
                t[j] = t[j] + (pj & _M)
                t[j + 1] = t[j + 1] + (pj >> LIMB_BITS)
            carry0 = t[0] >> LIMB_BITS
            t = t[1:]
            t[0] = t[0] + carry0
        return self.cond_sub_p(self.carry(t))

    # -- predicates ----------------------------------------------------------
    def is_zero(self, a):
        acc = None
        for x in a:
            acc = x if acc is None else (acc | x)
        return acc == 0

    def eq(self, a, b):
        acc = None
        for x, y in zip(a, b):
            d = x ^ y
            acc = d if acc is None else (acc | d)
        return acc == 0

    def select(self, mask, a, b):
        """mask elementwise: a where mask else b."""
        return [jnp.where(mask, x, y) for x, y in zip(a, b)]


LL_FQ = LLOps(FQ_SPEC)
LL_FR = LLOps(FR_SPEC)


# -- G1 point formulas in list form -----------------------------------------

def ll_jac_double(p, F=LL_FQ):
    X1, Y1, Z1 = p
    A = F.mont_sqr(X1)
    B = F.mont_sqr(Y1)
    C = F.mont_sqr(B)
    t = F.mont_sqr(F.add(X1, B))
    d_half = F.sub(F.sub(t, A), C)
    D = F.add(d_half, d_half)
    E = F.add(F.add(A, A), A)
    Fv = F.mont_sqr(E)
    X3 = F.sub(F.sub(Fv, D), D)
    C8 = F.add(C, C)
    C8 = F.add(C8, C8)
    C8 = F.add(C8, C8)
    Y3 = F.sub(F.mont_mul(E, F.sub(D, X3)), C8)
    Z3 = F.mont_mul(F.add(Y1, Y1), Z1)
    return (X3, Y3, Z3)


def ll_mdbl(leaf, F=LL_FQ):
    """Double an affine point (mdbl-2007-bl): 1M + 5S — the cheap fallback
    when a bucket run adds a point to itself."""
    X1, Y1 = leaf
    XX = F.mont_sqr(X1)
    YY = F.mont_sqr(Y1)
    YYYY = F.mont_sqr(YY)
    t = F.mont_sqr(F.add(X1, YY))
    Sh = F.sub(F.sub(t, XX), YYYY)
    S = F.add(Sh, Sh)
    M = F.add(F.add(XX, XX), XX)
    T = F.sub(F.sub(F.mont_sqr(M), S), S)
    C8 = F.add(YYYY, YYYY)
    C8 = F.add(C8, C8)
    C8 = F.add(C8, C8)
    Y3 = F.sub(F.mont_mul(M, F.sub(S, T)), C8)
    Z3 = F.add(Y1, Y1)
    return (T, Y3, Z3)


def ll_jac_madd(p, leaf, F=LL_FQ, fast=False):
    """Mixed addition jacobian += affine (madd-2007-bl): 8M + 3S vs the
    11M + 5S general add — the MSM bucket scan's leaves are always affine
    SRS points, so this is the hot combine.

    Affine identity encodes as (0, 0) (Y = 0 never occurs on G1, see
    curve_jax.affine_to_jac); masked-out leaves use the same encoding.

    fast=True: skip the doubling fallback (1M + 5S more) and instead
    return an error mask that is set when acc == leaf would have required
    a doubling.  Sound for the prover's MSMs — the SRS bases are distinct
    powers of a random trapdoor, so a partial bucket sum colliding with
    the next base has negligible probability — and the caller asserts the
    flag is clear.  Returns (point, err) with err None unless fast.
    """
    X1, Y1, Z1 = p
    X2, Y2 = leaf
    Z1Z1 = F.mont_sqr(Z1)
    U2 = F.mont_mul(X2, Z1Z1)
    S2 = F.mont_mul(F.mont_mul(Y2, Z1), Z1Z1)
    H = F.sub(U2, X1)
    I = F.mont_sqr(F.add(H, H))
    J = F.mont_mul(H, I)
    rr = F.sub(S2, Y1)
    rr = F.add(rr, rr)
    V = F.mont_mul(X1, I)
    X3 = F.sub(F.sub(F.mont_sqr(rr), J), F.add(V, V))
    YJ = F.mont_mul(Y1, J)
    Y3 = F.sub(F.mont_mul(rr, F.sub(V, X3)), F.add(YJ, YJ))
    Z3 = F.mont_mul(F.add(Z1, Z1), H)
    out = (X3, Y3, Z3)

    p_inf = F.is_zero(Z1)
    leaf_inf = F.is_zero(Y2)
    h_zero = F.eq(U2, X1)
    r_zero = F.eq(S2, Y1)
    live = ~p_inf & ~leaf_inf

    def sel(mask, a, b):
        return tuple(F.select(mask, x, y) for x, y in zip(a, b))

    err = None
    coll = h_zero & r_zero & live
    if fast:
        err = coll
    else:
        out = sel(coll, ll_mdbl(leaf, F), out)
    idn = (F.ones_mont(X1[0]), F.ones_mont(X1[0]), F.zeros(X1[0]))
    out = sel(h_zero & ~r_zero & live, idn, out)   # P + (-P)
    one = F.ones_mont(X1[0])
    out = sel(p_inf, (X2, Y2, one), out)
    out = sel(leaf_inf, p, out)
    return out, err


def ll_jac_add(p, q, F=LL_FQ):
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = F.mont_sqr(Z1)
    Z2Z2 = F.mont_sqr(Z2)
    U1 = F.mont_mul(X1, Z2Z2)
    U2 = F.mont_mul(X2, Z1Z1)
    S1 = F.mont_mul(F.mont_mul(Y1, Z2), Z2Z2)
    S2 = F.mont_mul(F.mont_mul(Y2, Z1), Z1Z1)
    H = F.sub(U2, U1)
    HH = F.mont_sqr(F.add(H, H))
    J = F.mont_mul(H, HH)
    rr = F.sub(S2, S1)
    rr = F.add(rr, rr)
    V = F.mont_mul(U1, HH)
    X3 = F.sub(F.sub(F.mont_sqr(rr), J), F.add(V, V))
    S1J = F.mont_mul(S1, J)
    Y3 = F.sub(F.mont_mul(rr, F.sub(V, X3)), F.add(S1J, S1J))
    ZZ = F.sub(F.sub(F.mont_sqr(F.add(Z1, Z2)), Z1Z1), Z2Z2)
    Z3 = F.mont_mul(ZZ, H)
    out = (X3, Y3, Z3)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h_zero = F.eq(U1, U2)
    r_zero = F.eq(S1, S2)

    dbl = ll_jac_double(p, F)
    idn = (F.ones_mont(X1[0]), F.ones_mont(X1[0]), F.zeros(X1[0]))

    def sel(mask, a, b):
        return tuple(F.select(mask, x, y) for x, y in zip(a, b))

    out = sel(h_zero & r_zero, dbl, out)
    out = sel(h_zero & ~r_zero & ~p_inf & ~q_inf, idn, out)
    out = sel(q_inf, p, out)
    out = sel(p_inf, q, out)
    return out
