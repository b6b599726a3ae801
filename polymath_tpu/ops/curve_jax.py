"""Batched G1 point arithmetic on device (Jacobian over Fq limbs).

Replaces arkworks ``ark-ec`` short-Weierstrass group law (SURVEY.md §2.2)
for bulk prover work.  Points are pytrees ``(X, Y, Z)`` of (24, ...batch)
uint32 Montgomery limb arrays; the identity is Z == 0.  All degenerate
cases (identity operands, doubling, inverse pair) are resolved with
branchless selects so the kernels batch cleanly — required because the MSM
segmented scan feeds arbitrary point pairs through one combine function.

BLS12-381 G1 has no 2-torsion (odd cofactor), so Y != 0 always and the
doubling formula is total.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..hostmath import bls12_381 as bls
from .limbs import FQ_SPEC, ints_to_limbs, limbs_to_ints
from .field_jax import FQ


def jac_identity(shape=()):
    one = FQ.ones_mont(shape)
    return (one, one, FQ.zeros(shape))


def affine_to_jac(xy):
    """(X, Y) affine limb arrays -> jacobian.

    The identity is encoded affine as (0, 0) (Y = 0 never occurs for a
    real G1 point — no 2-torsion), mapping to Z = 0.  Real points get
    Z = 1.  This keeps SRS vectors with identity entries (zero SAP
    columns -> zero scalars, e.g. BenchCircuit filler variables) exact
    through every device MSM."""
    X, Y = xy
    inf = FQ.is_zero(Y)
    one = FQ.ones_mont(X.shape[1:])
    z = jnp.where(inf[None], FQ.zeros(X.shape[1:]), one)
    return (X, Y, z)


def is_identity(p):
    return FQ.is_zero(p[2])


def select_point(mask, a, b):
    """mask (...) bool: a where True else b (per point)."""
    m = mask[None]
    return tuple(jnp.where(m, ai, bi) for ai, bi in zip(a, b))


def jac_double(p):
    """Doubling; Pallas-fused on TPU for large batches."""
    from ..utils.config import use_pallas
    if use_pallas():
        from .pallas_curve import jac_double_fused
        if int(np.prod(p[0].shape[1:])) >= 128:
            return jac_double_fused(p)
    return jac_double_core(p)


def jac_double_core(p):
    """dbl-2009-l (a=0): 2M + 5S.  Total: identity doubles to identity."""
    X1, Y1, Z1 = p
    A = FQ.mont_sqr(X1)
    B = FQ.mont_sqr(Y1)
    C = FQ.mont_sqr(B)
    t = FQ.mont_sqr(FQ.add(X1, B))
    D = FQ.add(FQ.sub(FQ.sub(t, A), C), FQ.sub(FQ.sub(t, A), C))
    E = FQ.add(FQ.add(A, A), A)
    F = FQ.mont_sqr(E)
    X3 = FQ.sub(FQ.sub(F, D), D)
    C8 = FQ.add(C, C)
    C8 = FQ.add(C8, C8)
    C8 = FQ.add(C8, C8)
    Y3 = FQ.sub(FQ.mont_mul(E, FQ.sub(D, X3)), C8)
    Z3 = FQ.mont_mul(FQ.add(Y1, Y1), Z1)
    return (X3, Y3, Z3)


def jac_add(p, q):
    """General Jacobian addition; dispatches to the fused Pallas kernel on
    TPU (one HLO op — keeps MSM/scan graphs compilable) or the pure-jnp
    formulas elsewhere.  Both paths share jac_add_core."""
    from ..utils.config import use_pallas
    if use_pallas():
        from .pallas_curve import jac_add_fused
        shape = jnp.broadcast_shapes(p[0].shape, q[0].shape)
        if int(np.prod(shape[1:])) >= 128:
            p = tuple(jnp.broadcast_to(a, shape) for a in p)
            q = tuple(jnp.broadcast_to(a, shape) for a in q)
            return jac_add_fused(p, q)
    return jac_add_core(p, q)


def jac_add_core(p, q):
    """add-2007-bl general Jacobian addition with full degenerate handling
    (identity operands, P == Q -> double, P == -Q -> identity)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = FQ.mont_sqr(Z1)
    Z2Z2 = FQ.mont_sqr(Z2)
    U1 = FQ.mont_mul(X1, Z2Z2)
    U2 = FQ.mont_mul(X2, Z1Z1)
    S1 = FQ.mont_mul(FQ.mont_mul(Y1, Z2), Z2Z2)
    S2 = FQ.mont_mul(FQ.mont_mul(Y2, Z1), Z1Z1)
    H = FQ.sub(U2, U1)
    HH = FQ.mont_sqr(FQ.add(H, H))          # I = (2H)^2
    J = FQ.mont_mul(H, HH)
    rr = FQ.sub(S2, S1)
    rr = FQ.add(rr, rr)
    V = FQ.mont_mul(U1, HH)
    X3 = FQ.sub(FQ.sub(FQ.mont_sqr(rr), J), FQ.add(V, V))
    S1J = FQ.mont_mul(S1, J)
    Y3 = FQ.sub(FQ.mont_mul(rr, FQ.sub(V, X3)), FQ.add(S1J, S1J))
    ZZ = FQ.sub(FQ.sub(FQ.mont_sqr(FQ.add(Z1, Z2)), Z1Z1), Z2Z2)
    Z3 = FQ.mont_mul(ZZ, H)
    out = (X3, Y3, Z3)

    p_inf = is_identity(p)
    q_inf = is_identity(q)
    h_zero = FQ.eq(U1, U2)
    r_zero = FQ.eq(S1, S2)
    # H == 0, r == 0 -> doubling;  H == 0, r != 0 -> identity
    out = select_point(h_zero & r_zero, jac_double_core(p), out)
    out = select_point(h_zero & ~r_zero & ~p_inf & ~q_inf,
                       jac_identity(X3.shape[1:]), out)
    out = select_point(q_inf, p, out)
    out = select_point(p_inf, q, out)
    return out


def jac_neg(p):
    X, Y, Z = p
    return (X, FQ.neg(Y), Z)


def mdbl_core(leaf):
    """Double an affine (X, Y) point -> jacobian (mdbl-2007-bl, 1M+5S)."""
    X1, Y1 = leaf
    XX = FQ.mont_sqr(X1)
    YY = FQ.mont_sqr(Y1)
    YYYY = FQ.mont_sqr(YY)
    t = FQ.mont_sqr(FQ.add(X1, YY))
    Sh = FQ.sub(FQ.sub(t, XX), YYYY)
    S = FQ.add(Sh, Sh)
    M = FQ.add(FQ.add(XX, XX), XX)
    T = FQ.sub(FQ.sub(FQ.mont_sqr(M), S), S)
    C8 = FQ.add(YYYY, YYYY)
    C8 = FQ.add(C8, C8)
    C8 = FQ.add(C8, C8)
    Y3 = FQ.sub(FQ.mont_mul(M, FQ.sub(S, T)), C8)
    Z3 = FQ.add(Y1, Y1)
    return (T, Y3, Z3)


def jac_madd_core(p, leaf, fast: bool = False):
    """Mixed add jacobian + affine (madd-2007-bl, 8M+3S; see ll.ll_jac_madd
    for the case analysis and the fast/collision-flag contract).  Returns
    (point, err) with err None unless fast."""
    X1, Y1, Z1 = p
    X2, Y2 = leaf
    Z1Z1 = FQ.mont_sqr(Z1)
    U2 = FQ.mont_mul(X2, Z1Z1)
    S2 = FQ.mont_mul(FQ.mont_mul(Y2, Z1), Z1Z1)
    H = FQ.sub(U2, X1)
    I = FQ.mont_sqr(FQ.add(H, H))
    J = FQ.mont_mul(H, I)
    rr = FQ.sub(S2, Y1)
    rr = FQ.add(rr, rr)
    V = FQ.mont_mul(X1, I)
    X3 = FQ.sub(FQ.sub(FQ.mont_sqr(rr), J), FQ.add(V, V))
    YJ = FQ.mont_mul(Y1, J)
    Y3 = FQ.sub(FQ.mont_mul(rr, FQ.sub(V, X3)), FQ.add(YJ, YJ))
    Z3 = FQ.mont_mul(FQ.add(Z1, Z1), H)
    out = (X3, Y3, Z3)

    p_inf = is_identity(p)
    leaf_inf = FQ.is_zero(Y2)
    h_zero = FQ.eq(U2, X1)
    r_zero = FQ.eq(S2, Y1)
    live = ~p_inf & ~leaf_inf
    shape = X1.shape[1:]

    err = None
    coll = h_zero & r_zero & live
    if fast:
        err = coll
    else:
        out = select_point(coll, mdbl_core(leaf), out)
    out = select_point(h_zero & ~r_zero & live, jac_identity(shape), out)
    one = FQ.ones_mont(shape)
    out = select_point(p_inf, (X2, Y2, one), out)
    out = select_point(leaf_inf, p, out)
    return out, err


def jac_madd(p, leaf, fast: bool = False):
    """Batched mixed add with Pallas dispatch on TPU (>= 128 points)."""
    from ..utils.config import use_pallas
    if use_pallas():
        from .pallas_curve import jac_madd_fused
        shape = jnp.broadcast_shapes(p[0].shape, leaf[0].shape)
        if int(np.prod(shape[1:])) >= 128:
            p = tuple(jnp.broadcast_to(a, shape) for a in p)
            leaf = tuple(jnp.broadcast_to(a, shape) for a in leaf)
            return jac_madd_fused(p, leaf, fast)
    return jac_madd_core(p, leaf, fast)


# -- 16-bit packed affine points --------------------------------------------
# Bulk point data (SRS vectors, MSM gather traffic) travels as (L/2, ...)
# uint32 rows packing limb pairs lo | hi << 16 — half the HBM bytes and
# half the h2d upload of the (L, ...) form.  Kernels unpack at register
# level (ll.split_packed).

def pack_limbs(a):
    """(L, ...) 16-bit limbs in u32 lanes -> (L/2, ...) packed."""
    return a[0::2] | (a[1::2] << np.uint32(16))


def unpack_limbs(a):
    """(L/2, ...) packed -> (L, ...) 16-bit limbs in u32 lanes."""
    lo = a & np.uint32(0xFFFF)
    hi = a >> np.uint32(16)
    out = jnp.stack([lo, hi], axis=1)
    return out.reshape((a.shape[0] * 2,) + a.shape[1:])


def jac_madd_packed(p, leaf_packed, fast: bool = False):
    """jac_madd whose affine leaves are 16-bit packed (L/2, ...) arrays.
    Pallas path keeps them packed into VMEM; the fallback unpacks
    in-graph (CPU testing)."""
    from ..utils.config import use_pallas
    shape = p[0].shape
    if use_pallas() and int(np.prod(shape[1:])) >= 128:
        from .pallas_curve import jac_madd_fused_packed
        return jac_madd_fused_packed(p, leaf_packed, fast)
    leaf = (unpack_limbs(leaf_packed[0]), unpack_limbs(leaf_packed[1]))
    return jac_madd_core(p, leaf, fast)


# -- graph-lean batched reductions ------------------------------------------
# These keep the number of jac_add instances in the traced graph small
# (compile time on TPU scales with HLO op count; one jac_add is ~10^4 ops).

def tree_sum_jac(pj):
    """Total sum along the trailing axis by pairwise halving: log2(n)
    rounds of one large batched jac_add each (vs fold_sum_jac's ~seq
    sequential scan steps of small batches — fewer, fatter kernel launches
    keep the VPU fed for the MSM window fold).

    On CPU (tests/dryrun) the halving schedule's ~log2(n) jac_add
    instances (~12k HLO ops each) blow up XLA:CPU's LLVM compile; the
    scan-based fold keeps ONE instance and compiles in seconds."""
    from ..utils.config import use_pallas
    if not use_pallas():
        return fold_sum_jac(pj)
    n = pj[0].shape[-1]
    while n > 1:
        if n & 1:
            idn = jac_identity(pj[0].shape[1:-1] + (1,))
            pj = tuple(jnp.concatenate([a, b], axis=-1)
                       for a, b in zip(pj, idn))
            n += 1
        half = n // 2
        lo = tuple(a[..., :half] for a in pj)
        hi = tuple(a[..., half:] for a in pj)
        pj = jac_add(lo, hi)
        n = half
    return pj


def fold_sum_jac(pj, seq: int = 64):
    """Total sum of a jacobian batch along the trailing axis.

    Reshapes (.., n) -> (.., n/seq, seq) and folds the seq axis with ONE
    lax.scan jac_add instance; recurses on the n/seq partials.
    """
    import jax

    n = pj[0].shape[-1]
    if n == 1:
        return pj
    if n <= seq:
        xs = tuple(jnp.moveaxis(a, -1, 0)[..., None] for a in pj)
        acc0 = jac_identity(pj[0].shape[1:-1] + (1,))

        def body(acc, x):
            return jac_add(acc, x), None

        acc, _ = jax.lax.scan(body, acc0, xs)
        return acc
    pad = (-n) % seq
    if pad:
        idn = jac_identity(pj[0].shape[1:-1] + (pad,))
        pj = tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(pj, idn))
        n += pad
    rows = n // seq
    pr = tuple(a.reshape(a.shape[:-1] + (rows, seq)) for a in pj)
    xs = tuple(jnp.moveaxis(a, -1, 0) for a in pr)  # (seq, ..., rows)
    acc0 = jac_identity(pj[0].shape[1:-1] + (rows,))

    def body(acc, x):
        return jac_add(acc, x), None

    acc, _ = jax.lax.scan(body, acc0, xs)
    return fold_sum_jac(acc, seq)


def prefix_scan_jac_tree(pj):
    """Inclusive prefix sum along the trailing axis, Hillis-Steele style:
    log2(n) rounds of ONE full-width batched jac_add each (n log n adds
    total vs the two-level scan's ~2n, but fat launches instead of ~n/seq
    sequential small ones — wins when the batch keeps the VPU fed, e.g.
    the MSM row-offset pass).  TPU-only: the log2(n) unrolled jac_add
    instances blow up XLA:CPU LLVM compiles (see tree_sum_jac)."""
    n = pj[0].shape[-1]
    k = 1
    while k < n:
        idn = jac_identity(pj[0].shape[1:-1] + (k,))
        shifted = tuple(jnp.concatenate([i, a[..., :-k]], axis=-1)
                        for i, a in zip(idn, pj))
        pj = jac_add(pj, shifted)
        k *= 2
    return pj


def prefix_scan_jac(pj, seq: int = 64):
    """Inclusive prefix sum (group law) along the trailing axis, with a
    fixed-shape two-level decomposition: O(2n) adds, ~2 jac_add graph
    instances per recursion level (depth <= 3 for n <= 2^18)."""
    import jax

    n = pj[0].shape[-1]
    if n <= seq:
        xs = tuple(jnp.moveaxis(a, -1, 0)[..., None] for a in pj)
        acc0 = jac_identity(pj[0].shape[1:-1] + (1,))

        def body(acc, x):
            nxt = jac_add(acc, x)
            return nxt, nxt

        _, ps = jax.lax.scan(body, acc0, xs)  # (n, L, ..., 1)
        ps = tuple(jnp.moveaxis(a[..., 0], 0, -1) for a in ps)
        return ps
    pad = (-n) % seq
    if pad:
        idn = jac_identity(pj[0].shape[1:-1] + (pad,))
        pj = tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(pj, idn))
    npad = pj[0].shape[-1]
    rows = npad // seq
    pr = tuple(a.reshape(a.shape[:-1] + (rows, seq)) for a in pj)
    xs = tuple(jnp.moveaxis(a, -1, 0) for a in pr)  # (seq, ..., rows)
    acc0 = jac_identity(pj[0].shape[1:-1] + (rows,))

    def body(acc, x):
        nxt = jac_add(acc, x)
        return nxt, nxt

    totals, local = jax.lax.scan(body, acc0, xs)
    # local: (seq, ..., rows) inclusive within-row; totals: (..., rows)
    row_ps = prefix_scan_jac(totals, seq)
    # exclusive row offsets: shift right by one row
    idn1 = jac_identity(pj[0].shape[1:-1] + (1,))
    off = tuple(jnp.concatenate([i1, a[..., :-1]], axis=-1)
                for i1, a in zip(idn1, row_ps))
    local = tuple(jnp.moveaxis(a, 0, -1) for a in local)  # (..., rows, seq)
    ps = jac_add(local, tuple(a[..., None] for a in off))
    ps = tuple(a.reshape(a.shape[:-2] + (npad,)) for a in ps)
    return tuple(a[..., :n] for a in ps)


# -- host <-> device point conversion ---------------------------------------

def points_to_device(points):
    """List of host affine G1 points -> (X, Y) Montgomery limb arrays
    (24, N).  ``None`` (the identity) encodes as (0, 0); see
    affine_to_jac."""
    xs = [0 if p is None else FQ_SPEC.to_mont_int(p[0].v) for p in points]
    ys = [0 if p is None else FQ_SPEC.to_mont_int(p[1].v) for p in points]
    return (jnp.asarray(ints_to_limbs(xs, FQ_SPEC.L)),
            jnp.asarray(ints_to_limbs(ys, FQ_SPEC.L)))


def jac_to_host(p):
    """Device jacobian point(s) -> list of host affine points.

    Z-inversions use the Montgomery batch trick: one modular pow for the
    whole batch instead of one per point (the per-point pow made the MSM
    window-sum conversion ~35 ms for 22 points)."""
    X = [FQ_SPEC.from_mont_int(v) for v in limbs_to_ints(np.asarray(p[0]))]
    Y = [FQ_SPEC.from_mont_int(v) for v in limbs_to_ints(np.asarray(p[1]))]
    Z = [FQ_SPEC.from_mont_int(v) for v in limbs_to_ints(np.asarray(p[2]))]
    # batch-invert the nonzero z's
    nz = [z for z in Z if z != 0]
    inv = {}
    if nz:
        prefix = [1]
        for z in nz:
            prefix.append(prefix[-1] * z % bls.Q)
        acc = pow(prefix[-1], bls.Q - 2, bls.Q)
        for z in reversed(nz):
            inv[z] = acc * prefix[len(prefix) - 2] % bls.Q
            acc = acc * z % bls.Q
            prefix.pop()
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
            continue
        zi = inv[z]
        zi2 = zi * zi % bls.Q
        out.append((bls.Fq(x * zi2 % bls.Q), bls.Fq(y * zi2 % bls.Q * zi % bls.Q)))
    return out
