"""Device (JAX) op unit tests — small sizes, CPU-friendly.

Covers the limb field engine, NTT, sparse matvec, and the affine-scan
synthetic division against the host oracle.  MSM and the full device
prover are TPU-scale (compile-heavy) and exercised by bench.py /
__graft_entry__.dryrun_multichip instead.
"""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from polymath_tpu.ops.limbs import (
    FR_SPEC, FQ_SPEC, ints_to_limbs, limbs_to_ints, int_to_limbs)
from polymath_tpu.ops.field_jax import FieldOps, FR, FQ
from polymath_tpu.hostmath.bls12_381 import R, Q

rng = random.Random(11)


def _roundtrip(spec, ops_vals):
    return [spec.from_mont_int(v) for v in limbs_to_ints(np.asarray(ops_vals))]


@pytest.mark.parametrize("spec,ops", [(FR_SPEC, FR), (FQ_SPEC, FQ)],
                         ids=["Fr", "Fq"])
def test_field_ops_vs_host(spec, ops):
    p = spec.modulus
    xs = [0, 1, p - 1, p - 2] + [rng.randrange(p) for _ in range(12)]
    ys = [0, p - 1, p - 1, 1] + [rng.randrange(p) for _ in range(12)]
    ax = jnp.asarray(ints_to_limbs([spec.to_mont_int(v) for v in xs], spec.L))
    ay = jnp.asarray(ints_to_limbs([spec.to_mont_int(v) for v in ys], spec.L))

    @jax.jit
    def all_ops(ax, ay):
        return (ops.mont_mul(ax, ay), ops.add(ax, ay), ops.sub(ax, ay),
                ops.neg(ax))

    mul_r, add_r, sub_r, neg_r = all_ops(ax, ay)
    assert _roundtrip(spec, mul_r) == [x * y % p for x, y in zip(xs, ys)]
    assert _roundtrip(spec, add_r) == [(x + y) % p for x, y in zip(xs, ys)]
    assert _roundtrip(spec, sub_r) == [(x - y) % p for x, y in zip(xs, ys)]
    assert _roundtrip(spec, neg_r) == [(-x) % p for x in xs]


def test_sum_reduce_and_redc():
    p = R
    vals = [rng.randrange(p) for _ in range(300)]
    a = jnp.asarray(ints_to_limbs([FR_SPEC.to_mont_int(v) for v in vals],
                                  FR_SPEC.L))
    got = _roundtrip(FR_SPEC, jax.jit(lambda x: FR.sum_reduce(x, axis=1))(a))
    assert got == [sum(vals) % p]


def test_ntt_small_vs_host():
    from polymath_tpu.ops.ntt import ntt
    from polymath_tpu.protocol.poly_host import Radix2Domain
    n = 16
    coeffs = [rng.randrange(R) for _ in range(n)]
    dom = Radix2Domain(n)
    dev = jnp.asarray(ints_to_limbs(
        [FR_SPEC.to_mont_int(c) for c in coeffs], FR_SPEC.L))
    got = _roundtrip(FR_SPEC, ntt(dev))
    assert got == dom.fft(coeffs)
    back = _roundtrip(FR_SPEC, ntt(ntt(dev), inverse=True))
    assert back == coeffs


def test_sparse_matvec_vs_host():
    from polymath_tpu.ops.sparse import CooMatrix, coo_matvec
    from polymath_tpu.frontend.sap import sparse_matvec
    rows = []
    ncols = 20
    for _ in range(15):
        row = [(rng.randrange(R), rng.randrange(ncols))
               for _ in range(rng.randrange(0, 4))]
        rows.append(row)
    z = [rng.randrange(R) for _ in range(ncols)]
    mat = CooMatrix.from_sparse_rows(rows, ncols)
    z_dev = jnp.asarray(ints_to_limbs(
        [FR_SPEC.to_mont_int(v) for v in z], FR_SPEC.L))
    got = _roundtrip(FR_SPEC, jax.jit(
        lambda zz: coo_matvec(mat, zz))(z_dev))
    assert got == sparse_matvec(rows, z)


def test_synthetic_divide_device_vs_host():
    from polymath_tpu.ops.poly_jax import synthetic_divide_device
    from polymath_tpu.protocol.poly_host import synthetic_divide
    dlen = 150
    coeffs = [rng.randrange(R) for _ in range(dlen)]
    x1 = rng.randrange(R)
    q_host, rem_host = synthetic_divide(coeffs, x1)
    dev = jnp.asarray(ints_to_limbs(
        [FR_SPEC.to_mont_int(c) for c in coeffs], FR_SPEC.L))
    x1_m = jnp.asarray(ints_to_limbs([FR_SPEC.to_mont_int(x1)], FR_SPEC.L))
    q_dev, rem_dev = jax.jit(synthetic_divide_device)(dev, x1_m)
    assert _roundtrip(FR_SPEC, q_dev) == q_host
    assert _roundtrip(FR_SPEC, rem_dev) == [rem_host]


def test_powers_and_eval():
    from polymath_tpu.ops.ntt import powers_of, poly_eval_device
    from polymath_tpu.protocol.poly_host import poly_eval
    x = rng.randrange(R)
    xm = jnp.asarray(ints_to_limbs([FR_SPEC.to_mont_int(x)], FR_SPEC.L))
    pw = _roundtrip(FR_SPEC, jax.jit(lambda a: powers_of(a, 10))(xm))
    assert pw == [pow(x, i, R) for i in range(10)]
    coeffs = [rng.randrange(R) for _ in range(50)]
    dev = jnp.asarray(ints_to_limbs(
        [FR_SPEC.to_mont_int(c) for c in coeffs], FR_SPEC.L))
    got = _roundtrip(FR_SPEC, jax.jit(poly_eval_device)(dev, xm))
    assert got == [poly_eval(coeffs, x)]


def test_window_digits():
    scalars = [rng.randrange(R) for _ in range(8)]
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))
    c = 13
    windows = (255 + c - 1) // c
    digits = np.asarray(jax.jit(
        lambda s: FR.window_digits(s, c, windows))(sc))
    for i, s in enumerate(scalars):
        for w in range(windows):
            assert digits[w, i] == (s >> (w * c)) & ((1 << c) - 1), (i, w)


def test_ll_mont_sqr_vs_host():
    """Dedicated SOS Montgomery squaring (ll.LLOps.mont_sqr) vs python
    ints, both fields, edge values included."""
    from polymath_tpu.ops.ll import LL_FR, LL_FQ

    for spec, LL in ((FR_SPEC, LL_FR), (FQ_SPEC, LL_FQ)):
        p = spec.modulus
        vals = [0, 1, p - 1, p - 2, (1 << 255) % p] + \
            [rng.randrange(p) for _ in range(24)]
        arr = np.asarray(ints_to_limbs(
            [spec.to_mont_int(v) for v in vals], spec.L))
        lst = [jnp.asarray(arr[i]) for i in range(spec.L)]
        out = LL.mont_sqr(lst)
        got = [spec.from_mont_int(v) for v in limbs_to_ints(
            np.stack([np.asarray(x) for x in out]))]
        assert got == [v * v % p for v in vals], spec.name
