"""Host math substrate tests: fields, tower, curves, pairing."""

import random

import pytest

from polymath_tpu.hostmath import (
    Fq, Fr, Fq2, Fq6, Fq12, G1, G2, Q, R,
    pairing, multi_pairing, FR_TWO_ADIC_ROOT, FR_TWO_ADICITY,
)

rng = random.Random(1234)


def test_fr_field_axioms():
    for _ in range(20):
        a, b, c = (Fr.rand(rng) for _ in range(3))
        assert (a + b) * c == a * c + b * c
        assert a * b == b * a
        if not a.is_zero():
            assert a * a.inv() == Fr.one()
    assert Fr(R - 1) + Fr.one() == Fr.zero()


def test_fq_sqrt():
    for _ in range(10):
        a = Fq.rand(rng)
        sq = a * a
        r = sq.sqrt()
        assert r is not None and (r == a or r == -a)


def test_two_adic_root():
    w = Fr(FR_TWO_ADIC_ROOT)
    assert w.pow(1 << FR_TWO_ADICITY) == Fr.one()
    assert w.pow(1 << (FR_TWO_ADICITY - 1)) != Fr.one()


def test_fq12_tower():
    for _ in range(5):
        a, b = Fq12.rand(rng), Fq12.rand(rng)
        assert a * b == b * a
        assert (a * b) * a.inv() == b * (a * a.inv())
        assert a * a.inv() == Fq12.one()


def test_g1_group_law():
    a, b = rng.randrange(R), rng.randrange(R)
    P, Qp = G1.mul(G1.gen, a), G1.mul(G1.gen, b)
    assert G1.is_on_curve(P)
    assert G1.add(P, Qp) == G1.mul(G1.gen, (a + b) % R)
    assert G1.add(P, G1.neg(P)) is None
    assert G1.add(P, None) == P
    assert G1.double(P) == G1.mul(G1.gen, 2 * a % R)


def test_g2_group_law():
    a = rng.randrange(R)
    P = G2.mul(G2.gen, a)
    assert G2.is_on_curve(P)
    assert G2.add(P, P) == G2.mul(G2.gen, 2 * a % R)


def test_g1_msm_matches_naive():
    pts = [G1.mul(G1.gen, rng.randrange(R)) for _ in range(40)]
    scalars = [rng.randrange(R) for _ in range(40)]
    expected = None
    for p, s in zip(pts, scalars):
        expected = G1.add(expected, G1.mul(p, s))
    assert G1.msm(pts, scalars) == expected


def test_pairing_bilinear():
    a, b = rng.randrange(R), rng.randrange(R)
    e = pairing(G1.gen, G2.gen)
    assert e != Fq12.one()
    assert e.pow(R) == Fq12.one()
    assert pairing(G1.mul(G1.gen, a), G2.mul(G2.gen, b)) == e.pow(a * b % R)


def test_multi_pairing_cancellation():
    a = rng.randrange(R)
    aP = G1.mul(G1.gen, a)
    assert multi_pairing([aP, G1.neg(aP)], [G2.gen, G2.gen]) == Fq12.one()
