"""arkworks-compatible codec tests: round-trips, flags, length prefixes."""

import random

import pytest

from polymath_tpu.serial import codec
from polymath_tpu.hostmath import G1, G2, R, Q, Fq

rng = random.Random(7)


def test_fr_roundtrip():
    for v in [0, 1, R - 1, rng.randrange(R)]:
        b = codec.fr_to_bytes(v)
        assert len(b) == 32
        assert codec.fr_from_bytes(b) == v
    with pytest.raises(ValueError):
        codec.fr_from_bytes(R.to_bytes(32, "little"))


def test_g1_roundtrip_and_flags():
    for _ in range(4):
        p = G1.rand(rng)
        b = codec.g1_to_bytes(p)
        assert len(b) == 48
        assert codec.g1_from_bytes(b) == p
        # y flag bit actually flips the recovered point
        flipped = bytearray(b)
        flipped[-1] ^= 0x80
        q = codec.g1_from_bytes(bytes(flipped))
        assert q == G1.neg(p)


def test_g1_infinity():
    b = codec.g1_to_bytes(None)
    assert b[:-1] == bytes(47) and b[-1] == 0x40
    assert codec.g1_from_bytes(b) is None


def test_g1_rejects_off_curve_and_out_of_subgroup():
    # x = 1 is not on the curve-or-subgroup for BLS12-381 G1 w/ b=4?
    # construct explicit garbage: x >= q
    bad = bytearray(48)
    bad[:48] = (Q + 1).to_bytes(48, "little")
    with pytest.raises(ValueError):
        codec.g1_from_bytes(bytes(bad))


def test_g2_roundtrip():
    p = G2.rand(rng)
    b = codec.g2_to_bytes(p)
    assert len(b) == 96
    assert codec.g2_from_bytes(b) == p
    assert codec.g2_from_bytes(codec.g2_to_bytes(None)) is None


def test_vec_prefix():
    vals = [1, 2, 3]
    b = codec.fr_vec_to_bytes(vals)
    assert b[:8] == (3).to_bytes(8, "little")
    assert len(b) == 8 + 3 * 32


def test_g1_generator_known_bytes():
    """The generator's compressed encoding: LE(x) with the sign flag for
    its (known) y coordinate."""
    b = codec.g1_to_bytes(G1.gen)
    x_le = G1.gen[0].v.to_bytes(48, "little")
    assert b[:47] == x_le[:47]
    assert (b[-1] & 0x3F) == x_le[-1]  # top bits only used by flags
    # y of the standard generator is the "negative" (smaller) root
    expected_flag = 0x80 if G1.gen[1].is_positive() else 0x00
    assert (b[-1] & 0xC0) == expected_flag
