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


# -- external cross-implementation vectors ----------------------------------
# The zkcrypto/IETF-draft BLS12-381 generator encodings (big-endian x with
# flag bits in the FIRST byte: 0x80 compressed, 0x40 infinity, 0x20 y
# lexicographically largest).  arkworks -- and this codec, which must be
# byte-compatible with it for Fiat-Shamir (reference macro.rs:7-12,
# data_structures.rs:25-34) -- serializes the same x little-endian with its
# flags in the LAST byte.  For the generators (whose y is the smaller
# root: both sign flags 0), the two encodings are exact byte reversals up
# to zkcrypto's always-set compression bit.  Source of the constants:
# zkcrypto/bls12_381 documentation / IETF hash-to-curve draft suites.
ZKCRYPTO_G1_GEN = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb")
ZKCRYPTO_G2_GEN = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
    "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
    "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8")


def test_g1_generator_external_vector():
    ours = codec.g1_to_bytes(G1.gen)
    rev = ours[::-1]
    assert rev[1:] == ZKCRYPTO_G1_GEN[1:]
    assert rev[0] | 0x80 == ZKCRYPTO_G1_GEN[0]
    # independent decode of the external bytes reproduces our x constant
    x = int.from_bytes(
        bytes([ZKCRYPTO_G1_GEN[0] & 0x1F]) + ZKCRYPTO_G1_GEN[1:], "big")
    assert x == G1.gen[0].v


def test_g2_generator_external_vector():
    """Closes the r3/r4 gap: an external-source vector through the
    96-byte compressed G2 codec (the three VK G2 points feed the pairing
    check, reference data_structures.rs:25-34)."""
    ours = codec.g2_to_bytes(G2.gen)
    assert len(ours) == 96
    rev = ours[::-1]
    assert rev[1:] == ZKCRYPTO_G2_GEN[1:]
    assert rev[0] | 0x80 == ZKCRYPTO_G2_GEN[0]
    # independent decode: zkcrypto G2 x = BE(c1) || BE(c0)
    x_c1 = int.from_bytes(
        bytes([ZKCRYPTO_G2_GEN[0] & 0x1F]) + ZKCRYPTO_G2_GEN[1:48], "big")
    x_c0 = int.from_bytes(ZKCRYPTO_G2_GEN[48:], "big")
    assert x_c0 == G2.gen[0].c0.v and x_c1 == G2.gen[0].c1.v
    # and our codec round-trips the externally-anchored point
    assert codec.g2_from_bytes(ours, validate=True) == G2.gen
