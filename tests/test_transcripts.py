"""Transcript byte-exactness tests: published vectors + state machines."""

import hashlib

from polymath_tpu.transcript.keccak import keccak256, keccak_f1600_bytes
from polymath_tpu.transcript.strobe import MerlinTranscript
from polymath_tpu.transcript.blake3_py import blake3
from polymath_tpu.transcript import (
    MerlinFieldTranscript, Keccak256Transcript, Blake3Transcript,
)
from polymath_tpu.hostmath.bls12_381 import R


def test_keccak256_vectors():
    assert keccak256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert keccak256(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"


def test_keccak_permutation_vs_hashlib_sha3():
    """Cross-validate the f[1600] permutation via SHA3-256 (0x06 padding)."""
    def sha3_256(data):
        rate = 136
        state = bytearray(200)
        msg = bytearray(data)
        pad = rate - (len(msg) % rate)
        msg += (b"\x06" + b"\x00" * (pad - 2) + b"\x80") if pad >= 2 else b"\x86"
        for bs in range(0, len(msg), rate):
            for i in range(rate):
                state[i] ^= msg[bs + i]
            state = bytearray(keccak_f1600_bytes(bytes(state)))
        return bytes(state[:32])

    for m in [b"", b"abc", b"x" * 135, b"y" * 136, b"z" * 137, b"w" * 500]:
        assert sha3_256(m) == hashlib.sha3_256(m).digest()


def test_merlin_conformance_vector():
    """Conformance vector from the merlin crate's test suite."""
    t = MerlinTranscript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == \
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_blake3_vectors():
    assert blake3(b"").hex() == \
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    # Official test-vector inputs: byte pattern i % 251.
    tv = lambda n: bytes(i % 251 for i in range(n))
    assert blake3(tv(1024)).hex().startswith("42214739f095a406f3fc83deb889744a")
    assert blake3(tv(1025)).hex().startswith("d00278ae47eb27b34faecf67b4fe263f")
    assert blake3(tv(2048)).hex().startswith("e776b6028c7cd22a4d0ba182a8bf6220")


def test_field_transcript_determinism_and_range():
    for T in (MerlinFieldTranscript, Keccak256Transcript, Blake3Transcript):
        t1, t2 = T(b"polymath"), T(b"polymath")
        for t in (t1, t2):
            t.append_message(b"public_inputs", b"\x01\x02\x03")
        c1, c2 = t1.challenge(b"x1"), t2.challenge(b"x1")
        assert c1 == c2 and 0 <= c1 < R
        # divergent messages -> divergent challenges
        t3 = T(b"polymath")
        t3.append_message(b"public_inputs", b"\x01\x02\x04")
        assert t3.challenge(b"x1") != c1
        # challenges advance state
        assert t1.challenge(b"x2") != c1
