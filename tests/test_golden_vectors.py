"""Frozen golden byte vectors (VERDICT r1 item 8).

With a fixed Rng seed (trapdoors + blinding) and fixed DummyCircuit
witness, the serialized VerifyingKey, the 176-byte proof, and both
Fiat-Shamir challenges must be byte-identical run over run, for all
three transcripts.  Any change to the arkworks-compatible compressed
codecs (serial/codec.py — flag bits, length prefixes, endianness), the
transcript state machines, or the challenge schema (protocol/common.py)
fails this test; kernel/backend work can never silently change bytes.

Fixture produced by the host-backend protocol oracle (itself validated
against published Merlin/Keccak/Blake3 vectors in test_transcripts.py).
Reference formats: to_bytes! macro.rs:7-12, challenge schema
common.rs:21-37, struct layouts data_structures.rs:10-50.
"""

import json
import os

import pytest

from polymath_tpu.protocol import Polymath, Rng
from polymath_tpu.protocol import common
from polymath_tpu.transcript import ALL_TRANSCRIPTS
from polymath_tpu.circuits import DummyCircuit
from polymath_tpu.hostmath.bls12_381 import R

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_dummy.json")


@pytest.mark.parametrize("transcript", ALL_TRANSCRIPTS, ids=lambda t: t.name)
def test_golden_dummy_bytes(transcript):
    with open(FIXTURE) as f:
        golden = json.load(f)[transcript.name]

    rng = Rng(1234)
    pm = Polymath(transcript=transcript, backend="host")
    pk, vk = pm.setup(DummyCircuit(), rng)
    a, b = 5, 7
    proof = pm.prove(pk, DummyCircuit(a, b), rng)
    pub = [1, a * b % R]

    t = transcript(common.B_POLYMATH)
    x1 = common.compute_x1(t, pub, [proof.a_g1, proof.c_g1])
    y1 = common.compute_y1(x1, vk.sigma)
    y1_gamma = common.neg_power(y1, common.MINUS_GAMMA)
    y1_alpha = common.neg_power(y1, common.MINUS_ALPHA)
    pi = common.compute_pi_at_x1(vk, pub, x1, y1_gamma)
    c_at_x1 = common.compute_c_at_x1(y1_gamma, y1_alpha, proof.a_at_x1, pi)
    x2 = common.compute_x2(t, x1, [proof.a_at_x1, c_at_x1])

    assert vk.to_bytes().hex() == golden["vk"], "VerifyingKey bytes changed"
    assert proof.to_bytes().hex() == golden["proof"], "Proof bytes changed"
    assert hex(x1) == golden["x1"], "challenge x1 changed"
    assert hex(x2) == golden["x2"], "challenge x2 changed"
    assert pm.verify(vk, [a * b % R], proof)


RUST_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                            "rust_dummy.json")


@pytest.mark.skipif(not os.path.exists(RUST_FIXTURE),
                    reason="Rust reference vectors not imported (cargo is "
                           "unavailable here; see tools/rust_vectors/)")
def test_rust_reference_vectors():
    """Proofs produced by the actual Rust reference crate must verify
    under this repo's verifier (byte-exact codec + transcript + pairing
    cross-validation; tools/import_rust_vectors.py installs the fixture)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import import_rust_vectors

    import_rust_vectors.check(RUST_FIXTURE)
