"""End-to-end: setup -> prove -> verify on the reference's test circuits
(mirrors tests/dummy.rs), host backend, all three transcripts."""

import dataclasses

import pytest

from polymath_tpu.protocol import Polymath, Rng, Proof
from polymath_tpu.transcript import ALL_TRANSCRIPTS
from polymath_tpu.circuits import DummyCircuit
from polymath_tpu.hostmath.bls12_381 import R


@pytest.mark.parametrize("transcript", ALL_TRANSCRIPTS, ids=lambda t: t.name)
def test_dummy_polymath(transcript):
    rng = Rng(42)
    pm = Polymath(transcript=transcript, backend="host")
    pk, vk = pm.setup(DummyCircuit(), rng)
    a, b = rng.randrange(R), rng.randrange(R)
    proof = pm.prove(pk, DummyCircuit(a, b), rng)
    assert pm.verify(vk, [a * b % R], proof)
    assert not pm.verify(vk, [(a * b + 1) % R], proof)
    bad = dataclasses.replace(proof, a_at_x1=(proof.a_at_x1 + 1) % R)
    assert not pm.verify(vk, [a * b % R], bad)


def test_proof_serialization_roundtrip():
    rng = Rng(3)
    pm = Polymath(backend="host")
    pk, vk = pm.setup(DummyCircuit(), rng)
    a, b = rng.randrange(R), rng.randrange(R)
    proof = pm.prove(pk, DummyCircuit(a, b), rng)
    blob = proof.to_bytes()
    assert len(blob) == 176  # 3 x G1 (48) + Fr (32), data_structures.rs:10-19
    proof2 = Proof.from_bytes(blob)
    assert proof2 == proof
    assert pm.verify(vk, [a * b % R], proof2)


def test_vk_serialization_roundtrip():
    rng = Rng(4)
    pm = Polymath(backend="host")
    pk, vk = pm.setup(DummyCircuit(), rng)
    from polymath_tpu.protocol.data_structures import VerifyingKey
    blob = vk.to_bytes()
    vk2 = VerifyingKey.from_bytes(blob)
    a, b = rng.randrange(R), rng.randrange(R)
    proof = pm.prove(pk, DummyCircuit(a, b), rng)
    assert pm.verify(vk2, [a * b % R], proof)


def test_proofs_bind_to_circuit_randomness():
    """Two proofs of the same statement differ (blinding) but both verify."""
    rng = Rng(5)
    pm = Polymath(backend="host")
    pk, vk = pm.setup(DummyCircuit(), rng)
    a, b = 3, 5
    p1 = pm.prove(pk, DummyCircuit(a, b), rng)
    p2 = pm.prove(pk, DummyCircuit(a, b), rng)
    assert p1 != p2
    assert pm.verify(vk, [15], p1) and pm.verify(vk, [15], p2)
