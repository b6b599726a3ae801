"""MiMC end-to-end (reference tests/mimc.rs:145-227): LongsightF322p3
preimage proofs, setup -> prove -> verify over fresh random preimages.

The reference runs 50 samples of the 322-round circuit; the host oracle
here is Python, so the full-size circuit runs 2 samples and a reduced
32-round instance (same structure, 2 constraints/round) covers more
samples cheaply.
"""

import random

import pytest

from polymath_tpu.protocol import Polymath, Rng
from polymath_tpu.circuits.mimc import MiMCDemo, mimc_hash, MIMC_ROUNDS
from polymath_tpu.hostmath.bls12_381 import R


def _run_samples(rounds: int, samples: int, seed: int):
    rng = Rng(seed)
    consts = [rng.randrange(R) for _ in range(rounds)]
    pm = Polymath(backend="host")
    pk, vk = pm.setup(MiMCDemo(constants=consts), rng)
    for _ in range(samples):
        xl, xr = rng.randrange(R), rng.randrange(R)
        image = mimc_hash(xl, xr, consts)
        proof = pm.prove(pk, MiMCDemo(xl, xr, consts), rng)
        assert pm.verify(vk, [image], proof)
        assert not pm.verify(vk, [(image + 1) % R], proof)
    return pk, vk


def test_mimc_reduced_rounds_many_samples():
    _run_samples(rounds=32, samples=4, seed=7)


def test_mimc_322_full_size():
    """Full LongsightF322p3 (~644 R1CS constraints, mimc.rs:31)."""
    pk, vk = _run_samples(rounds=MIMC_ROUNDS, samples=2, seed=11)
    # dimension facts from the reference circuit: 2 constraints/round,
    # 1 public input (the image)
    assert vk.m0 == 2  # leading 1 + image
    assert vk.n == 2048
