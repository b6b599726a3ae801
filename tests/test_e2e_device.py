"""Device-backend end-to-end tests on the CPU fallback (no TPU needed).

VERDICT r2 gap: nothing in the suite invoked create_proof_device /
generate_proving_key_device / msm_device.  These run the REAL device
pipeline (backend="jax") the way bench.py does, matching the reference's
integration tests (tests/dummy.rs:37-73) plus the negative paths of the
in-graph invariants (prover.rs:107-108, 221).
"""

import random

import pytest

from polymath_tpu.hostmath.bls12_381 import R
from polymath_tpu.protocol import Polymath, Rng
from polymath_tpu.transcript import MerlinFieldTranscript
from polymath_tpu.circuits import DummyCircuit
from polymath_tpu.circuits.mimc import MiMCDemo, mimc_hash
from polymath_tpu.frontend.r1cs import lc


def test_device_backend_dummy_e2e():
    rng = Rng(42)
    a = rng.randrange(R)
    b = rng.randrange(R)
    pm = Polymath(transcript=MerlinFieldTranscript, backend="jax")
    pk, vk = pm.setup(DummyCircuit(), rng)
    proof = pm.prove(pk, DummyCircuit(a, b), rng)
    assert pm.verify(vk, [a * b % R], proof)
    # negative: wrong public input rejects
    assert not pm.verify(vk, [(a * b + 1) % R], proof)


def test_device_backend_mimc_reduced_e2e():
    rounds = 5
    crng = random.Random(9)
    consts = [crng.randrange(R) for _ in range(rounds)]
    rng = Rng(7)
    xl, xr = rng.randrange(R), rng.randrange(R)
    image = mimc_hash(xl, xr, consts)
    pm = Polymath(transcript=MerlinFieldTranscript, backend="jax")
    pk, vk = pm.setup(MiMCDemo(constants=consts), rng)
    proof = pm.prove(pk, MiMCDemo(xl, xr, consts), rng)
    assert pm.verify(vk, [image], proof)


class UnsatisfiableCircuit:
    """a*b = c with the input assigned a*b + 1 — synthesizes fine but the
    witness violates the constraint, so the prover's vanishing-division
    exactness check (prover.rs:107-108 analogue) must fire."""

    def __init__(self, a=None, b=None):
        self.a = a
        self.b = b

    def generate_constraints(self, cs):
        a = cs.new_witness_variable(lambda: self.a)
        b = cs.new_witness_variable(lambda: self.b)
        c = cs.new_input_variable(
            lambda: None if (self.a is None or self.b is None)
            else (self.a * self.b + 1) % R)
        cs.enforce_constraint(lc(a), lc(b), lc(c))


def test_device_backend_corrupt_witness_raises():
    rng = Rng(3)
    pm = Polymath(transcript=MerlinFieldTranscript, backend="jax")
    # setup against the HONEST circuit (same matrices either way)
    pk, vk = pm.setup(DummyCircuit(), rng)
    with pytest.raises(AssertionError, match="vanishing division"):
        pm.prove(pk, UnsatisfiableCircuit(5, 7), rng)


def test_msm_device_vs_host_oracle_2_12():
    import jax.numpy as jnp
    from polymath_tpu.hostmath import bls12_381 as bls
    from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs
    from polymath_tpu.ops.curve_jax import points_to_device
    from polymath_tpu.ops.msm import msm_device

    n = 1 << 12
    rng = random.Random(21)
    # distinct points via distinct scalar multiples of the generator
    base_scalars = [rng.randrange(1, R) for _ in range(32)]
    base = [bls.G1.mul(bls.G1.gen, s) for s in base_scalars]
    # build n distinct points cheaply: base[i % 32] + i*G is too slow on
    # host; instead repeat the base points (duplicates exercise the
    # doubling fallback of the safe mode) and add a few identities
    pts = (base * ((n + 31) // 32))[:n]
    pts[5] = None
    pts[77] = None
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[11] = 0
    xs, ys = points_to_device(pts)
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))
    got = msm_device(xs, ys, sc)
    want = bls.G1.msm(pts, scalars)
    assert got == want


def test_msm_tiny_tail_split_vs_host_oracle(monkeypatch):
    """m = k*chunk + t with 0 < t <= 64 peels the tail to a host
    Pippenger (msm.py tail split, the r/d MSM shapes: n+2, 10n+23)."""
    import jax.numpy as jnp
    from polymath_tpu.hostmath import bls12_381 as bls
    from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs
    from polymath_tpu.ops.curve_jax import points_to_device
    from polymath_tpu.ops.msm import msm_device

    monkeypatch.setenv("POLYMATH_MSM_TAIL", "1")
    chunk = 1 << 9
    n = 2 * chunk + 23          # tail of 23 live points past 2 chunks
    rng = random.Random(31)
    base_scalars = [rng.randrange(1, R) for _ in range(64)]
    base = [bls.G1.mul(bls.G1.gen, s) for s in base_scalars]
    pts = (base * ((n + 63) // 64))[:n]
    pts[-3] = None              # identity inside the host tail
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[-1] = 0             # zero scalar inside the host tail
    xs, ys = points_to_device(pts)
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))
    got = msm_device(xs, ys, sc, chunk=chunk)
    want = bls.G1.msm(pts, scalars)
    assert got == want
    # bases longer than the scalar vector (pre-padded SRS shape): the
    # base arrays are not sliced, trailing bases get zero scalars
    got2 = msm_device(xs, ys, sc[:, :n - 40], chunk=chunk)
    want2 = bls.G1.msm(pts[:n - 40], scalars[:n - 40])
    assert got2 == want2


def test_msm_fast_mode_flags_collisions():
    import jax.numpy as jnp
    from polymath_tpu.hostmath import bls12_381 as bls
    from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs
    from polymath_tpu.ops.curve_jax import points_to_device
    from polymath_tpu.ops.msm import msm_device

    p = bls.G1.mul(bls.G1.gen, 1234567)
    pts = [p, p]  # duplicate base: same digit -> adjacent in every window
    scalars = [5, 5]
    xs, ys = points_to_device(pts)
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))
    with pytest.raises(AssertionError, match="collision"):
        msm_device(xs, ys, sc, fast=True)
    # safe mode handles the doubling
    assert msm_device(xs, ys, sc, fast=False) == bls.G1.msm(pts, scalars)
