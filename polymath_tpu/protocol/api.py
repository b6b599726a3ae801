"""Public SNARK API (reference ``src/lib.rs`` ``Polymath<E, T>``).

    pm = Polymath(transcript=MerlinFieldTranscript, backend="auto")
    pk, vk = pm.setup(circuit, rng)
    proof = pm.prove(pk, circuit, rng)
    assert pm.verify(vk, [public_input, ...], proof)

Backends: "host" (pure-Python oracle, small circuits), "jax" (TPU device
path for NTT/MSM bulk work), "auto" (jax when available, else host).
"""

from __future__ import annotations

import random
import secrets

from ..transcript.transcripts import MerlinFieldTranscript
from . import generator as _generator
from . import prover as _prover
from . import verifier as _verifier


class PolymathError(Exception):
    pass


class Rng:
    """RNG façade (replaces the caller-supplied ``impl Rng`` of reference
    prover.rs:110 / generator.rs:72-77).

    Default (seed=None) is a CSPRNG (`secrets.SystemRandom`): the trapdoors
    x, z and the blinding poly r_a protect zero-knowledge, so predictable
    randomness is a soundness/privacy bug.  Pass a seed ONLY for
    reproducible tests/fixtures — that mode uses a Mersenne Twister and is
    not cryptographically secure."""

    def __init__(self, seed=None):
        self._r = secrets.SystemRandom() if seed is None else random.Random(seed)

    def randrange(self, *args):
        return self._r.randrange(*args)


class Polymath:
    def __init__(self, transcript=MerlinFieldTranscript, backend: str = "auto"):
        self.transcript = transcript
        if backend == "auto":
            try:
                from ..ops import backend_available
                backend = "jax" if backend_available() else "host"
            except Exception:
                backend = "host"
        self.backend = backend

    # -- setup ------------------------------------------------------------
    def setup(self, circuit, rng=None):
        rng = rng or Rng()
        if self.backend == "jax":
            from ..ops.srs import generate_proving_key_device
            pk = generate_proving_key_device(circuit, rng)
        else:
            pk = _generator.generate_proving_key(circuit, rng)
        return pk, pk.vk

    # -- prove ------------------------------------------------------------
    def prove(self, pk, circuit, rng=None):
        rng = rng or Rng()
        if self.backend == "jax":
            from ..ops.prover_jax import create_proof_device
            return create_proof_device(circuit, pk, rng, self.transcript)
        return _prover.create_proof(circuit, pk, rng, self.transcript)

    # -- verify -----------------------------------------------------------
    def process_vk(self, vk):
        return vk

    def verify(self, vk, public_inputs, proof) -> bool:
        return _verifier.verify_proof(vk, proof, public_inputs, self.transcript)
