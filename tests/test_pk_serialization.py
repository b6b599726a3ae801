"""ProvingKey / SAPMatrices persistence (reference derives
CanonicalSerialize on both: data_structures.rs:56-73, common.rs:112):
setup once -> save -> load -> prove with the loaded key.
"""

import random

from polymath_tpu.protocol import Polymath, Rng
from polymath_tpu.protocol.data_structures import ProvingKey, sap_to_bytes, sap_from_reader
from polymath_tpu.serial.codec import Reader
from polymath_tpu.circuits import DummyCircuit
from polymath_tpu.circuits.mimc import MiMCDemo, mimc_hash
from polymath_tpu.hostmath.bls12_381 import R


def test_sap_matrices_roundtrip():
    rng = Rng(21)
    consts = [rng.randrange(R) for _ in range(8)]
    pm = Polymath(backend="host")
    pk, _ = pm.setup(MiMCDemo(constants=consts), rng)
    sap = pk.sap_matrices
    blob = sap_to_bytes(sap)
    sap2 = sap_from_reader(Reader(blob))
    assert sap2.num_instance_variables == sap.num_instance_variables
    assert sap2.num_r1cs_witness_variables == sap.num_r1cs_witness_variables
    assert sap2.num_r1cs_constraints == sap.num_r1cs_constraints
    assert sap2.a == sap.a and sap2.b == sap.b and sap2.c == sap.c


def test_proving_key_bytes_roundtrip_then_prove():
    rng = Rng(22)
    pm = Polymath(backend="host")
    pk, vk = pm.setup(DummyCircuit(), rng)
    blob = pk.to_bytes()
    pk2 = ProvingKey.from_bytes(blob)
    assert pk2.to_bytes() == blob  # byte-stable
    a, b = rng.randrange(R), rng.randrange(R)
    proof = pm.prove(pk2, DummyCircuit(a, b), rng)
    assert pm.verify(vk, [a * b % R], proof)
    # and the reloaded vk verifies too
    assert pm.verify(pk2.vk, [a * b % R], proof)


def test_proving_key_npz_roundtrip(tmp_path):
    rng = Rng(23)
    consts = [rng.randrange(R) for _ in range(8)]
    pm = Polymath(backend="host")
    pk, vk = pm.setup(MiMCDemo(constants=consts), rng)
    path = str(tmp_path / "pk.npz")
    pk.save_npz(path)
    pk2 = ProvingKey.load_npz(path, host_points=True)
    assert pk2.vk.to_bytes() == vk.to_bytes()
    # all six SRS vectors survive with exact host coordinates
    from polymath_tpu.protocol.data_structures import _PK_VECTORS
    for name in _PK_VECTORS:
        assert getattr(pk2, name) == getattr(pk, name), name
    xl, xr = rng.randrange(R), rng.randrange(R)
    image = mimc_hash(xl, xr, consts)
    proof = pm.prove(pk2, MiMCDemo(xl, xr, consts), rng)
    assert pm.verify(vk, [image], proof)
