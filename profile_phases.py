"""Phase-level profiling of setup/prove at a configurable size."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = int(os.environ.get("N", 4096))


def t(label, f, *a, **k):
    t0 = time.time()
    r = f(*a, **k)
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)
    return r


from polymath_tpu.protocol import Polymath, Rng
from polymath_tpu.transcript import MerlinFieldTranscript
from polymath_tpu.circuits import BenchCircuit
from polymath_tpu.hostmath.bls12_381 import R

rng = Rng(0)
a = rng.randrange(R)
b = rng.randrange(R)

def circuit():
    return BenchCircuit(a, b, num_variables=N, num_constraints=N)

# -- setup phases -----------------------------------------------------------
from polymath_tpu.frontend.r1cs import synthesize, ConstraintSystem
from polymath_tpu.frontend.sap import SAPMatrices

cs = t("synthesize(setup)", synthesize, circuit(), ConstraintSystem.SETUP)
sap = t("SAPMatrices", SAPMatrices.from_constraint_system, cs)

import polymath_tpu.ops.srs as srs
import polymath_tpu.ops.fixed_base as fb

t("_g1_table", fb._g1_table)

pm = Polymath(transcript=MerlinFieldTranscript, backend="jax")
pk, vk = t("setup(full)", pm.setup, circuit(), rng)
proof = t("prove(warm)", pm.prove, pk, circuit(), rng)
ok = t("verify", pm.verify, vk, [a * b % R], proof)
assert ok
proof = t("prove(steady)", pm.prove, pk, circuit(), rng)
assert pm.verify(vk, [a * b % R], proof)
