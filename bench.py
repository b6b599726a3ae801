"""End-to-end prover benchmark (reference benches/bench.rs harness).

Workload: BenchCircuit (a*b=c replicated) with NUM_CONSTRAINTS R1CS
constraints, BLS12-381, Merlin transcript — the reference uses
(1 << 20) - 100 (bench.rs:16); size here is env-tunable because first-run
XLA/Mosaic compiles are cached but expensive.

Prints ONE JSON line:
  {"metric": "prove_ns_per_constraint", "value": N, "unit": "ns/constraint",
   "vs_baseline": R}

The reference publishes no numbers (BASELINE.md), so vs_baseline is
reported against an arkworks-class CPU reference estimate of 1.0 (parity
placeholder).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    num_constraints = int(os.environ.get(
        "POLYMATH_BENCH_CONSTRAINTS", (1 << 18) - 100))
    num_variables = int(os.environ.get(
        "POLYMATH_BENCH_VARIABLES", num_constraints))
    reps = int(os.environ.get("POLYMATH_BENCH_REPS", 1))

    from polymath_tpu.protocol import Polymath, Rng
    from polymath_tpu.transcript import MerlinFieldTranscript
    from polymath_tpu.circuits import BenchCircuit
    from polymath_tpu.hostmath.bls12_381 import R

    rng = Rng(0)
    a = rng.randrange(R)
    b = rng.randrange(R)

    def circuit():
        return BenchCircuit(a, b, num_variables=num_variables,
                            num_constraints=num_constraints)

    pm = Polymath(transcript=MerlinFieldTranscript, backend="jax")
    t0 = time.time()
    pk, vk = pm.setup(circuit(), rng)
    setup_s = time.time() - t0
    print(f"# setup: {setup_s:.1f}s (n={pk.vk.n})", file=sys.stderr)

    # warm-up proof (compiles); then timed reps
    t0 = time.time()
    proof = pm.prove(pk, circuit(), rng)
    warm_s = time.time() - t0
    print(f"# warm prove (incl compiles): {warm_s:.1f}s", file=sys.stderr)
    assert pm.verify(vk, [a * b % R], proof), "bench proof failed to verify"

    times = []
    for _ in range(reps):
        t0 = time.time()
        proof = pm.prove(pk, circuit(), rng)
        times.append(time.time() - t0)
    prove_s = min(times)
    assert pm.verify(vk, [a * b % R], proof)
    print(f"# steady prove: {prove_s:.2f}s", file=sys.stderr)

    ns_per_constraint = prove_s * 1e9 / num_constraints
    print(json.dumps({
        "metric": "prove_ns_per_constraint",
        "value": round(ns_per_constraint, 1),
        "unit": "ns/constraint",
        "vs_baseline": 1.0,
        "detail": {
            "num_constraints": num_constraints,
            "prove_seconds": round(prove_s, 3),
            "setup_seconds": round(setup_s, 1),
            "domain_n": pk.vk.n,
            "verify": True,
        },
    }))


if __name__ == "__main__":
    main()
