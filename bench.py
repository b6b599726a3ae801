"""End-to-end prover benchmark (reference benches/bench.rs harness).

Workload: BenchCircuit (a*b=c replicated) with NUM_CONSTRAINTS R1CS
constraints, BLS12-381, Merlin transcript — matching the reference
(1 << 20) - 100 (bench.rs:16-17).  Overridable via env for smoke runs:
  POLYMATH_BENCH_CONSTRAINTS / _VARIABLES / _REPS

Prints ONE JSON line:
  {"metric": "prove_ns_per_constraint", "value": N, "unit": "ns/constraint",
   "vs_baseline": R}

The reference publishes no numbers (BASELINE.md: "published": {}), so
vs_baseline is computed against a documented arkworks-class CPU estimate:
~25 s wall-clock for the 2^20-constraint prove (≈ 12n G1 products at
~4 Mpts/s on a 16-thread CPU + 6 NTTs), i.e. BASELINE_NS_PER_CONSTRAINT
= 25e9 / 2^20 ≈ 23.8 us/constraint.  vs_baseline > 1 means faster than
that estimate.

Heavy one-time work is cached on disk (machine-local):
  .bench_cache/pk_<n>_<seed>.npz   — the proving key / SRS (gitignored)
  ~/.cache/polymath_jax            — XLA persistent compilation cache
so driver re-runs skip setup and compiles.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# phase timers on stderr by default (the JSON line goes to stdout); gives
# the driver log the trace/compile/execute split per phase
os.environ.setdefault("POLYMATH_TRACE", "1")

BASELINE_NS_PER_CONSTRAINT = 25e9 / (1 << 20)  # documented estimate, see above


def main():
    num_constraints = int(os.environ.get(
        "POLYMATH_BENCH_CONSTRAINTS", (1 << 20) - 100))
    num_variables = int(os.environ.get(
        "POLYMATH_BENCH_VARIABLES", num_constraints))
    reps = int(os.environ.get("POLYMATH_BENCH_REPS", 3))

    # persistent XLA compile cache (~/.cache/polymath_jax) is enabled on
    # polymath_tpu.ops import; SRS cache below makes setup a one-time cost.
    from polymath_tpu.protocol import Polymath, Rng
    from polymath_tpu.protocol.data_structures import ProvingKey
    from polymath_tpu.transcript import MerlinFieldTranscript
    from polymath_tpu.circuits import BenchCircuit
    from polymath_tpu.hostmath.bls12_381 import R

    seed = 0
    rng = Rng(seed)
    a = rng.randrange(R)
    b = rng.randrange(R)

    def circuit():
        return BenchCircuit(a, b, num_variables=num_variables,
                            num_constraints=num_constraints)

    pm = Polymath(transcript=MerlinFieldTranscript, backend="jax")

    here = os.path.dirname(os.path.abspath(__file__))
    cache_dir = os.path.join(here, ".bench_cache")
    pk_dir = os.path.join(cache_dir, f"pk_{num_constraints}_{seed}.dir")
    pk_path = os.path.join(cache_dir, f"pk_{num_constraints}_{seed}.npz")
    setup_s = 0.0
    pk_load_s = 0.0
    if os.path.isdir(pk_dir):
        t0 = time.time()
        pk = ProvingKey.load_dir(pk_dir)
        vk = pk.vk
        pk_load_s = time.time() - t0
        print(f"# setup: loaded SRS dir cache in {pk_load_s:.1f}s "
              f"(n={vk.n})", file=sys.stderr)
    elif os.path.exists(pk_path):
        t0 = time.time()
        pk = ProvingKey.load_npz(pk_path)
        vk = pk.vk
        print(f"# setup: loaded SRS npz cache in {time.time()-t0:.1f}s "
              f"(n={vk.n}); run tools/pkconvert.py for the fast dir form",
              file=sys.stderr)
    else:
        t0 = time.time()
        pk, vk = pm.setup(circuit(), rng)
        setup_s = time.time() - t0
        print(f"# setup: {setup_s:.1f}s (n={pk.vk.n})", file=sys.stderr)
        # device->host pull of the SRS through the TPU tunnel is slow
        # (~6 MB/s measured) — the cache write is worth it exactly once
        # per machine; skip with POLYMATH_BENCH_SKIP_SAVE=1 for one-off
        # sizes.
        if os.environ.get("POLYMATH_BENCH_SKIP_SAVE", "") not in ("1", "true"):
            try:
                os.makedirs(cache_dir, exist_ok=True)
                t0 = time.time()
                # straight to the raw-npy dir form (the r4 path wrote a
                # legacy npz then converted: 399 s + 90 s at 2^21)
                pk.save_dir(pk_dir)
                print(f"# setup: SRS cached to {pk_dir} "
                      f"({time.time()-t0:.1f}s)", file=sys.stderr)
            except Exception as e:
                print(f"# setup: SRS cache write failed: {e}", file=sys.stderr)

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
    # verify timing: 50 reps like the reference harness (bench.rs:95-122)
    verify_reps = int(os.environ.get("POLYMATH_BENCH_VERIFY_REPS", 50))
    t0 = time.time()
    ok = True
    for _ in range(verify_reps):
        ok &= pm.verify(vk, [a * b % R], proof)
    verify_s = (time.time() - t0) / max(verify_reps, 1)
    assert ok
    print(f"# steady prove: {prove_s:.2f}s  verify: {verify_s*1e3:.1f}ms "
          f"({verify_reps} reps)", file=sys.stderr)

    ns_per_constraint = prove_s * 1e9 / num_constraints
    print(json.dumps({
        "metric": "prove_ns_per_constraint",
        "value": round(ns_per_constraint, 1),
        "unit": "ns/constraint",
        "vs_baseline": round(BASELINE_NS_PER_CONSTRAINT / ns_per_constraint, 3),
        "detail": {
            "num_constraints": num_constraints,
            "prove_seconds": round(prove_s, 3),
            "warm_prove_seconds": round(warm_s, 1),
            "setup_seconds": round(setup_s, 1),
            "pk_load_seconds": round(pk_load_s, 1),
            "verify_ms": round(verify_s * 1e3, 2),
            "verify_reps": verify_reps,
            "domain_n": vk.n,
            "verify": True,
            "baseline": "arkworks-class CPU estimate, 25s @ 2^20 (no "
                        "published reference numbers; BASELINE.md)",
        },
    }))


if __name__ == "__main__":
    main()
