"""North-star kernel metrics (BASELINE.md): NTT elems/s and MSM points/s
per chip, plus cold/warm compile+dispatch times, captured to
KERNEL_METRICS.json.

Workloads follow the driver BASELINE.json north-star definition:
  * NTT over Fr at n = 2^20 (and 2^22 when memory allows),
  * Pippenger MSM over G1 at 2^20 points,
with per-kernel wall-clock split into first-call (compile-inclusive,
served from the persistent XLA cache when present) and steady-state
(min over reps) times.

Run:  python kernel_metrics.py            # full sizes (TPU)
      POLYMATH_KM_LOGN=14 python ...      # smoke size
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    log_n = int(os.environ.get("POLYMATH_KM_LOGN", 20))
    reps = max(1, int(os.environ.get("POLYMATH_KM_REPS", 3)))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from polymath_tpu.hostmath import bls12_381 as bls
    from polymath_tpu.hostmath.bls12_381 import R
    from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs
    from polymath_tpu.ops.ntt import ntt
    from polymath_tpu.ops.msm import msm_device
    from polymath_tpu.ops.curve_jax import points_to_device

    rng = random.Random(7)
    out = {"device": str(jax.devices()[0]), "log_n": log_n, "kernels": {}}

    def sync(r):
        # block_until_ready through the remote-TPU tunnel does not reliably
        # wait for device execution; a tiny dependent D2H pull does.
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])
        return r

    def timed(name, fn, *args):
        t0 = time.time()
        r = sync(fn(*args))
        first_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            r = sync(fn(*args))
            times.append(time.time() - t0)
        steady = max(min(times), 1e-9)  # clock floor: avoid 0-div at tiny sizes
        out["kernels"][name] = {
            "first_call_s": round(first_s, 3),
            "steady_s": round(steady, 6),
        }
        print(f"# {name}: first {first_s:.2f}s steady {steady*1e3:.2f}ms",
              file=sys.stderr)
        return r, steady

    # ---- NTT ----------------------------------------------------------
    for ln in [log_n] + ([log_n + 2] if log_n == 20 else []):
        n = 1 << ln
        vals = np.random.default_rng(5).integers(
            0, 1 << 30, size=n, dtype=np.int64).tolist()
        a = jnp.asarray(ints_to_limbs(
            [FR_SPEC.to_mont_int(v) for v in vals], FR_SPEC.L))
        try:
            _, steady = timed(f"ntt_2^{ln}", lambda x: ntt(x), a)
        except Exception as e:  # 2^22 may exceed memory on small chips
            print(f"# ntt_2^{ln} failed: {e}", file=sys.stderr)
            continue
        out["kernels"][f"ntt_2^{ln}"]["elems_per_s"] = round(n / steady)
        del a

    # ---- MSM ----------------------------------------------------------
    # distinct bases (like a real SRS), generated on device — repeating a
    # handful of host points would (a) trip the fast-mode collision guard
    # and (b) not exercise realistic bucket distributions
    from polymath_tpu.ops.fixed_base import fixed_base_mul_ints

    n = 1 << log_n
    pt_scalars = [rng.randrange(1, R) for _ in range(n)]
    t0 = time.time()
    xs, ys = fixed_base_mul_ints(pt_scalars)
    jax.block_until_ready(xs)
    print(f"# fixed-base point gen 2^{log_n}: {time.time()-t0:.1f}s",
          file=sys.stderr)
    scalars = [rng.randrange(R) for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))

    t0 = time.time()
    r1 = msm_device(xs, ys, sc, fast=True)
    first_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        r1 = msm_device(xs, ys, sc, fast=True)
        times.append(time.time() - t0)
    steady = max(min(times), 1e-9)
    out["kernels"][f"msm_2^{log_n}"] = {
        "first_call_s": round(first_s, 3),
        "steady_s": round(steady, 6),
        "points_per_s": round(n / steady),
    }
    print(f"# msm_2^{log_n}: first {first_s:.2f}s steady {steady:.3f}s "
          f"({n/steady/1e6:.2f} Mpts/s)", file=sys.stderr)

    # correctness spot check vs host oracle on a small prefix
    k = 1 << 10
    pts_host = [bls.G1.mul(bls.G1.gen, s) for s in pt_scalars[:k]]
    want = bls.G1.msm(pts_host, scalars[:k])
    got = msm_device(xs[:, :k], ys[:, :k], sc[:, :k])
    assert got == want, "device MSM mismatch vs host oracle on 2^10 prefix"
    out["msm_oracle_check"] = "ok (2^10 prefix vs host Pippenger)"

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "KERNEL_METRICS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
