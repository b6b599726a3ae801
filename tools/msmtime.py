"""Lean MSM config sweep: one point-set, many (chunk, c[, seq]) configs.

Generates N distinct points once (fixed_base, AOT-cached programs), then
times msm_device per config in THIS process — POLYMATH_MSM_C / _SEQ are
read at call time, chunk is an argument, so no respawn is needed.

Env: N (default 1<<21), CONFIGS "chunk:c[:seq];..." (default a small
sweep around the current production config), REPS (default 2).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import polymath_tpu.ops  # noqa
    from polymath_tpu.hostmath.bls12_381 import R
    from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs
    from polymath_tpu.ops.msm import msm_device, SCALAR_BITS
    from polymath_tpu.ops.fixed_base import fixed_base_mul_ints
    import random

    n = int(os.environ.get("N", 1 << 21))
    reps = int(os.environ.get("REPS", 2))
    configs = os.environ.get(
        "CONFIGS", "262144:14;262144:13;262144:12;524288:14")

    rng = random.Random(5)
    t0 = time.time()
    pt_sc = [rng.randrange(1, R) for _ in range(n)]
    xs, ys = fixed_base_mul_ints(pt_sc)
    from polymath_tpu.ops.curve_jax import pack_limbs
    xs, ys = pack_limbs(xs), pack_limbs(ys)
    np.asarray(xs[:1, :1])
    print(f"# {n} distinct points in {time.time()-t0:.1f}s", file=sys.stderr)
    sc = jnp.asarray(ints_to_limbs(
        [rng.randrange(R) for _ in range(n)], FR_SPEC.L))

    ref = None
    for cfg in configs.split(";"):
        parts = cfg.split(":")
        chunk, c = int(parts[0]), int(parts[1])
        if len(parts) > 2:
            os.environ["POLYMATH_MSM_SEQ"] = parts[2]
        else:
            os.environ.pop("POLYMATH_MSM_SEQ", None)
        os.environ["POLYMATH_MSM_C"] = str(c)
        t0 = time.time()
        r = msm_device(xs, ys, sc, chunk=chunk, fast=True)
        cold = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            r = msm_device(xs, ys, sc, chunk=chunk, fast=True)
            times.append(time.time() - t0)
        steady = min(times)
        W = (SCALAR_BITS + c - 1) // c
        print(f"# chunk=2^{chunk.bit_length()-1} c={c} W={W} "
              f"seq={os.environ.get('POLYMATH_MSM_SEQ', 'dflt')}: "
              f"cold {cold:.1f}s steady {steady:.3f}s = "
              f"{n/steady/1e6:.3f} Mpts/s", file=sys.stderr, flush=True)
        if ref is None:
            ref = r
        else:
            assert r == ref, f"config {cfg} result mismatch vs first config"
    print("SWEEP DONE", file=sys.stderr)


if __name__ == "__main__":
    main()
