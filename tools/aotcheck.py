"""Validates the AOT executable store on the live backend.

Runs a small device MSM (vs host oracle) + NTT roundtrip.  First
invocation traces/compiles and stores executables; a second invocation of
the same script must report only deserializations (POLYMATH_TRACE=1 shows
the split) and finish in seconds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLYMATH_TRACE", "1")


def main():
    t00 = time.time()
    import jax.numpy as jnp
    import polymath_tpu.ops  # noqa
    from polymath_tpu.hostmath import bls12_381 as bls
    from polymath_tpu.hostmath.bls12_381 import R
    from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs
    from polymath_tpu.ops.msm import msm_device
    from polymath_tpu.ops.ntt import ntt
    from polymath_tpu.ops.fixed_base import fixed_base_mul_ints
    from polymath_tpu.ops.field_jax import FR
    import numpy as np
    import random
    rng = random.Random(5)
    print(f"# imports: {time.time()-t00:.1f}s", file=sys.stderr)

    k = 1 << 12
    t0 = time.time()
    sc_pts = [rng.randrange(1, R) for _ in range(k)]
    xs, ys = fixed_base_mul_ints(sc_pts)
    print(f"# fixed_base {k}: {time.time()-t0:.1f}s", file=sys.stderr)
    scalars = [rng.randrange(R) for _ in range(k)]
    scalars[3] = 0
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))

    t0 = time.time()
    got = msm_device(xs, ys, sc, chunk=k, fast=True)
    print(f"# msm 2^12: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    pts_host = [bls.G1.mul(bls.G1.gen, s) for s in sc_pts[:256]]
    want = bls.G1.msm(pts_host, scalars[:256])
    got256 = msm_device(xs[:, :256], ys[:, :256], sc[:, :256], chunk=256)
    assert got256 == want, "device MSM mismatch vs host oracle"
    print(f"# msm oracle at 256: OK ({time.time()-t0:.1f}s)", file=sys.stderr)

    t0 = time.time()
    vals = [rng.randrange(R) for _ in range(1 << 12)]
    a = FR.to_mont(jnp.asarray(ints_to_limbs(vals, FR_SPEC.L)))
    ev = ntt(a, inverse=False)
    back = ntt(ev, inverse=True)
    assert np.array_equal(np.asarray(FR.from_mont(back)),
                          np.asarray(FR.from_mont(a))), "NTT roundtrip"
    print(f"# ntt 2^12 roundtrip: OK ({time.time()-t0:.1f}s)", file=sys.stderr)
    print(f"# total: {time.time()-t00:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
