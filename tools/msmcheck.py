"""TPU validation + timing of the redesigned MSM (msm.py v2).

Oracle-checks msm_device against the host Pippenger at 2^12, then times
chunks at bench scale with distinct device-generated points.
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
    from polymath_tpu.hostmath import bls12_381 as bls
    from polymath_tpu.hostmath.bls12_381 import R
    from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs
    from polymath_tpu.ops.curve_jax import points_to_device
    from polymath_tpu.ops.msm import msm_device, _window_params
    from polymath_tpu.ops.fixed_base import fixed_base_mul_ints

    import random
    rng = random.Random(5)

    # ---- correctness at 2^12 vs host oracle (distinct points) ----------
    k = 1 << 12
    t0 = time.time()
    sc_pts = [rng.randrange(1, R) for _ in range(k)]
    xs, ys = fixed_base_mul_ints(sc_pts)      # distinct points, on device
    print(f"# fixed_base {k}: {time.time()-t0:.1f}s", file=sys.stderr)
    scalars = [rng.randrange(R) for _ in range(k)]
    scalars[3] = 0
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))

    for fast in (False, True):
        t0 = time.time()
        got = msm_device(xs, ys, sc, fast=fast)
        dt = time.time() - t0
        print(f"# msm 2^12 fast={fast}: {dt:.1f}s (cold)", file=sys.stderr)
    t0 = time.time()
    pts_host = [bls.G1.mul(bls.G1.gen, s) for s in sc_pts[:256]]
    want = bls.G1.msm(pts_host, scalars[:256])
    got = msm_device(xs[:, :256], ys[:, :256], sc[:, :256], chunk=1 << 12)
    assert got == want, "device MSM mismatch vs host oracle (256 prefix)"
    print(f"# oracle check vs host at 256: OK ({time.time()-t0:.1f}s)",
          file=sys.stderr)

    # ---- throughput at chunk scale -------------------------------------
    n = 1 << 20
    t0 = time.time()
    sc_big = [rng.randrange(1, R) for _ in range(n)]
    xs, ys = fixed_base_mul_ints(sc_big)
    jax.block_until_ready(xs)
    print(f"# fixed_base 2^20 distinct points: {time.time()-t0:.1f}s",
          file=sys.stderr)
    scalars = [rng.randrange(R) for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))

    for fast in (True, False):
        t0 = time.time()
        r = msm_device(xs, ys, sc, fast=fast)
        cold = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time()
            r = msm_device(xs, ys, sc, fast=fast)
            times.append(time.time() - t0)
        steady = min(times)
        c, w = _window_params(1 << 18)
        print(f"# msm 2^20 fast={fast} (c={c},W={w}): cold {cold:.1f}s "
              f"steady {steady:.3f}s = {n/steady/1e6:.3f} Mpts/s",
              file=sys.stderr)

    # spot check big MSM vs partial sums: verify via small-scalar trick
    # (sum of i*P_i for first 512 with rest zero)
    sc_np = np.zeros((16, n), np.uint32)
    small = ints_to_limbs(scalars[:512], FR_SPEC.L)
    sc_np[:, :512] = small
    got = msm_device(xs, ys, jnp.asarray(sc_np), fast=True)
    want = bls.G1.msm([bls.G1.mul(bls.G1.gen, s) for s in sc_big[:512]],
                      scalars[:512])
    assert got == want, "big-array MSM mismatch on 512-point prefix"
    print("# big-array prefix oracle: OK", file=sys.stderr)
    print("ALL OK")


if __name__ == "__main__":
    main()
