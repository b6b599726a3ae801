"""Correctness test for the fused MSM scan kernel (pallas_scan.py).

CPU interpret mode at tiny shapes: compares (local, totals, err) against
the reference composition gather_rows_quads + _scan_local_madd, and the
end-to-end _msm_chunk window sums against the host Pippenger oracle.
On TPU (arg 'tpu'): same checks at a realistic sub-chunk shape.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    on_tpu = len(sys.argv) > 1 and sys.argv[1] == "tpu"
    if not on_tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["POLYMATH_PALLAS"] = "0"  # keep jac ops on jnp path
    import jax
    if not on_tpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    import polymath_tpu.ops  # noqa
    from polymath_tpu.utils import config as _cfg
    _cfg.on_tpu.cache_clear(); _cfg.use_pallas.cache_clear()
    from polymath_tpu.hostmath import bls12_381 as bls
    from polymath_tpu.hostmath.bls12_381 import R
    from polymath_tpu.ops.limbs import FR_SPEC, FQ_SPEC, ints_to_limbs
    from polymath_tpu.ops.curve_jax import (
        points_to_device, pack_limbs, unpack_limbs)
    from polymath_tpu.ops import msm as M
    from polymath_tpu.ops.pallas_scan import fused_scan_msm
    import random

    rng = random.Random(9)
    chunk = 1 << 10 if on_tpu else 64
    seq = 128 if on_tpu else 8
    c, W = (8, 32) if on_tpu else (4, 4)

    pts = [bls.G1.mul(bls.G1.gen, rng.randrange(1, R)) for _ in range(chunk)]
    scalars = [rng.randrange(R) for _ in range(chunk)]
    scalars[2] = 0
    xs, ys = points_to_device(pts)
    xs, ys = pack_limbs(xs), pack_limbs(ys)
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))

    # build the quad table like _msm_run does
    rows96 = jnp.concatenate([xs, ys], axis=0).T
    quads = rows96.reshape(chunk // 4, 96)
    quads = jnp.pad(quads, ((0, 1), (0, 32)))

    digits = M._digits(sc, c, W)
    order = jnp.argsort(-digits, axis=-1)
    d_sorted = jnp.take_along_axis(digits, order, axis=-1)
    idx = jnp.where(d_sorted > 0, order, chunk)

    for fast in (True, False):
        loc_f, tot_f, err_f = fused_scan_msm(quads, idx, seq, fast)

        from polymath_tpu.ops.pallas_gather import gather_rows_quads
        g = gather_rows_quads(quads, idx)
        Lh = FQ_SPEC.L // 2
        px, py = g[:Lh], g[Lh:]
        loc_r, tot_r, err_r = M._scan_local_madd(px, py, seq, fast)

        for a, b, name in zip(loc_f, loc_r, "XYZ"):
            fa, fb = np.asarray(a), np.asarray(b)
            assert fa.shape == fb.shape, (fa.shape, fb.shape)
            assert (fa == fb).all(), f"local {name} mismatch (fast={fast})"
        for a, b, name in zip(tot_f, tot_r, "XYZ"):
            assert (np.asarray(a) == np.asarray(b)).all(), \
                f"totals {name} mismatch (fast={fast})"
        if fast:
            assert (np.asarray(err_f) == np.asarray(err_r)).all()
        print(f"# fused == reference (fast={fast})", file=sys.stderr,
              flush=True)

    # end-to-end window-sum check vs host oracle through _msm_chunk(fused)
    wsum, err = M._msm_chunk(None, None, sc, c, W, fast=True, seq=seq,
                             rowscan="seq" if not on_tpu else "tree",
                             table_quads=quads, fused=True)
    got = M._horner_windows_host(wsum, c, W)
    want = bls.G1.msm(pts, scalars)
    assert got == want, "fused _msm_chunk mismatch vs host Pippenger"
    print("# fused e2e chunk == host oracle  OK", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
