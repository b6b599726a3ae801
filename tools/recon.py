"""One-off TPU recon: HBM capacity, H2D bandwidth, and per-component MSM/NTT
timings that drive the round-3 perf work.  Results land in tools/RECON.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

out = {}


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def timed(fn, reps=3):
    import jax
    t0 = time.time()
    r = jax.block_until_ready(fn())
    first = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return first, min(ts), r


def main():
    import jax
    import jax.numpy as jnp
    import polymath_tpu.ops  # noqa: F401  (enables compile cache)

    dev = jax.devices()[0]
    out["device"] = str(dev)

    # ---- HBM capacity probe -------------------------------------------
    log("HBM probe")
    held = []
    gb_ok = 0
    try:
        for i in range(15):
            a = jnp.ones((1 << 28,), jnp.float32)  # 1 GB
            a.block_until_ready()
            held.append(a)
            gb_ok = i + 1
    except Exception as e:
        out["hbm_probe_error"] = str(e)[:200]
    out["hbm_gb_allocatable"] = gb_ok
    held = None
    log(f"HBM ~{gb_ok} GB allocatable")

    # ---- H2D bandwidth -------------------------------------------------
    buf = np.ones((1 << 27,), np.float32)  # 512 MB
    t0 = time.time()
    d = jax.device_put(buf)
    d.block_until_ready()
    h2d = time.time() - t0
    out["h2d_512MB_s"] = round(h2d, 3)
    out["h2d_GBps"] = round(0.5 / h2d, 2)
    # D2H
    t0 = time.time()
    _ = np.asarray(d)
    d2h = time.time() - t0
    out["d2h_512MB_s"] = round(d2h, 3)
    del d, buf
    log(f"H2D 512MB: {h2d:.2f}s  D2H: {d2h:.2f}s")

    # ---- field mul throughput (Fq batch) --------------------------------
    from polymath_tpu.ops.field_jax import FQ, FR
    from polymath_tpu.ops.limbs import FQ_SPEC, FR_SPEC, ints_to_limbs
    rng = np.random.default_rng(3)
    n = 1 << 20
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(24, n)).astype(np.uint32))
    f = jax.jit(FQ.mont_mul)
    first, steady, _ = timed(lambda: f(a, a))
    out["fq_mul_2^20"] = dict(first_s=round(first, 2), steady_s=round(steady, 5),
                              mps=round(n / steady / 1e6, 1))
    log(f"fq_mul 2^20: first {first:.1f}s steady {steady*1e3:.2f}ms = {n/steady/1e6:.1f} M/s")

    # ---- pallas fused jac_add throughput --------------------------------
    from polymath_tpu.ops.pallas_curve import jac_add_fused
    from polymath_tpu.ops.curve_jax import affine_to_jac, points_to_device
    from polymath_tpu.hostmath import bls12_381 as bls
    pts = [bls.G1.mul(bls.G1.gen, int(v)) for v in rng.integers(1, 1 << 30, 8)]
    n = 1 << 17
    xs, ys = points_to_device((pts * ((n + 7) // 8))[:n])
    pj = affine_to_jac((xs, ys))
    g = jax.jit(lambda p, q: jac_add_fused(p, q))
    first, steady, _ = timed(lambda: g(pj, pj))
    out["jac_add_fused_2^17"] = dict(first_s=round(first, 2),
                                     steady_s=round(steady, 5),
                                     madds_ps=round(n / steady / 1e6, 2))
    log(f"jac_add_fused 2^17: first {first:.1f}s steady {steady*1e3:.2f}ms = {n/steady/1e6:.2f} Madd/s")

    # ---- argsort + gather cost (MSM preprocessing) ----------------------
    W, c = 17, 15
    digits = jnp.asarray(rng.integers(0, 1 << c, size=(W, n)).astype(np.int32))

    def srt(d):
        order = jnp.argsort(-d, axis=-1)
        return order
    f_s = jax.jit(srt)
    first, steady, order = timed(lambda: f_s(digits))
    out["argsort_17x2^17"] = dict(first_s=round(first, 2), steady_s=round(steady, 5))
    log(f"argsort (17,2^17): first {first:.1f}s steady {steady*1e3:.2f}ms")

    def gath(xs, ys, order):
        return xs[:, order], ys[:, order]
    f_g = jax.jit(gath)
    first, steady, _ = timed(lambda: f_g(xs, ys, order))
    out["gather_pts_17x2^17"] = dict(first_s=round(first, 2), steady_s=round(steady, 5))
    log(f"gather pts (24,17,2^17)x2: first {first:.1f}s steady {steady*1e3:.2f}ms")

    # ---- prefix scan over one window-batch ------------------------------
    from polymath_tpu.ops.curve_jax import prefix_scan_jac
    pjw = tuple(jnp.broadcast_to(a[:, None, :], (24, W, n)) for a in pj)
    f_p = jax.jit(lambda p: prefix_scan_jac(p))
    first, steady, _ = timed(lambda: f_p(pjw), reps=1)
    tot = W * n
    out["prefix_scan_17x2^17"] = dict(first_s=round(first, 2), steady_s=round(steady, 4),
                                      madds_ps=round(2 * tot / steady / 1e6, 2))
    log(f"prefix_scan (17,2^17): first {first:.1f}s steady {steady:.3f}s (~{2*tot/steady/1e6:.2f} Madd/s incl 2x work)")

    # ---- full msm chunk -------------------------------------------------
    from polymath_tpu.ops.msm import _msm_chunk_jit, _window_params
    cc, ww = _window_params(n)
    f_m = _msm_chunk_jit(n, cc, ww)
    sc = jnp.asarray(ints_to_limbs(
        [int.from_bytes(os.urandom(31), "little") for _ in range(64)] * (n // 64),
        FR_SPEC.L))
    first, steady, _ = timed(lambda: f_m(xs, ys, sc), reps=2)
    out["msm_chunk_2^17"] = dict(first_s=round(first, 2), steady_s=round(steady, 4),
                                 mpts_ps=round(n / steady / 1e6, 3), c=cc, windows=ww)
    log(f"msm chunk 2^17 (c={cc},W={ww}): first {first:.1f}s steady {steady:.3f}s = {n/steady/1e6:.3f} Mpts/s")

    # ---- NTT 2^20 -------------------------------------------------------
    from polymath_tpu.ops.ntt import ntt
    m = 1 << 20
    av = jnp.asarray(rng.integers(0, 1 << 16, size=(16, m)).astype(np.uint32))
    first, steady, _ = timed(lambda: ntt(av))
    out["ntt_2^20"] = dict(first_s=round(first, 2), steady_s=round(steady, 5),
                           melems_ps=round(m / steady / 1e6, 1))
    log(f"ntt 2^20: first {first:.1f}s steady {steady*1e3:.1f}ms = {m/steady/1e6:.1f} Melem/s")

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "RECON.json"), "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
