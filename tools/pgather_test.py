"""Correctness + throughput harness for the Pallas MSM row-gather kernel.

CPU (interpret mode): small-shape correctness vs numpy.
TPU: realistic MSM shapes (2^18 chunk, 22 windows) vs the XLA gather.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import polymath_tpu.ops  # noqa: cache/config side effects
    from polymath_tpu.ops.pallas_gather import gather_rows, BLK
    from polymath_tpu.utils.config import on_tpu

    rng = np.random.default_rng(0)

    # -- correctness (small) --
    t, m = 4096, 4 * BLK
    tbl = rng.integers(0, 1 << 32, (t, 24), dtype=np.uint32)
    idx = rng.integers(0, t, (m,), dtype=np.int32)
    out = np.asarray(gather_rows(jnp.asarray(tbl), jnp.asarray(idx)))
    ref = tbl[idx].T
    assert out.shape == ref.shape, (out.shape, ref.shape)
    assert (out == ref).all(), "gather mismatch"
    print("# correctness ok", file=sys.stderr, flush=True)

    if not on_tpu():
        return

    # -- throughput at MSM shape --
    n, W = 1 << 18, 22
    tbl = jnp.asarray(
        rng.integers(0, 1 << 32, ((n + 4) // 4 * 4, 24), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (W, n), dtype=np.int32))

    def timed(name, f, *a):
        g = jax.jit(f)
        out = jax.block_until_ready(g(*a))
        ts = []
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(g(*a)); ts.append(time.time() - t0)
        dt = min(ts)
        print(f"# {name:36s} {dt*1e3:8.2f} ms  {dt*1e9/(W*n):6.2f} ns/row",
              file=sys.stderr, flush=True)
        return out

    o1 = timed("pallas gather_rows", lambda i: gather_rows(tbl, i), idx)
    o2 = timed("xla rows[idx] -> moveaxis",
               lambda i: jnp.moveaxis(tbl[i.reshape(-1)].reshape(W, n, 24), -1, 0),
               idx)
    a1 = np.asarray(o1.reshape(24, W, n))
    a2 = np.asarray(o2)
    assert (a1 == a2).all(), "pallas vs xla mismatch"
    print("# tpu cross-check ok", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
