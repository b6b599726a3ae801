"""Gather-layout experiment for the MSM point permutation step."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    import polymath_tpu.ops  # noqa

    rng = np.random.default_rng(0)
    n, W = 1 << 17, 17
    xs = jnp.asarray(rng.integers(0, 1 << 16, (24, n)).astype(np.uint32))
    ys = jnp.asarray(rng.integers(0, 1 << 16, (24, n)).astype(np.uint32))
    xy48 = jnp.concatenate([xs, ys], 0)                    # (48, n)
    rows = jnp.asarray(rng.integers(0, 1 << 16, (n, 48)).astype(np.uint32))  # (n, 48)
    order = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(W)]).astype(np.int32))

    def timed(name, f, *a):
        g = jax.jit(f)
        jax.block_until_ready(g(*a))
        ts = []
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(g(*a)); ts.append(time.time()-t0)
        print(f"# {name:40s} {min(ts)*1e3:8.2f}ms", file=sys.stderr, flush=True)

    timed("A: xs[:,order] + ys[:,order] (L,W,n)", lambda o: (xs[:, o], ys[:, o]), order)
    timed("B: xy48[:, order] one gather", lambda o: xy48[:, o], order)
    timed("C: rows[order] (W,n,48) row-gather", lambda o: rows[o], order)
    timed("C2: rows[order] -> transpose (48,W,n)",
          lambda o: jnp.moveaxis(rows[o], -1, 0), order)
    timed("D: take_along_axis (48,W,n)",
          lambda o: jnp.take_along_axis(xy48[:, None, :], o[None], axis=-1), order)
    # single window for scale reference
    timed("E: one-window xs[:, order[0]]", lambda o: xs[:, o[0]], order)
    # sort keys
    digits = jnp.asarray(rng.integers(0, 1 << 15, (W, n)).astype(np.int32))
    timed("F: argsort(-digits)", lambda d: jnp.argsort(-d, axis=-1), digits)
    packed = ((digits.astype(jnp.uint32)) << 17) | jax.lax.broadcasted_iota(jnp.uint32, (W, n), 1)
    timed("G: sort packed u32", lambda p: jnp.sort(p, axis=-1), packed)

if __name__ == "__main__":
    main()
