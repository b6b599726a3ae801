"""Per-component timing of one MSM chunk at bench shapes (chunk=2^18).

Each stage is jitted separately and timed with device-resident inputs;
subtract ~30 ms dispatch latency per call for in-graph cost estimates.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHUNK = int(os.environ.get("CHUNK", 1 << 18))
SEQ = int(os.environ.get("SEQ", 64))


def main():
    import jax
    import jax.numpy as jnp
    import polymath_tpu.ops  # noqa
    from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs
    from polymath_tpu.ops.field_jax import FR
    from polymath_tpu.ops.msm import (
        _window_params, _digits, _scan_local_madd)
    from polymath_tpu.ops.curve_jax import (
        jac_add, jac_identity, fold_sum_jac, prefix_scan_jac, select_point)
    from polymath_tpu.ops.fixed_base import fixed_base_mul_ints
    import random

    rng = random.Random(5)
    n = CHUNK
    c, W = _window_params(n)
    print(f"# chunk=2^{n.bit_length()-1} c={c} W={W} seq={SEQ}",
          file=sys.stderr)

    from polymath_tpu.hostmath.bls12_381 import R
    xs, ys = fixed_base_mul_ints([rng.randrange(1, R) for _ in range(n)])
    sc = jnp.asarray(ints_to_limbs(
        [rng.randrange(R) for _ in range(n)], FR_SPEC.L))

    def sync(r):
        # block_until_ready through the axon tunnel does not actually wait
        # for device execution; a (tiny) D2H pull does.
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])
        return r

    def timed(name, f, *a, reps=3):
        g = jax.jit(f)
        t0 = time.time()
        r = sync(g(*a))
        first = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = sync(g(*a))
            ts.append(time.time() - t0)
        print(f"# {name:34s} first {first:7.1f}s steady {min(ts)*1e3:8.1f}ms",
              file=sys.stderr, flush=True)
        return r

    digits = timed("digits", lambda s: _digits(s, c, W), sc)
    order = timed("argsort", lambda d: jnp.argsort(-d, axis=-1), digits)

    def gath(xs, ys, order, digits):
        d_sorted = jnp.take_along_axis(digits, order, axis=-1)
        xy = jnp.concatenate([xs, ys], axis=0)
        g = xy[:, order]
        g = jnp.where((d_sorted > 0)[None], g, 0)
        return g, d_sorted
    g, d_sorted = timed("gather+mask", gath, xs, ys, order, digits)

    px, py = g[:24], g[24:]
    def scan(px, py):
        return _scan_local_madd(px, py, SEQ, True)
    local, totals, err = timed("local madd scan", scan, px, py)

    rows = n // SEQ
    def recur(totals):
        row_ps = prefix_scan_jac(totals)
        idn1 = jac_identity((W, 1))
        return tuple(jnp.concatenate([i1, a[..., :-1]], axis=-1)
                     for i1, a in zip(idn1, row_ps))
    offs = timed("row-offset recursion", recur, totals)

    def thresh(local, offs, d_sorted):
        flat = (d_sorted + (jnp.arange(W, dtype=jnp.int32)[:, None] << c))
        hist = jnp.bincount(flat.reshape(-1), length=W << c)
        hist = hist.reshape(W, 1 << c)
        cnt = (n - jnp.cumsum(hist, axis=-1))[:, :-1]
        pos = jnp.clip(cnt - 1, 0, n - 1)
        loc_g = tuple(jnp.take_along_axis(a, pos[None], axis=-1)
                      for a in local)
        off_g = tuple(jnp.take_along_axis(a, (pos // SEQ)[None], axis=-1)
                      for a in offs)
        ps_g = jac_add(loc_g, off_g)
        ps_g = select_point(cnt > 0, ps_g, jac_identity((W, (1 << c) - 1)))
        return ps_g
    ps_g = timed("threshold gather+combine", thresh, local, offs, d_sorted)
    wsum = timed("window fold", lambda p: fold_sum_jac(p), ps_g)
    print("# done", file=sys.stderr)


if __name__ == "__main__":
    main()
