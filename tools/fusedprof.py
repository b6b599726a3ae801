"""Per-stage profile of the r6/fused MSM chunk pipeline at bench shape.

Times each stage standalone (jitted, D2H-synced): digits, argsort,
fused scan kernel, split gather kernel, split madd scan, row-offset
tree, threshold gather+combine, window fold.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    import polymath_tpu.ops  # noqa
    from polymath_tpu.ops import msm as M
    from polymath_tpu.ops.field_jax import FR
    from polymath_tpu.ops.pallas_scan import fused_scan_msm
    from polymath_tpu.ops.pallas_gather import gather_rows_quads
    from polymath_tpu.ops.curve_jax import (
        prefix_scan_jac_tree, jac_identity, jac_add, tree_sum_jac,
        select_point, unpack_limbs)

    rng = np.random.default_rng(0)
    n = 1 << 18
    c, W = 12, 22
    seq = 128
    rows = n // seq

    # synthetic (valid-shape) data; stage timing only
    quads = jnp.asarray(
        rng.integers(0, 1 << 32, (n // 4 + 1, 128), dtype=np.uint32))
    sc = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.reshape(-1)[:1])
        return x

    def timed(name, f, *a, reps=3):
        g = jax.jit(f)
        out = sync(g(*a))
        ts = []
        for _ in range(reps):
            t0 = time.time(); sync(g(*a)); ts.append(time.time() - t0)
        print(f"# {name:34s} {min(ts)*1e3:9.2f} ms", file=sys.stderr,
              flush=True)
        return out

    digits = timed("digits", lambda s: M._digits(s, c, W), sc)
    order = timed("argsort", lambda d: jnp.argsort(-d, axis=-1), digits)
    d_sorted = jnp.take_along_axis(digits, order, axis=-1)
    idx = jnp.where(d_sorted > 0, order, n)

    loc, tot, err = timed("fused scan kernel (fast)",
                          lambda q, i: fused_scan_msm(q, i, seq, True),
                          quads, idx)

    g = timed("split: pallas gather", lambda q, i: gather_rows_quads(q, i),
              quads, idx)
    Lh = 12
    timed("split: madd scan (packed emit)",
          lambda gg: M._scan_local_madd(gg[:Lh], gg[Lh:], seq, True), g)

    row_ps = timed("row-offset tree", lambda t: prefix_scan_jac_tree(t), tot)

    def thresh(local, offs_in, dsort):
        asc = jnp.flip(dsort, axis=-1)
        t_vals = jnp.arange(1, (1 << c) + 1, dtype=dsort.dtype)
        first_ge = jax.vmap(
            lambda a: jnp.searchsorted(a, t_vals, side="left"))(asc)
        cnt = (n - first_ge).astype(jnp.int32)
        pos = jnp.clip(cnt - 1, 0, n - 1)
        loc_g = tuple(
            unpack_limbs(jnp.take_along_axis(a, pos[None], axis=-1))
            for a in local)
        idn1 = jac_identity((W, 1))
        offs = tuple(jnp.concatenate([i1, a[..., :-1]], axis=-1)
                     for i1, a in zip(idn1, offs_in))
        off_g = tuple(
            jnp.take_along_axis(a, (pos // seq)[None], axis=-1)
            for a in offs)
        ps_g = jac_add(loc_g, off_g)
        ps_g = select_point(cnt > 0, ps_g, jac_identity((W, 1 << c)))
        return ps_g

    ps_g = timed("threshold gather+combine", thresh, loc, row_ps, d_sorted)
    timed("window fold (tree_sum)", lambda p: tree_sum_jac(p), ps_g)


if __name__ == "__main__":
    main()
