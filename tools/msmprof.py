"""Per-component timing of one MSM chunk at bench shapes.

Times the CURRENT _msm_chunk stages (16-bit-packed gather with zero-row
sentinel, packed madd scan, searchsorted thresholds padded to 2^c,
tree_sum window fold), each jitted separately with device-resident
inputs; subtract ~30 ms dispatch latency per call for in-graph costs.

Env: CHUNK (default 2^18), SEQ (default msm._scan_seq()), C (window
override), REPS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHUNK = int(os.environ.get("CHUNK", 1 << 18))
REPS = int(os.environ.get("REPS", 3))


def main():
    import jax
    import jax.numpy as jnp
    import polymath_tpu.ops  # noqa
    from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs
    from polymath_tpu.ops.msm import (
        _window_params, _digits, _scan_local_madd, _scan_seq)
    from polymath_tpu.ops.curve_jax import (
        jac_add, jac_identity, tree_sum_jac, prefix_scan_jac, select_point,
        pack_limbs)
    from polymath_tpu.ops.fixed_base import fixed_base_mul_ints
    import random

    rng = random.Random(5)
    n = CHUNK
    seq = int(os.environ.get("SEQ", _scan_seq()))
    c, W = _window_params(n)
    if os.environ.get("C"):
        from polymath_tpu.ops.msm import SCALAR_BITS
        c = int(os.environ["C"])
        W = (SCALAR_BITS + c - 1) // c
    print(f"# chunk=2^{n.bit_length()-1} c={c} W={W} seq={seq}",
          file=sys.stderr)

    from polymath_tpu.hostmath.bls12_381 import R
    xs, ys = fixed_base_mul_ints([rng.randrange(1, R) for _ in range(n)])
    xs, ys = pack_limbs(xs), pack_limbs(ys)
    Lh = 12
    sc = jnp.asarray(ints_to_limbs(
        [rng.randrange(R) for _ in range(n)], FR_SPEC.L))

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])
        return r

    results = {}

    def timed(name, f, *a):
        g = jax.jit(f)
        t0 = time.time()
        r = sync(g(*a))
        first = time.time() - t0
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            r = sync(g(*a))
            ts.append(time.time() - t0)
        results[name] = min(ts) * 1e3
        print(f"# {name:28s} first {first:7.1f}s steady {min(ts)*1e3:8.1f}ms",
              file=sys.stderr, flush=True)
        return r

    digits = timed("digits", lambda s: _digits(s, c, W), sc)
    order = timed("argsort", lambda d: jnp.argsort(-d, axis=-1), digits)

    def gath(xs, ys, order, digits):
        d_sorted = jnp.take_along_axis(digits, order, axis=-1)
        xy_rows = jnp.concatenate([xs, ys], axis=0).T
        xy_ext = jnp.concatenate(
            [xy_rows, jnp.zeros((1, 2 * Lh), jnp.uint32)], axis=0)
        idx = jnp.where(d_sorted > 0, order, n)
        g = xy_ext[idx.reshape(-1)]
        g = jnp.moveaxis(g.reshape(W, n, 2 * Lh), -1, 0)
        return g, d_sorted
    g, d_sorted = timed("gather(sentinel,packed)", gath, xs, ys, order, digits)

    # split diagnosis: raw row-gather vs the (W*n, L) -> (L, W, n) relayout
    def gath_raw(xs, ys, order, digits):
        d_sorted = jnp.take_along_axis(digits, order, axis=-1)
        xy_rows = jnp.concatenate([xs, ys], axis=0).T
        xy_ext = jnp.concatenate(
            [xy_rows, jnp.zeros((1, 2 * Lh), jnp.uint32)], axis=0)
        idx = jnp.where(d_sorted > 0, order, n)
        return xy_ext[idx.reshape(-1)]
    graw = timed("gather-raw (no transpose)", gath_raw, xs, ys, order, digits)
    timed("transpose only", lambda g: jnp.moveaxis(
        g.reshape(W, n, 2 * Lh), -1, 0), graw)
    del graw

    px, py = g[:Lh], g[Lh:]
    local, totals, err = timed(
        "packed madd scan", lambda a, b: _scan_local_madd(a, b, seq, True),
        px, py)

    from polymath_tpu.ops.msm import _rowscan_mode
    from polymath_tpu.ops.curve_jax import prefix_scan_jac_tree

    def recur(totals):
        if _rowscan_mode() == "tree":
            row_ps = prefix_scan_jac_tree(totals)
        else:
            row_ps = prefix_scan_jac(totals)
        idn1 = jac_identity((W, 1))
        return tuple(jnp.concatenate([i1, a[..., :-1]], axis=-1)
                     for i1, a in zip(idn1, row_ps))
    offs = timed(f"row-offset ({_rowscan_mode()})", recur, totals)

    def thresh(local, offs, d_sorted):
        asc = jnp.flip(d_sorted, axis=-1)
        t_vals = jnp.arange(1, (1 << c) + 1, dtype=d_sorted.dtype)
        first_ge = jax.vmap(
            lambda a: jnp.searchsorted(a, t_vals, side="left"))(asc)
        cnt = (n - first_ge).astype(jnp.int32)
        pos = jnp.clip(cnt - 1, 0, n - 1)
        loc_g = tuple(jnp.take_along_axis(a, pos[None], axis=-1)
                      for a in local)
        off_g = tuple(jnp.take_along_axis(a, (pos // seq)[None], axis=-1)
                      for a in offs)
        ps_g = jac_add(loc_g, off_g)
        return select_point(cnt > 0, ps_g, jac_identity((W, 1 << c)))
    ps_g = timed("threshold gather+combine", thresh, local, offs, d_sorted)

    # threshold sub-split: searchsorted vs the local/offs gathers vs add
    def thr_search(d_sorted):
        asc = jnp.flip(d_sorted, axis=-1)
        t_vals = jnp.arange(1, (1 << c) + 1, dtype=d_sorted.dtype)
        first_ge = jax.vmap(
            lambda a: jnp.searchsorted(a, t_vals, side="left"))(asc)
        return (n - first_ge).astype(jnp.int32)
    cnt = timed("  thr: searchsorted", thr_search, d_sorted)
    pos = jnp.clip(cnt - 1, 0, n - 1)

    def thr_gather(local, pos):
        return tuple(jnp.take_along_axis(a, pos[None], axis=-1)
                     for a in local)
    loc_g = timed("  thr: local gather x3", thr_gather, local, pos)

    def thr_add(loc_g, offs, pos, cnt):
        off_g = tuple(jnp.take_along_axis(a, (pos // seq)[None], axis=-1)
                      for a in offs)
        ps = jac_add(loc_g, off_g)
        return select_point(cnt > 0, ps, jac_identity((W, 1 << c)))
    timed("  thr: offs-gather+add+sel", thr_add, loc_g, offs, pos, cnt)
    wsum = timed("window fold (tree)", lambda p: tree_sum_jac(p), ps_g)
    total = sum(results.values())
    print(f"# total {total:.0f}ms -> {n/total*1e3/1e6:.2f} Mpts/s "
          f"(per-stage dispatch overhead included)", file=sys.stderr)


if __name__ == "__main__":
    main()
