"""Throughput experiments for the Pallas MSM row-gather kernel variants.

Each variant gathers M=W*n 24-u32 rows from a 2^18-point table and emits
(24, M) limb-major.  Correctness cross-checked against numpy on a prefix.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW = 24
BLK = 1024


def make_call(kernel, t4, m, blk=BLK, scratch_lanes=128):
    return pl.pallas_call(
        kernel,
        grid=(m // blk,),
        in_specs=[
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((t4, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROW, m), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((blk, scratch_lanes), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            disable_bounds_checks=True),
    )


def extract_quads(scratch_ref, idxv_ref, out_ref, blk=BLK):
    quads = scratch_ref[:, :]
    off = (idxv_ref[:, :].reshape(blk, 1) % 4)
    out = quads[:, :ROW]
    for kq in range(1, 4):
        shifted = pltpu.roll(quads, 128 - kq * ROW, axis=1)[:, :ROW]
        out = jnp.where(off == kq, shifted, out)
    out_ref[:, :] = out.T


def v_rowload(unroll):
    def kernel(idx_ref, idxv_ref, table_ref, out_ref, scratch_ref):
        def body(k, carry):
            base = pl.multiple_of(k * unroll, unroll)
            rows = []
            for u in range(unroll):
                i = idx_ref[0, base + u]
                rows.append(table_ref[pl.ds(i // 4, 1), :])
            scratch_ref[pl.ds(base, unroll), :] = jnp.concatenate(rows, 0)
            return carry
        jax.lax.fori_loop(0, BLK // unroll, body, 0)
        extract_quads(scratch_ref, idxv_ref, out_ref)
    return kernel


def v_tileload(unroll):
    """Aligned (8,128) tile loads + dynamic sublane roll per row."""
    def kernel(idx_ref, idxv_ref, table_ref, out_ref, scratch_ref):
        def body(k, carry):
            base = pl.multiple_of(k * unroll, unroll)
            rows = []
            for u in range(unroll):
                i = idx_ref[0, base + u]
                s = i // 4
                tb = pl.multiple_of((s // 8) * 8, 8)
                tile = table_ref[pl.ds(tb, 8), :]
                tile = pltpu.roll(tile, 8 - (s % 8), axis=0)
                rows.append(tile[:1, :])
            scratch_ref[pl.ds(base, unroll), :] = jnp.concatenate(rows, 0)
            return carry
        jax.lax.fori_loop(0, BLK // unroll, body, 0)
        extract_quads(scratch_ref, idxv_ref, out_ref)
    return kernel


def v_noop(unroll):
    """Upper bound probe: loads from a loop-affine sublane (no idx read)."""
    def kernel(idx_ref, idxv_ref, table_ref, out_ref, scratch_ref):
        def body(k, carry):
            base = pl.multiple_of(k * unroll, unroll)
            rows = []
            for u in range(unroll):
                rows.append(table_ref[pl.ds((k + u * 64) % 4096, 1), :])
            scratch_ref[pl.ds(base, unroll), :] = jnp.concatenate(rows, 0)
            return carry
        jax.lax.fori_loop(0, BLK // unroll, body, 0)
        extract_quads(scratch_ref, idxv_ref, out_ref)
    return kernel


def v_noextract(unroll):
    """Probe: row loads + stores, skip the vectorized extraction."""
    def kernel(idx_ref, idxv_ref, table_ref, out_ref, scratch_ref):
        def body(k, carry):
            base = pl.multiple_of(k * unroll, unroll)
            rows = []
            for u in range(unroll):
                i = idx_ref[0, base + u]
                rows.append(table_ref[pl.ds(i // 4, 1), :])
            scratch_ref[pl.ds(base, unroll), :] = jnp.concatenate(rows, 0)
            return carry
        jax.lax.fori_loop(0, BLK // unroll, body, 0)
        out_ref[:, :] = scratch_ref[:, :ROW].T
    return kernel


def main():
    rng = np.random.default_rng(0)
    n, W = 1 << 18, 22
    t4 = (n + 4) // 4
    tblq = rng.integers(0, 1 << 32, (t4, 128), dtype=np.uint32)
    tbl_rows = tblq.reshape(-1, 128)[:, :96].reshape(-1, 24)
    idx_np = rng.integers(0, n, (W * n,), dtype=np.int32)
    tbl = jnp.asarray(tblq)
    idx = jnp.asarray(idx_np).reshape(1, -1)
    m = W * n
    ref_cols = tbl_rows[idx_np[:4096]].T  # (24, 4096) prefix oracle

    def sync(x):
        # block_until_ready is NOT sufficient through the axon tunnel —
        # only a D2H pull is (see polymath_tpu.utils.config.device_sync)
        np.asarray(x[:1, :1])
        return x

    def timed(name, call, check=True):
        f = jax.jit(lambda a, b: call(a, a, b))
        try:
            out = sync(f(idx, tbl))
        except Exception as e:
            print(f"# {name:28s} FAILED: {str(e).splitlines()[0][:90]}",
                  file=sys.stderr, flush=True)
            return
        ts = []
        for _ in range(3):
            t0 = time.time(); sync(f(idx, tbl)); ts.append(time.time() - t0)
        dt = min(ts)
        okstr = ""
        if check:
            got = np.asarray(out[:, :4096])
            okstr = "ok" if (got == ref_cols).all() else "MISMATCH"
        print(f"# {name:28s} {dt*1e3:8.2f} ms  {dt*1e9/m:6.2f} ns/row  {okstr}",
              file=sys.stderr, flush=True)

    for unroll in (8, 16):
        timed(f"rowload u{unroll}", make_call(v_rowload(unroll), t4, m))
    for unroll in (8, 16):
        timed(f"tileload u{unroll}", make_call(v_tileload(unroll), t4, m))
    timed("probe noidx u8", make_call(v_noop(8), t4, m), check=False)
    timed("probe noextract u8", make_call(v_noextract(8), t4, m), check=False)


if __name__ == "__main__":
    main()
