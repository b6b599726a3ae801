"""Fused MSM bucket scan: gather + madd + packed emission in ONE kernel.

The r5 split pipeline pays for the point gather in its own kernel
(~13 ns/row of scalar-unit work while the VPU idles, ops/pallas_gather.py)
and then re-reads the gathered leaves from HBM in the madd scan.  Here the
scan IS the gather consumer: one pallas_call with grid (seq, W) keeps the
whole chunk's point table resident in VMEM and, at grid step (t, w),

  * scalar-loops the `rows` gathered indices of step t+1 (window w) out
    of the table into a raw staging block, then vector-extracts the quad
    rows into limb-major staged leaves — work the Mosaic scheduler can
    overlap with this step's madd, because it touches only the
    parity-opposite staging ref;
  * runs the 8M+3S mixed-add (ll_jac_madd) of step t against the leaves
    staged at (t-1, w), accumulating into a per-window VMEM acc slice;
  * emits the 16-bit-packed local prefix row consumed by the threshold
    stage (ops/msm.py step 3).

Double buffering uses TWO scratch refs selected by t-parity `pl.when`
branches (a single parity-indexed ref would make the gather writes and
madd reads alias under ref-level dependence analysis and serialize the
pipeline).  The body is therefore traced twice — the price of
guaranteed-disjoint dataflow.

All limb data lives as (8, rows/8) tiles on the two minor axes (full
vreg utilization — a (1, rows) limb row would use one sublane in eight),
with the limb index on an untiled major axis, following pallas_curve's
block convention.

Replaces lax.scan over jac_madd_fused_packed + gather_rows for the TPU
MSM hot loop (reference cost center: ark-ec VariableBaseMSM,
prover.rs:229 — ~10n of the 12n products per proof).

Layouts (n = rows * seq = chunk, sorted position j = r * seq + t,
lane r = s * (rows/8) + q for sublane s, lane q):
  idx_steps : (seq, W, rows) int32; sentinel = last table row
  table     : (chunk/4 + 1, 128) u32 quad rows (ops/msm.py _msm_run)
  local out : (seq, 3*Lh, W, 8, rows/8) u32 packed jacobian prefixes
  totals out: (W, 3*L, 8, rows/8) u32; err out: (W, 8, rows/8) u32
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import pallas_interpret
from .limbs import FQ_SPEC
from .ll import LL_FQ, ll_jac_madd

FUSED_REV = "b"        # bump on fused-kernel graph changes (AOT naming)
L = FQ_SPEC.L          # 24 u32 limbs per Fq coordinate
LH = L // 2            # 16-bit packed rows per coordinate
ROW_U32 = 2 * LH       # packed point row: x || y
PTS_PER_VROW = 4
SUB = 8                # sublane grouping of the row axis


def _fused_kernel(seq: int, windows: int, rows: int, fast: bool,
                  full_unroll: bool = True):
    unroll = min(8, rows)
    C = rows // SUB

    def gather_raw(idx_ref, table_ref, raw_ref):
        def body8(base):
            blk = []
            for u in range(unroll):
                i = idx_ref[0, 0, 0, base + u]
                blk.append(table_ref[pl.ds(i // PTS_PER_VROW, 1), :])
            raw_ref[pl.ds(base, unroll), :] = jnp.concatenate(blk, 0)

        if full_unroll:
            # flat straight-line code: a fori_loop is a scheduling region
            # Mosaic will NOT interleave with the madd's vector work
            # (measured: fused-with-loop == split-sum, zero overlap), but
            # an unrolled gather joins the step's dataflow DAG and can
            # co-issue on the scalar/load slots under the madd ALU ops
            for k in range(rows // unroll):
                body8(k * unroll)
        else:
            def body(k, carry):
                body8(pl.multiple_of(k * unroll, unroll))
                return carry
            jax.lax.fori_loop(0, rows // unroll, body, 0)

    def extract(raw_ref, idxv_ref, stage, w):
        """raw (rows, 128) quads -> stage[w] = (24, 8, C) packed points."""
        raw = raw_ref[:, :]
        off = idxv_ref[0, 0, 0].reshape(rows, 1) % PTS_PER_VROW
        out = raw[:, :ROW_U32]
        for kq in range(1, PTS_PER_VROW):
            sh = pltpu.roll(raw, 128 - kq * ROW_U32, axis=1)[:, :ROW_U32]
            out = jnp.where(off == kq, sh, out)
        stage[w, :, :, :] = out.T.reshape(ROW_U32, SUB, C)

    def kernel(idxs_next_ref, idxv_next_ref, idxs_cur_ref, idxv_cur_ref,
               table_ref, local_ref, totals_ref, err_ref,
               acc_ref, stage_a, stage_b, raw_ref, erracc_ref):
        t = pl.program_id(0)
        w = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            # identity accumulator + clear error lanes for this window
            one = LL_FQ.one_ints
            ones = jnp.stack(
                [jnp.full((SUB, C), np.uint32(c)) for c in one], 0)
            acc_ref[w, 0:L] = ones
            acc_ref[w, L:2 * L] = ones
            acc_ref[w, 2 * L:3 * L] = jnp.zeros((L, SUB, C), jnp.uint32)
            erracc_ref[w, :, :] = jnp.zeros((SUB, C), jnp.uint32)
            # bootstrap: stage step 0's own leaves (no prefetch exists)
            gather_raw(idxs_cur_ref, table_ref, raw_ref)
            extract(raw_ref, idxv_cur_ref, stage_a, w)

        def step(stage_cur, stage_nxt):
            # prefetch step t+1's leaves into the opposite stage
            gather_raw(idxs_next_ref, table_ref, raw_ref)
            extract(raw_ref, idxv_next_ref, stage_nxt, w)

            # madd: acc (jacobian limb lists) += staged packed leaves
            acc = tuple(
                [acc_ref[w, c * L + i] for i in range(L)]
                for c in range(3))
            leafp = [stage_cur[w, i] for i in range(ROW_U32)]
            leaf = (LL_FQ.split_packed(leafp[:LH]),
                    LL_FQ.split_packed(leafp[LH:]))
            (rx, ry, rz), err = ll_jac_madd(acc, leaf, fast=fast)
            for c, coord in enumerate((rx, ry, rz)):
                for i in range(L):
                    acc_ref[w, c * L + i] = coord[i]
            if fast:
                erracc_ref[w, :, :] = (
                    erracc_ref[w, :, :] | err.astype(jnp.uint32))

            # 16-bit packed local prefix emission
            packed = []
            for coord in (rx, ry, rz):
                for i in range(LH):
                    packed.append(
                        coord[2 * i] | (coord[2 * i + 1] << np.uint32(16)))
            local_ref[0, :, 0] = jnp.stack(packed, 0)

        # parity-disjoint staging refs keep the prefetch writes and the
        # madd reads alias-free (see module docstring)
        @pl.when(t % 2 == 0)
        def _():
            step(stage_a, stage_b)

        @pl.when(t % 2 == 1)
        def _():
            step(stage_b, stage_a)

        @pl.when(t == seq - 1)
        def _():
            totals_ref[0] = acc_ref[w]
            err_ref[0] = erracc_ref[w]

    return kernel


@lru_cache(maxsize=None)
def _fused_call(seq: int, windows: int, rows: int, t4: int, fast: bool):
    kernel = _fused_kernel(seq, windows, rows, fast)
    C = rows // SUB

    def nxt(t, w):
        return (jnp.minimum(t + 1, seq - 1), w, 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(seq, windows),
        in_specs=[
            pl.BlockSpec((1, 1, 1, rows), nxt, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, rows), nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, rows), lambda t, w: (t, w, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, rows), lambda t, w: (t, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t4, 128), lambda t, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3 * LH, 1, SUB, C),
                         lambda t, w: (t, 0, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * L, SUB, C), lambda t, w: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, C), lambda t, w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((seq, 3 * LH, windows, SUB, C),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((windows, 3 * L, SUB, C), jnp.uint32),
            jax.ShapeDtypeStruct((windows, SUB, C), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM((windows, 3 * L, SUB, C), jnp.uint32),   # acc
            pltpu.VMEM((windows, ROW_U32, SUB, C), jnp.uint32),  # stage A
            pltpu.VMEM((windows, ROW_U32, SUB, C), jnp.uint32),  # stage B
            pltpu.VMEM((rows, 128), jnp.uint32),                 # raw quads
            pltpu.VMEM((windows, SUB, C), jnp.uint32),           # err acc
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
            disable_bounds_checks=True),
        interpret=pallas_interpret(),
    )


def fused_scan_msm(table_quads, idx, seq: int, fast: bool):
    """table_quads: (chunk/4 + 1, 128) u32; idx: (W, n) int32 sorted-order
    gather indices (sentinel = chunk).  Returns (local, totals, err):
    local = 3 PACKED coords of (Lh, W, n); totals = 3 unpacked coords of
    (L, W, rows); err = (W, rows) bool or None.  Drop-in for the
    gather_rows + _scan_local_madd pair (same downstream shapes)."""
    windows, n = idx.shape
    rows = n // seq
    assert rows * seq == n and rows % SUB == 0, (seq, n)
    t4 = table_quads.shape[0]
    idx_steps = jnp.moveaxis(
        idx.reshape(windows, rows, seq), -1, 0).astype(jnp.int32)
    idx_steps = idx_steps.reshape(seq, windows, 1, rows)
    local, totals, err = _fused_call(seq, windows, rows, t4, fast)(
        idx_steps, idx_steps, idx_steps, idx_steps, table_quads)
    # local: (seq, 3*Lh, W, 8, C) -> 3 packed coords of (Lh, W, n);
    # lane (s, q) at step t is sorted position (s*C + q)*seq + t
    loc = tuple(
        jnp.moveaxis(local[:, c * LH:(c + 1) * LH], 0, -1).reshape(
            LH, windows, n)
        for c in range(3))
    tot = tuple(
        jnp.moveaxis(totals[:, c * L:(c + 1) * L], 0, 1).reshape(
            L, windows, rows)
        for c in range(3))
    e = None
    if fast:
        e = (err != 0).reshape(windows, rows)
    return loc, tot, e
