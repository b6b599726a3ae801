"""Pallas TPU row-gather kernel for the MSM point permutation.

The MSM bucket sort (ops/msm.py step 1) permutes each chunk's points into
digit order once per window: W*n gathered rows of 96 B (24 packed u32) per
chunk.  XLA's gather lowers this to per-row descriptor DMA at a measured
~23 ns/row (tools/MSM_MEASUREMENTS_r04.json) — the largest single cost of
the r4 MSM profile (~145 ms per 2^18 chunk).

This kernel keeps the whole point table resident in VMEM (it fits: a 2^18
chunk is 24 MB packed, and v5e VMEM is 128 MB) and turns each row into a
handful of register ops instead of a DMA:

  table is reshaped (T/4, 96) and lane-padded to 128: four 24-u32 point
  rows per VMEM row, so a point i lives at sublane i>>2, lane offset
  (i&3)*24.  The per-index scalar loop does the bare minimum — one
  dynamic-sublane (1, 128) load and one aligned store into a (BLK, 128)
  staging block (~5 ops/row); the lane extraction is then done VECTORIZED
  over the whole block (4 static lane rolls + masked selects, ~1 op/row)
  — a per-row dynamic roll + masked 24-lane store measured 17 ns/row,
  no better than XLA's gather.  Finally the block is transposed in-kernel
  so the output leaves in the (24, M) limb-major layout the madd scan
  consumes (the XLA path paid a separate ~43 ms relayout for this).

Replaces the arkworks Pippenger bucket assignment (reference
prover.rs:379-384 via ark-ec VariableBaseMSM); no scatter exists on TPU so
the permutation IS the bucket structure (see ops/msm.py module docstring).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import pallas_interpret

ROW_U32 = 24          # packed point row: 12 x-limbs + 12 y-limbs (u32)
PTS_PER_VROW = 4      # points per 96-lane VMEM row
BLK = 1024            # gathered points per grid step
UNROLL = 8


def _gather_kernel(idx_ref, idxv_ref, table_ref, out_ref, scratch_ref):
    """idx (1, BLK) SMEM + same in VMEM; table (T4, 128) VMEM;
    out (24, BLK) VMEM; scratch (BLK, 128) VMEM."""

    def body(k, carry):
        base = pl.multiple_of(k * UNROLL, UNROLL)
        rows = []
        for u in range(UNROLL):
            i = idx_ref[0, base + u]
            s = i // PTS_PER_VROW
            rows.append(table_ref[pl.ds(s, 1), :])
        scratch_ref[pl.ds(base, UNROLL), :] = jnp.concatenate(rows, axis=0)
        return carry

    jax.lax.fori_loop(0, BLK // UNROLL, body, 0)

    # vectorized lane extraction: point u sits at lanes (idx&3)*24..+24 of
    # its quad row; select among the 4 static alignments at full width
    quads = scratch_ref[:, :]                                # (BLK, 128)
    off = (idxv_ref[:, :].reshape(BLK, 1) % PTS_PER_VROW)    # (BLK, 1)
    out = quads[:, :ROW_U32]
    for kq in range(1, PTS_PER_VROW):
        shifted = pltpu.roll(quads, 128 - kq * ROW_U32, axis=1)[:, :ROW_U32]
        out = jnp.where(off == kq, shifted, out)
    out_ref[:, :] = out.T


@lru_cache(maxsize=None)
def _gather_call(t4: int, m: int):
    grid = (m // BLK,)
    return pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t4, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_U32, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROW_U32, m), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            disable_bounds_checks=True),
        interpret=pallas_interpret(),
    )


def gather_rows(table_rows, idx):
    """table_rows: (T, 24) u32 point rows; idx: int32 (..., M) flat total M
    indices in [0, T).  Returns (24, ...idx.shape): out[:, j] =
    table_rows[idx[j], :] transposed to limb-major.

    T must be a multiple of 4 and the flattened index count a multiple of
    BLK (ops/msm.py pads both: the table with zero sentinel rows, the
    index vector never — its W*chunk size is already BLK-aligned).
    """
    t, row = table_rows.shape
    assert row == ROW_U32 and t % PTS_PER_VROW == 0, (t, row)
    ish = idx.shape
    m = int(np.prod(ish))
    assert m % BLK == 0, ish
    tbl = table_rows.reshape(t // PTS_PER_VROW, PTS_PER_VROW * ROW_U32)
    tbl = jnp.pad(tbl, ((0, 0), (0, 128 - PTS_PER_VROW * ROW_U32)))
    return gather_rows_quads(tbl, idx)


def gather_rows_quads(table_quads, idx):
    """Like gather_rows but the table is pre-quadded: (T4, 128) u32 with
    point i at sublane i>>2, lanes (i&3)*24..+24 (lanes 96.. ignored).
    The MSM fori_loop slices these tables directly out of a row-major
    SRS relayout (ops/msm.py _msm_run) with zero per-chunk layout work."""
    t4, lanes = table_quads.shape
    assert lanes == 128, table_quads.shape
    ish = idx.shape
    m = int(np.prod(ish))
    assert m % BLK == 0, ish
    idx2 = idx.reshape(1, m).astype(jnp.int32)
    out = _gather_call(t4, m)(idx2, idx2, table_quads)
    return out.reshape((ROW_U32,) + ish)
