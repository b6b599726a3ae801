"""Device sparse linear algebra over Fr: COO matvec with segment sums.

Implements the O(nnz) SAP evaluation products (replacing the reference's
dense O(n*m) materialization, prover.rs:87-88/245-252) on device: gather z
by column index, Montgomery-multiply by coefficients, lazily segment-sum
limbs into rows, then REDC-normalize.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath.bls12_381 import R
from .limbs import FR_SPEC, ints_to_limbs
from .field_jax import FR


#: Lazy uint32 limb sums stay < 2^31 only for segments of < 2^15 entries
#: (each Montgomery limb < 2^16).  plan_segments() splits denser segments.
MAX_SEG = 1 << 15


def plan_segments(seg_ids: np.ndarray, num_segments: int):
    """Host-side soundness planning for segment_sum_mod.

    Returns (sub_ids, lvl2_ids, n_sub):
      * every segment < MAX_SEG entries: sub_ids is seg_ids unchanged,
        lvl2_ids is None, n_sub == num_segments;
      * otherwise entries of segment s map to compact sub-segments
        (one per MAX_SEG-1 entries, so n_sub ~ nnz/MAX_SEG + num_segments
        — NOT num_segments * k, which explodes for a few dense columns),
        and lvl2_ids (length n_sub) maps each sub-segment back to its
        segment for an exact second-level sum in segment_sum_mod.
    """
    seg_ids = np.asarray(seg_ids, np.int32)
    counts = np.bincount(seg_ids, minlength=num_segments)
    max_c = int(counts.max()) if counts.size else 0
    if max_c < MAX_SEG:
        return seg_ids, None, num_segments
    cap = MAX_SEG - 1
    n_parts = -(-counts // cap)            # ceil(count/cap), 0 for empty
    n_parts = np.maximum(n_parts, 1)       # empty segments keep one slot
    sub_start = np.zeros(num_segments + 1, np.int64)
    np.cumsum(n_parts, out=sub_start[1:])
    n_sub = int(sub_start[-1])
    order = np.argsort(seg_ids, kind="stable")
    starts = np.zeros(num_segments + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    ranks = np.empty(len(seg_ids), np.int64)
    ranks[order] = np.arange(len(seg_ids)) - starts[seg_ids[order]]
    sub_ids = (sub_start[seg_ids] + ranks // cap).astype(np.int32)
    lvl2_ids = np.repeat(np.arange(num_segments, dtype=np.int32), n_parts)
    return sub_ids, lvl2_ids, n_sub


class CooMatrix:
    """Static COO representation of a sparse Fr matrix (host-prepared)."""

    def __init__(self, rows, cols, coeffs, num_rows: int, num_cols: int):
        rows_np = np.asarray(rows, np.int32)
        sub_ids, lvl2_ids, self.n_sub = plan_segments(rows_np, num_rows)
        self.row_idx = jnp.asarray(sub_ids)  # sub-segment ids
        self.lvl2_idx = None if lvl2_ids is None else jnp.asarray(lvl2_ids)
        self.col_idx = jnp.asarray(np.asarray(cols, np.int32))
        self.coeffs_mont = jnp.asarray(
            ints_to_limbs([FR_SPEC.to_mont_int(c % R) for c in coeffs], FR_SPEC.L))
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.nnz = len(coeffs)

    @classmethod
    def from_sparse_rows(cls, sparse_rows, num_cols: int):
        """From list-of-rows [(coeff, col)] (frontend r1cs.to_matrices)."""
        rows, cols, coeffs = [], [], []
        for i, row in enumerate(sparse_rows):
            for coeff, j in row:
                rows.append(i)
                cols.append(j)
                coeffs.append(coeff)
        if not rows:  # keep a 1-element dummy so shapes stay static
            rows, cols, coeffs = [0], [0], [0]
        return cls(rows, cols, coeffs, len(sparse_rows), num_cols)

    @classmethod
    def from_arrays(cls, row_idx, col_idx, coeffs_mont, lvl2_idx, n_sub,
                    num_rows: int, num_cols: int) -> "CooMatrix":
        """Rehydrate from pre-planned arrays (ProvingKey.load_dir) — skips
        the host big-int coefficient conversion and segment planning."""
        self = cls.__new__(cls)
        self.row_idx = jnp.asarray(np.asarray(row_idx, np.int32))
        self.lvl2_idx = (None if lvl2_idx is None
                         else jnp.asarray(np.asarray(lvl2_idx, np.int32)))
        self.col_idx = jnp.asarray(np.asarray(col_idx, np.int32))
        self.coeffs_mont = jnp.asarray(np.asarray(coeffs_mont, np.uint32))
        self.n_sub = int(n_sub)
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.nnz = int(self.coeffs_mont.shape[-1])
        return self


def segment_sum_mod(vals, seg_ids, num_segments: int, lvl2_ids=None,
                    n_sub: int | None = None):
    """vals: (L, nnz) Montgomery limbs; lazily sum into segments and
    REDC-normalize.

    The lazy uint32 limb accumulation is exact only for segments of
    < MAX_SEG entries.  Callers with denser segments pass the two-level
    plan from plan_segments(): level 1 sums into n_sub compact
    sub-segments (lazy, then carried to canonical 16-bit limbs), level 2
    sums the <= MAX_SEG canonical sub-sums per segment (limb sums
    < 2^16 * nnz/MAX_SEG < 2^31), and one REDC finishes.
    """
    if n_sub is None:
        n_sub = num_segments
    lazy = jax.ops.segment_sum(
        vals.T.astype(jnp.uint32), seg_ids, num_segments=n_sub
    ).T  # (L, n_sub), limbs < 2^31
    lazy = jnp.concatenate(
        [lazy, jnp.zeros((2,) + lazy.shape[1:], jnp.uint32)], axis=0)
    lazy = FR.carry(lazy)  # canonical 16-bit limbs, L+2 wide
    if lvl2_ids is not None:
        lazy = jax.ops.segment_sum(
            lazy.T, lvl2_ids, num_segments=num_segments).T
        lazy = jnp.concatenate(
            [lazy, jnp.zeros((1,) + lazy.shape[1:], jnp.uint32)], axis=0)
        lazy = FR.carry(lazy)
    red = FR.redc_wide(lazy)
    return FR.mont_mul(red, jnp.asarray(FR_SPEC.r2, jnp.uint32)[:, None])


def coo_matvec(mat: CooMatrix, z_mont):
    """(L, num_rows) = M @ z for z_mont (L, num_cols) Montgomery limbs."""
    from .pallas_field import fr_mul
    gathered = z_mont[:, mat.col_idx]          # (L, nnz)
    prods = fr_mul(gathered, mat.coeffs_mont)
    return segment_sum_mod(prods, mat.row_idx, mat.num_rows,
                           mat.lvl2_idx, mat.n_sub)
