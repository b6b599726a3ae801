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

    Returns (sub_ids, k): when every segment has < MAX_SEG entries, k = 1
    and sub_ids is seg_ids unchanged.  Otherwise entries are round-robined
    over k sub-segments per segment (sub id = seg*k + rank % k) so each
    sub-segment stays under the lazy-sum bound; segment_sum_mod folds the
    k sub-sums exactly mod p.
    """
    seg_ids = np.asarray(seg_ids, np.int32)
    counts = np.bincount(seg_ids, minlength=num_segments)
    max_c = int(counts.max()) if counts.size else 0
    if max_c < MAX_SEG:
        return seg_ids, 1
    k = -(-max_c // (MAX_SEG - 1))
    order = np.argsort(seg_ids, kind="stable")
    starts = np.zeros(num_segments + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    ranks = np.empty(len(seg_ids), np.int64)
    ranks[order] = np.arange(len(seg_ids)) - starts[seg_ids[order]]
    return (seg_ids.astype(np.int64) * k + ranks % k).astype(np.int32), k


class CooMatrix:
    """Static COO representation of a sparse Fr matrix (host-prepared)."""

    def __init__(self, rows, cols, coeffs, num_rows: int, num_cols: int):
        rows_np = np.asarray(rows, np.int32)
        sub_ids, self.k_sub = plan_segments(rows_np, num_rows)
        self.row_idx = jnp.asarray(sub_ids)  # sub-segment ids (== rows if k_sub=1)
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


def segment_sum_mod(vals, seg_ids, num_segments: int, k_sub: int = 1):
    """vals: (L, nnz) Montgomery limbs; lazily sum into segments and
    REDC-normalize.

    The lazy uint32 limb accumulation is exact only for segments of
    < MAX_SEG entries.  Callers with denser segments pass sub-segment ids
    from plan_segments() plus k_sub > 1; the k_sub partial sums per segment
    are REDC'd then folded with exact modular adds.
    """
    lazy = jax.ops.segment_sum(
        vals.T.astype(jnp.uint32), seg_ids, num_segments=num_segments * k_sub
    ).T  # (L, num_segments*k_sub), limbs < 2^31
    lazy = jnp.concatenate(
        [lazy, jnp.zeros((2,) + lazy.shape[1:], jnp.uint32)], axis=0)
    lazy = FR.carry(lazy)
    red = FR.redc_wide(lazy)
    out = FR.mont_mul(red, jnp.asarray(FR_SPEC.r2, jnp.uint32)[:, None])
    if k_sub > 1:
        out = out.reshape(out.shape[0], num_segments, k_sub)
        acc = out[..., 0]
        for i in range(1, k_sub):
            acc = FR.add(acc, out[..., i])
        out = acc
    return out


def coo_matvec(mat: CooMatrix, z_mont):
    """(L, num_rows) = M @ z for z_mont (L, num_cols) Montgomery limbs."""
    gathered = z_mont[:, mat.col_idx]          # (L, nnz)
    prods = FR.mont_mul(gathered, mat.coeffs_mont)
    return segment_sum_mod(prods, mat.row_idx, mat.num_rows, mat.k_sub)
