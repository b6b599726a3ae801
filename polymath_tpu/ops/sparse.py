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


class CooMatrix:
    """Static COO representation of a sparse Fr matrix (host-prepared)."""

    def __init__(self, rows, cols, coeffs, num_rows: int, num_cols: int):
        self.row_idx = jnp.asarray(np.asarray(rows, np.int32))
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


def segment_sum_mod(vals, seg_ids, num_segments: int):
    """vals: (L, nnz) Montgomery limbs; lazily sum into segments and
    REDC-normalize.  Safe for segments with < 2^15 entries (limb sums stay
    < 2^31); larger rows would need a two-level split."""
    L = vals.shape[0]
    lazy = jax.ops.segment_sum(
        vals.T.astype(jnp.uint32), seg_ids, num_segments=num_segments
    ).T  # (L, num_segments), limbs < 2^31
    lazy = jnp.concatenate(
        [lazy, jnp.zeros((2,) + lazy.shape[1:], jnp.uint32)], axis=0)
    lazy = FR.carry(lazy)
    red = FR.redc_wide(lazy)
    return FR.mont_mul(red, jnp.asarray(FR_SPEC.r2, jnp.uint32)[:, None])


def coo_matvec(mat: CooMatrix, z_mont):
    """(L, num_rows) = M @ z for z_mont (L, num_cols) Montgomery limbs."""
    gathered = z_mont[:, mat.col_idx]          # (L, nnz)
    prods = FR.mont_mul(gathered, mat.coeffs_mont)
    return segment_sum_mod(prods, mat.row_idx, mat.num_rows)
