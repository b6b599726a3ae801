"""Segment-sum soundness: rows/columns denser than the 2^15-entry lazy
limb-accumulation bound must still sum exactly (r2 verdict weak #5 /
next-round item 7 — previously such rows silently wrapped uint32)."""

import random

import numpy as np
import jax.numpy as jnp

from polymath_tpu.hostmath.bls12_381 import R
from polymath_tpu.ops.limbs import FR_SPEC, ints_to_limbs, limbs_to_ints
from polymath_tpu.ops.sparse import (
    CooMatrix, coo_matvec, plan_segments, segment_sum_mod, MAX_SEG)
from polymath_tpu.ops.field_jax import FR


def _to_ints(arr):
    return [FR_SPEC.from_mont_int(v) for v in limbs_to_ints(np.asarray(arr))]


def test_plan_segments_two_level_compact():
    seg = np.array([0] * (3 * MAX_SEG + 7) + [2] * 5, np.int32)
    sub, lvl2, n_sub = plan_segments(seg, 3)
    assert lvl2 is not None
    counts = np.bincount(sub, minlength=n_sub)
    assert counts.max() < MAX_SEG
    # compact: ~nnz/MAX_SEG + num_segments slots, not num_segments * k
    assert n_sub <= 4 + 1 + 1
    for s in range(3):
        for x in np.unique(sub[seg == s]):
            assert lvl2[x] == s


def test_dense_row_matvec_exact_vs_host():
    """A single R1CS row with > 2^15 terms, worst-case coefficients
    (p-1, which maximizes limb magnitudes)."""
    rng = random.Random(4)
    nnz = MAX_SEG + 100
    cols = list(range(8)) * (nnz // 8 + 1)
    rows = [(R - 1, cols[i]) for i in range(nnz)]   # one dense row
    mat = CooMatrix.from_sparse_rows([rows, [(3, 1)]], 8)
    assert mat.lvl2_idx is not None
    z_int = [rng.randrange(R) for _ in range(8)]
    z = jnp.asarray(ints_to_limbs(
        [FR_SPEC.to_mont_int(v) for v in z_int], FR_SPEC.L))
    got = _to_ints(coo_matvec(mat, z))
    want0 = sum((R - 1) * z_int[cols[i]] for i in range(nnz)) % R
    assert got == [want0, 3 * z_int[1] % R]
