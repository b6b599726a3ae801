"""Multi-chip NTT: Bailey 4-step decomposition under shard_map.

n = n1 * n2; data viewed (L, n1, n2) with the n2 axis sharded over the
mesh.  Column NTTs are device-local, one all_to_all transposes the shard
axis over ICI, row NTTs are local, and a final all_to_all restores the
natural-order layout.  This is the sequence-parallel analogue for long
polynomials (SURVEY.md §5: the Ulysses-style axis swap).

The per-device local transforms reuse the single-chip fused Pallas kernel
(ops.ntt.ntt_local_batched: all stages of one nl <= 2048 transform in
VMEM).

Derivation (j = j2 + n2*j1, k = k1 + n1*k2, w = w_n):
    evals[k1 + n1 k2]
      = sum_j2 w^(j2 k1) w_n2^(j2 k2) * [ sum_j1 A[j1,j2] w_n1^(j1 k1) ]
so: (1) NTT_n1 over j1;  (2) twiddle by w^(k1 j2);  (3) NTT_n2 over j2;
(4) output transpose.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..hostmath.bls12_381 import R
from ..ops.limbs import FR_SPEC, int_to_limbs
from ..ops.field_jax import FR
from ..ops.ntt import domain_omega, ntt_local_batched, powers_of
from ..ops.pallas_field import fr_mul


def _outer_twiddle(n1: int, n2: int, inverse: bool):
    """(L, n1, n2) Montgomery twiddles w^(±k1*j2) via one gather from the
    length-n power table (host-precomputed index matrix).

    NOT lru_cached: this traces jnp ops, and caching a tracer from one jit
    scope leaks it into the next (UnexpectedTracerError when a second
    jitted caller — e.g. the sharded prover's stage1 after the dryrun's
    primitive check — hits the cache)."""
    n = n1 * n2
    omega = domain_omega(n)
    if inverse:
        omega = pow(omega, R - 2, R)

    pw = powers_of(jnp.asarray(
        int_to_limbs(FR_SPEC.to_mont_int(omega), FR_SPEC.L))[:, None], n)
    k1 = np.arange(n1, dtype=np.int64)[:, None]
    j2 = np.arange(n2, dtype=np.int64)[None, :]
    idx = ((k1 * j2) % n).astype(np.int32)
    return pw[:, idx]  # (L, n1, n2)


def ntt_sharded(a, mesh, n1: int | None = None, inverse: bool = False,
                axis: str = "dp"):
    """NTT of (L, n) Montgomery Fr limbs over a 1-axis mesh.

    Returns natural-order result, sharded like the input (trailing axis).
    """
    L, n = a.shape
    d = mesh.shape[axis]
    if n1 is None:
        # balanced split with both factors divisible by d
        half = (n.bit_length() - 1) // 2
        n1 = 1 << max(half, (d - 1).bit_length())
    n2 = n // n1
    assert n1 * n2 == n and n1 % d == 0 and n2 % d == 0, (n1, n2, d)

    tw = _outer_twiddle(n1, n2, inverse)

    def local(a_blk, tw_blk):
        # a_blk: (L, n1, n2/d) — local columns
        x = jnp.swapaxes(a_blk, 1, 2)              # (L, n2/d, n1)
        x = ntt_local_batched(x, inverse)          # NTT over j1 (scales 1/n1)
        x = jnp.swapaxes(x, 1, 2)                  # (L, n1, n2/d)
        x = fr_mul(x, tw_blk)                      # twiddle w^(k1 j2)
        # transpose shard: split n1 into d chunks, concat along n2
        x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                               tiled=True)         # (L, n1/d, n2)
        x = ntt_local_batched(x, inverse)          # NTT over j2 (scales 1/n2)
        # x[k1_local, k2]; want natural order evals[k1 + n1 k2]:
        # flat natural = (k2-major over n2) x (k1) -> transpose back
        x = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                               tiled=True)         # (L, n1, n2/d)
        return x

    out = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis)),
        out_specs=P(None, None, axis),
        # Pallas calls inside the body can't declare varying-mesh-axes
        # metadata; skip the replication check.
        check_vma=False,
    )(a.reshape(L, n1, n2), tw)
    # out[k1, k2] with evals[k1 + n1 k2] -> natural flat = transpose.
    # inverse scaling: 1/n1 then 1/n2 per local NTT = 1/n total.
    return jnp.swapaxes(out, 1, 2).reshape(L, n)
