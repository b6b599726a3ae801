"""Multi-chip MSM: data-parallel points/scalars with window partial sums
combined over ICI.

Each device runs the single-chip Pippenger chunk (ops.msm._msm_chunk) on
its point shard; the (L, windows) Jacobian partials — a few KB — are
all_gather'ed and tree-combined with the group law (a `psum` cannot sum
group elements, so the reduction is an explicit jac_add fold over the
gathered device axis).  The final window Horner stays on host.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.msm import _msm_chunk, _window_params, _horner_windows_host
from ..ops.curve_jax import jac_add


def _reduce_gathered(parts):
    """parts: coords (d, L, W) -> fold over leading axis with jac_add.

    lax.scan keeps the graph at ONE jac_add instance regardless of mesh
    size (an unrolled fold is d-1 instances — minutes of XLA compile)."""
    from ..ops.curve_jax import jac_identity

    acc0 = jac_identity(parts[0].shape[2:])

    def body(acc, xs):
        return jac_add(acc, xs), None

    acc, _ = jax.lax.scan(body, acc0, parts)
    return acc


def msm_sharded_partials(xs, ys, scalars, mesh, axis: str = "dp"):
    """Traceable sharded MSM core: per-device Pippenger chunks combined
    over the mesh.  Returns (window params, jacobian window sums on
    device) — callers finish with the tiny host-side window Horner."""
    from ..ops.limbs import FQ_SPEC
    from ..ops.curve_jax import pack_limbs
    if xs.shape[0] == FQ_SPEC.L:     # _msm_chunk consumes packed leaves
        xs, ys = pack_limbs(xs), pack_limbs(ys)
    n = xs.shape[-1]
    d = mesh.shape[axis]
    assert n % d == 0, "pad MSM inputs to a multiple of the mesh size"
    local_n = n // d
    c, windows = _window_params(local_n)

    def local(xs_l, ys_l, sc_l):
        part, _ = _msm_chunk(xs_l, ys_l, sc_l, c, windows)  # (L, W) coords
        gathered = tuple(
            jax.lax.all_gather(a, axis, axis=0) for a in part)  # (d, L, W)
        return _reduce_gathered(gathered)

    wsums = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, None),
        # Pallas calls inside the body can't declare varying-mesh-axes
        # metadata; skip the replication check.
        check_vma=False,
    )(xs, ys, scalars)
    return (c, windows), wsums


def msm_sharded(xs, ys, scalars, mesh, axis: str = "dp"):
    """MSM over (24, N) affine limbs + (16, N) canonical scalars, N
    divisible by the mesh size.  Returns a host affine point."""
    (c, windows), wsums = msm_sharded_partials(xs, ys, scalars, mesh, axis)
    return _horner_windows_host(wsums, c, windows)
