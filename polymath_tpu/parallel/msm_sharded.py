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
from jax.experimental.shard_map import shard_map

from ..ops.msm import _msm_chunk, _window_params, _horner_windows_host
from ..ops.curve_jax import jac_add


def _reduce_gathered(parts):
    """parts: coords (d, L, W) -> fold over leading axis with jac_add."""
    d = parts[0].shape[0]
    acc = tuple(a[0] for a in parts)
    for i in range(1, d):
        acc = jac_add(acc, tuple(a[i] for a in parts))
    return acc


def msm_sharded(xs, ys, scalars, mesh, axis: str = "dp"):
    """MSM over (24, N) affine limbs + (16, N) canonical scalars, N
    divisible by the mesh size.  Returns a host affine point."""
    n = xs.shape[-1]
    d = mesh.shape[axis]
    assert n % d == 0, "pad MSM inputs to a multiple of the mesh size"
    local_n = n // d
    c, windows = _window_params(local_n)

    def local(xs_l, ys_l, sc_l):
        part = _msm_chunk(xs_l, ys_l, sc_l, c, windows)  # (L, W) coords
        gathered = tuple(
            jax.lax.all_gather(a, axis, axis=0) for a in part)  # (d, L, W)
        return _reduce_gathered(gathered)

    wsums = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, None),
    )(xs, ys, scalars)
    return _horner_windows_host(wsums, c, windows)
