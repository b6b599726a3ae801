"""Device-mesh helpers for multi-chip proving.

The reference's only parallelism is shared-memory rayon (SURVEY.md §2.2);
here the scaling axes are JAX meshes: points/scalars data-parallel for MSM
(partial window sums gathered over ICI), and Bailey-decomposed NTTs with
all_to_all transposes (the sequence-parallel analogue, SURVEY.md §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n_devices]), (axis,))


def axis_size(mesh: Mesh, axis: str = "dp") -> int:
    return mesh.shape[axis]
