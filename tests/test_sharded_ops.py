"""Multi-chip sharded ops on the 8-virtual-CPU-device mesh (SURVEY.md §4
item 4 — the fake-backend layer the reference never needed).

Exercises the one-jit sharded step: sequence-parallel NTT (Bailey split,
all_to_all transposes) and data-parallel Pippenger MSM (all_gather +
group-law fold), both checked against host oracles.  Uses the same shapes
as the driver's ``dryrun_multichip`` so persistent-compile-cache entries
are shared (XLA:CPU compile of limb-math graphs dominates otherwise).
"""

import pytest
import jax

from polymath_tpu.parallel.mesh import make_mesh
from polymath_tpu.parallel.dryrun import run_sharded_check


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_sharded_ntt_and_msm_vs_host_oracles():
    # conftest pins JAX to 8 virtual CPU devices; use_pallas() is False on
    # CPU, selecting the compile-lean jnp fallback (interpret-mode Pallas
    # was measured at >15 min for this step on a 2-core host).
    mesh = make_mesh(8)
    run_sharded_check(mesh)
