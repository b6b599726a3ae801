"""One-jit sharded proving step on tiny shapes + host-oracle checks.

Used by the driver's multichip dryrun (``__graft_entry__.dryrun_multichip``)
and by the pytest suite on the 8-virtual-CPU-device mesh (SURVEY.md §4:
the fake-backend layer).  Keeping both on the same shapes and code path
means they share persistent-compile-cache entries.

Validates the real multi-chip primitives of the prover:
  * sequence-parallel NTT (Bailey split, two ``all_to_all`` transposes)
    forward + inverse vs the host Radix2Domain oracle;
  * data-parallel Pippenger MSM (per-device chunks, ``all_gather`` +
    group-law fold) vs the host MSM oracle.
"""

from __future__ import annotations

import random

import numpy as np


def run_sharded_check(mesh, n: int | None = None, pts_per_dev: int = 8,
                      seed: int = 11) -> None:
    """Raises AssertionError on any mismatch vs the host oracles.

    Default n scales as max(64, d^2) with the mesh size d so both Bailey
    factors of the sharded NTT stay divisible by d (n = 64 fails its
    n1 % d == 0 assert at d = 16; at the common d = 8 this keeps the
    round-2 cached shapes)."""
    import jax
    import jax.numpy as jnp

    from ..hostmath import bls12_381 as bls
    from ..hostmath.bls12_381 import R
    from ..ops.limbs import FR_SPEC, ints_to_limbs, limbs_to_ints
    from ..ops.curve_jax import points_to_device
    from ..ops.msm import _window_params
    from ..protocol.poly_host import Radix2Domain
    from .ntt_sharded import ntt_sharded
    from .msm_sharded import msm_sharded_partials, _horner_windows_host

    n_devices = mesh.devices.size
    if n is None:
        n = max(64, n_devices * n_devices)
    rng = random.Random(seed)
    npts = pts_per_dev * n_devices

    coeffs = [rng.randrange(R) for _ in range(n)]
    a = jnp.asarray(ints_to_limbs(
        [FR_SPEC.to_mont_int(c) for c in coeffs], FR_SPEC.L))

    base_pts = [bls.G1.mul(bls.G1.gen, rng.randrange(R)) for _ in range(8)]
    pts = (base_pts * ((npts + 7) // 8))[:npts]
    scalars = [rng.randrange(R) for _ in range(npts)]
    xs, ys = points_to_device(pts)
    sc = jnp.asarray(ints_to_limbs(scalars, FR_SPEC.L))

    # Two jits, not one: XLA:CPU compile time is superlinear in module
    # size (one fused step measured >560 s of compile on a 2-core host;
    # the halves compile in a fraction of that and cache independently).
    # Both go through the AOT executable store so a fresh driver process
    # deserializes instead of recompiling (r4: rc=124 on exactly this).
    from ..ops.aot import aot_jit

    def _ntt_step(a):
        evals = ntt_sharded(a, mesh)                        # all_to_all x2
        back = ntt_sharded(evals, mesh, inverse=True)       # all_to_all x2
        return evals, back

    def _msm_step(xs, ys, sc):
        _, wsums = msm_sharded_partials(xs, ys, sc, mesh)   # all_gather
        return wsums

    ntt_step = aot_jit(_ntt_step, f"dryrun-ntt-{n}-d{n_devices}")
    msm_step = aot_jit(_msm_step, f"dryrun-msm-{npts}-d{n_devices}")

    c, windows = _window_params(npts // n_devices)
    evals, back = ntt_step(a)
    wsums = msm_step(xs, ys, sc)
    jax.block_until_ready(wsums[0])

    got = [FR_SPEC.from_mont_int(v)
           for v in limbs_to_ints(np.asarray(evals))]
    expect = Radix2Domain(n).fft(coeffs)
    assert got == expect, "sharded NTT mismatch vs host oracle"
    got_b = [FR_SPEC.from_mont_int(v)
             for v in limbs_to_ints(np.asarray(back))]
    assert got_b == coeffs, "sharded iNTT round-trip failed"

    got_msm = _horner_windows_host(wsums, c, windows)
    expect_msm = bls.G1.msm(pts, scalars)
    assert got_msm == expect_msm, "sharded MSM mismatch vs host oracle"


def run_sharded_prove(mesh, rounds: int = 15, seed: int = 3) -> None:
    """End-to-end PROOF through the mesh (create_proof_sharded): reduced
    MiMC at n = 4*rounds + 4 = 64, verified by the host verifier.  This is
    the path that makes multi-chip proving a first-class capability rather
    than two leaf primitives (SURVEY.md §2.2/§7)."""
    from ..hostmath.bls12_381 import R
    from ..circuits.mimc import MiMCDemo, mimc_hash
    from ..protocol import Polymath, Rng
    from ..transcript import MerlinFieldTranscript
    from .prover_sharded import create_proof_sharded

    crng = random.Random(seed)
    consts = [crng.randrange(R) for _ in range(rounds)]
    xl, xr = crng.randrange(R), crng.randrange(R)
    image = mimc_hash(xl, xr, consts)

    # setup via the host generator: at n = 64 it is sub-second pure
    # Python and compiles NOTHING, vs the device generator's several
    # XLA:CPU program classes on the virtual mesh (r4 driver-clock cost)
    pm = Polymath(transcript=MerlinFieldTranscript, backend="host")
    pk, vk = pm.setup(MiMCDemo(constants=consts), Rng(seed))
    proof = create_proof_sharded(
        MiMCDemo(xl, xr, consts), pk, Rng(seed + 1),
        MerlinFieldTranscript, mesh)
    from ..protocol import verifier as _verifier
    assert _verifier.verify_proof(vk, proof, [image], MerlinFieldTranscript), \
        "sharded proof failed host verification"
