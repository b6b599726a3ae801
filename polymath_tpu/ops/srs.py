"""Device-side trusted setup: SRS scalar vectors and fixed-base bulk
multiplication (the generator's hot path, reference generator.rs:79-146).

Two entry points:
  * ``device_scalar_mul_backend`` — plugs into
    protocol/generator.generate_proving_key: host-computed scalar dict in,
    host affine point lists out (fine up to ~10^5 elements).
  * ``generate_proving_key_device`` — full device path for large circuits:
    scalar vectors are computed on device (powers by doubling, Lagrange
    coefficients via batched Fermat inversion, column sums via segment
    sums) and SRS points stay on device (pk.device["srs"]), avoiding any
    O(n) host<->device int conversion.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath import bls12_381 as bls
from ..hostmath.bls12_381 import R
from ..frontend.r1cs import synthesize, ConstraintSystem
from ..frontend.sap import SAPMatrices
from ..protocol.poly_host import Radix2Domain
from ..protocol.common import MINUS_ALPHA, MINUS_GAMMA
from ..protocol.data_structures import PairingVK, VerifyingKey, ProvingKey
from ..utils.timers import phase
from ..utils.config import device_sync as sync
from .limbs import FR_SPEC, ints_to_limbs
from .field_jax import FR
from .ntt import powers_of, domain_omega
from .sparse import segment_sum_mod, plan_segments
from .fixed_base import fixed_base_mul, fixed_base_mul_ints
from .curve_jax import jac_to_host


def _affine_device_to_host(xy):
    """Device affine (X, Y) Montgomery limb arrays -> host affine list.
    (0, 0) is the device identity encoding -> host ``None``."""
    from .limbs import FQ_SPEC, limbs_to_ints
    xs = [FQ_SPEC.from_mont_int(v) for v in limbs_to_ints(np.asarray(xy[0]))]
    ys = [FQ_SPEC.from_mont_int(v) for v in limbs_to_ints(np.asarray(xy[1]))]
    return [None if y == 0 else (bls.Fq(x), bls.Fq(y))
            for x, y in zip(xs, ys)]


def device_scalar_mul_backend(scalars: dict):
    """Host scalar dict -> host affine vectors, bulk work on device."""
    out = {}
    for name, vec in scalars.items():
        if len(vec) < 64:
            # tiny vectors: host fixed-base is cheaper than a device trip
            from ..protocol.generator import FixedBaseTable
            table = FixedBaseTable(bls.G1, bls.G1.gen, c=8)
            out[name] = [table.mul(s) for s in vec]
        else:
            xy = fixed_base_mul_ints(vec)
            out[name] = _affine_device_to_host(xy)
    return out


def _mont_const(v: int):
    return jnp.asarray(
        ints_to_limbs([FR_SPEC.to_mont_int(v % R)], FR_SPEC.L))


def generate_proving_key_device(circuit, rng) -> ProvingKey:
    """Full setup with device scalar vectors and device-resident SRS.

    Phase scopes mirror the reference generator's ark-std timers
    (generator.rs:28-148)."""
    with phase("setup::constraint synthesis"):
        cs = synthesize(circuit, ConstraintSystem.SETUP)
        sap = SAPMatrices.from_constraint_system(cs)
    rows, num_columns = sap.size()
    domain = Radix2Domain(rows)
    n = domain.n
    m0 = sap.num_instance_variables
    m = num_columns
    sigma = n + 3
    bnd_a = 1

    x = domain.sample_element_outside_domain(rng)
    z = domain.sample_element_outside_domain(rng)
    y = pow(x, sigma, R)
    y_inv = pow(y, R - 2, R)
    y_alpha = pow(y_inv, MINUS_ALPHA, R)
    y_to_minus_alpha = pow(y, MINUS_ALPHA, R)
    y_gamma = pow(y_inv, MINUS_GAMMA, R)

    d_max = 2 * (n - 1) + sigma * (MINUS_ALPHA + MINUS_GAMMA)

    # -- scalar vectors on device ----------------------------------------
    with phase("setup::x-power scalar vectors"):
        xm = _mont_const(x)
        xp_all = powers_of(xm, d_max + 1)               # (16, d_max+1) mont

        def scaled(vec, const_int):
            # fused Pallas elementwise mul: the XLA scan-CIOS holds ~6x
            # the operand size in loop temporaries, which OOMs at the
            # (16, ~21M) d-vector scale; the Pallas kernel is in/out only
            from .pallas_field import fr_mul
            return fr_mul(vec, _mont_const(const_int))

        sc = {}
        sc["x_powers_g1"] = xp_all[:, : n + bnd_a]
        sc["x_powers_y_gamma_z_g1"] = scaled(xp_all, y_gamma * z % R)
        zh_at_x = (pow(x, n, R) - 1) % R
        sc["x_powers_zh_by_y_alpha_g1"] = sync(scaled(
            xp_all[:, : n - 1], zh_at_x * y_to_minus_alpha % R))

    # -- u_j(x), w_j(x) for witness columns (device) ----------------------
    # l_i(x) = omega^i * (x^n - 1) / (n (x - omega^i))
    with phase("setup::lagrange coefficients at x"):
        omega = domain_omega(n)
        om_pows = powers_of(_mont_const(omega), n)      # (16, n)
        x_bc = jnp.broadcast_to(xm, (16, n))
        denom = FR.sub(x_bc, om_pows)
        denom_inv = FR.inv(denom)                       # batched Fermat
        lconst = _mont_const(zh_at_x * pow(n, R - 2, R) % R)
        l_at_x = sync(FR.mont_mul(FR.mont_mul(om_pows, denom_inv), lconst))

    with phase("setup::SAP column views"):
        u_cols = sap.u_columns_transposed()
        w_cols = sap.w_columns_transposed()

    def col_sums(cols_dict):
        seg, row, coeff = [], [], []
        for j, entries in cols_dict.items():
            for i, co in entries:
                seg.append(j - m0)
                row.append(i)
                coeff.append(co)
        if not seg:
            seg, row, coeff = [0], [0], [0]
        # dense columns (a bench variable reused across ~n constraints)
        # overflow the lazy limb sums past 2^15 entries — split them
        sub_ids, lvl2_ids, n_sub = plan_segments(
            np.asarray(seg, np.int32), m - m0)
        seg = jnp.asarray(sub_ids)
        lvl2 = None if lvl2_ids is None else jnp.asarray(lvl2_ids)
        row = jnp.asarray(np.asarray(row, np.int32))
        cmont = jnp.asarray(
            ints_to_limbs([FR_SPEC.to_mont_int(c) for c in coeff], FR_SPEC.L))
        gathered = l_at_x[:, row]
        prods = FR.mont_mul(gathered, cmont)
        return segment_sum_mod(prods, seg, m - m0, lvl2, n_sub)

    with phase("setup::u_j(x), w_j(x) column sums"):
        uj_x = col_sums(u_cols)
        wj_x = col_sums(w_cols)
        sc["uj_wj_lcs_by_y_alpha_g1"] = sync(scaled(
            FR.add(scaled(uj_x, y_gamma), wj_x), y_to_minus_alpha))

    # scalar-vector temporaries are sizeable at bench scale (~10n Fr
    # elements); free each as it is consumed so SRS points + scalars never
    # coexist fully in HBM
    del xp_all, om_pows, denom, denom_inv, l_at_x, x_bc

    # -- fixed-base multiply (device), canonical scalars ------------------
    srs_device = {}
    for name in list(sc.keys()):
        vec = sc.pop(name)
        with phase(f"setup::fixed-base mul {name} ({vec.shape[-1]})"):
            srs_device[name] = sync(fixed_base_mul(jax.jit(FR.from_mont)(vec)))
        del vec

    # small vectors on host (exact per generator.rs:85-91)
    with phase("setup::G2 + small host vectors"):
        from ..protocol.generator import FixedBaseTable
        table = FixedBaseTable(bls.G1, bls.G1.gen, c=8)
        x_powers_y_alpha = [table.mul(pow(x, j, R) * y_alpha % R)
                            for j in range(2 * bnd_a + 1)]
        x_powers_y_gamma = [table.mul(pow(x, j, R) * y_gamma % R)
                            for j in range(bnd_a + 1)]

    e = PairingVK(
        one_g1=bls.G1.gen, one_g2=bls.G2.gen,
        x_g2=bls.G2.mul(bls.G2.gen, x), z_g2=bls.G2.mul(bls.G2.gen, z))
    vk = VerifyingKey(e=e, n=n, m0=m0, sigma=sigma, omega=omega)

    pk = ProvingKey(
        vk=vk, sap_matrices=sap,
        x_powers_g1=None,
        x_powers_y_alpha_g1=x_powers_y_alpha,
        x_powers_zh_by_y_alpha_g1=None,
        x_powers_y_gamma_g1=x_powers_y_gamma,
        x_powers_y_gamma_z_g1=None,
        uj_wj_lcs_by_y_alpha_g1=None,
    )
    pk.device["srs"] = srs_device
    return pk
