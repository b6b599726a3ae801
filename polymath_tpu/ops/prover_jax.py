"""Device (TPU) prover pipeline.

Same protocol skeleton as protocol/prover.py (reference prover.rs:66-237)
with all bulk math on device: sparse SAP block matvecs, NTTs, the size-2n
squaring, the ~10n-coefficient quotient scan, and all large MSMs.  Host
keeps witness synthesis, the two Fiat–Shamir rounds (the mandatory
device->host sync points, SURVEY.md §3.2) and the O(1)/O(m0) algebra.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath import bls12_381 as bls
from ..hostmath.bls12_381 import R
from ..frontend.r1cs import synthesize, ConstraintSystem
from ..protocol import common
from ..protocol.common import MINUS_ALPHA, MINUS_GAMMA
from ..protocol.data_structures import Proof
from ..protocol.poly_host import Radix2Domain
from .limbs import FR_SPEC, ints_to_limbs, limbs_to_ints
from .field_jax import FR
from .ntt import ntt, ntt_trace, poly_eval_device
from .pallas_field import fr_mul, fr_sqr
from .poly_jax import synthetic_divide_device
from .sparse import CooMatrix, coo_matvec
from .msm import msm_device
from .curve_jax import points_to_device, jac_to_host
from .aot import aot_jit


def fr_ints_to_mont_device(values):
    """list of canonical ints -> (16, N) Montgomery limbs (device to_mont).

    The limbs travel h2d as uint16 (32 B/element, the canonical width)
    and widen on device — at bench scale the z vector is ~67 MB as u32
    and the tunnel h2d runs at a few tens of MB/s, so halving the bytes
    halves the prover's h2d phase."""
    import numpy as np
    n = len(values)
    nbytes = 2 * FR_SPEC.L
    buf = b"".join((int(v) % R).to_bytes(nbytes, "little") for v in values)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(n, FR_SPEC.L)
    raw16 = jnp.asarray(np.ascontiguousarray(u16.T))
    return _to_mont16_jit()(raw16)


# aot_jit keys per input shape internally; one callable serves every size
@lru_cache(maxsize=1)
def _to_mont_jit():
    return aot_jit(FR.to_mont, "to_mont")


@lru_cache(maxsize=1)
def _to_mont16_jit():
    def widen_to_mont(raw16):
        return FR.to_mont(raw16.astype(jnp.uint32))
    return aot_jit(widen_to_mont, "to_mont16")


@lru_cache(maxsize=1)
def _from_mont_jit():
    return aot_jit(FR.from_mont, "from_mont")


def mont_scalar(v: int):
    return jnp.asarray(
        ints_to_limbs([FR_SPEC.to_mont_int(v % R)], FR_SPEC.L))


def mont_to_int(arr) -> int:
    return FR_SPEC.from_mont_int(
        limbs_to_ints(np.asarray(arr).reshape(FR_SPEC.L, -1)[:, :1])[0])


class DeviceArtifacts:
    """Per-proving-key device state: COO matrices + SRS point arrays.

    On TPU the SRS vectors are stored zero-padded to whole MSM chunks
    ((0,0) = the affine identity encoding, inert under zero scalars) so
    msm_device never has to copy a multi-GB point array to pad it."""

    def __init__(self, pk):
        sap = pk.sap_matrices
        m0, m, n_r = sap.m0_m_n()
        self.m0, self.m, self.n_r = m0, m, n_r
        rows, self.cols = sap.size()
        self.n = Radix2Domain(rows).n
        self.sigma = pk.vk.sigma
        coo = pk.device.get("coo")
        if coo is not None:  # pre-planned arrays (ProvingKey.load_dir)
            self.coo_a, self.coo_b, self.coo_c = coo["a"], coo["b"], coo["c"]
        else:
            self.coo_a = CooMatrix.from_sparse_rows(sap.a, m)
            self.coo_b = CooMatrix.from_sparse_rows(sap.b, m)
            self.coo_c = CooMatrix.from_sparse_rows(sap.c, m)
        # SRS device arrays (16-bit-packed affine Montgomery limbs —
        # half the HBM residency and MSM gather traffic of the unpacked
        # form; see curve_jax.pack_limbs)
        from ..utils.config import on_tpu
        from .msm import _default_chunk
        from .curve_jax import pack_limbs
        from .limbs import FQ_SPEC
        chunk = _default_chunk() if on_tpu() else None
        self.srs = {}
        srs_in = pk.device.get("srs", {})
        for name in ("x_powers_g1", "x_powers_zh_by_y_alpha_g1",
                     "x_powers_y_gamma_z_g1", "uj_wj_lcs_by_y_alpha_g1"):
            if name in srs_in:
                xy = srs_in[name]
            else:
                xy = points_to_device(getattr(pk, name))
            if xy[0].shape[0] == FQ_SPEC.L:
                from ..utils.config import device_sync
                xy = tuple(pack_limbs(a) for a in xy)
                device_sync(xy)  # free the unpacked copies promptly
                if name in srs_in:
                    srs_in[name] = xy
            if chunk:
                n_pts = xy[0].shape[-1]
                pad = (-n_pts) % chunk
                if pad:
                    xy = tuple(
                        jnp.concatenate(
                            [a, jnp.zeros((a.shape[0], pad), jnp.uint32)],
                            axis=1) for a in xy)
                    from ..utils.config import device_sync
                    device_sync(xy)  # serialize: old+new copies coexist
                    if name in srs_in:
                        # release the unpadded originals — at bench scale
                        # keeping both doubles the ~4 GB d vector
                        srs_in[name] = xy
            self.srs[name] = xy


def get_artifacts(pk) -> DeviceArtifacts:
    # Cached on the key object itself (a dict keyed by id() would alias
    # distinct keys after GC reuses the address).
    art = pk.device.get("artifacts")
    if art is None:
        art = DeviceArtifacts(pk)
        pk.device["artifacts"] = art
    return art


@lru_cache(maxsize=None)
def _stage1_jit(n: int, m0: int, m: int, n_r: int, cols: int,
                na: int, nb: int, nc: int):
    """Builds z, u/w eval vectors, coefficient polys, h, and MSM scalar
    vectors — everything between witness synthesis and the first
    Fiat-Shamir round that runs on device.  na/nb/nc: sub-segment counts
    of the three COO matrices (static; see sparse.plan_segments)."""

    def stage1(x_m, z_r, coo_data):
        (coo_a, coo_b, coo_c) = coo_data
        az = coo_matvec_raw(*coo_a, z_r, n_r, na)
        bz = coo_matvec_raw(*coo_b, z_r, n_r, nb)
        cz = coo_matvec_raw(*coo_c, z_r, n_r, nc)
        amb = FR.sub(az, bz)
        apb = FR.add(az, bz)
        y_n = fr_sqr(amb)

        one = FR.ones_mont((1,))
        x0 = x_m[:, :1]
        # y = [0] || (1-x_j)^2 for j=1..m0 || y_n
        one_minus_x = FR.sub(one, x_m[:, 1:m0])
        y_m0 = FR.mont_mul(one_minus_x, one_minus_x)
        y = jnp.concatenate([FR.zeros((1,)), y_m0, y_n], axis=1)

        w_part = z_r[:, m0:]
        z = jnp.concatenate([x_m, x_m, w_part, y], axis=1)  # (16, cols)

        # u_evals blocks (SAP row structure, frontend/sap.py)
        u_b1 = FR.add(x0, x_m)                      # rows [0, m0)
        u_b2 = jnp.concatenate(
            [FR.zeros((1,)), FR.sub(x0, x_m[:, 1:m0])], axis=1)
        pad = FR.zeros((n - 2 * m0 - 2 * n_r,))
        u_evals = jnp.concatenate([u_b1, u_b2, apb, amb, pad], axis=1)

        four = mont_scalar(4)
        y_m0_full = y[:, :m0]
        y_n_full = y[:, m0:]
        w_b1 = FR.add(FR.mont_mul(four, x_m), y_m0_full)
        w_b3 = FR.add(fr_mul(four, cz), y_n_full)
        w_evals = jnp.concatenate(
            [w_b1, y_m0_full, w_b3, y_n_full, pad], axis=1)

        u_coeffs = ntt_trace(u_evals, inverse=True)
        w_coeffs = ntt_trace(w_evals, inverse=True)

        # u^2 via 2n FFT
        u_pad = jnp.concatenate([u_coeffs, FR.zeros((n,))], axis=1)
        u2_ev = ntt_trace(u_pad, inverse=False)
        u2_ev = fr_sqr(u2_ev)
        u2 = ntt_trace(u2_ev, inverse=True)

        w_pad = jnp.concatenate([w_coeffs, FR.zeros((n,))], axis=1)
        h_num = FR.sub(u2, w_pad)                   # (16, 2n)
        h = h_num[:, n:]                            # quotient by X^n - 1
        # vanishing-division exactness (prover.rs:107-108): dividing
        # p (deg < 2n) by X^n - 1 gives q = p[n:], r = p[:n] + p[n:];
        # the protocol requires r == 0 (and p[2n-1] == 0 => deg h <= n-2).
        vanish_rem_nz = jnp.count_nonzero(FR.add(h_num[:, :n], h))

        # witness-only u: rows < 2*m0 zeroed (instance columns live there)
        wu_evals = jnp.concatenate(
            [FR.zeros((2 * m0,)), apb, amb, pad], axis=1)
        wu_coeffs = ntt_trace(wu_evals, inverse=True)

        # everything stays in Montgomery form — MSM consumers convert
        # digits in-graph (mont=True), avoiding three n-sized canonical
        # copies living across the whole proof
        return dict(
            z=z, u_coeffs=u_coeffs, w_coeffs=w_coeffs, h_num=h_num,
            wu_coeffs=wu_coeffs,
            vanish_rem_nz=vanish_rem_nz,
        )

    return aot_jit(stage1, f"stage1-{n}-{m0}-{m}-{n_r}-{cols}-{na}-{nb}-{nc}")


def coo_matvec_raw(rows, cols, coeffs_mont, lvl2, z, num_rows,
                   n_sub: int):
    """Traceable COO matvec (see sparse.coo_matvec)."""
    from .sparse import segment_sum_mod
    from .pallas_field import fr_mul
    gathered = z[:, cols]
    prods = fr_mul(gathered, coeffs_mont)
    return segment_sum_mod(prods, rows, num_rows, lvl2, n_sub)


@lru_cache(maxsize=None)
def _stage2_jit(n: int, sigma: int, d_len: int):
    """Assemble the D(X)*Y^-gamma numerator (division is a separate jit —
    splitting halves the stage's HBM peak at bench scale, where dnum and
    the divide's scan transients are ~1.3 GB each on top of the SRS)."""

    def stage2(u_coeffs, wu_coeffs, w_coeffs, h_num, ra0, ra1, x1_m, x2_m,
               eval_sum):
        s = sigma
        dnum = FR.zeros((d_len,))

        def addb(dn, off, coeffs):
            cur = jax.lax.dynamic_slice_in_dim(dn, off, coeffs.shape[-1], 1)
            return jax.lax.dynamic_update_slice_in_dim(
                dn, FR.add(cur, coeffs), off, 1)

        ra = jnp.concatenate([ra0, ra1], axis=1)  # (16, 2)
        # 2*r_a*u (degree n), r_a^2 (degree 2)
        two = mont_scalar(2)
        u_sh = jnp.concatenate([FR.zeros((1,)), u_coeffs], axis=1)  # x*u
        u_lo = jnp.concatenate([u_coeffs, FR.zeros((1,))], axis=1)
        two_ra_u = FR.add(
            FR.mont_mul(FR.mont_mul(two, ra0), u_lo),
            FR.mont_mul(FR.mont_mul(two, ra1), u_sh))
        ra_sq = jnp.concatenate([
            FR.mont_mul(ra0, ra0),
            FR.mont_mul(two, FR.mont_mul(ra0, ra1)),
            FR.mont_mul(ra1, ra1)], axis=1)

        # A(X) Y^-gamma: u at 5s, r_a at 2s
        dnum = addb(dnum, 5 * s, u_coeffs)
        dnum = addb(dnum, 2 * s, ra)
        # + x2 * C(X) Y^-gamma
        dnum = addb(dnum, 3 * s, FR.mont_mul(x2_m, wu_coeffs))
        dnum = addb(dnum, 8 * s, FR.mont_mul(x2_m, w_coeffs))
        # h_num top coefficient (index 2n-1) is structurally zero; drop it
        # so the block stays inside the d_len buffer.
        dnum = addb(dnum, 8 * s, FR.mont_mul(x2_m, h_num[:, :2 * n - 1]))
        dnum = addb(dnum, 5 * s, FR.mont_mul(x2_m, two_ra_u))
        dnum = addb(dnum, 2 * s, FR.mont_mul(x2_m, ra_sq))
        dnum = addb(dnum, 0, FR.mont_mul(x2_m, ra))
        # - (a_at_x1 + x2 c_at_x1) at 5s
        dnum = addb(dnum, 5 * s, FR.neg(eval_sum))
        return dnum

    return aot_jit(stage2, f"stage2-{n}-{sigma}-{d_len}")


@lru_cache(maxsize=None)
def _divide_jit(d_len: int):
    def divide(dnum, x1_m):
        q, rem = synthetic_divide_device(dnum, x1_m)
        return q, rem  # Montgomery form; the d-MSM converts in-graph
    return aot_jit(divide, f"divide-{d_len}")


def create_proof_device(circuit, pk, rng, transcript_cls) -> Proof:
    from ..utils.timers import phase, sync

    art = get_artifacts(pk)
    n, m0, m, n_r, cols, sigma = (art.n, art.m0, art.m, art.n_r, art.cols,
                                  art.sigma)

    with phase("prover::witness synthesis"):
        cs = synthesize(circuit, ConstraintSystem.PROVE)
    instance = cs.instance_assignment
    witness = cs.witness_assignment
    assert len(instance) == m0

    with phase("prover::h2d assignment"):
        x_m = fr_ints_to_mont_device(instance)
        z_r = sync(fr_ints_to_mont_device(instance + witness))

    coo_data = tuple(
        (cm.row_idx, cm.col_idx, cm.coeffs_mont, cm.lvl2_idx)
        for cm in (art.coo_a, art.coo_b, art.coo_c))
    with phase("prover::stage1 (matvecs+NTTs+h)"):
        s1 = sync(_stage1_jit(n, m0, m, n_r, cols,
                              art.coo_a.n_sub, art.coo_b.n_sub,
                              art.coo_c.n_sub)(x_m, z_r, coo_data))
    # device analogue of prover.rs:107-108 (a kernel or witness bug must
    # surface as a clean error here, not as an invalid proof)
    assert int(s1["vanish_rem_nz"]) == 0, \
        "vanishing division (u^2 - w) / Z_H must be exact"

    # -- blinding + commitments ------------------------------------------
    ra0_i, ra1_i = rng.randrange(R), rng.randrange(R)

    # x-power SRS bases are distinct by construction -> fast madd mode;
    # uj_wj columns CAN repeat (structurally identical circuit columns,
    # e.g. the bench a/b witnesses), so the c_w MSM keeps the total group
    # law (fast=False).
    # The a/r/c_w/c_h MSMs are independent given stage1: DISPATCH all
    # four device programs back-to-back (async through the tunnel), THEN
    # finalize — the device never idles while the host runs each ~0.1 s
    # combine (Horner, tail, error pull).
    xp = art.srs["x_powers_g1"]
    with phase("prover::msm a+r+c dispatch"):
        p_a = msm_device(xp[0], xp[1], s1["u_coeffs"],
                         mont=True, fast=True, n_eff=n, defer=True)
        tr0 = mont_scalar(2 * ra0_i % R)
        tr1 = mont_scalar(2 * ra1_i % R)
        u_lo = jnp.concatenate([s1["u_coeffs"], FR.zeros((1,))], axis=1)
        u_sh = jnp.concatenate([FR.zeros((1,)), s1["u_coeffs"]], axis=1)
        two_ra_u = _tru_jit(n)(tr0, tr1, u_lo, u_sh)
        del u_lo, u_sh
        p_r = msm_device(xp[0], xp[1], two_ra_u,
                         mont=True, fast=True, n_eff=n + 1, defer=True)
        del two_ra_u
        ujwj = art.srs["uj_wj_lcs_by_y_alpha_g1"]
        # uj_wj bases are not distinct-by-construction (duplicate SAP
        # columns are possible), but collisions are detected exactly by
        # the fast-mode flag — run fast optimistically and redo in safe
        # mode only if a collision actually fired (~30% madd saving on
        # this MSM for typical circuits; the safe program class then
        # never even compiles)
        p_cw = msm_device(ujwj[0], ujwj[1], s1["z"][:, m0:],
                          mont=True, fast=True, n_eff=cols - m0, defer=True)
        zh = art.srs["x_powers_zh_by_y_alpha_g1"]
        p_ch = msm_device(zh[0], zh[1], s1["h_num"][:, n:2 * n - 1],
                          mont=True, fast=True, n_eff=n - 1, defer=True)

    with phase("prover::msm a+r+c finalize"):
        a_u = p_a.result()
        # host: tiny r_a MSMs over the 3/2-element SRS vectors
        a_ra = bls.G1.msm(pk.x_powers_y_alpha_g1, [ra0_i, ra1_i])
        a_g1 = bls.G1.add(a_u, a_ra)
        r_big = p_r.result()
        ra_sq = [ra0_i * ra0_i % R, 2 * ra0_i * ra1_i % R,
                 ra1_i * ra1_i % R]
        r_small = bls.G1.add(
            bls.G1.msm(pk.x_powers_y_alpha_g1, ra_sq),
            bls.G1.msm(pk.x_powers_y_gamma_g1, [ra0_i, ra1_i]))
        r_g1 = bls.G1.add(r_big, r_small)
        try:
            c_w = p_cw.result()
        except AssertionError:
            c_w = msm_device(ujwj[0], ujwj[1], s1["z"][:, m0:],
                             mont=True, n_eff=cols - m0)
        c_h = p_ch.result()
    c_g1 = bls.G1.add(bls.G1.add(c_w, c_h), r_g1)

    # -- Fiat-Shamir round 1 ---------------------------------------------
    t = transcript_cls(common.B_POLYMATH)
    x1 = common.compute_x1(t, instance, [a_g1, c_g1])
    y1 = common.compute_y1(x1, sigma)
    y1_alpha = common.neg_power(y1, MINUS_ALPHA)
    y1_gamma = common.neg_power(y1, MINUS_GAMMA)

    u_at_x1 = mont_to_int(_eval_jit(n)(s1["u_coeffs"], mont_scalar(x1)))
    a_at_x1 = (u_at_x1 + (ra0_i + ra1_i * x1) * y1_alpha) % R
    pi_at_x1 = common.compute_pi_at_x1(pk.vk, instance, x1, y1_gamma)
    c_at_x1 = common.compute_c_at_x1(y1_gamma, y1_alpha, a_at_x1, pi_at_x1)

    # -- Fiat-Shamir round 2 ---------------------------------------------
    x2 = common.compute_x2(t, x1, [a_at_x1, c_at_x1])

    d_len = 2 * (n - 1) + sigma * (MINUS_ALPHA + MINUS_GAMMA) + 1
    eval_sum = mont_scalar((a_at_x1 + x2 * c_at_x1) % R)
    x1_m = mont_scalar(x1)
    from ..utils.config import device_sync
    with phase("prover::stage2a (D numerator)"):
        dnum = device_sync(_stage2_jit(n, sigma, d_len)(
            s1["u_coeffs"], s1["wu_coeffs"], s1["w_coeffs"], s1["h_num"],
            mont_scalar(ra0_i), mont_scalar(ra1_i),
            x1_m, mont_scalar(x2), eval_sum))
    # stage-1 polynomials are fully consumed now — free ~0.8 GB before the
    # divide scan and the 10n-point d-MSM
    s1.clear()
    with phase("prover::stage2b (quotient scan)"):
        q_mont, rem = sync(_divide_jit(d_len)(dnum, x1_m))
    del dnum
    # prover.rs:221: the quotient division by (X - x1) must be exact
    assert mont_to_int(rem) == 0, \
        "quotient division by (X - x1) must be exact"

    ygz = art.srs["x_powers_y_gamma_z_g1"]
    with phase("prover::msm d_g1 (~10n)"):
        d_g1 = msm_device(ygz[0], ygz[1], q_mont,
                          mont=True, fast=True, n_eff=d_len - 1)

    return Proof(a_g1=a_g1, c_g1=c_g1, a_at_x1=a_at_x1, d_g1=d_g1)


@lru_cache(maxsize=None)
def _eval_jit(n: int):
    return aot_jit(poly_eval_device, f"polyeval-{n}")


@lru_cache(maxsize=None)
def _tru_jit(n: int):
    def tru(tr0, tr1, u_lo, u_sh):
        # tr0/tr1 arrive in Montgomery form (mont_scalar); result stays
        # Montgomery — the r MSM converts digits in-graph (mont=True)
        return FR.add(FR.mont_mul(tr0, u_lo), FR.mont_mul(tr1, u_sh))
    return aot_jit(tru, f"tru-{n}")
