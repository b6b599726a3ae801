"""Proof / key data structures + arkworks-compatible byte round-trips.

Mirrors reference ``src/data_structures.rs``: Proof{a_g1, c_g1, a_at_x1,
d_g1}; PairingVK{one_g1, one_g2, x_g2, z_g2}; VerifyingKey{e, n, m0, sigma,
omega}; ProvingKey{vk, sap_matrices, 6 G1 power vectors}.  Host-side points
are affine tuples; the proving key's big G1 vectors may also live on device
(see ops/srs.py) — serialization always goes through the host form.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ..serial import codec
from ..frontend.sap import SAPMatrices


@dataclass
class Proof:
    a_g1: object           # affine G1 (tuple of Fq) or None
    c_g1: object
    a_at_x1: int           # Fr canonical int
    d_g1: object

    def to_bytes(self) -> bytes:
        return (codec.g1_to_bytes(self.a_g1) + codec.g1_to_bytes(self.c_g1)
                + codec.fr_to_bytes(self.a_at_x1) + codec.g1_to_bytes(self.d_g1))

    @classmethod
    def from_bytes(cls, b: bytes) -> "Proof":
        assert len(b) == 176, "Polymath proof is 176 bytes compressed"
        return cls(
            a_g1=codec.g1_from_bytes(b[0:48]),
            c_g1=codec.g1_from_bytes(b[48:96]),
            a_at_x1=codec.fr_from_bytes(b[96:128]),
            d_g1=codec.g1_from_bytes(b[128:176]),
        )


@dataclass
class PairingVK:
    one_g1: object
    one_g2: object
    x_g2: object
    z_g2: object

    def to_bytes(self) -> bytes:
        return (codec.g1_to_bytes(self.one_g1) + codec.g2_to_bytes(self.one_g2)
                + codec.g2_to_bytes(self.x_g2) + codec.g2_to_bytes(self.z_g2))

    @classmethod
    def from_bytes(cls, b: bytes) -> "PairingVK":
        assert len(b) == 48 + 3 * 96
        return cls(
            one_g1=codec.g1_from_bytes(b[0:48]),
            one_g2=codec.g2_from_bytes(b[48:144]),
            x_g2=codec.g2_from_bytes(b[144:240]),
            z_g2=codec.g2_from_bytes(b[240:336]),
        )


@dataclass
class VerifyingKey:
    e: PairingVK
    n: int
    m0: int
    sigma: int
    omega: int  # Fr canonical int

    def to_bytes(self) -> bytes:
        return (self.e.to_bytes() + codec.u64_to_bytes(self.n)
                + codec.u64_to_bytes(self.m0) + codec.u64_to_bytes(self.sigma)
                + codec.fr_to_bytes(self.omega))

    @classmethod
    def from_bytes(cls, b: bytes) -> "VerifyingKey":
        e = PairingVK.from_bytes(b[:336])
        off = 336
        n = int.from_bytes(b[off:off + 8], "little")
        m0 = int.from_bytes(b[off + 8:off + 16], "little")
        sigma = int.from_bytes(b[off + 16:off + 24], "little")
        omega = codec.fr_from_bytes(b[off + 24:off + 56])
        return cls(e=e, n=n, m0=m0, sigma=sigma, omega=omega)


# arkworks derives CanonicalSerialize on SAPMatrices (reference
# common.rs:111-124): three u64 dims then a, b, c as Vec<Vec<(F, u64)>>.

def sap_to_bytes(sap: SAPMatrices) -> bytes:
    def row_to_bytes(row):
        return codec.vec_to_bytes(
            row, lambda t: codec.fr_to_bytes(t[0]) + codec.u64_to_bytes(t[1]))

    out = bytearray()
    out += codec.u64_to_bytes(sap.num_instance_variables)
    out += codec.u64_to_bytes(sap.num_r1cs_witness_variables)
    out += codec.u64_to_bytes(sap.num_r1cs_constraints)
    for mat in (sap.a, sap.b, sap.c):
        out += codec.vec_to_bytes(mat, row_to_bytes)
    return bytes(out)


def sap_from_reader(r: "codec.Reader") -> SAPMatrices:
    m0 = r.u64()
    m_w = r.u64()
    n_r = r.u64()

    def term():
        coeff = r.fr()
        col = r.u64()
        return (coeff, col)

    mats = [r.vec(lambda: r.vec(term)) for _ in range(3)]
    return SAPMatrices(m0, m_w, n_r, *mats)


_PK_VECTORS = (
    "x_powers_g1", "x_powers_y_alpha_g1", "x_powers_zh_by_y_alpha_g1",
    "x_powers_y_gamma_g1", "x_powers_y_gamma_z_g1", "uj_wj_lcs_by_y_alpha_g1",
)

# big vectors kept as packed device arrays; small ones decode to host points
_PK_BIG = ("x_powers_g1", "x_powers_zh_by_y_alpha_g1",
           "x_powers_y_gamma_z_g1", "uj_wj_lcs_by_y_alpha_g1")
_PK_SMALL = ("x_powers_y_alpha_g1", "x_powers_y_gamma_g1")


class SAPDims:
    """Dimension-only stand-in for SAPMatrices (ProvingKey.load_dir).

    The device prover only reads dimensions from pk.sap_matrices (the
    sparse content is consumed via the pre-planned COO arrays); this
    avoids re-parsing ~nnz terms of sap bytes on every process start.
    """

    def __init__(self, m0: int, m_w: int, n_r: int):
        self.num_instance_variables = m0
        self.num_r1cs_witness_variables = m_w
        self.num_r1cs_constraints = n_r
        self.a = self.b = self.c = None

    def m0_m_n(self):
        m0 = self.num_instance_variables
        return m0, m0 + self.num_r1cs_witness_variables, \
            self.num_r1cs_constraints

    def size(self):
        m0, m, n = self.m0_m_n()
        return (m0 + n) * 2, m0 * 2 + m + n


@dataclass
class ProvingKey:
    vk: VerifyingKey
    sap_matrices: SAPMatrices
    # G1 SRS vectors; host form: lists of affine points.  When the device
    # backend is active these also carry packed device arrays (set lazily by
    # ops/srs.py) — the `device` attribute caches them.
    x_powers_g1: list
    x_powers_y_alpha_g1: list
    x_powers_zh_by_y_alpha_g1: list
    x_powers_y_gamma_g1: list
    x_powers_y_gamma_z_g1: list
    uj_wj_lcs_by_y_alpha_g1: list
    device: dict = field(default_factory=dict, repr=False, compare=False)

    def to_bytes(self) -> bytes:
        """arkworks-compatible compressed bytes (field order matches the
        CanonicalSerialize derive, reference data_structures.rs:56-73)."""
        out = bytearray(self.vk.to_bytes())
        out += sap_to_bytes(self.sap_matrices)
        for name in _PK_VECTORS:
            out += codec.g1_vec_to_bytes(getattr(self, name))
        return bytes(out)

    @classmethod
    def from_bytes(cls, b: bytes, validate: bool = False) -> "ProvingKey":
        """Inverse of to_bytes.  `validate` runs the (slow) subgroup check
        per point; the default trusts locally-produced keys, matching
        arkworks' `deserialize_*_unchecked` fast path."""
        vk_len = 336 + 24 + 32
        vk = VerifyingKey.from_bytes(b[:vk_len])
        r = codec.Reader(b, vk_len)
        sap = sap_from_reader(r)
        vecs = [r.vec(lambda: r.g1(validate=validate)) for _ in _PK_VECTORS]
        return cls(vk, sap, *vecs)

    # -- fast persistence of the packed device SRS -----------------------
    # The compressed codec needs a sqrt per point to decompress; at bench
    # scale (~12n points, n = 2^20) that is hours of host work.  The npz
    # form stores the (24, N) affine Montgomery limb arrays directly, so a
    # 2^20-scale key round-trips in seconds and loads straight to device.

    def save_npz(self, path: str) -> None:
        import numpy as np
        from ..ops.curve_jax import points_to_device

        arrays = {
            "vk": np.frombuffer(self.vk.to_bytes(), dtype=np.uint8),
            "sap": np.frombuffer(sap_to_bytes(self.sap_matrices),
                                 dtype=np.uint8),
        }
        srs = self.device.get("srs", {})
        for name in _PK_VECTORS:
            if name in srs:
                xs, ys = srs[name]
            else:
                xs, ys = points_to_device(getattr(self, name))
            arrays[name + "_x"] = np.asarray(xs)
            arrays[name + "_y"] = np.asarray(ys)
        np.savez(path, **arrays)

    @classmethod
    def load_npz(cls, path: str, host_points: bool = False) -> "ProvingKey":
        """Load a key saved by save_npz.

        By default only the small SRS vectors (y_alpha: 3 pts, y_gamma:
        2 pts — used host-side by the device prover) are decoded to host
        affine form; the big vectors stay as packed device arrays (a host
        decode of ~12n points is a Python loop — hours at n = 2^20).  Pass
        host_points=True (small keys / host backend) to decode everything.
        """
        import numpy as np
        from ..ops.limbs import FQ_SPEC, limbs_to_ints
        from ..hostmath.bls12_381 import Fq

        small = ("x_powers_y_alpha_g1", "x_powers_y_gamma_g1")

        def decode(xs, ys):
            return [
                (Fq(FQ_SPEC.from_mont_int(x)), Fq(FQ_SPEC.from_mont_int(y)))
                for x, y in zip(limbs_to_ints(xs), limbs_to_ints(ys))
            ]

        with np.load(path) as data:
            vk = VerifyingKey.from_bytes(data["vk"].tobytes())
            sap = sap_from_reader(codec.Reader(data["sap"].tobytes()))
            vecs, srs = [], {}
            for name in _PK_VECTORS:
                xs = data[name + "_x"]
                ys = data[name + "_y"]
                if host_points or name in small:
                    vecs.append(decode(xs, ys))
                else:
                    vecs.append(None)
                if not (name in small and not host_points):
                    srs[name] = (xs, ys)
        pk = cls(vk, sap, *vecs)
        try:
            import jax.numpy as jnp
            pk.device["srs"] = {
                k: (jnp.asarray(xs), jnp.asarray(ys))
                for k, (xs, ys) in srs.items()
            }
        except ImportError:
            pass
        return pk

    # -- raw .npy directory store (fastest cold-process path) -------------
    # One .npy per SRS vector instead of a single npz: memmap'd reads skip
    # the multi-GB zip copy (70-265 s observed for the 2^21 npz), the big
    # vectors are stored pre-padded to whole MSM chunks (no device-side
    # re-pad copies), and the COO matrices are stored post-planning so a
    # fresh process skips the host big-int coefficient conversion.

    def save_dir(self, path: str) -> None:
        import json
        import numpy as np
        from ..ops.prover_jax import get_artifacts
        from ..serial import codec

        art = get_artifacts(self)
        os.makedirs(path, exist_ok=True)
        m0, m, n_r = self.sap_matrices.m0_m_n()
        meta = {
            "version": 2,
            # art.srs holds 16-bit-packed (L/2, N) arrays (DeviceArtifacts)
            "packed": True,
            "sap_dims": [m0, m - m0, n_r],
            "small": {
                name: [codec.g1_to_bytes(p).hex()
                       for p in getattr(self, name)]
                for name in _PK_SMALL
            },
            "coo": {},
            "true_len": {},
        }
        with open(os.path.join(path, "vk.bin"), "wb") as fh:
            fh.write(self.vk.to_bytes())
        for name in _PK_BIG:
            xs, ys = art.srs[name]
            np.save(os.path.join(path, name + "_x.npy"), np.asarray(xs))
            np.save(os.path.join(path, name + "_y.npy"), np.asarray(ys))
            meta["true_len"][name] = len(getattr(self, name) or []) or None
        for tag, cm in (("a", art.coo_a), ("b", art.coo_b), ("c", art.coo_c)):
            np.save(os.path.join(path, f"coo_{tag}_row.npy"),
                    np.asarray(cm.row_idx))
            np.save(os.path.join(path, f"coo_{tag}_col.npy"),
                    np.asarray(cm.col_idx))
            np.save(os.path.join(path, f"coo_{tag}_coeff.npy"),
                    np.asarray(cm.coeffs_mont))
            if cm.lvl2_idx is not None:
                np.save(os.path.join(path, f"coo_{tag}_lvl2.npy"),
                        np.asarray(cm.lvl2_idx))
            meta["coo"][tag] = {
                "n_sub": cm.n_sub, "num_rows": cm.num_rows,
                "num_cols": cm.num_cols,
                "lvl2": cm.lvl2_idx is not None,
            }
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(meta, fh)

    @classmethod
    def load_dir(cls, path: str) -> "ProvingKey":
        import json
        import numpy as np
        import jax
        from ..ops.sparse import CooMatrix
        from ..serial import codec
        from ..utils.config import device_sync

        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        with open(os.path.join(path, "vk.bin"), "rb") as fh:
            vk = VerifyingKey.from_bytes(fh.read())
        sap = SAPDims(*meta["sap_dims"])
        vecs = {name: None for name in _PK_VECTORS}
        for name in _PK_SMALL:
            vecs[name] = [codec.g1_from_bytes(bytes.fromhex(h))
                          for h in meta["small"][name]]
        pk = cls(vk, sap, *[vecs[name] for name in _PK_VECTORS])
        srs = {}
        packed = bool(meta.get("packed"))

        # Pipeline disk reads with tunnel uploads: a reader thread loads
        # the next vector's npy files while the previous one streams to
        # the device (the r4 serial read -> put -> sync loop measured
        # 231 s for the 2.8 GB bench PK; h2d and disk each run at a few
        # tens of MB/s here, so overlap roughly halves the wall).  All
        # transfers are h2d only — no program outputs — so deferring the
        # sync to the end cannot OOM HBM (see utils.config.device_sync).
        from concurrent.futures import ThreadPoolExecutor

        def _read(name):
            xs = np.load(os.path.join(path, name + "_x.npy"))
            ys = np.load(os.path.join(path, name + "_y.npy"))
            if not packed:
                # v1 dir (unpacked on disk): 16-bit-pack on host so the
                # tunnel upload moves half the bytes
                xs = xs[0::2] | (xs[1::2] << np.uint32(16))
                ys = ys[0::2] | (ys[1::2] << np.uint32(16))
            return xs, ys

        with ThreadPoolExecutor(max_workers=1) as ex:
            futs = {name: ex.submit(_read, name) for name in _PK_BIG}
            for name in _PK_BIG:
                xs, ys = futs[name].result()
                srs[name] = (jax.device_put(xs), jax.device_put(ys))
                del xs, ys
        for name in _PK_BIG:
            device_sync(srs[name])
        pk.device["srs"] = srs
        coo = {}
        for tag in ("a", "b", "c"):
            cm = meta["coo"][tag]
            lvl2 = None
            if cm["lvl2"]:
                lvl2 = np.load(os.path.join(path, f"coo_{tag}_lvl2.npy"))
            coo[tag] = CooMatrix.from_arrays(
                np.load(os.path.join(path, f"coo_{tag}_row.npy")),
                np.load(os.path.join(path, f"coo_{tag}_col.npy")),
                np.load(os.path.join(path, f"coo_{tag}_coeff.npy")),
                lvl2, cm["n_sub"], cm["num_rows"], cm["num_cols"])
        pk.device["coo"] = coo
        return pk
