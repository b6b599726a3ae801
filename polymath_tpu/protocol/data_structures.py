"""Proof / key data structures + arkworks-compatible byte round-trips.

Mirrors reference ``src/data_structures.rs``: Proof{a_g1, c_g1, a_at_x1,
d_g1}; PairingVK{one_g1, one_g2, x_g2, z_g2}; VerifyingKey{e, n, m0, sigma,
omega}; ProvingKey{vk, sap_matrices, 6 G1 power vectors}.  Host-side points
are affine tuples; the proving key's big G1 vectors may also live on device
(see ops/srs.py) — serialization always goes through the host form.
"""

from __future__ import annotations

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
