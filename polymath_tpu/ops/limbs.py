"""Limb representation of big field elements for device compute.

Replaces arkworks' 64-bit Montgomery limbs (ark-ff, SURVEY.md §2.2) with a
TPU-friendly scheme: **16-bit limbs held in uint32 lanes**, shaped
``(L, ...batch)`` — limbs on the leading axis, batch on the trailing (lane)
axes, so all per-element arithmetic vectorizes across the batch.

Why 16-bit limbs in uint32: TPU has no 64-bit integer multiplier; 16x16
products fit exactly in uint32, and the interleaved Montgomery (CIOS)
accumulator stays < 2^25 per limb without per-step carry chains (see
field_jax.mont_mul), so a full L-step reduction needs just one final carry
propagation.

Fields: Fr (L=16, R_mont = 2^256) and Fq (L=24, R_mont = 2^384) — matching
arkworks' Montgomery R for BLS12-381, which keeps canonical serialization
trivially compatible.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..hostmath.bls12_381 import Q, R

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(v: int, L: int) -> np.ndarray:
    """Python int -> (L,) uint32 of 16-bit limbs, little-endian."""
    return np.array([(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(L)],
                    dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    v = 0
    arr = np.asarray(limbs, dtype=np.uint64)
    for i in range(arr.shape[0] - 1, -1, -1):
        v = (v << LIMB_BITS) | int(arr[i])
    return v


def ints_to_limbs(values, L: int) -> np.ndarray:
    """list[int] -> (L, N) uint32 limb array (vectorized via bytes)."""
    n = len(values)
    nbytes = 2 * L
    buf = b"".join(int(v).to_bytes(nbytes, "little") for v in values)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(n, L)
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def limbs_to_ints(arr) -> list[int]:
    """(L, N) uint32 limb array -> list[int]."""
    a = np.asarray(arr)
    L, n = a.shape[0], int(np.prod(a.shape[1:], dtype=np.int64))
    u16 = a.reshape(L, n).T.astype("<u2")
    raw = u16.tobytes()
    nbytes = 2 * L
    return [int.from_bytes(raw[i * nbytes:(i + 1) * nbytes], "little")
            for i in range(n)]


@dataclass(frozen=True)
class FieldSpec:
    """Static per-field constants baked into the device kernels."""

    name: str
    modulus: int
    L: int
    p_limbs: np.ndarray = field(compare=False)
    n0inv: int = 0                 # -p^-1 mod 2^16
    r_mont: int = 0                # 2^(16 L) mod p
    r2: np.ndarray = field(default=None, compare=False)   # R^2 mod p, limbs
    one_mont: np.ndarray = field(default=None, compare=False)  # R mod p, limbs

    @classmethod
    def make(cls, name: str, p: int, L: int) -> "FieldSpec":
        r_mont = (1 << (LIMB_BITS * L)) % p
        r2 = (r_mont * r_mont) % p
        n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        return cls(
            name=name, modulus=p, L=L,
            p_limbs=int_to_limbs(p, L),
            n0inv=n0inv,
            r_mont=r_mont,
            r2=int_to_limbs(r2, L),
            one_mont=int_to_limbs(r_mont, L),
        )

    # host-side Montgomery codecs ------------------------------------------
    def to_mont_int(self, v: int) -> int:
        return v * self.r_mont % self.modulus

    def from_mont_int(self, v: int) -> int:
        return v * pow(self.r_mont, -1, self.modulus) % self.modulus


FR_SPEC = FieldSpec.make("Fr", R, 16)
FQ_SPEC = FieldSpec.make("Fq", Q, 24)
