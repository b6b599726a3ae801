"""One-time host-side converter: ProvingKey npz cache -> .npy dir cache.

Pure numpy (never touches the device — pulling 5.3 GB back through the
TPU tunnel at ~6-15 MB/s would take ~10 minutes).  Produces the layout
ProvingKey.load_dir expects: pre-padded big vectors, pre-planned COO
arrays, vk + small vectors in meta.json.

Usage: python tools/pkconvert.py .bench_cache/pk_1048476_0.npz [outdir]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(npz_path: str, out: str | None = None):
    from polymath_tpu.ops.limbs import FR_SPEC, FQ_SPEC, ints_to_limbs, \
        limbs_to_ints
    from polymath_tpu.ops.sparse import plan_segments
    from polymath_tpu.ops.msm import _default_chunk
    DEFAULT_CHUNK = _default_chunk()
    from polymath_tpu.serial import codec
    from polymath_tpu.protocol.data_structures import (
        sap_from_reader, _PK_BIG, _PK_SMALL)
    from polymath_tpu.hostmath.bls12_381 import Fq, R

    out = out or npz_path[:-4] + ".dir"
    os.makedirs(out, exist_ok=True)
    data = np.load(npz_path)

    with open(os.path.join(out, "vk.bin"), "wb") as fh:
        fh.write(data["vk"].tobytes())

    sap = sap_from_reader(codec.Reader(data["sap"].tobytes()))
    m0, m, n_r = sap.m0_m_n()
    meta = {"version": 2, "packed": True, "sap_dims": [m0, m - m0, n_r],
            "small": {}, "coo": {}, "true_len": {}}

    def decode_small(name):
        xs, ys = data[name + "_x"], data[name + "_y"]
        pts = [(Fq(FQ_SPEC.from_mont_int(x)), Fq(FQ_SPEC.from_mont_int(y)))
               for x, y in zip(limbs_to_ints(xs), limbs_to_ints(ys))]
        return [codec.g1_to_bytes(p).hex() for p in pts]

    for name in _PK_SMALL:
        meta["small"][name] = decode_small(name)

    for name in _PK_BIG:
        for ax in ("_x", "_y"):
            arr = data[name + ax]
            n_pts = arr.shape[-1]
            pad = (-n_pts) % DEFAULT_CHUNK
            if pad:
                arr = np.concatenate(
                    [arr, np.zeros((arr.shape[0], pad), np.uint32)], axis=1)
            if arr.shape[0] == FQ_SPEC.L:  # 16-bit-pack limb pairs
                arr = arr[0::2] | (arr[1::2] << np.uint32(16))
            np.save(os.path.join(out, name + ax + ".npy"), arr)
        meta["true_len"][name] = n_pts
        print(f"# {name}: {n_pts} pts (+{pad} pad, packed)", file=sys.stderr)

    for tag, mat in (("a", sap.a), ("b", sap.b), ("c", sap.c)):
        rows, cols, coeffs = [], [], []
        for i, row in enumerate(mat):
            for coeff, j in row:
                rows.append(i)
                cols.append(j)
                coeffs.append(coeff)
        if not rows:
            rows, cols, coeffs = [0], [0], [0]
        sub_ids, lvl2_ids, n_sub = plan_segments(
            np.asarray(rows, np.int32), n_r)
        np.save(os.path.join(out, f"coo_{tag}_row.npy"), sub_ids)
        np.save(os.path.join(out, f"coo_{tag}_col.npy"),
                np.asarray(cols, np.int32))
        np.save(os.path.join(out, f"coo_{tag}_coeff.npy"),
                np.asarray(ints_to_limbs(
                    [FR_SPEC.to_mont_int(c % R) for c in coeffs],
                    FR_SPEC.L), np.uint32))
        if lvl2_ids is not None:
            np.save(os.path.join(out, f"coo_{tag}_lvl2.npy"), lvl2_ids)
        meta["coo"][tag] = {"n_sub": int(n_sub), "num_rows": n_r,
                            "num_cols": m, "lvl2": lvl2_ids is not None}
        print(f"# coo {tag}: nnz={len(coeffs)} n_sub={n_sub}",
              file=sys.stderr)

    with open(os.path.join(out, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
