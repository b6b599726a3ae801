"""Imports cross-validation vectors produced by the Rust reference crate
(tools/rust_vectors/) and checks them against this repo's stack:

  * deserialize the VerifyingKey and the 176-byte proof from the
    reference's compressed bytes (serial/codec.py must agree bit-exactly
    on flags, endianness, and length prefixes);
  * verify the reference-produced proof with THIS repo's verifier under
    the matching transcript — any byte-level disagreement in the codec,
    Fiat-Shamir label schema, or transcript state machine diverges the
    challenges and rejects the proof.

On success the vectors are installed at tests/fixtures/rust_dummy.json,
where tests/test_golden_vectors.py::test_rust_reference_vectors picks
them up (the test auto-skips while the fixture is absent — cargo is not
available in this build image).

Usage: python tools/import_rust_vectors.py rust_dummy.json
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(path: str) -> None:
    from polymath_tpu.protocol.data_structures import Proof, VerifyingKey
    from polymath_tpu.protocol import verifier
    from polymath_tpu.serial import codec
    from polymath_tpu.transcript import (
        MerlinFieldTranscript, Keccak256Transcript, Blake3Transcript)

    transcripts = {"merlin": MerlinFieldTranscript,
                   "keccak256": Keccak256Transcript,
                   "blake3": Blake3Transcript}
    with open(path) as fh:
        vecs = json.load(fh)
    for name, tcls in transcripts.items():
        v = vecs[name]
        vk = VerifyingKey.from_bytes(bytes.fromhex(v["vk"]))
        proof = Proof.from_bytes(bytes.fromhex(v["proof"]))
        public = codec.fr_from_bytes(bytes.fromhex(v["public_input"]))
        assert verifier.verify_proof(vk, proof, [public], tcls), (
            f"reference proof REJECTED under {name} — codec/transcript "
            "divergence from arkworks")
        print(f"{name}: reference proof verifies under this repo's "
              "verifier OK")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "rust_dummy.json"
    check(path)
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "rust_dummy.json")
    shutil.copy(path, dst)
    print(f"installed {dst}")


if __name__ == "__main__":
    main()
