"""polymath_tpu: a TPU-native implementation of the Polymath zk-SNARK.

Brand-new implementation of the Polymath zk-SNARK (Lipmaa, eprint 2024/916)
with the capabilities of the Rust reference ``sigma0-dev/polymath``, built
TPU-first: JAX/XLA/Pallas kernels for bulk field arithmetic, NTTs and MSMs,
sharded over device meshes; Python-int host math for the O(1) protocol glue
(transcripts, pairing check, serialization).
"""

__version__ = "0.1.0"
