import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from polymath_tpu.ops.limbs import FR_SPEC, FQ_SPEC, ints_to_limbs
from polymath_tpu.ops.field_jax import FR, FQ
from polymath_tpu.hostmath.bls12_381 import R
import random

rng = random.Random(0)
N = int(os.environ.get("N", 8192))


def bench(label, f, *a):
    t0 = time.time()
    r = jax.block_until_ready(f(*a))
    t1 = time.time()
    r = jax.block_until_ready(f(*a))
    t2 = time.time()
    r = jax.block_until_ready(f(*a))
    t3 = time.time()
    print(f"{label}: compile+run={t1-t0:.2f}s run={t2-t1:.3f}/{t3-t2:.3f}s",
          flush=True)
    return r


a = jnp.asarray(ints_to_limbs([FR_SPEC.to_mont_int(rng.randrange(R))
                               for _ in range(N)], FR_SPEC.L))
b = jnp.asarray(ints_to_limbs([FR_SPEC.to_mont_int(rng.randrange(R))
                               for _ in range(N)], FR_SPEC.L))

bench("fr.mont_mul jnp (16,%d)" % N, jax.jit(FR.mont_mul), a, b)

from polymath_tpu.ops.pallas_field import fr_mul
bench("fr_mul pallas (16,%d)" % N, jax.jit(fr_mul), a, b)

# FQ arrays
from polymath_tpu.hostmath import bls12_381 as bls
Q = bls.Q
qa = jnp.asarray(ints_to_limbs([FQ_SPEC.to_mont_int(rng.randrange(Q))
                                for _ in range(N)], FQ_SPEC.L))
bench("fq.mont_mul jnp (24,%d)" % N, jax.jit(FQ.mont_mul), qa, qa)

# curve adds
from polymath_tpu.ops.curve_jax import jac_add_core, affine_to_jac
from polymath_tpu.ops.fixed_base import fixed_base_mul, batch_inverse_fq

sc = jnp.asarray(ints_to_limbs([rng.randrange(R) for _ in range(N)],
                               FR_SPEC.L))

from polymath_tpu.ops.pallas_curve import jac_add_fused
pj = (qa, qa, qa)
bench("jac_add pallas (24,%d)" % N, jax.jit(jac_add_fused), pj, pj)
bench("jac_add core-jnp (24,%d)" % N, jax.jit(jac_add_core), pj, pj)
bench("batch_inverse_fq (24,%d)" % N, jax.jit(batch_inverse_fq), qa)

t0 = time.time()
out = fixed_base_mul(sc)
jax.block_until_ready(out)
print("fixed_base_mul(%d): first=%.2fs" % (N, time.time() - t0), flush=True)
t0 = time.time()
out = fixed_base_mul(sc)
jax.block_until_ready(out)
print("fixed_base_mul(%d): steady=%.2fs" % (N, time.time() - t0), flush=True)
