"""Mosaic primitive-cost microbench: what does one vector op cost on this
chip inside a Pallas kernel?  Chains K dependent ops per element so the
compiler cannot elide them; per-op time = steady / (K * n_elems).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 512
ROWS, LANES = 8, 256
GRID = 64  # total elems = GRID * ROWS * LANES = 128Ki


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import polymath_tpu.ops  # noqa: F401

    n_elems = GRID * ROWS * LANES

    def bench(name, body, dtype=jnp.uint32, init=3):
        spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

        def kernel(x_ref, o_ref):
            a = x_ref[...]
            b = a
            for i in range(K):
                b = body(b, a, i)
            o_ref[...] = b

        call = jax.jit(pl.pallas_call(
            kernel, grid=(GRID,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANES), dtype)))
        x = jnp.full((GRID * ROWS, LANES), init, dtype)
        t0 = time.time()
        jax.block_until_ready(call(x))
        first = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(call(x))
            ts.append(time.time() - t0)
        steady = min(ts)
        per_op_ps = steady / (K * n_elems) * 1e12
        print(f"# {name:28s} first {first:6.2f}s steady {steady*1e3:8.3f}ms"
              f"  -> {per_op_ps:7.2f} ps/op  ({1/per_op_ps:4.2f} Top/s)",
            file=sys.stderr, flush=True)

    m16 = np.uint32(0xFFFF)

    bench("u32 add", lambda b, a, i: b + a)
    bench("u32 mul", lambda b, a, i: b * a)
    bench("u32 mul (a<2^16 hint?)", lambda b, a, i: (b & m16) * a)
    bench("u32 shift+and", lambda b, a, i: (b >> np.uint32(1)) ^ (a & m16))
    bench("i32 mul", lambda b, a, i: b * a, jnp.int32)
    bench("f32 mul", lambda b, a, i: b * a, jnp.float32, 1.0000001)
    bench("f32 fma-ish", lambda b, a, i: b * a + a, jnp.float32, 1.0000001)
    bench("u16 mul", lambda b, a, i: b * a, jnp.uint16)
    bench("u32 select", lambda b, a, i: jnp.where(a > 1, b, a))


if __name__ == "__main__":
    main()
