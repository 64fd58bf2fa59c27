"""Measure per-pallas_call boundary cost at serving shapes (r4).

exp_attn_sections2 (fixed) showed: tower 120.3 ms, attention-half ideal
29.4, measured 38.6; MLP+scan floor 81.7 vs 58.8 MXU ideal. Hypothesis:
the fat is per-kernel-boundary cost (x HBM round-trip that cannot overlap
across pallas_call edges + fixed dispatch), ~0.8-1 ms per boundary x 24
halves. This times chains of N pure-copy kernels over the serving row
stream [204800, 768] bf16 — slope = cost per boundary.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def copy_kernel(x_ref, o_ref):
    # +1 so no layer of the stack can elide or dedup the chain; checksum
    # printed to prove N executions happened
    o_ref[...] = x_ref[...] + jnp.bfloat16(1.0)


def chain(n, rows, e, group_rows):
    def one(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(rows // group_rows,),
            in_specs=[pl.BlockSpec((group_rows, e), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((group_rows, e), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, e), jnp.bfloat16),
        )(x)

    def f(x):
        for _ in range(n):
            x = one(x)
        return x

    return jax.jit(f)


def main():
    rows, e = 204800, 768
    group_rows = 800  # G=16 crops x 50 rows, the serving tile
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal((rows, e)),
                    jnp.bfloat16))
    for n in (6, 12, 24, 48):
        f = chain(n, rows, e, group_rows)
        for _ in range(2):
            o = f(x)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        outs = [f(x) for _ in range(10)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / 10 * 1e3
        bw = n * 2 * rows * e * 2 / (ms / 1e3) / 1e9
        delta = float(jnp.mean(outs[0].astype(jnp.float32) - x.astype(jnp.float32)))
        print(f"n={n:3d}: {ms:7.2f} ms  ({ms / n:.3f} ms/kernel, "
              f"{bw:.0f} GB/s effective, mean delta {delta:.1f})", flush=True)


if __name__ == "__main__":
    main()
