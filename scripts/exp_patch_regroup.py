"""Probe: can Mosaic do the im2col patch regroup in-kernel, and how fast?

The serving patchify section costs 17 ms/iter at b512 (trace r4 post-
assembly: conv fusion.77 9.84 + views batch-minor relayout copy.162 5.2 +
conv-output relayout copy.163 1.96) vs a 2.4 ms int8-GEMM ideal. If the
view kernel could emit im2col patch rows [49, 3072] directly, patchify
becomes one flat int8 GEMM and every relayout dies. The blocker recorded
in ops/view_kernel.py: Mosaic rejects sublane<->lane shape casts. This
probe re-tests that on the current toolchain, per-variant:

  A. reshape+transpose: [224,224] -> [7,32,7,32] -> (0,2,1,3) -> [49,1024]
  B. per-py loop of [32,224] -> [32,7,32] -> (1,0,2) -> [7,1024]
  C. strided-row loads: for dy: out[:, dy*32:+32] = x[dy::32] as [49,32]

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_patch_regroup.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_a(x_ref, o_ref):
    x = x_ref[0]  # [224, 224]
    y = x.reshape(7, 32, 7, 32).transpose(0, 2, 1, 3).reshape(49, 1024)
    o_ref[0] = y


def kernel_b(x_ref, o_ref):
    x = x_ref[0]
    for py in range(7):
        blk = x[32 * py : 32 * py + 32]  # [32, 224]
        y = blk.reshape(32, 7, 32).transpose(1, 0, 2).reshape(7, 1024)
        o_ref[0, 7 * py : 7 * py + 7] = y


def kernel_c(x_ref, o_ref):
    x = x_ref[0]
    for dy in range(32):
        rows = x[dy::32]  # [7, 224] strided sublane load
        o_ref[0, :, dy * 32 : dy * 32 + 32] = rows.reshape(49, 32)


def run(kernel, name, n=512, dtype=jnp.float32):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, 224, 224)), dtype
    )
    if kernel is kernel_c:
        out_shape = jax.ShapeDtypeStruct((n, 49, 1024), dtype)
        out_spec = pl.BlockSpec((1, 49, 1024), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((n, 49, 1024), dtype)
        out_spec = pl.BlockSpec((1, 49, 1024), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 224, 224), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=out_shape,
    )
    try:
        f = jax.jit(fn)
        o = f(x)
        jax.block_until_ready(o)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    # correctness vs numpy
    xn = np.asarray(x[0])
    ref = xn.reshape(7, 32, 7, 32).transpose(0, 2, 1, 3).reshape(49, 1024)
    got = np.asarray(o[0])
    ok = np.array_equal(got, ref)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    gb = 2 * x.size * x.dtype.itemsize / 1e9
    print(f"{name}: ok={ok} {ms:.3f} ms for {n} ch-views "
          f"({gb / (ms / 1e3):.0f} GB/s effective)")
    return ms


if __name__ == "__main__":
    for dt, tag in ((jnp.float32, "f32"), (jnp.int8, "int8")):
        print(f"--- {tag}")
        for k, name in ((kernel_a, "A reshape+transpose"),
                        (kernel_b, "B per-py transpose"),
                        (kernel_c, "C strided rows")):
            run(k, name, dtype=dt)
