"""Experiment: does Mosaic support batched dot_general on the MXU, and how
does it compare to a python-unrolled per-head loop?

Shapes mirror the attention inner loop at tower scale: per grid step,
group=8 crops x 12 heads of [56, 64] q/k/v.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


GROUP, S, H, D = 8, 56, 12, 64
GRID = 128  # b // group at 1024 crops


def kernel_batched(q_ref, k_ref, v_ref, o_ref):
    # [G*H, S, D] batched over dim 0
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def kernel_loop(q_ref, k_ref, v_ref, o_ref):
    def body(i, _):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[i] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, GROUP * H, body, 0)


def main():
    rng = np.random.default_rng(0)
    gh = GROUP * H
    shape = (GRID * gh, S, D)
    q = jax.device_put(jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16))
    k = jax.device_put(jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16))
    v = jax.device_put(jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16))

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    specs = dict(
        grid=(GRID,),
        in_specs=[vmem((gh, S, D), lambda i: (i, 0, 0))] * 3,
        out_specs=vmem((gh, S, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.bfloat16),
    )

    for name, kern in [("batched", kernel_batched), ("loop", kernel_loop)]:
        try:
            fn = jax.jit(pl.pallas_call(kern, **specs))
            out = fn(q, k, v)
            jax.block_until_ready(out)
            t = timed(fn, q, k, v)
            print(f"{name:8s}: {t:6.3f} ms   out[0,0,0]={float(out[0,0,0]):.4f}")
        except Exception as e:
            print(f"{name:8s}: FAILED — {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
