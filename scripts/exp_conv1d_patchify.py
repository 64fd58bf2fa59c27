"""Probe: patchify as a 96-channel conv1d / 1D-im2col GEMM (r4).

The serving patchify section costs 17 ms/iter at b512 because XLA's
shallow-conv (C=3) lowering picks batch-minor layouts (PERF.md r4). If
the view kernel emits py-split slabs [B', 7(py), 96(c,dy), 224(x)] —
same bytes, 7 trailing-2D stores per channel instead of 1 — the same
contraction becomes:

  A2. conv1d: [B'*7, 96, 224] x [768, 96, 32] stride 32 -> [B'*7, 7, 768]
  C2. 1D im2col: reshape [B'*7, 96, 7, 32] -> transpose (0,2,1,3)
      -> [B'*49, 3072] @ [3072, 768] int8 GEMM

vs the current A1 (2D conv on [B', 3, 224, 224]).

MEASUREMENT RULE (r4): identical repeated dispatches through the axon
path can be memoized — every timed iteration must use a DISTINCT input
buffer (bench.py's fresh-key rule). We cycle 3 input copies.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

BN = 4096


def timed(f, inputs, fixed, n=9, tag=""):
    g = jax.jit(f)
    for v in inputs[:2]:
        o = g(v, fixed)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [g(inputs[i % len(inputs)], fixed) for i in range(n)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{tag}: {ms:.3f} ms (out {outs[0].shape})", flush=True)
    return ms


def conv2d(v, k):
    return jax.lax.conv_general_dilated(
        v, k, (32, 32), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NHWC"),
        preferred_element_type=jnp.int32)


def conv1d(v, k):
    return jax.lax.conv_general_dilated(
        v, k, (32,), "VALID",
        dimension_numbers=("NCW", "OIW", "NWC"),
        preferred_element_type=jnp.int32)


def im2col1d(v, w):
    x = v.reshape(-1, 96, 7, 32).transpose(0, 2, 1, 3)
    return jax.lax.dot_general(
        x.reshape(-1, 3072), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def main():
    rng = np.random.default_rng(0)

    # exactness first (tiny)
    small = rng.integers(-5, 6, (2, 3, 224, 224)).astype(np.int8)
    ks = rng.integers(-3, 4, (768, 3, 32, 32)).astype(np.int8)
    a = np.asarray(jax.jit(conv2d)(jnp.asarray(small), jnp.asarray(ks)))
    v1 = jnp.asarray(
        small.reshape(2, 3, 7, 32, 224).transpose(0, 2, 1, 3, 4)
        .reshape(14, 96, 224))
    b = np.asarray(jax.jit(conv1d)(v1, jnp.asarray(ks.reshape(768, 96, 32))))
    print("conv1d == conv2d:", np.array_equal(a, b.reshape(2, 7, 7, 768)),
          flush=True)
    c = np.asarray(jax.jit(im2col1d)(
        v1, jnp.asarray(ks.reshape(768, 3072).T.copy())))
    print("im2col1d == conv2d:",
          np.array_equal(a.reshape(-1, 768), c), flush=True)

    def copies(shape, dtype=np.int8):
        return [jax.device_put(jnp.asarray(
            rng.integers(-127, 128, shape), jnp.int8).astype(dtype))
            for _ in range(3)]

    k2d = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (768, 3, 32, 32)), jnp.int8))
    k1d = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (768, 96, 32)), jnp.int8))
    w = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (3072, 768)), jnp.int8))

    timed(conv2d, copies((BN, 3, 224, 224)), k2d,
          tag="A1 conv2d s8 (current form)")
    timed(conv1d, copies((BN * 7, 96, 224)), k1d, tag="A2 conv1d s8 96ch")
    timed(im2col1d, copies((BN * 7, 96, 224)), w, tag="C2 im2col-1d s8 GEMM")
    timed(conv1d, copies((BN * 7, 96, 224), jnp.bfloat16),
          k1d.astype(jnp.bfloat16), tag="A2b conv1d bf16 96ch")


if __name__ == "__main__":
    main()
