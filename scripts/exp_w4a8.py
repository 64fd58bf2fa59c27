"""w4a8 MLP weight-halving probe (VERDICT r4 #8).

Times ONE layer's MLP half at serving tile shapes three ways:

  int8      the shipping _mlp_half_int8_kernel math (W8A8, static-full)
  w4_step   c_fc/c_proj packed two-int4-per-byte, sign-extended + column-
            interleaved back to int8 INSIDE the kernel on every grid step
  w4_cache  same packing, but unpacked ONCE into VMEM scratch at grid
            step 0 and reused (weights are grid-invariant in the halves
            design, so this is the best-faith variant)

Context that decides the outcome before measuring (PERF.md r4/r5): in
the halves design the weight BlockSpecs are grid-invariant, so Mosaic
fetches them from HBM once per pallas_call — per-iter MLP weight traffic
is 12 x 4.7 MB = 56 MB = ~0.07 ms at 819 GB/s. Halving bytes that are
not on the critical path cannot win; the probe exists to pin the number
and the unpack overhead honestly. (The weight-RE-streaming variant where
w4 would matter, _FUSE="stream", already lost to halves by 19% for
unrelated reasons — PERF.md r4.)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_w4a8.py
Env: JCF_W4_ROWS (default 409600 = b1024 serving), JCF_W4_GROUP (16)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

E = 768
HID = 3072
S = 50
ROWS = int(os.environ.get("JCF_W4_ROWS", str(8192 * S)))
GROUP = int(os.environ.get("JCF_W4_GROUP", "16"))
TILE = GROUP * S


def _unpack_int4(packed_i8, out_cols):
    """[r, c/2] int8 -> [r, c] int8. Byte j holds col j (low nibble) and
    col j + c/2 (high nibble), so the unpack is a plain lane concat — an
    element interleave (stack + reshape) is an 'unsupported shape cast'
    in Mosaic's vector layout inference (measured r5)."""
    wi = packed_i8.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(wi, 28), jnp.int32(28))
    hi = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(wi, 24), jnp.int32(28))
    return jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)


def _mlp_math(rows, wfc, wproj, h_inv):
    import jcf_tpu.ops.block_kernel as bk

    h_ln = bk._ln_norm(rows)
    x_q = bk._quant_rows_static(h_ln, jnp.float32(28.0))
    hidden = jax.lax.dot_general(
        x_q, wfc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * jnp.float32(3e-4)
    h_q = bk._gelu_quant_static(hidden, h_inv)
    part = jax.lax.dot_general(
        h_q, wproj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * jnp.float32(3e-4)
    return (rows.astype(jnp.float32) + part).astype(rows.dtype)


def k_int8(x_ref, wfc_ref, wproj_ref, o_ref):
    o_ref[...] = _mlp_math(
        x_ref[...], wfc_ref[...], wproj_ref[...], jnp.float32(10.0))


def k_w4_step(x_ref, wfc4_ref, wproj4_ref, o_ref):
    wfc = _unpack_int4(wfc4_ref[...], E)
    wproj = _unpack_int4(wproj4_ref[...], HID)
    o_ref[...] = _mlp_math(x_ref[...], wfc, wproj, jnp.float32(10.0))


def k_w4_cache(x_ref, wfc4_ref, wproj4_ref, o_ref, wfc_s, wproj_s):
    @pl.when(pl.program_id(0) == 0)
    def _unpack():
        wfc_s[...] = _unpack_int4(wfc4_ref[...], E)
        wproj_s[...] = _unpack_int4(wproj4_ref[...], HID)

    o_ref[...] = _mlp_math(
        x_ref[...], wfc_s[...], wproj_s[...], jnp.float32(10.0))


def build(kind):
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def full(shape):
        return vmem(shape, lambda i: tuple(0 for _ in shape))

    tile = vmem((TILE, E), lambda i: (i, 0))
    common = dict(
        grid=(ROWS // TILE,),
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((ROWS, E), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    if kind == "int8":
        return pl.pallas_call(
            k_int8, in_specs=[tile, full((HID, E)), full((E, HID))], **common)
    if kind == "w4_step":
        return pl.pallas_call(
            k_w4_step, in_specs=[tile, full((HID, E // 2)), full((E, HID // 2))],
            **common)
    return pl.pallas_call(
        k_w4_cache, in_specs=[tile, full((HID, E // 2)), full((E, HID // 2))],
        scratch_shapes=[pltpu.VMEM((HID, E), jnp.int8),
                        pltpu.VMEM((E, HID), jnp.int8)],
        **common)


def main():
    rng = np.random.default_rng(0)
    wfc = jnp.asarray(rng.integers(-7, 8, (HID, E)).astype(np.int8))
    wproj = jnp.asarray(rng.integers(-7, 8, (E, HID)).astype(np.int8))

    def pack(w):
        wi = np.asarray(w).astype(np.int8)
        half = wi.shape[1] // 2
        lo = wi[:, :half] & 0xF
        hi = (wi[:, half:] & 0xF) << 4
        return jnp.asarray((lo | hi).astype(np.uint8).view(np.int8))

    wfc4, wproj4 = pack(wfc), pack(wproj)
    # distinct inputs per timed iteration (fresh-input rule)
    xs = [jnp.asarray(rng.standard_normal((ROWS, E)).astype(np.float32))
          .astype(jnp.bfloat16) for _ in range(3)]

    outs = {}
    for kind, args in (("int8", (wfc, wproj)), ("w4_step", (wfc4, wproj4)),
                       ("w4_cache", (wfc4, wproj4))):
        fn = jax.jit(lambda x, a=args, k=kind: build(k)(x, *a))
        for x in xs[:2]:
            o = fn(x)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        rs = [fn(xs[i % 3]) for i in range(9)]
        jax.block_until_ready(rs)
        dt = (time.perf_counter() - t0) / 9 * 1e3
        outs[kind] = (dt, float(jnp.sum(jnp.abs(rs[-1].astype(jnp.float32)))))
        print(f"{kind:9s} {dt:8.2f} ms  (checksum {outs[kind][1]:.6e})",
              flush=True)
    # int4 values fit both packings exactly -> checksums must agree
    assert abs(outs["int8"][1] - outs["w4_step"][1]) < 1.0, outs
    assert abs(outs["int8"][1] - outs["w4_cache"][1]) < 1.0, outs


if __name__ == "__main__":
    main()
