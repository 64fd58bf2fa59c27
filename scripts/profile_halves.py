"""Time the attn-half and mlp-half Pallas programs separately (real chip).

Usage: python scripts/profile_halves.py [group]
"""

from __future__ import annotations

import functools
import math
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from jcf_tpu.models import VIT_B_32, init_clip_params
    from jcf_tpu.ops import block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    group = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    qp = jax.tree_util.tree_map(
        lambda a: a[0], quantize_clip_params(params)["visual"])
    blk = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a[0]), params["visual"]["blocks"])

    b, s_pad, e = 1024, 56, cfg.vision_width
    h, d = cfg.vision_heads, cfg.vision_width // cfg.vision_heads
    gs = group * s_pad
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((b, s_pad, e)).astype(np.float32)).astype(jnp.bfloat16))
    bias = jnp.full((s_pad, s_pad), -1e30, jnp.float32).at[:50, :50].set(0.0)

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def full(shape):
        return vmem(shape, lambda i: tuple(0 for _ in shape))

    attn = pl.pallas_call(
        functools.partial(
            bk._attn_half_int8_kernel, n_heads=h, head_dim=d,
            scale=1.0 / math.sqrt(d), group=group, s_pad=s_pad,
        ),
        grid=(b // group,),
        in_specs=[
            vmem((group, s_pad, e), lambda i: (i, 0, 0)),
            full((e,)), full((e,)),
            full((3 * e, e)), full((3 * e,)), full((3 * e,)),
            full((e, e)), full((e,)), full((e,)),
            full((s_pad, s_pad)),
        ],
        out_specs=vmem((group, s_pad, e), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, e), x.dtype),
    )
    attn_fn = jax.jit(lambda x: attn(
        x, blk["ln_1"]["scale"].astype(x.dtype), blk["ln_1"]["bias"].astype(x.dtype),
        qp["attn"]["w_qkv"].w_int8, qp["attn"]["w_qkv"].w_scale, qp["attn"]["w_qkv"].bias,
        qp["attn"]["w_out"].w_int8, qp["attn"]["w_out"].w_scale, qp["attn"]["w_out"].bias,
        bias,
    ))

    hidden = qp["mlp"]["c_fc"].w_int8.shape[0]
    mlp = pl.pallas_call(
        functools.partial(bk._mlp_half_int8_kernel, group=group, s_pad=s_pad),
        grid=(b // group,),
        in_specs=[
            vmem((group, s_pad, e), lambda i: (i, 0, 0)),
            full((e,)), full((e,)),
            full((hidden, e)), full((hidden,)), full((hidden,)),
            full((e, hidden)), full((e,)), full((e,)),
        ],
        out_specs=vmem((group, s_pad, e), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, e), x.dtype),
    )
    mlp_fn = jax.jit(lambda x: mlp(
        x, blk["ln_2"]["scale"].astype(x.dtype), blk["ln_2"]["bias"].astype(x.dtype),
        qp["mlp"]["c_fc"].w_int8, qp["mlp"]["c_fc"].w_scale, qp["mlp"]["c_fc"].bias,
        qp["mlp"]["c_proj"].w_int8, qp["mlp"]["c_proj"].w_scale, qp["mlp"]["c_proj"].bias,
    ))

    rows = b * s_pad
    t_attn = timed(attn_fn, x)
    t_mlp = timed(mlp_fn, x)
    gattn = 4 * e * e * rows * 2 / 1e12
    gmlp = 8 * e * e * rows * 2 / 1e12
    print(f"group={group}")
    print(f"attn half int8: {t_attn:6.2f} ms  (GEMM ideal @400TOPS {gattn/0.4*1e3:5.2f} ms)")
    print(f"mlp  half int8: {t_mlp:6.2f} ms  (GEMM ideal @400TOPS {gmlp/0.4*1e3:5.2f} ms)")


if __name__ == "__main__":
    main()
