"""Attribute int8 tower time: full halves vs attention-stubbed halves.

The difference isolates the attention inner section (per-head lane slices,
scores/softmax/PV) from the GEMM+LN+quant chain — deciding whether the
next kernel effort goes to attention layout or to the quant/VPU tail.

Env: JCF_STUB=1 stubs attention. One program per run (compiles are slow
through the remote helper today — keep runs single-program).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import jcf_tpu.ops.block_kernel as bk
    # defaults come FROM the module so the script measures the shipping
    # config unless explicitly overridden (ADVICE r4: a hardcoded '8'
    # silently overrode the adopted _S_ALIGN=16 default)
    bk._ATTN_STUB = os.environ.get("JCF_STUB", "0") == "1"
    bk._FUSE = os.environ.get("JCF_FUSE", bk._FUSE)
    bk._SUBTILES = int(os.environ.get("JCF_SUBTILES", str(bk._SUBTILES)))
    bk._PAIR_HEADS = os.environ.get("JCF_PAIR", "1") == "1"
    bk._S_ALIGN = int(os.environ.get("JCF_SALIGN", str(bk._S_ALIGN)))
    bk._GROUP_TARGET = int(os.environ.get("JCF_GROUP", str(bk._GROUP_TARGET)))

    from jcf_tpu.models import VIT_B_32, init_clip_params
    from jcf_tpu.ops.quant import quantize_clip_params

    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    quant = os.environ.get("JCF_QUANT", "int8")
    qp = quantize_clip_params(params)["visual"] if quant == "int8" else None
    blocks = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params["visual"]["blocks"])

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((1024, 50, cfg.vision_width)).astype(np.float32)
    ).astype(jnp.bfloat16))

    fn = jax.jit(lambda x: bk.run_fused_tower(x, blocks, cfg.vision_heads, quant=qp))
    for _ in range(3):
        out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(20)]
    jax.block_until_ready(outs)
    t = (time.perf_counter() - t0) / 20 * 1e3
    print(f"fuse={bk._FUSE} quant={quant} stub={bk._ATTN_STUB} "
          f"subtiles={bk._SUBTILES} pair={bk._PAIR_HEADS} "
          f"salign={bk._S_ALIGN} group={bk._GROUP_TARGET}: tower {t:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
