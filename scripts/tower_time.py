"""Minimal tower-only timing: 12 fused int8 blocks at bench shapes.

Env: JCF_GROUP (default 8), JCF_VMEM_MB (default 100), JCF_QUANT (int8|bf16)
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import jcf_tpu.ops.block_kernel as bk
    bk._GROUP_TARGET = int(os.environ.get("JCF_GROUP", "8"))
    bk._VMEM_LIMIT = int(os.environ.get("JCF_VMEM_MB", "100")) * 1024 * 1024
    bk._FUSE = os.environ.get("JCF_FUSE", "block")
    bk._MLP_NSPLIT = int(os.environ.get("JCF_MLP_NSPLIT", "1"))
    bk._SUBTILES = int(os.environ.get("JCF_SUBTILES", "2"))
    bk._NOMASK_EPILOGUE = os.environ.get("JCF_NOMASK_EPI", "1") == "1"
    bk._INT8_ATTN = os.environ.get("JCF_INT8_ATTN", "0") == "1"
    bk._DENSE_ROWS = os.environ.get("JCF_DENSE", "1") == "1"
    bk._GROUP_STREAM = int(os.environ.get("JCF_GROUP_STREAM",
                                          bk._GROUP_STREAM))
    if os.environ.get("JCF_GROUP_ATTN"):
        bk._GROUP_ATTN = int(os.environ["JCF_GROUP_ATTN"])
    if os.environ.get("JCF_GROUP_MLP"):
        bk._GROUP_MLP = int(os.environ["JCF_GROUP_MLP"])

    from jcf_tpu.models import VIT_B_32, init_clip_params
    from jcf_tpu.ops.quant import quantize_clip_params

    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    quant = os.environ.get("JCF_QUANT", "int8")
    fold = os.environ.get("JCF_FOLD", "0") == "1"
    qp = None
    if quant == "int8":
        qp = quantize_clip_params(
            params, fold=fold,
            heads={"visual": cfg.vision_heads, "text": cfg.text_heads},
        )["visual"]
    blocks = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params["visual"]["blocks"])

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((1024, 50, cfg.vision_width)).astype(np.float32)
    ).astype(jnp.bfloat16))

    fn = jax.jit(lambda x: bk.run_fused_tower(
        x, blocks, cfg.vision_heads, quant=qp, quant_folded=fold))
    for _ in range(3):
        out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(20)]
    jax.block_until_ready(outs)
    t = (time.perf_counter() - t0) / 20 * 1e3
    print(f"group={bk._GROUP_TARGET} vmem={bk._VMEM_LIMIT>>20}MB quant={quant} "
          f"fold={int(fold)} fuse={bk._FUSE} sub={bk._SUBTILES} "
          f"nsplit={bk._MLP_NSPLIT} nomask_epi={int(bk._NOMASK_EPILOGUE)} "
          f"i8attn={int(bk._INT8_ATTN)} ga={bk._GROUP_ATTN} gm={bk._GROUP_MLP} "
          f"dense={int(bk._DENSE_ROWS)} gs={bk._GROUP_STREAM}: "
          f"tower {t:.2f} ms")


if __name__ == "__main__":
    main()
