"""Round-2 perf breakdown on the real chip.

Times each piece of the bench pipeline (128 images x 8 views, int8 W8A8)
separately so optimization effort lands where the milliseconds are:
  - full features_from_images (the bench workload)
  - tower-only encode (fused int8 blocks)
  - single attn-half / mlp-half pallas program x12 (layer estimate)
  - pre/post tower glue (patchify, embed, ln, proj)
  - device crop sampling, MTA solve

Usage: python scripts/profile_r2.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=20, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from jcf_tpu.infer import TTAEngine
    from jcf_tpu.infer.engine import device_random_crops
    from jcf_tpu.models import VIT_B_32, init_clip_params
    from jcf_tpu.models.clip import encode_image
    from jcf_tpu.ops.block_kernel import fused_block, run_fused_tower
    from jcf_tpu.ops.quant import quantize_clip_params
    from jcf_tpu.tta import solve_mta_batch

    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    qp = quantize_clip_params(params)["visual"]
    bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "astype") and x.dtype == jnp.float32 else x,
        params,
    )

    batch, n_views = 128, 8
    n_crops = batch * n_views
    rng = np.random.default_rng(0)

    images = jax.device_put(jnp.asarray(
        rng.random((batch, 3, 256, 256)).astype(np.float32)))
    crops = jax.device_put(jnp.asarray(
        rng.random((n_crops, 3, 224, 224)).astype(np.float32)).astype(jnp.bfloat16))
    text = rng.standard_normal((403, cfg.embed_dim)).astype(np.float32)
    text = jax.device_put(jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True)))

    engine = TTAEngine(params, cfg, dtype=jnp.bfloat16, n_views=n_views - 1,
                       normalize_views=True, quant="int8")
    key = jax.random.PRNGKey(0)

    t_full = timed(engine.features_from_images, images, text, key)
    print(f"full pipeline (128 img x 8 views, int8): {t_full:7.2f} ms "
          f"-> {batch / t_full * 1e3:7.1f} img/s")

    enc_q = jax.jit(lambda c: encode_image(bf16, cfg, c, dtype=jnp.bfloat16,
                                           quant=qp))
    t_enc = timed(enc_q, crops)
    print(f"encode 1024 crops int8:                  {t_enc:7.2f} ms")

    enc_bf = jax.jit(lambda c: encode_image(bf16, cfg, c, dtype=jnp.bfloat16,
                                            impl="fused"))
    t_encb = timed(enc_bf, crops)
    print(f"encode 1024 crops bf16 fused:            {t_encb:7.2f} ms")

    # tower-only: skip patchify/embed/pre/post
    s, e = 50, cfg.vision_width
    s_pad = 56
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((n_crops, s, e)).astype(np.float32)).astype(jnp.bfloat16))
    blocks = bf16["visual"]["blocks"]

    tower_q = jax.jit(lambda x: run_fused_tower(x, blocks, cfg.vision_heads,
                                                quant=qp))
    t_tower = timed(tower_q, x)
    print(f"tower only (12 fused int8 blocks):       {t_tower:7.2f} ms")

    # single block (both halves)
    one_block = jax.tree_util.tree_map(lambda a: a[0], blocks)
    one_quant = jax.tree_util.tree_map(lambda a: a[0], qp)
    xp = jax.device_put(jnp.asarray(
        rng.standard_normal((n_crops, s_pad, e)).astype(np.float32)).astype(jnp.bfloat16))
    bias = jnp.full((s_pad, s_pad), -1e30, jnp.float32).at[:s, :s].set(0.0)

    blk_q = jax.jit(lambda x: fused_block(x, one_block, cfg.vision_heads, bias,
                                          quant_layer=one_quant))
    t_blk = timed(blk_q, xp)
    print(f"single int8 block (attn+mlp halves):     {t_blk:7.2f} ms x12 = {t_blk*12:6.2f}")

    # attn half alone: run fused_block with zeroed MLP? cheaper: time the two
    # pallas programs by reusing fused_block internals is invasive; instead
    # estimate: mlp-only variant by timing a block whose attn is identity is
    # not available. Use bf16 single block for reference.
    blk_b = jax.jit(lambda x: fused_block(x, one_block, cfg.vision_heads, bias))
    t_blkb = timed(blk_b, xp)
    print(f"single bf16 block:                       {t_blkb:7.2f} ms x12 = {t_blkb*12:6.2f}")

    # glue = encode - tower
    print(f"glue (patchify/embed/ln/proj + pad):     {t_enc - t_tower:7.2f} ms")

    imgs_n = jax.jit(lambda im, k: device_random_crops(
        im.astype(jnp.bfloat16), k, n_views - 1, 224))
    t_crop = timed(imgs_n, images, key)
    print(f"device crop sampling (128x7):            {t_crop:7.2f} ms")

    clouds = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, n_views, cfg.embed_dim)).astype(np.float32)))
    clouds = clouds / jnp.linalg.norm(clouds, axis=-1, keepdims=True)
    mta = jax.jit(lambda c, t: solve_mta_batch(c, t))
    t_mta = timed(mta, clouds, text)
    print(f"MTA solve (128x8):                       {t_mta:7.2f} ms")


if __name__ == "__main__":
    main()
