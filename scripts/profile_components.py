"""Component-level throughput breakdown on the real chip:
crops-only, encode-only, MTA-only, full pipeline; pallas vs xla attention.

Usage: python scripts/profile_components.py [batch] [views]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from jcf_tpu.infer.engine import device_random_crops, _center_crop_view
from jcf_tpu.models import VIT_B_32, init_clip_params, encode_image
from jcf_tpu.ops.layers import l2_normalize
from jcf_tpu.tta import solve_mta_batch


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - start) / iters
    print(f"{name:34s} {dt*1000:9.2f} ms/iter")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    views = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, 3, 256, 256)).astype(np.float32))
    text = rng.standard_normal((403, 512)).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    key = jax.random.PRNGKey(0)
    n_total = views + 1

    crops_fn = jax.jit(lambda im, k: device_random_crops(im, k, views, 224))
    t_crops = timed("device crops", crops_fn, images, key)

    flat = jnp.asarray(rng.random((batch * n_total, 3, 224, 224)).astype(np.float32))

    enc_bf16_pallas = jax.jit(
        lambda p, x: l2_normalize(encode_image(p, cfg, x, dtype=jnp.bfloat16, impl="pallas"))
    )
    t_enc = timed("encode bf16+pallas", enc_bf16_pallas, params, flat)

    enc_bf16_xla = jax.jit(
        lambda p, x: l2_normalize(encode_image(p, cfg, x, dtype=jnp.bfloat16, impl="xla"))
    )
    t_enc_xla = timed("encode bf16+xla-attn", enc_bf16_xla, params, flat)

    clouds = jnp.asarray(rng.standard_normal((batch, n_total, 512)).astype(np.float32))
    clouds = clouds / jnp.linalg.norm(clouds, axis=-1, keepdims=True)
    mta_fn = jax.jit(lambda c, t: solve_mta_batch(c, t))
    t_mta = timed("mta solve", mta_fn, clouds, text)

    print(f"\nper-image budget at batch={batch}: crops {t_crops/batch*1e6:.0f}us "
          f"encode {t_enc/batch*1e6:.0f}us mta {t_mta/batch*1e6:.0f}us")
    flops = batch * n_total * 8.8e9  # ViT-B/32 fwd ≈ 4.4 GFLOPs x2 (MACs->FLOPs)
    print(f"encode implied TFLOP/s: pallas {flops/t_enc/1e12:.1f}  xla {flops/t_enc_xla/1e12:.1f}")


if __name__ == "__main__":
    main()
