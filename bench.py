"""Throughput benchmark: ViT-B/32 TTA inference, images/sec/chip.

BASELINE.md target: >= 5,000 images/sec/chip at N=8 crops on TPU v5e.

Measures the steady-state throughput of the full compiled TTA pipeline on
one chip: device-side crop sampling (center + 8 random views per image)
-> CLIP normalize -> bf16 ViT-B/32 forward with fused Pallas attention ->
L2 norm -> MTA solve -> 403-class logits. Source images are staged on
device once; each timed iteration uses a fresh RNG key so crops differ.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    batch = int(os.environ.get("JCF_BENCH_BATCH", "128"))
    # total views per image (BASELINE's N=8): center + (N-1) random crops
    n_views_total = int(os.environ.get("JCF_BENCH_VIEWS", "8"))
    n_views = n_views_total - 1
    iters = int(os.environ.get("JCF_BENCH_ITERS", "20"))
    warmup = int(os.environ.get("JCF_BENCH_WARMUP", "3"))
    baseline = float(os.environ.get("JCF_BENCH_BASELINE", "5000"))
    # serving config: int8 W8A8 towers by default (per-feature cosine vs
    # bf16 > 0.999; PERF.md). JCF_BENCH_QUANT=none measures the bf16 path.
    quant = os.environ.get("JCF_BENCH_QUANT", "int8")
    quant = None if quant in ("", "none", "bf16") else quant

    from jcf_tpu.infer import TTAEngine
    from jcf_tpu.models import VIT_B_32, init_clip_params

    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    engine = TTAEngine(
        params,
        cfg,
        dtype=jnp.bfloat16,
        n_views=n_views,
        normalize_views=True,
        quant=quant,
    )

    rng = np.random.default_rng(0)
    # staged in the compute dtype: the serving host uploads bf16 pixels
    # (raw [0,1] range — normalization is folded into the patch embed)
    images = jax.device_put(
        jnp.asarray(rng.random((batch, 3, 256, 256)).astype(np.float32)).astype(
            jnp.bfloat16
        )
    )
    text = rng.standard_normal((403, cfg.embed_dim)).astype(np.float32)
    text = jax.device_put(jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True)))

    keys = jax.random.split(jax.random.PRNGKey(0), warmup + iters)

    # warmup / compile
    for i in range(warmup):
        out = engine.features_from_images(images, text, keys[i])
    jax.block_until_ready(out)

    start = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(engine.features_from_images(images, text, keys[warmup + i]))
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - start

    images_per_sec = batch * iters / elapsed
    print(
        json.dumps(
            {
                "metric": (
                    f"ViT-B/32 TTA inference throughput (N={n_views_total} views/image "
                    f"incl. center, {'int8 W8A8' if quant else 'bf16'}, device crops, MTA)"
                ),
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
