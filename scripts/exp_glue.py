"""Attribute the non-tower time of the bench pipeline (glue).

bench = views (crop GEMMs) + patchify-embed + pre/post + 12-layer tower +
MTA/logits. Tower is measured separately (exp_halves_breakdown); this
times the other pieces so optimization lands where the milliseconds are.
Programs kept small/cached where possible (tunnel compiles are slow).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from jcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    from jcf_tpu.infer.engine import device_tta_views_nhcw
    from jcf_tpu.models import VIT_B_32, init_clip_params
    from jcf_tpu.models.clip import embed_views_nhcw, fold_normalize_into_embed
    from jcf_tpu.tta import solve_mta_batch

    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    rng = np.random.default_rng(0)
    batch, n_views = 128, 7
    images = jax.device_put(
        jnp.asarray(rng.random((batch, 3, 256, 256)).astype(np.float32)).astype(jnp.bfloat16)
    )
    key = jax.random.PRNGKey(0)

    w4, fold_bias = fold_normalize_into_embed(
        params["visual"]["patch_embed"]["w"], CLIP_MEAN, CLIP_STD,
        cfg.vision_patch_size, dtype=jnp.bfloat16,
    )

    views_fn = jax.jit(lambda im, k: device_tta_views_nhcw(im, k, n_views, 224))
    t_views = timed(views_fn, images, key)
    print(f"device views (128 x 8):        {t_views:6.2f} ms", flush=True)

    def views_embed(im, k):
        v = device_tta_views_nhcw(im, k, n_views, 224)
        flat = v.reshape((-1,) + v.shape[2:])
        return embed_views_nhcw(flat, w4, fold_bias)

    ve_fn = jax.jit(views_embed)
    t_ve = timed(ve_fn, images, key)
    print(f"views + patchify embed:        {t_ve:6.2f} ms (embed ~{t_ve - t_views:5.2f})",
          flush=True)

    feats = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 8, 512)).astype(np.float32))
    )
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    text = jnp.asarray(rng.standard_normal((403, 512)).astype(np.float32))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    mta_fn = jax.jit(lambda f, t: solve_mta_batch(f, t) @ t.T * 100.0)
    t_mta = timed(mta_fn, feats, text)
    print(f"MTA solve + logits (128 x 8):  {t_mta:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
