"""End-to-end pipeline candidates on the real chip.

Variants (all: 128 images x 8 views, int8 tower):
  A: current engine (reference timing)
  B: bf16-staged images + norm-folded patch embed + transpose sampler
     + einsum embed from NHCW views (no patchify transpose)
  C: B but sampler contracts h straight out of NCHW (no img transpose)
  D: B but classic _patchify_nhcw + linear embed
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from jcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD
from jcf_tpu.infer import TTAEngine
from jcf_tpu.infer.engine import sample_crop_boxes, crop_resize_matrices
from jcf_tpu.models import VIT_B_32, init_clip_params
from jcf_tpu.models.clip import _patchify_nhcw, layer_norm
from jcf_tpu.ops.block_kernel import run_fused_tower
from jcf_tpu.ops.layers import l2_normalize, linear
from jcf_tpu.ops.quant import quantize_clip_params
from jcf_tpu.tta import solve_mta_batch

B, V, OUT, SRC = 128, 8, 224, 256


def make_views(x, key, transpose_src):
    b = x.shape[0]
    keys = jax.random.split(key, b)
    boxes, flips = jax.vmap(lambda k: sample_crop_boxes(k, V - 1, (SRC, SRC)))(keys)
    center = jnp.array([16.0, 16.0, 224.0, 224.0], jnp.float32)
    boxes = jnp.concatenate([jnp.broadcast_to(center, (b, 1, 4)), boxes], axis=1)
    flips = jnp.concatenate([jnp.zeros((b, 1), bool), flips], axis=1)
    wy, wx = crop_resize_matrices(boxes.reshape(b * V, 4), (SRC, SRC), OUT)
    wy = wy.reshape(b, V, OUT, SRC).astype(x.dtype)
    wx = wx.reshape(b, V, OUT, SRC).astype(x.dtype)
    wx = jnp.where(flips[:, :, None, None], wx[:, :, ::-1, :], wx)
    if transpose_src:
        img_t = x.transpose(0, 2, 1, 3).reshape(b, SRC, 3 * SRC)
        t = jax.lax.dot_general(
            wy.reshape(b, V * OUT, SRC), img_t, (((2,), (1,)), ((0,), (0,))))
        t = t.reshape(b, V, OUT, 3, SRC)
    else:
        t = jax.lax.dot_general(
            wy.reshape(b, V * OUT, SRC), x, (((2,), (2,)), ((0,), (0,))))
        t = t.reshape(b, V, OUT, 3, SRC)
    return jax.lax.dot_general(t, wx, (((4,), (3,)), ((0, 1), (0, 1))))


def embed_einsum(views_flat, w4, patch=32):
    """[M, (gh u), c, (gw v)] x W [c,u,v,E] -> [M, gh*gw, E], one dot."""
    m = views_flat.shape[0]
    g = OUT // patch
    x = views_flat.reshape(m, g, patch, 3, g, patch)
    out = jax.lax.dot_general(
        x, w4, (((2, 3, 5), (1, 0, 2)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, gh, gw, E]
    return out.reshape(m, g * g, -1)


def main():
    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    qp = quantize_clip_params(params)["visual"]
    bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    v = bf16["visual"]
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)

    # fold (x - mean_c)/std_c into the embed: W'_j = W_j/std_c(j),
    # bias = -sum_j W_j mean_c(j)/std_c(j)
    w = np.asarray(params["visual"]["patch_embed"]["w"], np.float32)  # [E, 3*p*p]
    pp = cfg.vision_patch_size ** 2
    chan = np.repeat(np.arange(3), pp)
    w_fold = (w / std[chan][None, :]).astype(np.float32)
    b_fold = -(w * (mean[chan] / std[chan])[None, :]).sum(axis=1)
    w4 = jnp.asarray(w_fold.T.reshape(3, 32, 32, -1)).astype(jnp.bfloat16)  # [c,u,v,E]
    b4 = jnp.asarray(b_fold)  # [E] f32
    w_fold_flat = jnp.asarray(w_fold).astype(jnp.bfloat16)

    rng = np.random.default_rng(0)
    images32 = jax.device_put(jnp.asarray(rng.random((B, 3, SRC, SRC)).astype(np.float32)))
    images = jax.device_put(images32.astype(jnp.bfloat16))
    text = rng.standard_normal((403, cfg.embed_dim)).astype(np.float32)
    text = jax.device_put(jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True)))
    keys = jax.random.split(jax.random.PRNGKey(0), 40)

    def tower_and_head(x_tokens):
        m = x_tokens.shape[0]
        cls = jnp.broadcast_to(v["class_embedding"][None, None, :], (m, 1, x_tokens.shape[-1]))
        x = jnp.concatenate([cls, x_tokens.astype(jnp.bfloat16)], axis=1)
        x = x + v["positional_embedding"]
        x = layer_norm(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"])
        x = run_fused_tower(x, v["blocks"], cfg.vision_heads, quant=qp)
        x = layer_norm(x[:, 0], v["ln_post"]["scale"], v["ln_post"]["bias"])
        f = jnp.dot(x, v["proj"], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).astype(jnp.bfloat16)
        return l2_normalize(f).reshape(B, V, -1).astype(jnp.float32)

    def pipe_B(images, text, key):
        views = make_views(images, key, transpose_src=True)
        flat = views.reshape((B * V,) + views.shape[2:])
        tokens = embed_einsum(flat, w4) + b4
        return solve_mta_batch(tower_and_head(tokens), text)

    def pipe_C(images, text, key):
        views = make_views(images, key, transpose_src=False)
        flat = views.reshape((B * V,) + views.shape[2:])
        tokens = embed_einsum(flat, w4) + b4
        return solve_mta_batch(tower_and_head(tokens), text)

    def pipe_D(images, text, key):
        views = make_views(images, key, transpose_src=True)
        flat = views.reshape((B * V,) + views.shape[2:])
        tokens = linear(_patchify_nhcw(flat, 32), w_fold_flat) + b4
        return solve_mta_batch(tower_and_head(tokens), text)

    def timed(j, *a):
        for _ in range(3):
            o = j(*a, keys[0])
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        outs = [j(*a, k) for k in keys[3:23]]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / 20 * 1e3

    eng = TTAEngine(params, cfg, dtype=jnp.bfloat16, n_views=V - 1,
                    normalize_views=True, quant="int8")
    tA = timed(eng.features_from_images, images32, text)
    print(f"A current engine:            {tA:6.2f} ms -> {B/tA*1e3:7.1f} img/s")
    for name, pipe in [("B fold+transpose+einsum", pipe_B),
                       ("C fold+no-transpose+einsum", pipe_C),
                       ("D fold+transpose+patchify", pipe_D)]:
        j = jax.jit(pipe)
        t = timed(j, images, text)
        print(f"{name}: {t:6.2f} ms -> {B/t*1e3:7.1f} img/s")

    # numerics: B vs current engine (same key)
    ref = np.asarray(eng.features_from_images(images32, text, keys[0]))
    got = np.asarray(jax.jit(pipe_B)(images, text, keys[0]))
    cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    print("min cos B-vs-engine:", float(cos.min()))


if __name__ == "__main__":
    main()
