"""On-device attribution of the view+embed stage (r4).

The profiler hangs through the axon tunnel (PERF.md r3), so this times the
view-sampling + patchify-embed subgraph in isolation with a K-iteration
on-device loop (data-dependent chain -> the tunnel dispatch cost amortizes
away), for each variant:

  views_bf16        fused view kernel, bf16 out, no embed
  views_i8          fused view kernel, int8 out, no embed
  conv              bf16 views + stride-32 conv embed (r3 default)
  conv_i8           int8 views + s8xs8->s32 conv embed
  tower             the int8 fused tower alone on fixed tokens (context)

Usage: python scripts/exp_view_embed.py [batch] (default 128)
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jcf_tpu.models import VIT_B_32, init_clip_params
from jcf_tpu.models.clip import fold_normalize_into_embed
from jcf_tpu.ops.view_kernel import fused_views_nchw, sample_view_centers

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
V, SRC, OUT, P, G, E = 8, 256, 224, 32, 7, 768
K = 8  # on-device iterations per timing


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3  # ms per inner iteration


def chain(body):
    """K-iteration on-device loop with a data dependency through the
    source images (adds a tiny scalar derived from the previous result)."""

    def run(images, cy, cx, inv):
        def step(i, carry):
            img, acc = carry
            r = body(img, cy, cx, inv)
            bump = (r.astype(jnp.float32).ravel()[0] * 1e-12).astype(images.dtype)
            return (img + bump, acc + bump.astype(jnp.float32))

        img, acc = jax.lax.fori_loop(0, K, step, (images, jnp.float32(0)))
        return acc

    return jax.jit(run)


def main():
    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, 3, SRC, SRC)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    cy, cx, inv = jax.jit(
        lambda k: sample_view_centers(k, B, V, (SRC, SRC), OUT)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready((cy, cx, inv))

    w4_f32, fold_bias = fold_normalize_into_embed(
        params["visual"]["patch_embed"]["w"], (0.48, 0.46, 0.41),
        (0.27, 0.26, 0.28), P, dtype=jnp.float32,
    )
    w4 = w4_f32.astype(jnp.bfloat16)
    kern = jnp.transpose(w4, (3, 0, 1, 2))
    kern_f = jnp.transpose(w4_f32, (3, 0, 1, 2))
    flat = kern_f.reshape(E, -1)
    kscale = jnp.maximum(jnp.max(jnp.abs(flat), axis=1) / 127.0, 1e-8)
    k_q = (
        jnp.clip(jnp.round(flat / kscale[:, None]), -127, 127)
        .astype(jnp.int8)
        .reshape(kern_f.shape)
    )
    k_sc = (kscale / 254.0).astype(jnp.float32)
    b_i8 = fold_bias + jnp.sum(flat, axis=1) * (127.0 / 254.0)

    def views_bf16(img, cy, cx, inv):
        return fused_views_nchw(img, cy, cx, inv, OUT)

    def views_i8(img, cy, cx, inv):
        return fused_views_nchw(img, cy, cx, inv, OUT, quantize=True)

    def conv_bf16(img, cy, cx, inv):
        v = fused_views_nchw(img, cy, cx, inv, OUT)
        return (
            jax.lax.conv_general_dilated(
                v.reshape(B * V, 3, OUT, OUT), kern, (P, P), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NHWC"),
                preferred_element_type=jnp.float32,
            ).reshape(B * V, G * G, E)
            + fold_bias
        ).astype(jnp.bfloat16)

    def conv_i8(img, cy, cx, inv):
        v = fused_views_nchw(img, cy, cx, inv, OUT, quantize=True)
        acc = jax.lax.conv_general_dilated(
            v.reshape(B * V, 3, OUT, OUT), k_q, (P, P), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NHWC"),
            preferred_element_type=jnp.int32,
        ).reshape(B * V, G * G, E)
        return (acc.astype(jnp.float32) * k_sc + b_i8).astype(jnp.bfloat16)

    for name, body in (
        ("views_bf16", views_bf16),
        ("views_i8", views_i8),
        ("conv_bf16", conv_bf16),
        ("conv_i8", conv_i8),
    ):
        ms = timed(chain(body), images, cy, cx, inv)
        print(f"{name:12s} {ms:7.3f} ms/iter (B={B}, V={V})", flush=True)


if __name__ == "__main__":
    main()
