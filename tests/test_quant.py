"""Int8 W8A8 path tests: quantized linear error bounds and full-tower
agreement with the float path."""

import numpy as np

import jax
import jax.numpy as jnp

from jcf_tpu.models import CLIPConfig, init_clip_params, encode_image, encode_text
from jcf_tpu.ops.quant import int8_linear, quantize_clip_params, quantize_weight

CFG = CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=8, context_length=16, vocab_size=120, text_width=128,
    text_heads=2, text_layers=2,
)

RNG = np.random.default_rng(23)


def test_int8_linear_close_to_float():
    x = RNG.standard_normal((16, 64)).astype(np.float32)
    w = (RNG.standard_normal((32, 64)) * 0.1).astype(np.float32)
    b = RNG.standard_normal(32).astype(np.float32)
    q = quantize_weight(jnp.asarray(w), jnp.asarray(b))
    out_q = np.asarray(int8_linear(jnp.asarray(x), q))
    out_f = x @ w.T + b
    rel = np.abs(out_q - out_f) / (np.abs(out_f).mean() + 1e-6)
    assert rel.mean() < 0.02


def test_quantized_tower_tracks_float():
    params = init_clip_params(0, CFG)
    quant = quantize_clip_params(params)
    images = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32))
    f = np.asarray(encode_image(params, CFG, images, impl="xla"))
    q = np.asarray(encode_image(params, CFG, images, impl="xla", quant=quant["visual"]))
    cos = (f * q).sum(-1) / (np.linalg.norm(f, axis=-1) * np.linalg.norm(q, axis=-1))
    assert (cos > 0.98).all(), cos

    ids = np.zeros((2, 16), np.int32)
    ids[:, 0] = 118
    ids[:, 1:3] = [[5, 119], [40, 119]]
    ft = np.asarray(encode_text(params, CFG, jnp.asarray(ids), impl="xla"))
    qt = np.asarray(encode_text(params, CFG, jnp.asarray(ids), impl="xla", quant=quant["text"]))
    cos_t = (ft * qt).sum(-1) / (np.linalg.norm(ft, axis=-1) * np.linalg.norm(qt, axis=-1))
    assert (cos_t > 0.98).all(), cos_t


def test_int8_text_classifier_tracks_float():
    """Quantized text tower through the classifier builder: int8 W8A8
    class weights stay rankings-equivalent to the f32 path (VERDICT r1
    #10 — the text tower ships with the same certificate scheme as
    vision)."""
    from jcf_tpu.tta.classifier import build_classifier_weights

    params = init_clip_params(5, CFG)
    qp = quantize_clip_params(params)["text"]
    templates = {i: [f"a photo of a thing {i}", f"art of {i}"] for i in range(6)}
    w_f = np.asarray(build_classifier_weights(params, CFG, templates, impl="xla"))
    w_q = np.asarray(
        build_classifier_weights(params, CFG, templates, impl="xla", quant=qp)
    )
    cos = np.sum(w_f * w_q, axis=-1)  # rows are L2-normalized
    assert cos.min() > 0.99, cos


def test_static_act_quant_tracks_dynamic():
    """Calibrated static activation scales (fold=True + act_scales) track
    the dynamic-quant fused tower and the float tower (interpret mode)."""
    from jcf_tpu.models.clip import vision_ln_z_amax
    from jcf_tpu.models import CLIPConfig
    from jcf_tpu.ops.block_kernel import run_fused_tower

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=120,
        text_width=128, text_heads=2, text_layers=2,
    )
    rng = np.random.default_rng(9)
    params = init_clip_params(11, cfg)
    images = jnp.asarray(rng.standard_normal((4, 3, 32, 32)).astype(np.float32))
    amax = np.asarray(vision_ln_z_amax(params, cfg, images))
    # columns: ln1-z, ln2-z, attention ctx, post-GELU hidden
    assert amax.shape == (2, 4) and (amax > 0).all()

    heads = {"visual": 2, "text": 2}
    q_dyn = quantize_clip_params(params, fold=True, heads=heads)
    q_static = quantize_clip_params(
        params, fold=True, heads=heads, act_scales={"visual": amax}
    )
    assert "ln_inv" in q_static["visual"]["attn"]
    assert "ctx_inv" in q_static["visual"]["attn"]
    assert "h_inv" in q_static["visual"]["mlp"]

    x = jnp.asarray(rng.standard_normal((4, 17, 64)).astype(np.float32))
    dyn = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None,
        quant=q_dyn["visual"], quant_folded=True, interpret=True))
    # static scales calibrated on DIFFERENT data than x -> clipping is
    # possible but rare within the margin; rankings-level agreement
    stat = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None,
        quant=q_static["visual"], quant_folded=True, interpret=True))
    cos = ((dyn * stat).sum(-1) / (
        np.linalg.norm(dyn, axis=-1) * np.linalg.norm(stat, axis=-1) + 1e-9
    )).min()
    assert cos > 0.99, cos
