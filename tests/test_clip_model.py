"""CLIP model numerics: scan-stacked towers vs an independent per-layer
numpy implementation, patchify vs torch conv2d, loader round-trips."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from jcf_tpu.models import (
    CLIPConfig,
    init_clip_params,
    encode_image,
    encode_text,
    clip_forward,
    config_from_state_dict,
    params_from_state_dict,
)
from jcf_tpu.models.loader import state_dict_from_params

TINY = CLIPConfig(
    embed_dim=48,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=8,
    context_length=16,
    vocab_size=120,
    text_width=128,  # width/64 head-dim rule must hold for loader round-trip
    text_heads=2,
    text_layers=2,
)

RNG = np.random.default_rng(7)


def np_layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def np_block(x, p, i, n_heads, mask=None):
    """One residual attention block, independent numpy implementation."""

    def g(*names):
        node = p
        for n in names:
            node = node[n]
        return np.asarray(node)[i].astype(np.float64)

    b, s, e = x.shape
    d = e // n_heads
    h = np_layer_norm(x, g("ln_1", "scale"), g("ln_1", "bias"))
    qkv = h @ g("attn", "w_qkv").T + g("attn", "b_qkv")
    q, k, v = qkv[..., :e], qkv[..., e : 2 * e], qkv[..., 2 * e :]

    def split(t):
        return t.reshape(b, s, n_heads, d).transpose(0, 2, 1, 3)

    q, k, v = map(split, (q, k, v))
    scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(d)
    if mask is not None:
        scores = scores + mask
    o = np_softmax(scores) @ v
    o = o.transpose(0, 2, 1, 3).reshape(b, s, e)
    x = x + (o @ g("attn", "w_out").T + g("attn", "b_out"))

    h = np_layer_norm(x, g("ln_2", "scale"), g("ln_2", "bias"))
    h = h @ g("mlp", "c_fc", "w").T + g("mlp", "c_fc", "b")
    h = h / (1 + np.exp(-1.702 * h))
    h = h @ g("mlp", "c_proj", "w").T + g("mlp", "c_proj", "b")
    return x + h


def np_encode_image(params, cfg, images):
    v = params["visual"]
    p = cfg.vision_patch_size
    b = images.shape[0]
    g = cfg.grid_size
    x = images.reshape(b, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, -1)
    x = x.astype(np.float64) @ np.asarray(v["patch_embed"]["w"]).T.astype(np.float64)
    cls = np.broadcast_to(np.asarray(v["class_embedding"]), (b, 1, x.shape[-1]))
    x = np.concatenate([cls, x], axis=1) + np.asarray(v["positional_embedding"])
    x = np_layer_norm(x, np.asarray(v["ln_pre"]["scale"]), np.asarray(v["ln_pre"]["bias"]))
    for i in range(cfg.vision_layers):
        x = np_block(x, v["blocks"], i, cfg.vision_heads)
    x = np_layer_norm(x[:, 0], np.asarray(v["ln_post"]["scale"]), np.asarray(v["ln_post"]["bias"]))
    return x @ np.asarray(v["proj"]).astype(np.float64)


def np_encode_text(params, cfg, ids):
    t = params["text"]
    x = np.asarray(t["token_embedding"])[ids].astype(np.float64)
    x = x + np.asarray(t["positional_embedding"])
    mask = np.triu(np.full((cfg.context_length, cfg.context_length), -np.inf), k=1)
    for i in range(cfg.text_layers):
        x = np_block(x, t["blocks"], i, cfg.text_heads, mask)
    x = np_layer_norm(x, np.asarray(t["ln_final"]["scale"]), np.asarray(t["ln_final"]["bias"]))
    x = x[np.arange(x.shape[0]), ids.argmax(-1)]
    return x @ np.asarray(t["text_projection"]).astype(np.float64)


@pytest.fixture(scope="module")
def tiny_params():
    return init_clip_params(0, TINY)


def test_encode_image_matches_numpy(tiny_params):
    images = RNG.standard_normal((3, 3, 32, 32)).astype(np.float32)
    ours = np.asarray(encode_image(tiny_params, TINY, jnp.asarray(images), impl="xla"))
    ref = np_encode_image(tiny_params, TINY, images)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_encode_text_matches_numpy(tiny_params):
    ids = np.zeros((2, 16), dtype=np.int32)
    ids[0, :5] = [118, 5, 9, 3, 119]  # SOT-ish ... EOT-ish (max id last)
    ids[1, :3] = [118, 40, 119]
    ours = np.asarray(encode_text(tiny_params, TINY, jnp.asarray(ids), impl="xla"))
    ref = np_encode_text(tiny_params, TINY, ids)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_patchify_matches_torch_conv(tiny_params):
    import torch
    import torch.nn.functional as F

    images = RNG.standard_normal((2, 3, 32, 32)).astype(np.float32)
    w = np.asarray(tiny_params["visual"]["patch_embed"]["w"])  # [W, 3pp]
    w4d = torch.from_numpy(w.reshape(64, 3, 8, 8))
    conv = F.conv2d(torch.from_numpy(images), w4d, stride=8)  # [B, W, g, g]
    conv = conv.reshape(2, 64, -1).transpose(1, 2).numpy()  # [B, G², W]

    from jcf_tpu.models.clip import _patchify
    from jcf_tpu.ops.layers import linear

    patches = _patchify(jnp.asarray(images), 8)
    ours = np.asarray(linear(patches, jnp.asarray(w)))
    np.testing.assert_allclose(ours, conv, atol=1e-4)


def test_clip_forward_shapes(tiny_params):
    images = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32))
    ids = np.zeros((5, 16), dtype=np.int32)
    ids[:, 0] = 118
    ids[:, 1] = 119
    li, lt = clip_forward(tiny_params, TINY, images, jnp.asarray(ids), impl="xla")
    assert li.shape == (2, 5)
    assert lt.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-5)


def test_state_dict_roundtrip(tiny_params):
    sd = state_dict_from_params(tiny_params, TINY)
    cfg2 = config_from_state_dict(sd)
    assert cfg2 == TINY
    params2 = params_from_state_dict(sd, cfg2)

    import jax

    leaves1 = jax.tree_util.tree_leaves_with_path(tiny_params)
    leaves2 = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(params2)}
    for k, v in leaves1:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(leaves2[str(k)]), err_msg=str(k))


def test_ivlp_prompted_tower():
    cfg = CLIPConfig(
        embed_dim=48, image_resolution=32, vision_layers=3, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=120, text_width=128,
        text_heads=2, text_layers=3, vision_prompt_tokens=4, vision_prompt_depth=3,
    )
    params = init_clip_params(1, cfg)
    assert params["visual"]["vpt"].shape == (4, 64)
    assert params["visual"]["vpt_deep"].shape == (2, 4, 64)
    images = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32))
    feats = encode_image(params, cfg, images, impl="xla")
    assert feats.shape == (2, 48)
    assert np.isfinite(np.asarray(feats)).all()

    # deep prompts replace trailing tokens in layers 1..depth-1: zeroing them
    # must change the output vs. the vanilla-deep run
    params2 = dict(params)
    params2["visual"] = dict(params["visual"])
    del params2["visual"]["vpt_deep"]
    feats2 = encode_image(params2, cfg, images, impl="xla")
    assert np.abs(np.asarray(feats) - np.asarray(feats2)).max() > 1e-6


def test_bf16_path(tiny_params):
    images = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32))
    f32 = np.asarray(encode_image(tiny_params, TINY, images, impl="xla"))
    bf = np.asarray(
        encode_image(tiny_params, TINY, images, dtype=jnp.bfloat16, impl="xla").astype(jnp.float32)
    )
    # bf16 tower should track f32 closely at tiny scale
    cos = (f32 * bf).sum(-1) / (np.linalg.norm(f32, axis=-1) * np.linalg.norm(bf, axis=-1))
    assert (cos > 0.99).all()
