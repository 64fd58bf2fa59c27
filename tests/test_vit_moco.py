"""MoCo/timm ViT tests: forward shapes, sincos table, timm loader."""

import numpy as np

import jax.numpy as jnp

from jcf_tpu.models.vit_moco import (
    ViTConfig,
    init_vit_params,
    sincos_2d_pos_embed,
    vit_features,
    vit_params_from_timm_state_dict,
)

CFG = ViTConfig(image_resolution=32, patch_size=8, width=64, layers=2, heads=2)
RNG = np.random.default_rng(29)


def test_sincos_table():
    pos = sincos_2d_pos_embed(64, 4)
    assert pos.shape == (17, 64)
    np.testing.assert_array_equal(pos[0], 0.0)  # CLS slot zeros
    # values bounded by sin/cos range
    assert np.abs(pos).max() <= 1.0 + 1e-6
    # distinct positions get distinct embeddings
    assert np.abs(pos[1] - pos[2]).max() > 1e-3


def test_forward_and_gelu_variant():
    params = init_vit_params(0, CFG)
    x = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32))
    feats = vit_features(params, CFG, x, impl="xla")
    assert feats.shape == (2, 64)
    assert np.isfinite(np.asarray(feats)).all()


def test_timm_loader_roundtrip():
    params = init_vit_params(1, CFG)
    # build a timm-style flat dict from the tree and re-load it
    sd = {
        "cls_token": np.asarray(params["cls_token"]).reshape(1, 1, -1),
        "pos_embed": np.asarray(params["pos_embed"])[None],
        "patch_embed.proj.weight": np.asarray(params["patch_embed"]["w"]).reshape(64, 3, 8, 8),
        "patch_embed.proj.bias": np.asarray(params["patch_embed"]["b"]),
        "norm.weight": np.asarray(params["norm"]["scale"]),
        "norm.bias": np.asarray(params["norm"]["bias"]),
    }
    names = {
        "norm1.weight": ("ln_1", "scale"), "norm1.bias": ("ln_1", "bias"),
        "attn.qkv.weight": ("attn", "w_qkv"), "attn.qkv.bias": ("attn", "b_qkv"),
        "attn.proj.weight": ("attn", "w_out"), "attn.proj.bias": ("attn", "b_out"),
        "norm2.weight": ("ln_2", "scale"), "norm2.bias": ("ln_2", "bias"),
    }
    for i in range(2):
        for suffix, (a, b) in names.items():
            sd[f"blocks.{i}.{suffix}"] = np.asarray(params["blocks"][a][b])[i]
        sd[f"blocks.{i}.mlp.fc1.weight"] = np.asarray(params["blocks"]["mlp"]["c_fc"]["w"])[i]
        sd[f"blocks.{i}.mlp.fc1.bias"] = np.asarray(params["blocks"]["mlp"]["c_fc"]["b"])[i]
        sd[f"blocks.{i}.mlp.fc2.weight"] = np.asarray(params["blocks"]["mlp"]["c_proj"]["w"])[i]
        sd[f"blocks.{i}.mlp.fc2.bias"] = np.asarray(params["blocks"]["mlp"]["c_proj"]["b"])[i]

    params2 = vit_params_from_timm_state_dict(sd, CFG)
    x = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32))
    f1 = np.asarray(vit_features(params, CFG, x, impl="xla"))
    f2 = np.asarray(vit_features(params2, CFG, x, impl="xla"))
    np.testing.assert_allclose(f1, f2, atol=1e-6)
