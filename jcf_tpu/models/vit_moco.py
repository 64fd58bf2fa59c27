"""timm-style ViT with MoCo-v3 extensions (the reference's ``vit.py``
Jittor port / ``vits.py`` torch definitions — auxiliary model family,
SURVEY.md §2.6).

Differences from the CLIP ViT tower: patch conv has a bias, MLP uses exact
GELU (not QuickGELU), blocks are timm-named, the position embedding can be
a **fixed 2D sin-cos** table (MoCo-v3, ``vits.py`` ViTMoCo), and features
are the final-norm CLS token (head == identity).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jcf_tpu.models.clip import _patchify
from jcf_tpu.ops.attention import multi_head_attention
from jcf_tpu.ops.layers import layer_norm, linear


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    sincos_pos_embed: bool = True  # MoCo-v3 fixed 2D sin-cos

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.patch_size


VIT_SMALL_MOCO = ViTConfig(patch_size=16, width=384, layers=12, heads=12)
VIT_BASE_MOCO = ViTConfig(patch_size=16, width=768, layers=12, heads=12)


def sincos_2d_pos_embed(width: int, grid: int, temperature: float = 10000.0) -> np.ndarray:
    """[1 + grid², width] fixed embedding: zeros for CLS, 2D sin-cos for
    patches (MoCo-v3 ``build_2d_sincos_position_embedding``)."""
    assert width % 4 == 0, "2D sin-cos requires width % 4 == 0"
    gw = np.arange(grid, dtype=np.float32)
    gh = np.arange(grid, dtype=np.float32)
    gw, gh = np.meshgrid(gw, gh)  # [grid, grid] each
    pos_dim = width // 4
    omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = gw.flatten()[:, None] * omega[None, :]
    out_h = gh.flatten()[:, None] * omega[None, :]
    pos = np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )  # [grid², width]
    return np.concatenate([np.zeros((1, width), np.float32), pos], axis=0)


def init_vit_params(seed: int, cfg: ViTConfig) -> dict:
    rng = np.random.default_rng(seed)
    w = cfg.width

    def trunc(shape, std=0.02):
        return jnp.asarray((rng.standard_normal(shape) * std).astype(np.float32))

    n_pos = cfg.grid_size**2 + 1
    pos = (
        jnp.asarray(sincos_2d_pos_embed(w, cfg.grid_size))
        if cfg.sincos_pos_embed
        else trunc((n_pos, w))
    )
    L = cfg.layers
    return {
        "cls_token": trunc((w,)),
        "pos_embed": pos,
        "patch_embed": {
            "w": trunc((w, 3 * cfg.patch_size**2), std=0.02),
            "b": jnp.zeros((w,), jnp.float32),
        },
        "blocks": {
            "ln_1": {"scale": jnp.ones((L, w)), "bias": jnp.zeros((L, w))},
            "attn": {
                "w_qkv": trunc((L, 3 * w, w)),
                "b_qkv": jnp.zeros((L, 3 * w), jnp.float32),
                "w_out": trunc((L, w, w)),
                "b_out": jnp.zeros((L, w), jnp.float32),
            },
            "ln_2": {"scale": jnp.ones((L, w)), "bias": jnp.zeros((L, w))},
            "mlp": {
                "c_fc": {"w": trunc((L, 4 * w, w)), "b": jnp.zeros((L, 4 * w), jnp.float32)},
                "c_proj": {"w": trunc((L, w, 4 * w)), "b": jnp.zeros((L, w), jnp.float32)},
            },
        },
        "norm": {"scale": jnp.ones(w), "bias": jnp.zeros(w)},
    }


def vit_features(
    params: dict,
    cfg: ViTConfig,
    images: jax.Array,
    *,
    dtype=jnp.float32,
    impl: Optional[str] = None,
) -> jax.Array:
    """[B, 3, H, W] -> CLS features [B, width] (head == identity)."""
    x = _patchify(images.astype(dtype), cfg.patch_size)
    x = linear(x, params["patch_embed"]["w"], params["patch_embed"]["b"])
    cls = jnp.broadcast_to(
        params["cls_token"].astype(dtype)[None, None, :], (x.shape[0], 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(dtype)

    def body(carry, bp):
        x = carry
        h = layer_norm(x, bp["ln_1"]["scale"], bp["ln_1"]["bias"])
        x = x + multi_head_attention(h, bp["attn"], cfg.heads, None, impl=impl)
        h = layer_norm(x, bp["ln_2"]["scale"], bp["ln_2"]["bias"])
        h = linear(h, bp["mlp"]["c_fc"]["w"], bp["mlp"]["c_fc"]["b"])
        h = jax.nn.gelu(h, approximate=False)  # timm exact GELU
        h = linear(h, bp["mlp"]["c_proj"]["w"], bp["mlp"]["c_proj"]["b"])
        return x + h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return layer_norm(x[:, 0], params["norm"]["scale"], params["norm"]["bias"])


def vit_params_from_timm_state_dict(sd: Dict[str, np.ndarray], cfg: ViTConfig) -> dict:
    """timm naming (cls_token, pos_embed, patch_embed.proj, blocks.{i}.*,
    norm.*) -> stacked param tree."""

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]).astype(np.float32))

    def stk(suffix):
        return jnp.asarray(
            np.stack([np.asarray(sd[f"blocks.{i}.{suffix}"]) for i in range(cfg.layers)]).astype(np.float32)
        )

    conv = np.asarray(sd["patch_embed.proj.weight"], np.float32)
    return {
        "cls_token": jnp.asarray(np.asarray(sd["cls_token"], np.float32).reshape(-1)),
        "pos_embed": jnp.asarray(np.asarray(sd["pos_embed"], np.float32).reshape(-1, cfg.width)),
        "patch_embed": {
            "w": jnp.asarray(conv.reshape(conv.shape[0], -1)),
            "b": arr("patch_embed.proj.bias"),
        },
        "blocks": {
            "ln_1": {"scale": stk("norm1.weight"), "bias": stk("norm1.bias")},
            "attn": {
                "w_qkv": stk("attn.qkv.weight"),
                "b_qkv": stk("attn.qkv.bias"),
                "w_out": stk("attn.proj.weight"),
                "b_out": stk("attn.proj.bias"),
            },
            "ln_2": {"scale": stk("norm2.weight"), "bias": stk("norm2.bias")},
            "mlp": {
                "c_fc": {"w": stk("mlp.fc1.weight"), "b": stk("mlp.fc1.bias")},
                "c_proj": {"w": stk("mlp.fc2.weight"), "b": stk("mlp.fc2.bias")},
            },
        },
        "norm": {"scale": arr("norm.weight"), "bias": arr("norm.bias")},
    }
