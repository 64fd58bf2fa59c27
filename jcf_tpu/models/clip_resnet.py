"""CLIP with a ModifiedResNet vision tower (the reference ``model_res.py``
path, selected when a checkpoint lacks ``visual.proj`` —
``jclip/model.py:236`` / ``build_model_res``).

Text tower and tokenizer are shared with the ViT CLIP; only the image
encoder differs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jcf_tpu.models.clip import CLIPConfig, encode_text as _encode_text
from jcf_tpu.models.resnet import (
    modified_resnet_config_from_state_dict,
    modified_resnet_features,
    modified_resnet_params_from_state_dict,
)


@dataclasses.dataclass(frozen=True)
class CLIPResNetConfig:
    embed_dim: int
    image_resolution: int
    vision_layers: Tuple[int, int, int, int]
    vision_width: int
    attnpool_heads: int
    text: CLIPConfig  # text-tower dimensions (vision fields unused)


def config_from_state_dict_res(sd: Dict[str, np.ndarray]) -> CLIPResNetConfig:
    res = modified_resnet_config_from_state_dict(sd)
    text = CLIPConfig(
        embed_dim=res["embed_dim"],
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        text_width=sd["ln_final.weight"].shape[0],
        text_heads=sd["ln_final.weight"].shape[0] // 64,
        text_layers=len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}),
    )
    return CLIPResNetConfig(
        embed_dim=res["embed_dim"],
        image_resolution=res["image_resolution"],
        vision_layers=res["layers"],
        vision_width=res["width"],
        attnpool_heads=res["heads"],
        text=text,
    )


def params_from_state_dict_res(sd: Dict[str, np.ndarray], cfg: CLIPResNetConfig) -> dict:
    from jcf_tpu.models.loader import _stack_blocks

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]).astype(np.float32))

    text = {
        "token_embedding": arr("token_embedding.weight"),
        "positional_embedding": arr("positional_embedding"),
        "blocks": _stack_blocks(sd, "transformer.resblocks", cfg.text.text_layers),
        "ln_final": {"scale": arr("ln_final.weight"), "bias": arr("ln_final.bias")},
        "text_projection": arr("text_projection"),
    }
    return {
        "visual": modified_resnet_params_from_state_dict(sd, cfg.vision_layers),
        "text": text,
        "logit_scale": jnp.asarray(np.float32(sd["logit_scale"])).reshape(()),
    }


def load_clip_resnet(sd: Dict[str, np.ndarray]):
    cfg = config_from_state_dict_res(sd)
    return params_from_state_dict_res(sd, cfg), cfg


def encode_image(params: dict, cfg: CLIPResNetConfig, images: jax.Array, *, dtype=jnp.float32) -> jax.Array:
    return modified_resnet_features(params["visual"], images, cfg.attnpool_heads, dtype=dtype)


def encode_text(params: dict, cfg: CLIPResNetConfig, token_ids: jax.Array, *, dtype=jnp.float32, impl=None) -> jax.Array:
    return _encode_text(params, cfg.text, token_ids, dtype=dtype, impl=impl)
