"""Checkpoint ingestion: OpenAI/Jittor CLIP state dicts -> stacked pytrees.

Mirrors the reference's shape-inference rules (``build_model``,
``/root/reference/jclip/model.py:235-274``): every architectural dimension
is derived from tensor shapes in the flat state dict, so any ViT CLIP
checkpoint (B/32, B/16, L/14) loads without explicit configuration. The
ResNet path (state dicts without ``visual.proj``) is handled by
``jcf_tpu.models.resnet``.

Accepted file formats: pickle (the ``jt.save``/``pth_to_pkl.py`` output the
reference ships), torch ``.pt``/``.pth`` archives, and TorchScript archives
(the original OpenAI distribution).
"""

from __future__ import annotations

import pickle
from typing import Dict

import jax.numpy as jnp
import numpy as np

from jcf_tpu.models.clip import CLIPConfig

_META_KEYS = ("input_resolution", "context_length", "vocab_size")


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensors (incl. inside pickles written with torch present)
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().cpu().float().numpy() if v.dtype.is_floating_point else v.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(v)


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a flat name->array state dict from pkl / pt / TorchScript."""
    state = None
    try:
        with open(path, "rb") as f:
            state = pickle.load(f)
    except Exception:
        pass
    if state is None:
        import torch

        try:
            state = torch.load(path, map_location="cpu", weights_only=False)
        except Exception:
            state = torch.jit.load(path, map_location="cpu").state_dict()
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    return {k: _to_numpy(v) for k, v in state.items() if k not in _META_KEYS}


def is_vit_state_dict(sd: Dict[str, np.ndarray]) -> bool:
    return "visual.proj" in sd


def _layer_count(sd: Dict[str, np.ndarray], prefix: str) -> int:
    return len({k.split(".")[2] for k in sd if k.startswith(prefix)})


def config_from_state_dict(sd: Dict[str, np.ndarray], **prompt_kwargs) -> CLIPConfig:
    if not is_vit_state_dict(sd):
        raise ValueError(
            "state dict has no visual.proj: use jcf_tpu.models.resnet for "
            "ModifiedResNet checkpoints"
        )
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len(
        [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
    )
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid_size = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    vpt = sd.get("visual.VPT")
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=vision_patch_size * grid_size,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        text_width=sd["ln_final.weight"].shape[0],
        text_heads=sd["ln_final.weight"].shape[0] // 64,
        text_layers=_layer_count(sd, "transformer.resblocks"),
        vision_prompt_tokens=(vpt.shape[0] if vpt is not None else 0),
        **prompt_kwargs,
    )


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, layers: int) -> dict:
    def stk(suffix):
        return jnp.asarray(
            np.stack([sd[f"{prefix}.{i}.{suffix}"] for i in range(layers)]).astype(
                np.float32
            )
        )

    return {
        "ln_1": {"scale": stk("ln_1.weight"), "bias": stk("ln_1.bias")},
        "attn": {
            "w_qkv": stk("attn.in_proj_weight"),
            "b_qkv": stk("attn.in_proj_bias"),
            "w_out": stk("attn.out_proj.weight"),
            "b_out": stk("attn.out_proj.bias"),
        },
        "ln_2": {"scale": stk("ln_2.weight"), "bias": stk("ln_2.bias")},
        "mlp": {
            "c_fc": {"w": stk("mlp.c_fc.weight"), "b": stk("mlp.c_fc.bias")},
            "c_proj": {"w": stk("mlp.c_proj.weight"), "b": stk("mlp.c_proj.bias")},
        },
    }


def params_from_state_dict(sd: Dict[str, np.ndarray], cfg: CLIPConfig) -> dict:
    def arr(name):
        return jnp.asarray(sd[name].astype(np.float32))

    conv1 = sd["visual.conv1.weight"].astype(np.float32)  # [W, 3, p, p]
    visual = {
        "patch_embed": {"w": jnp.asarray(conv1.reshape(conv1.shape[0], -1))},
        "class_embedding": arr("visual.class_embedding"),
        "positional_embedding": arr("visual.positional_embedding"),
        "ln_pre": {"scale": arr("visual.ln_pre.weight"), "bias": arr("visual.ln_pre.bias")},
        "blocks": _stack_blocks(sd, "visual.transformer.resblocks", cfg.vision_layers),
        "ln_post": {"scale": arr("visual.ln_post.weight"), "bias": arr("visual.ln_post.bias")},
        "proj": arr("visual.proj"),
    }
    if "visual.VPT" in sd:
        visual["vpt"] = arr("visual.VPT")

    text = {
        "token_embedding": arr("token_embedding.weight"),
        "positional_embedding": arr("positional_embedding"),
        "blocks": _stack_blocks(sd, "transformer.resblocks", cfg.text_layers),
        "ln_final": {"scale": arr("ln_final.weight"), "bias": arr("ln_final.bias")},
        "text_projection": arr("text_projection"),
    }

    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(np.float32(sd["logit_scale"])).reshape(()),
    }


def state_dict_from_params(params: dict, cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Inverse of params_from_state_dict (flat OpenAI naming), for saving
    checkpoints interoperable with the reference's pkl format."""
    sd: Dict[str, np.ndarray] = {}
    v, t = params["visual"], params["text"]
    p = cfg.vision_patch_size
    sd["visual.conv1.weight"] = np.asarray(v["patch_embed"]["w"]).reshape(
        cfg.vision_width, 3, p, p
    )
    sd["visual.class_embedding"] = np.asarray(v["class_embedding"])
    sd["visual.positional_embedding"] = np.asarray(v["positional_embedding"])
    sd["visual.ln_pre.weight"] = np.asarray(v["ln_pre"]["scale"])
    sd["visual.ln_pre.bias"] = np.asarray(v["ln_pre"]["bias"])
    sd["visual.ln_post.weight"] = np.asarray(v["ln_post"]["scale"])
    sd["visual.ln_post.bias"] = np.asarray(v["ln_post"]["bias"])
    sd["visual.proj"] = np.asarray(v["proj"])
    if "vpt" in v:
        sd["visual.VPT"] = np.asarray(v["vpt"])

    def unstack(blocks, prefix):
        names = {
            "ln_1.weight": blocks["ln_1"]["scale"],
            "ln_1.bias": blocks["ln_1"]["bias"],
            "attn.in_proj_weight": blocks["attn"]["w_qkv"],
            "attn.in_proj_bias": blocks["attn"]["b_qkv"],
            "attn.out_proj.weight": blocks["attn"]["w_out"],
            "attn.out_proj.bias": blocks["attn"]["b_out"],
            "ln_2.weight": blocks["ln_2"]["scale"],
            "ln_2.bias": blocks["ln_2"]["bias"],
            "mlp.c_fc.weight": blocks["mlp"]["c_fc"]["w"],
            "mlp.c_fc.bias": blocks["mlp"]["c_fc"]["b"],
            "mlp.c_proj.weight": blocks["mlp"]["c_proj"]["w"],
            "mlp.c_proj.bias": blocks["mlp"]["c_proj"]["b"],
        }
        for suffix, stacked in names.items():
            arrs = np.asarray(stacked)
            for i in range(arrs.shape[0]):
                sd[f"{prefix}.{i}.{suffix}"] = arrs[i]

    unstack(v["blocks"], "visual.transformer.resblocks")
    unstack(t["blocks"], "transformer.resblocks")

    sd["token_embedding.weight"] = np.asarray(t["token_embedding"])
    sd["positional_embedding"] = np.asarray(t["positional_embedding"])
    sd["ln_final.weight"] = np.asarray(t["ln_final"]["scale"])
    sd["ln_final.bias"] = np.asarray(t["ln_final"]["bias"])
    sd["text_projection"] = np.asarray(t["text_projection"])
    sd["logit_scale"] = np.asarray(params["logit_scale"])
    return sd


def load_clip(path: str, **prompt_kwargs):
    """(params, config) from a checkpoint file — the ``clip.load`` /
    ``clip1.load_vlp`` equivalent (``jclip/clip.py:170-187``)."""
    sd = load_state_dict_file(path)
    cfg = config_from_state_dict(sd, **prompt_kwargs)
    return params_from_state_dict(sd, cfg), cfg
