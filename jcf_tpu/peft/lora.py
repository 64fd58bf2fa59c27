"""LoRA as a parameter-tree transform (no module surgery).

Reference semantics (``/root/reference/ood.py:185-548``):

- rank-r factors per attention projection; **scaling = alpha / sqrt(r)**
  (the reference's sqrt variant, ``ood.py:197``)
- A ~ kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
  B = 0 (``ood.py:209-213``)
- applied to projections named in ``params`` (default q,k,v) at layer
  indices selected by position tables (``ood.py:27-63,516-548``), on the
  text and/or vision encoder
- inference: merged weights ``W + scaling * B@A`` (``ood.py:218-235``);
  training: decomposed ``Wx + scaling * drop(x) @ A^T B^T`` with dropout on
  the LoRA branch only (``ood.py:296-306``)

TPU-native layout: factors are stacked over layers to ride the same
``lax.scan`` as the model blocks — ``a_qkv [L, 3, r, W]``, ``b_qkv
[L, 3, W, r]`` (projection order q,k,v) and optional ``a_out/b_out`` for
the output projection. Disabled layers/projections are zeroed by **static
masks** derived from the spec, so no gradient flows into them.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Layer-position tables (``ood.py:27-63``)
INDEX_POSITIONS_TEXT = {
    "top1": [11],
    "top2": [10, 11],
    "top3": [9, 10, 11],
    "bottom": [0, 1, 2, 3],
    "mid": [4, 5, 6, 7],
    "up": [8, 9, 10, 11],
    "half-up": [6, 7, 8, 9, 10, 11],
    "half-bottom": [0, 1, 2, 3, 4, 5],
    "all": list(range(12)),
}

INDEX_POSITIONS_VISION = {
    "ViT-B/16": {
        "top": [11],
        "top3": [9, 10, 11],
        "bottom": [0, 1, 2, 3],
        "mid": [4, 5, 6, 7],
        "up": [8, 9, 10, 11],
        "half-up": [6, 7, 8, 9, 10, 11],
        "half-bottom": [0, 1, 2, 3, 4, 5],
        "all": list(range(12)),
    },
    "ViT-B/32": {
        "bottom": [0, 1, 2, 3],
        "mid": [4, 5, 6, 7],
        "up": [8, 9, 10, 11],
        "half-up": [6, 7, 8, 9, 10, 11],
        "half-bottom": [0, 1, 2, 3, 4, 5],
        "all": list(range(12)),
    },
    "ViT-L/14": {
        "bottom": [0, 1, 2, 3],
        "mid": [4, 5, 6, 7],
        "up": [8, 9, 10, 11],
        "half-up": [6, 7, 8, 9, 10, 11],
        "half-bottom": [0, 1, 2, 3, 4, 5],
        "all": list(range(21)),
    },
}

_PROJ_ORDER = ("q", "k", "v")


@dataclasses.dataclass(frozen=True)
class LoraSpec:
    """Static LoRA configuration (the reference's argparse LoRA flags,
    ``ood.py:698-706``)."""

    r: int = 4
    alpha: float = 1.0
    dropout_rate: float = 0.25
    params: Tuple[str, ...] = ("q", "k", "v")
    encoder: str = "both"  # "text" | "vision" | "both"
    position: str = "all"
    backbone: str = "ViT-B/32"

    @property
    def scaling(self) -> float:
        return self.alpha / math.sqrt(self.r)

    def text_indices(self, n_layers: int):
        if self.encoder not in ("text", "both"):
            return []
        return [i for i in INDEX_POSITIONS_TEXT[self.position] if i < n_layers]

    def vision_indices(self, n_layers: int):
        if self.encoder not in ("vision", "both"):
            return []
        return [i for i in INDEX_POSITIONS_VISION[self.backbone][self.position] if i < n_layers]


def lora_layer_masks(spec: LoraSpec, n_text: int, n_vision: int):
    """Static (layer, projection) masks. Returns dict with f32 numpy arrays
    — constants under jit, so masked work folds away."""
    proj = np.array([1.0 if p in spec.params else 0.0 for p in _PROJ_ORDER], np.float32)
    text = np.zeros((n_text,), np.float32)
    text[spec.text_indices(n_text)] = 1.0
    vision = np.zeros((n_vision,), np.float32)
    vision[spec.vision_indices(n_vision)] = 1.0
    return {
        "text": text,
        "vision": vision,
        "proj": proj,
        "out": 1.0 if "o" in spec.params else 0.0,
    }


def _init_tower(rng: np.random.Generator, n_layers: int, width: int, spec: LoraSpec) -> dict:
    r = spec.r
    bound = 1.0 / math.sqrt(width)  # kaiming-uniform(a=sqrt(5)) on [r, W]
    a_qkv = rng.uniform(-bound, bound, size=(n_layers, 3, r, width)).astype(np.float32)
    tower = {
        "a_qkv": jnp.asarray(a_qkv),
        "b_qkv": jnp.zeros((n_layers, 3, width, r), jnp.float32),
    }
    if "o" in spec.params:
        a_out = rng.uniform(-bound, bound, size=(n_layers, r, width)).astype(np.float32)
        tower["a_out"] = jnp.asarray(a_out)
        tower["b_out"] = jnp.zeros((n_layers, width, r), jnp.float32)
    return tower


def init_lora_params(seed: int, spec: LoraSpec, n_text: int, text_width: int,
                     n_vision: int, vision_width: int) -> dict:
    """Fresh LoRA factors for both towers (disabled slices still allocated;
    static masks keep them inert)."""
    rng = np.random.default_rng(seed)
    out = {}
    if spec.encoder in ("text", "both"):
        out["text"] = _init_tower(rng, n_text, text_width, spec)
    if spec.encoder in ("vision", "both"):
        out["vision"] = _init_tower(rng, n_vision, vision_width, spec)
    return out


def _merged_qkv_delta(tower: dict, spec: LoraSpec, layer_mask: np.ndarray,
                      proj_mask: np.ndarray) -> jax.Array:
    """[L, 3W, W] additive delta for the packed qkv weight."""
    # [L,3,W,r] @ [L,3,r,W] -> [L,3,W,W]
    delta = jnp.einsum("lpwr,lprv->lpwv", tower["b_qkv"], tower["a_qkv"])
    delta = delta * spec.scaling * layer_mask[:, None, None, None] * proj_mask[None, :, None, None]
    L, _, W, _ = delta.shape
    return delta.reshape(L, 3 * W, W)


def merge_lora_params(params: dict, lora: dict, spec: LoraSpec) -> dict:
    """Inference-time merge: returns model params with
    ``W_eff = W + scaling * B@A`` folded into the packed qkv (and output)
    projection weights. Zero runtime overhead afterwards."""
    masks = lora_layer_masks(
        spec,
        params["text"]["blocks"]["attn"]["w_qkv"].shape[0],
        params["visual"]["blocks"]["attn"]["w_qkv"].shape[0],
    )
    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy

    for tower_name, mask_key in (("text", "text"), ("visual", "vision")):
        if mask_key not in lora:
            continue
        tower_lora = lora[mask_key]
        attn = dict(new[tower_name]["blocks"]["attn"])
        attn["w_qkv"] = attn["w_qkv"] + _merged_qkv_delta(
            tower_lora, spec, masks[mask_key], masks["proj"]
        )
        if "a_out" in tower_lora and masks["out"]:
            delta_o = jnp.einsum("lwr,lrv->lwv", tower_lora["b_out"], tower_lora["a_out"])
            attn["w_out"] = attn["w_out"] + delta_o * spec.scaling * masks[mask_key][:, None, None]
        blocks = dict(new[tower_name]["blocks"])
        blocks["attn"] = attn
        tower = dict(new[tower_name])
        tower["blocks"] = blocks
        new[tower_name] = tower
    return new


def lora_qkv_adjustment(
    x: jax.Array,
    layer_lora: dict,
    spec: LoraSpec,
    layer_gate: jax.Array,
    proj_mask: jax.Array,
    dropout_rng: Optional[jax.Array],
) -> jax.Array:
    """Decomposed training-path contribution to the packed qkv output.

    x: [B, S, W]; layer_lora holds this layer's a_qkv [3, r, W] and b_qkv
    [3, W, r]. Independent dropout per projection (each reference
    LinearLoRA owns its dropout, ``ood.py:296-306``).
    Returns [B, S, 3W].
    """
    b, s, w = x.shape
    if dropout_rng is not None and spec.dropout_rate > 0:
        keep = 1.0 - spec.dropout_rate
        masks = jax.random.bernoulli(dropout_rng, keep, (3,) + x.shape)
        xin = jnp.where(masks, x[None] / keep, 0.0)  # [3, B, S, W]
    else:
        xin = jnp.broadcast_to(x[None], (3,) + x.shape)

    u = jnp.einsum("pbsw,prw->pbsr", xin.astype(jnp.float32), layer_lora["a_qkv"])
    d = jnp.einsum("pbsr,pwr->pbsw", u, layer_lora["b_qkv"])
    d = d * spec.scaling * layer_gate * proj_mask[:, None, None, None]
    # [3, B, S, W] -> [B, S, 3W]
    return jnp.moveaxis(d, 0, 2).reshape(b, s, 3 * w).astype(x.dtype)


def lora_out_adjustment(
    x: jax.Array,
    layer_lora: dict,
    spec: LoraSpec,
    layer_gate: jax.Array,
    dropout_rng: Optional[jax.Array],
) -> jax.Array:
    """Decomposed contribution of the output-projection LoRA ('o')."""
    if dropout_rng is not None and spec.dropout_rate > 0:
        keep = 1.0 - spec.dropout_rate
        rng_o = jax.random.fold_in(dropout_rng, 3)
        mask = jax.random.bernoulli(rng_o, keep, x.shape)
        xin = jnp.where(mask, x / keep, 0.0)
    else:
        xin = x
    u = jnp.einsum("bsw,rw->bsr", xin.astype(jnp.float32), layer_lora["a_out"])
    d = jnp.einsum("bsr,wr->bsw", u, layer_lora["b_out"])
    return (d * spec.scaling * layer_gate).astype(x.dtype)


def make_lora_context(
    lora: dict,
    spec: LoraSpec,
    tower: str,  # "text" | "vision"
    n_layers: int,
    rng: Optional[jax.Array] = None,
) -> Optional[dict]:
    """Per-tower context consumed by the model scan: stacked factors plus
    static masks. Returns None when LoRA does not apply to this tower."""
    if tower not in lora:
        return None
    masks_all = {
        "text": np.zeros((n_layers,), np.float32),
        "vision": np.zeros((n_layers,), np.float32),
    }
    indices = (
        spec.text_indices(n_layers) if tower == "text" else spec.vision_indices(n_layers)
    )
    if not indices:
        return None
    masks_all[tower][indices] = 1.0
    proj = np.array([1.0 if p in spec.params else 0.0 for p in _PROJ_ORDER], np.float32)
    return {
        "stacked": lora[tower],
        "gates": jnp.asarray(masks_all[tower]),
        "proj_mask": jnp.asarray(proj),
        "spec": spec,
        "rng": rng,
    }
