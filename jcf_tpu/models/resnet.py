"""ResNet towers: torchvision-style ResNet-50 (MoCo-v3 feature extractor)
and CLIP's ModifiedResNet with attention pooling.

Capability parity:
- ``load_moco`` (``/root/reference/slow_pace.py:1237-1271``): jittor
  ``resnet50`` with the ``base_encoder.`` prefix stripped from the MoCo-v3
  checkpoint and ``fc`` replaced by identity -> 2048-d features.
- ``ModifiedResNet`` (``/root/reference/jclip/model_res.py:65-170``):
  3-conv stem, avg-pool anti-aliased downsampling bottlenecks, and
  ``AttentionPool2d`` over HW+mean tokens returning token 0.

The towers run frozen in the reference (feature extractors), so BatchNorm
is inference-mode (running statistics). Convs use NCHW/OIHW layouts so
torch checkpoints map 1:1; XLA canonicalizes layouts for the TPU MXU.

Note: the reference's AttentionPool2d port double-projects (explicit
q/k/v_proj then a jittor MHA with its own in-projection,
``model_res.py:76-82``) — a latent bug on a path its pipeline never loads.
We implement the OpenAI-correct single projection.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jcf_tpu.ops.attention import fused_attention
from jcf_tpu.ops.layers import linear

_BN_EPS = 1e-5


def conv2d(x: jax.Array, w: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )


def batch_norm(x: jax.Array, p: dict) -> jax.Array:
    """Inference-mode BN over NCHW with running statistics."""
    scale = (p["weight"] / jnp.sqrt(p["running_var"] + _BN_EPS)).astype(x.dtype)
    shift = (p["bias"] - p["running_mean"] * p["weight"] / jnp.sqrt(p["running_var"] + _BN_EPS)).astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def avg_pool(x: jax.Array, window: int, stride: int) -> jax.Array:
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, window, window), (1, 1, stride, stride), "VALID"
    )
    return out / (window * window)


def max_pool(x: jax.Array, window: int, stride: int, padding: int) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 1, window, window),
        (1, 1, stride, stride),
        [(0, 0), (0, 0), (padding, padding), (padding, padding)],
    )


# ---------------------------------------------------------------------------
# torchvision-style ResNet-50 (MoCo feature extractor)
# ---------------------------------------------------------------------------

RESNET50_LAYERS = (3, 4, 6, 3)


def _tv_bottleneck(x: jax.Array, p: dict, stride: int) -> jax.Array:
    identity = x
    out = jax.nn.relu(batch_norm(conv2d(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(batch_norm(conv2d(out, p["conv2"], stride=stride, padding=1), p["bn2"]))
    out = batch_norm(conv2d(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = batch_norm(conv2d(x, p["downsample"]["conv"], stride=stride), p["downsample"]["bn"])
    return jax.nn.relu(out + identity)


def resnet50_features(params: dict, images: jax.Array, *, dtype=jnp.float32) -> jax.Array:
    """[B, 3, H, W] -> [B, 2048] pooled features (fc == identity)."""
    x = images.astype(dtype)
    x = jax.nn.relu(batch_norm(conv2d(x, params["conv1"], stride=2, padding=3), params["bn1"]))
    x = max_pool(x, 3, 2, 1)
    for stage_idx, stage in enumerate(params["layers"]):
        for block_idx, block in enumerate(stage):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            x = _tv_bottleneck(x, block, stride)
    x = jnp.mean(x, axis=(2, 3))  # global average pool
    return x


def moco_params_from_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Map a MoCo-v3 checkpoint (possibly ``base_encoder.``-prefixed, as in
    ``slow_pace.py:1244-1260``) to the resnet50_features param tree. The
    ``fc`` head is dropped (identity)."""
    flat = {}
    for k, v in sd.items():
        if k.startswith("base_encoder.") and not k.startswith("base_encoder.fc"):
            flat[k[len("base_encoder."):]] = np.asarray(v)
        elif not k.startswith("base_encoder"):
            flat[k] = np.asarray(v)
    return resnet50_params_from_flat(flat)


def _bn_tree(flat: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "weight": jnp.asarray(flat[f"{prefix}.weight"].astype(np.float32)),
        "bias": jnp.asarray(flat[f"{prefix}.bias"].astype(np.float32)),
        "running_mean": jnp.asarray(flat[f"{prefix}.running_mean"].astype(np.float32)),
        "running_var": jnp.asarray(flat[f"{prefix}.running_var"].astype(np.float32)),
    }


def resnet50_params_from_flat(flat: Dict[str, np.ndarray]) -> dict:
    params = {
        "conv1": jnp.asarray(flat["conv1.weight"].astype(np.float32)),
        "bn1": _bn_tree(flat, "bn1"),
        "layers": [],
    }
    for stage_idx, n_blocks in enumerate(RESNET50_LAYERS, start=1):
        stage: List[dict] = []
        for b in range(n_blocks):
            pre = f"layer{stage_idx}.{b}"
            block = {
                "conv1": jnp.asarray(flat[f"{pre}.conv1.weight"].astype(np.float32)),
                "bn1": _bn_tree(flat, f"{pre}.bn1"),
                "conv2": jnp.asarray(flat[f"{pre}.conv2.weight"].astype(np.float32)),
                "bn2": _bn_tree(flat, f"{pre}.bn2"),
                "conv3": jnp.asarray(flat[f"{pre}.conv3.weight"].astype(np.float32)),
                "bn3": _bn_tree(flat, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in flat:
                block["downsample"] = {
                    "conv": jnp.asarray(flat[f"{pre}.downsample.0.weight"].astype(np.float32)),
                    "bn": _bn_tree(flat, f"{pre}.downsample.1"),
                }
            stage.append(block)
        params["layers"].append(stage)
    return params


def init_resnet50_params(seed: int = 0) -> dict:
    """Random-init RN50 tree (testing / from-scratch training)."""
    rng = np.random.default_rng(seed)

    def conv(o, i, k):
        fan = i * k * k
        return jnp.asarray(
            (rng.standard_normal((o, i, k, k)) * np.sqrt(2.0 / fan)).astype(np.float32)
        )

    def bn(c):
        return {
            "weight": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "running_mean": jnp.zeros((c,), jnp.float32),
            "running_var": jnp.ones((c,), jnp.float32),
        }

    params = {"conv1": conv(64, 3, 7), "bn1": bn(64), "layers": []}
    inplanes = 64
    for stage_idx, n_blocks in enumerate(RESNET50_LAYERS):
        planes = 64 * (2**stage_idx)
        stage = []
        for b in range(n_blocks):
            block = {
                "conv1": conv(planes, inplanes, 1),
                "bn1": bn(planes),
                "conv2": conv(planes, planes, 3),
                "bn2": bn(planes),
                "conv3": conv(planes * 4, planes, 1),
                "bn3": bn(planes * 4),
            }
            if b == 0:
                block["downsample"] = {"conv": conv(planes * 4, inplanes, 1), "bn": bn(planes * 4)}
            stage.append(block)
            inplanes = planes * 4
        params["layers"].append(stage)
    return params


# ---------------------------------------------------------------------------
# CLIP ModifiedResNet (model_res.py)
# ---------------------------------------------------------------------------


def _clip_bottleneck(x: jax.Array, p: dict, stride: int) -> jax.Array:
    """CLIP's anti-aliased bottleneck: stride lives in an avgpool between
    conv2 and conv3; the shortcut is avgpool -> 1x1 conv (model_res.py:84-121)."""
    identity = x
    out = jax.nn.relu(batch_norm(conv2d(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(batch_norm(conv2d(out, p["conv2"], padding=1), p["bn2"]))
    if stride > 1:
        out = avg_pool(out, stride, stride)
    out = batch_norm(conv2d(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = x if stride == 1 else avg_pool(x, stride, stride)
        identity = batch_norm(conv2d(identity, p["downsample"]["conv"]), p["downsample"]["bn"])
    return jax.nn.relu(out + identity)


def attention_pool(params: dict, x: jax.Array, n_heads: int) -> jax.Array:
    """Attention pooling over spatial positions (model_res.py:65-82, with
    the OpenAI-correct single projection): mean token queries HW tokens."""
    b, c, h, w = x.shape
    tokens = x.reshape(b, c, h * w).transpose(0, 2, 1)  # [B, HW, C]
    tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
    tokens = tokens + params["positional_embedding"].astype(x.dtype)[None]

    q = linear(tokens[:, :1], params["q_proj"]["w"], params["q_proj"]["b"])
    k = linear(tokens, params["k_proj"]["w"], params["k_proj"]["b"])
    v = linear(tokens, params["v_proj"]["w"], params["v_proj"]["b"])

    d = c // n_heads

    def split(t):
        return t.reshape(b, t.shape[1], n_heads, d).transpose(0, 2, 1, 3)

    out = fused_attention(split(q), split(k), split(v), None, impl="xla")
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
    return linear(out, params["c_proj"]["w"], params["c_proj"]["b"])


def modified_resnet_features(params: dict, images: jax.Array, n_heads: int, *, dtype=jnp.float32) -> jax.Array:
    x = images.astype(dtype)
    for i in (1, 2, 3):
        stride = 2 if i == 1 else 1
        x = jax.nn.relu(
            batch_norm(conv2d(x, params[f"conv{i}"], stride=stride, padding=1), params[f"bn{i}"])
        )
    x = avg_pool(x, 2, 2)
    for stage_idx, stage in enumerate(params["layers"]):
        for block_idx, block in enumerate(stage):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            x = _clip_bottleneck(x, block, stride)
    return attention_pool(params["attnpool"], x, n_heads)


def modified_resnet_config_from_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Shape-inference for RN CLIP checkpoints (``jclip/model.py:248-264``)."""
    counts = [
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
        for b in (1, 2, 3, 4)
    ]
    width = sd["visual.layer1.0.conv1.weight"].shape[0]
    output_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
    embed_dim = sd["visual.attnpool.c_proj.weight"].shape[0]
    return {
        "layers": tuple(counts),
        "width": width,
        "image_resolution": output_width * 32,
        "embed_dim": embed_dim,
        "heads": width * 32 // 64,
    }


def modified_resnet_params_from_state_dict(sd: Dict[str, np.ndarray], layers: Sequence[int]) -> dict:
    flat = {k[len("visual."):]: np.asarray(v) for k, v in sd.items() if k.startswith("visual.")}
    params: dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = jnp.asarray(flat[f"conv{i}.weight"].astype(np.float32))
        params[f"bn{i}"] = _bn_tree(flat, f"bn{i}")
    params["layers"] = []
    for stage_idx, n_blocks in enumerate(layers, start=1):
        stage = []
        for b in range(n_blocks):
            pre = f"layer{stage_idx}.{b}"
            block = {
                "conv1": jnp.asarray(flat[f"{pre}.conv1.weight"].astype(np.float32)),
                "bn1": _bn_tree(flat, f"{pre}.bn1"),
                "conv2": jnp.asarray(flat[f"{pre}.conv2.weight"].astype(np.float32)),
                "bn2": _bn_tree(flat, f"{pre}.bn2"),
                "conv3": jnp.asarray(flat[f"{pre}.conv3.weight"].astype(np.float32)),
                "bn3": _bn_tree(flat, f"{pre}.bn3"),
            }
            # CLIP downsample: ("-1" avgpool, "0" conv, "1" bn)
            if f"{pre}.downsample.0.weight" in flat:
                block["downsample"] = {
                    "conv": jnp.asarray(flat[f"{pre}.downsample.0.weight"].astype(np.float32)),
                    "bn": _bn_tree(flat, f"{pre}.downsample.1"),
                }
            stage.append(block)
        params["layers"].append(stage)
    params["attnpool"] = {
        "positional_embedding": jnp.asarray(flat["attnpool.positional_embedding"].astype(np.float32)),
        "q_proj": {"w": jnp.asarray(flat["attnpool.q_proj.weight"].astype(np.float32)),
                   "b": jnp.asarray(flat["attnpool.q_proj.bias"].astype(np.float32))},
        "k_proj": {"w": jnp.asarray(flat["attnpool.k_proj.weight"].astype(np.float32)),
                   "b": jnp.asarray(flat["attnpool.k_proj.bias"].astype(np.float32))},
        "v_proj": {"w": jnp.asarray(flat["attnpool.v_proj.weight"].astype(np.float32)),
                   "b": jnp.asarray(flat["attnpool.v_proj.bias"].astype(np.float32))},
        "c_proj": {"w": jnp.asarray(flat["attnpool.c_proj.weight"].astype(np.float32)),
                   "b": jnp.asarray(flat["attnpool.c_proj.bias"].astype(np.float32))},
    }
    return params
