"""Classification heads over frozen features.

- ``Channel_LP`` (``/root/reference/slow_pace.py:1195-1206``): LP++-style
  channel reweighting — learnable per-channel scale (ones) and bias (zeros)
  followed by a 512->C linear whose weight is initialized from the
  zero-shot text classifier (``slow_pace.py:1537-1539``).
- ``Moco_Adapter`` (``slow_pace.py:1208-1219``): a 2048->C linear over
  frozen MoCo-v3 ResNet-50 features, weight initialized to per-class sums
  of the training features (``slow_pace.py:1545-1551``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from jcf_tpu.ops.layers import linear


def init_channel_lp(
    num_classes: int = 403,
    feat_dim: int = 512,
    text_weights: Optional[jax.Array] = None,
) -> dict:
    """text_weights: zero-shot classifier [C, D] used as fc init.

    Copied (jnp.array), never aliased: the classifier typically also rides
    in the training step's frozen-argument tree, and one buffer arriving
    both donated (trainable) and not (frozen) is a runtime error."""
    fc_w = (
        jnp.array(text_weights, jnp.float32)
        if text_weights is not None
        else jnp.zeros((num_classes, feat_dim), jnp.float32)
    )
    return {
        "scale1": jnp.ones((feat_dim,), jnp.float32),
        "bias1": jnp.zeros((feat_dim,), jnp.float32),
        "fc": {"w": fc_w, "b": jnp.zeros((num_classes,), jnp.float32)},
    }


def channel_lp(params: dict, features: jax.Array) -> jax.Array:
    x = params["scale1"][None, :] * features + params["bias1"][None, :]
    return linear(x, params["fc"]["w"], params["fc"]["b"])


def init_moco_adapter(
    num_classes: int = 403,
    feat_dim: int = 2048,
    class_feature_sums: Optional[jax.Array] = None,
) -> dict:
    """class_feature_sums: [C, D] per-class sums of train MoCo features.
    Copied, never aliased (see init_channel_lp)."""
    fc_w = (
        jnp.array(class_feature_sums, jnp.float32)
        if class_feature_sums is not None
        else jnp.zeros((num_classes, feat_dim), jnp.float32)
    )
    return {"fc": {"w": fc_w, "b": jnp.zeros((num_classes,), jnp.float32)}}


def moco_adapter(params: dict, features: jax.Array) -> jax.Array:
    return linear(features, params["fc"]["w"], params["fc"]["b"])


def moco_adapter_init_from_features(features: jax.Array, labels: jax.Array, num_classes: int = 403) -> jax.Array:
    """Per-class feature sums [C, D] (``slow_pace.py:1545-1551``)."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=features.dtype)  # [N, C]
    return onehot.T @ features
