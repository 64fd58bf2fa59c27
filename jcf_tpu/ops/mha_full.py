"""Full multi-head attention surface (the reference's torch-port contract,
``/root/reference/jclip/mha.py:201-548``): separate query/key/value inputs,
packed or separate projection weights, boolean or additive masks,
key-padding masks, bias_k/bias_v, add_zero_attn, and the need_weights
branch returning (averaged) attention probabilities.

The CLIP hot path never needs this generality (``jcf_tpu.ops.attention``
serves it with the fused kernel); this exists for capability parity and for
models that pool with cross-attention (e.g. AttentionPool2d variants).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jcf_tpu.ops.layers import linear

_HI = jax.lax.Precision.HIGHEST


def canonical_mask(mask: Optional[jax.Array], target_dtype=jnp.float32) -> Optional[jax.Array]:
    """bool mask (True = masked) -> additive -inf float mask
    (``jclip/mha.py:11-36``); float masks pass through."""
    if mask is None:
        return None
    if mask.dtype == jnp.bool_:
        return jnp.where(mask, jnp.asarray(-jnp.inf, target_dtype), jnp.asarray(0, target_dtype))
    return mask.astype(target_dtype)


def multi_head_attention_full(
    query: jax.Array,  # [B, Lq, E]
    key: jax.Array,  # [B, Lk, E]
    value: jax.Array,  # [B, Lk, E]
    n_heads: int,
    w_qkv: Optional[jax.Array] = None,  # packed [3E, E]
    b_qkv: Optional[jax.Array] = None,
    w_q: Optional[jax.Array] = None,  # separate projections
    w_k: Optional[jax.Array] = None,
    w_v: Optional[jax.Array] = None,
    b_q: Optional[jax.Array] = None,
    b_k: Optional[jax.Array] = None,
    b_v: Optional[jax.Array] = None,
    w_out: Optional[jax.Array] = None,
    b_out: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,  # [Lq, Lk] or [B*H, Lq, Lk]; bool or float
    key_padding_mask: Optional[jax.Array] = None,  # [B, Lk]; bool or float
    bias_k: Optional[jax.Array] = None,  # [E]
    bias_v: Optional[jax.Array] = None,
    add_zero_attn: bool = False,
    need_weights: bool = False,
    average_attn_weights: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    b, lq, e = query.shape
    d = e // n_heads

    if w_qkv is not None:
        # packed in-projection split into thirds (jclip/mha.py:129-168)
        w_q, w_k, w_v = w_qkv[:e], w_qkv[e : 2 * e], w_qkv[2 * e :]
        if b_qkv is not None:
            b_q, b_k, b_v = b_qkv[:e], b_qkv[e : 2 * e], b_qkv[2 * e :]

    q = linear(query, w_q, b_q)
    k = linear(key, w_k, b_k)
    v = linear(value, w_v, b_v)

    # bias_k / bias_v: one extra learned key/value token (jclip/mha.py:299-310)
    if bias_k is not None and bias_v is not None:
        k = jnp.concatenate([k, jnp.broadcast_to(bias_k[None, None], (b, 1, e)).astype(k.dtype)], axis=1)
        v = jnp.concatenate([v, jnp.broadcast_to(bias_v[None, None], (b, 1, e)).astype(v.dtype)], axis=1)
        if attn_mask is not None and attn_mask.ndim == 2:
            attn_mask = jnp.pad(canonical_mask(attn_mask), ((0, 0), (0, 1)))
        if key_padding_mask is not None:
            key_padding_mask = jnp.pad(canonical_mask(key_padding_mask), ((0, 0), (0, 1)))

    if add_zero_attn:
        # one all-zero key/value slot (jclip/mha.py:376-388)
        zeros = jnp.zeros((b, 1, e), k.dtype)
        k = jnp.concatenate([k, zeros], axis=1)
        v = jnp.concatenate([v, zeros], axis=1)
        if attn_mask is not None and attn_mask.ndim == 2:
            attn_mask = jnp.pad(canonical_mask(attn_mask), ((0, 0), (0, 1)))
        if key_padding_mask is not None:
            key_padding_mask = jnp.pad(canonical_mask(key_padding_mask), ((0, 0), (0, 1)))

    lk = k.shape[1]

    def split(t, length):
        return t.reshape(b, length, n_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, lq), split(k, lk), split(v, lk)

    scores = jax.lax.dot_general(
        qh, kh, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32, precision=_HI,
    ) * (1.0 / math.sqrt(d))

    bias = jnp.zeros((b, n_heads, lq, lk), jnp.float32)
    if attn_mask is not None:
        am = canonical_mask(attn_mask)
        if am.ndim == 2:
            bias = bias + am[None, None]
        else:  # [B*H, Lq, Lk]
            bias = bias + am.reshape(b, n_heads, lq, lk)
    if key_padding_mask is not None:
        kp = canonical_mask(key_padding_mask)  # [B, Lk] additive
        bias = bias + kp[:, None, None, :]

    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)

    out = jax.lax.dot_general(
        probs.astype(vh.dtype), vh, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32, precision=_HI,
    ).astype(query.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
    if w_out is not None:
        out = linear(out, w_out, b_out)

    if not need_weights:
        return out, None
    weights = probs
    if average_attn_weights:
        weights = jnp.mean(weights, axis=1)  # over heads (jclip/mha.py:452-456)
    return out, weights
