"""Full-surface MHA vs torch.nn.functional.multi_head_attention_forward."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from jcf_tpu.ops.mha_full import multi_head_attention_full

RNG = np.random.default_rng(17)
E, H, B, LQ, LK = 32, 4, 2, 6, 9


def _weights():
    return {
        "w_qkv": (RNG.standard_normal((3 * E, E)) * 0.2).astype(np.float32),
        "b_qkv": (RNG.standard_normal(3 * E) * 0.1).astype(np.float32),
        "w_out": (RNG.standard_normal((E, E)) * 0.2).astype(np.float32),
        "b_out": (RNG.standard_normal(E) * 0.1).astype(np.float32),
    }


def _torch_mha(q, k, v, w, need_weights=False, attn_mask=None,
               key_padding_mask=None, bias_k=None, bias_v=None,
               add_zero_attn=False):
    out, wts = F.multi_head_attention_forward(
        torch.from_numpy(q).transpose(0, 1),
        torch.from_numpy(k).transpose(0, 1),
        torch.from_numpy(v).transpose(0, 1),
        E, H,
        torch.from_numpy(w["w_qkv"]), torch.from_numpy(w["b_qkv"]),
        torch.from_numpy(bias_k).reshape(1, 1, E) if bias_k is not None else None,
        torch.from_numpy(bias_v).reshape(1, 1, E) if bias_v is not None else None,
        add_zero_attn, 0.0,
        torch.from_numpy(w["w_out"]), torch.from_numpy(w["b_out"]),
        training=False, need_weights=need_weights,
        attn_mask=torch.from_numpy(np.asarray(attn_mask)) if attn_mask is not None else None,
        key_padding_mask=torch.from_numpy(key_padding_mask) if key_padding_mask is not None else None,
    )
    return out.transpose(0, 1).numpy(), (wts.numpy() if wts is not None else None)


def test_cross_attention_matches_torch():
    w = _weights()
    q = RNG.standard_normal((B, LQ, E)).astype(np.float32)
    k = RNG.standard_normal((B, LK, E)).astype(np.float32)
    v = RNG.standard_normal((B, LK, E)).astype(np.float32)
    ours, _ = multi_head_attention_full(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
        w_qkv=jnp.asarray(w["w_qkv"]), b_qkv=jnp.asarray(w["b_qkv"]),
        w_out=jnp.asarray(w["w_out"]), b_out=jnp.asarray(w["b_out"]),
    )
    theirs, _ = _torch_mha(q, k, v, w)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_need_weights_and_masks_match_torch():
    w = _weights()
    q = RNG.standard_normal((B, LQ, E)).astype(np.float32)
    k = RNG.standard_normal((B, LK, E)).astype(np.float32)
    v = RNG.standard_normal((B, LK, E)).astype(np.float32)
    attn_mask = (RNG.random((LQ, LK)) < 0.2)
    attn_mask[:, 0] = False  # keep at least one visible key per row
    kpm = np.zeros((B, LK), bool)
    kpm[:, -2:] = True

    ours, ow = multi_head_attention_full(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
        w_qkv=jnp.asarray(w["w_qkv"]), b_qkv=jnp.asarray(w["b_qkv"]),
        w_out=jnp.asarray(w["w_out"]), b_out=jnp.asarray(w["b_out"]),
        attn_mask=jnp.asarray(attn_mask), key_padding_mask=jnp.asarray(kpm),
        need_weights=True,
    )
    theirs, tw = _torch_mha(q, k, v, w, need_weights=True,
                            attn_mask=attn_mask, key_padding_mask=kpm)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ow), tw, atol=2e-5)


def test_bias_kv_and_zero_attn_match_torch():
    w = _weights()
    bias_k = (RNG.standard_normal(E) * 0.1).astype(np.float32)
    bias_v = (RNG.standard_normal(E) * 0.1).astype(np.float32)
    q = RNG.standard_normal((B, LQ, E)).astype(np.float32)
    k = RNG.standard_normal((B, LK, E)).astype(np.float32)
    v = RNG.standard_normal((B, LK, E)).astype(np.float32)
    ours, _ = multi_head_attention_full(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
        w_qkv=jnp.asarray(w["w_qkv"]), b_qkv=jnp.asarray(w["b_qkv"]),
        w_out=jnp.asarray(w["w_out"]), b_out=jnp.asarray(w["b_out"]),
        bias_k=jnp.asarray(bias_k), bias_v=jnp.asarray(bias_v),
        add_zero_attn=True,
    )
    theirs, _ = _torch_mha(q, k, v, w, bias_k=bias_k, bias_v=bias_v, add_zero_attn=True)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_separate_projection_weights():
    w = _weights()
    q = RNG.standard_normal((B, LQ, E)).astype(np.float32)
    ours_packed, _ = multi_head_attention_full(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), H,
        w_qkv=jnp.asarray(w["w_qkv"]), b_qkv=jnp.asarray(w["b_qkv"]),
        w_out=jnp.asarray(w["w_out"]), b_out=jnp.asarray(w["b_out"]),
    )
    ours_sep, _ = multi_head_attention_full(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), H,
        w_q=jnp.asarray(w["w_qkv"][:E]), w_k=jnp.asarray(w["w_qkv"][E:2*E]),
        w_v=jnp.asarray(w["w_qkv"][2*E:]),
        b_q=jnp.asarray(w["b_qkv"][:E]), b_k=jnp.asarray(w["b_qkv"][E:2*E]),
        b_v=jnp.asarray(w["b_qkv"][2*E:]),
        w_out=jnp.asarray(w["w_out"]), b_out=jnp.asarray(w["b_out"]),
    )
    np.testing.assert_allclose(np.asarray(ours_packed), np.asarray(ours_sep), atol=1e-6)
