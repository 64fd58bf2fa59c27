"""Numeric tests for primitive ops against independent torch references."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from jcf_tpu.ops import (
    layer_norm,
    quick_gelu,
    linear,
    l2_normalize,
    multi_head_attention,
    logit_normalize,
    top_k_accuracy,
    boundary_accuracy,
)
from jcf_tpu.ops.attention import causal_mask, fused_attention

RNG = np.random.default_rng(0)


def test_layer_norm_matches_torch():
    x = RNG.standard_normal((4, 7, 32)).astype(np.float32)
    scale = RNG.standard_normal(32).astype(np.float32)
    bias = RNG.standard_normal(32).astype(np.float32)
    ours = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    theirs = F.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(scale), torch.from_numpy(bias)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_quick_gelu():
    x = np.linspace(-4, 4, 100, dtype=np.float32)
    expected = x / (1 + np.exp(-1.702 * x))
    np.testing.assert_allclose(np.asarray(quick_gelu(jnp.asarray(x))), expected, atol=1e-6)


def test_linear_torch_layout():
    x = RNG.standard_normal((5, 16)).astype(np.float32)
    w = RNG.standard_normal((8, 16)).astype(np.float32)
    b = RNG.standard_normal(8).astype(np.float32)
    ours = linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    theirs = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_l2_normalize():
    x = RNG.standard_normal((3, 9)).astype(np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)


@pytest.mark.parametrize("seq,masked", [(10, False), (13, True)])
def test_mha_matches_torch(seq, masked):
    """Packed-qkv self-attention must match torch's reference MHA, the same
    contract the reference ports (jclip/mha.py:201-466)."""
    e, h, b = 64, 4, 3
    x = RNG.standard_normal((b, seq, e)).astype(np.float32)
    w_qkv = (RNG.standard_normal((3 * e, e)) * 0.1).astype(np.float32)
    b_qkv = (RNG.standard_normal(3 * e) * 0.1).astype(np.float32)
    w_out = (RNG.standard_normal((e, e)) * 0.1).astype(np.float32)
    b_out = (RNG.standard_normal(e) * 0.1).astype(np.float32)

    params = {k: jnp.asarray(v) for k, v in
              dict(w_qkv=w_qkv, b_qkv=b_qkv, w_out=w_out, b_out=b_out).items()}
    mask = causal_mask(seq) if masked else None
    ours = multi_head_attention(jnp.asarray(x), params, h, mask)

    xt = torch.from_numpy(x).transpose(0, 1)  # [S, B, E] for torch
    tmask = torch.from_numpy(np.asarray(mask)) if masked else None
    theirs, _ = F.multi_head_attention_forward(
        xt, xt, xt, e, h,
        torch.from_numpy(w_qkv), torch.from_numpy(b_qkv),
        None, None, False, 0.0,
        torch.from_numpy(w_out), torch.from_numpy(b_out),
        training=False, need_weights=False, attn_mask=tmask,
    )
    theirs = theirs.transpose(0, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_pallas_interpret_matches_xla():
    b, h, s, d = 2, 3, 50, 64
    q = jnp.asarray(RNG.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((b, h, s, d)).astype(np.float32))
    mask = causal_mask(s)
    ref = fused_attention(q, k, v, mask, impl="xla")
    pal = fused_attention(q, k, v, mask, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)
    # unmasked path too
    ref2 = fused_attention(q, k, v, None, impl="xla")
    pal2 = fused_attention(q, k, v, None, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(pal2), np.asarray(ref2), atol=1e-5)


def test_logit_normalize_matches_reference_formula():
    x = RNG.standard_normal((6, 11)).astype(np.float32)
    out = np.asarray(logit_normalize(jnp.asarray(x)))
    expected = (x - x.mean(axis=1, keepdims=True)) / x.std()
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_accuracies():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    targets = jnp.asarray([1, 2])
    assert float(top_k_accuracy(logits, targets, 1)) == 50.0
    assert float(top_k_accuracy(logits, targets, 3)) == 100.0
    # boundary variant: classes < 1 are "base", >= 1 "new"
    assert float(boundary_accuracy(logits, targets, 1, boundary=1)) == 50.0


def test_packed_attention_matches_xla():
    from jcf_tpu.ops.attention import packed_attention, _attention_xla
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(8)
    for h in (3, 4):  # odd -> per-head loop; even -> head-PAIR stacking
        b, s, d = 4, 10, 8
        e = h * d
        qkv = jnp.asarray(rng.standard_normal((b, s, 3 * e)).astype(np.float32))
        qkv4 = qkv.reshape(b, s, 3, h, d)
        q, k, v = (jnp.moveaxis(qkv4[:, :, i], 2, 1) for i in range(3))
        for mask in (None, causal_mask(s)):
            ref = _attention_xla(q, k, v, mask)
            ref = jnp.moveaxis(ref, 1, 2).reshape(b, s, e)
            out = packed_attention(qkv, h, mask, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_attention_grad_matches_xla():
    """packed_attention carries a custom VJP (XLA-derived backward) so the
    fused forward stays usable under jax.grad in the training stages."""
    from jcf_tpu.ops.attention import packed_attention, _packed_attention_ref
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(9)
    b, s, h, d = 2, 6, 4, 8
    e = h * d
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * e)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((b, s, e)).astype(np.float32))
    mask = causal_mask(s)

    g_pl = jax.grad(
        lambda x: jnp.sum(packed_attention(x, h, mask, interpret=True) * cot)
    )(qkv)
    g_ref = jax.grad(
        lambda x: jnp.sum(_packed_attention_ref(x, h, mask.astype(jnp.float32)) * cot)
    )(qkv)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-5)
