"""Fused multi-head self-attention for the CLIP towers.

Numeric contract: the reference SDPA path
(``/root/reference/jclip/mha.py:55-83`` and ``ood.py:339-367``):
``softmax(Q K^T / sqrt(D) + bias) V`` with an optional additive mask (the
text tower's causal mask, ``jclip/model.py:189-193``), no dropout in the
live inference path.

Two implementations with identical semantics:

- ``_attention_xla``: plain jnp ops, lets XLA fuse. Used on CPU and as the
  reference in tests.
- ``_attention_pallas``: one fused Pallas TPU kernel per (batch, head):
  scores, bias add, softmax and the PV matmul never leave VMEM. CLIP
  sequences are tiny (50-81 tokens), so a whole (S_pad, S_pad) score tile
  fits comfortably; the win is avoiding HBM round-trips for the [BH, S, S]
  score tensor when BH is large (TTA crop batches).

Scores are always computed in f32 (MXU accumulation) regardless of input
dtype; bf16 inputs give bf16 outputs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jcf_tpu.ops.layers import linear

_HI = jax.lax.Precision.HIGHEST

# Finite "minus infinity" for padded keys: large enough that exp underflows
# to zero, small enough that padded *query* rows stay NaN-free.
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_xla(q, k, v, bias):
    # q,k,v: [B, H, S, D]; bias: [S, S] additive or None
    dims = (((3,), (3,)), ((0, 1), (0, 1)))
    scores = jax.lax.dot_general(
        q, k, dims, preferred_element_type=jnp.float32, precision=_HI
    )
    scores = scores * (1.0 / math.sqrt(q.shape[-1]))
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    dims_pv = (((3,), (2,)), ((0, 1), (0, 1)))
    out = jax.lax.dot_general(
        probs.astype(q.dtype), v, dims_pv, preferred_element_type=jnp.float32,
        precision=_HI,
    )
    return out.astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, precision):
    q = q_ref[0]  # [S, D] (padded; `scale` uses the true head dim)
    k = k_ref[0]
    v = v_ref[0]
    # `precision` is HIGHEST for f32 inputs (full-precision MXU passes) and
    # None for bf16 — Mosaic rejects HIGHEST on bf16 operands ("Bad lhs
    # type"), and bf16 is MXU-native anyway. Accumulation stays f32 via
    # preferred_element_type either way.
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )
    scores = scores * scale
    scores = scores + bias_ref[...]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    out = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32,
        precision=precision,
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _attn_kernel_blocked(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, precision, group):
    """G (batch*head) slices per grid program: amortizes Mosaic's
    per-program overhead, which dominates when each attention is tiny
    (CLIP: S<=81, D=64 — one MXU pass per matmul)."""
    bias = bias_ref[...]

    def body(g, _):
        q = q_ref[0, g]
        k = k_ref[0, g]
        v = v_ref[0, g]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        scores = scores * scale + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out_ref[0, g] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_pallas(q, k, v, bias, interpret=False):
    b, h, s, d = q.shape
    s_pad = _round_up(s, 128)
    d_pad = _round_up(d, 128)
    bh = b * h

    qp = jnp.pad(q.reshape(bh, s, d), ((0, 0), (0, s_pad - s), (0, d_pad - d)))
    kp = jnp.pad(k.reshape(bh, s, d), ((0, 0), (0, s_pad - s), (0, d_pad - d)))
    vp = jnp.pad(v.reshape(bh, s, d), ((0, 0), (0, s_pad - s), (0, d_pad - d)))

    # Additive bias [S_pad, S_pad]: user mask on the real block, _NEG_INF on
    # padded key columns so they receive zero probability.
    full_bias = jnp.full((s_pad, s_pad), _NEG_INF, dtype=jnp.float32)
    block = jnp.zeros((s, s), jnp.float32) if bias is None else bias.astype(jnp.float32)
    full_bias = full_bias.at[:s, :s].set(block)

    kernel_precision = _HI if q.dtype == jnp.float32 else None

    # group size: amortize per-program overhead while keeping the working
    # set (4 tensors x G x s_pad x d_pad) comfortably inside VMEM (~16MB)
    bytes_per_slice = 4 * s_pad * d_pad * qp.dtype.itemsize
    group = max(1, min(32, (4 * 1024 * 1024) // max(bytes_per_slice, 1)))
    while bh % group:
        group -= 1

    qp = qp.reshape(bh // group, group, s_pad, d_pad)
    kp = kp.reshape(bh // group, group, s_pad, d_pad)
    vp = vp.reshape(bh // group, group, s_pad, d_pad)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_blocked, scale=1.0 / math.sqrt(d),
            precision=kernel_precision, group=group,
        ),
        grid=(bh // group,),
        in_specs=[
            pl.BlockSpec((1, group, s_pad, d_pad), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, s_pad, d_pad), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, s_pad, d_pad), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, s_pad, d_pad), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh // group, group, s_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, full_bias)

    return out.reshape(bh, s_pad, d_pad)[:, :s, :d].reshape(b, h, s, d)


def _packed_attn_kernel(qkv_ref, bias_ref, out_ref, *, n_heads, head_dim, scale,
                        precision, group, seq):
    """Fused multi-head attention over the PACKED qkv projection output.

    One grid program handles `group` crops; for each crop it slices every
    head's q/k/v out of the packed [S, 3E] row block (no head-split
    transposes ever touch HBM), computes scores+softmax+PV in VMEM, and
    writes the packed [S, E] context. This is the layout that wins at
    CLIP's tiny sequence lengths: XLA's alternative materializes
    [B, H, S, S] score tensors and three head-split transposes per layer,
    which measured ~73ms of a 134ms ViT-B/32 forward at batch 9216.
    """
    e = n_heads * head_dim
    bias = bias_ref[...]  # [S, S] additive (0 when no mask)

    def crop_body(g, _):
        row = qkv_ref[g]  # [S, 3E]
        for h in range(n_heads):  # static unroll: slices are compile-time
            q = row[:, h * head_dim : (h + 1) * head_dim]
            k = row[:, e + h * head_dim : e + (h + 1) * head_dim]
            v = row[:, 2 * e + h * head_dim : 2 * e + (h + 1) * head_dim]
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * scale + bias
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out_ref[g, :, h * head_dim : (h + 1) * head_dim] = jnp.dot(
                p.astype(v.dtype), v,
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(out_ref.dtype)
        return 0

    # NOTE: a head-PAIR stacking variant (two heads concatenated along the
    # sequence axis with a block-diagonal mask — exact math, half the
    # matmul count at double tile fill) is blocked by a Mosaic limitation:
    # tpu.concatenate rejects operands with differing lane offsets
    # ("result/input offset mismatch on non-concat dimension"). Revisit
    # via VMEM scratch staging if attention shows up in profiles again.
    jax.lax.fori_loop(0, group, crop_body, 0)


def packed_attention(qkv: jax.Array, n_heads: int, bias: jax.Array | None = None,
                     *, interpret: bool = False) -> jax.Array:
    """[B, S, 3E] packed qkv -> [B, S, E] attention context, one fused
    Pallas program per crop group. `bias` is an optional [S, S] additive
    mask (text causal).

    Differentiable: the Pallas kernel runs the forward; the backward pass
    linearizes the mathematically-identical XLA formulation (a Pallas
    program has no automatic VJP), so LoRA training on TPU keeps the fused
    forward (attention sits under ``jax.grad`` in both training stages)."""
    full_bias = (
        jnp.zeros(
            (qkv.shape[1], qkv.shape[1]), jnp.float32
        ) if bias is None else bias.astype(jnp.float32)
    )
    return _packed_attention_ad(qkv, n_heads, full_bias, interpret)


def _packed_attention_ref(qkv, n_heads, full_bias):
    """The same function as the packed kernel, in plain XLA ops (backward
    rule + non-TPU fallback)."""
    b, s, three_e = qkv.shape
    e = three_e // 3
    d = e // n_heads
    q3 = qkv.reshape(b, s, 3, n_heads, d)
    q, k, v = (jnp.moveaxis(q3[:, :, i], 2, 1) for i in range(3))  # [B,H,S,D]
    out = _attention_xla(q, k, v, full_bias)
    return jnp.moveaxis(out, 1, 2).reshape(b, s, e)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def _packed_attention_ad(qkv, n_heads, full_bias, interpret):
    return _packed_attention_impl(qkv, n_heads, full_bias, interpret)


def _packed_attention_ad_fwd(qkv, n_heads, full_bias, interpret):
    return _packed_attention_impl(qkv, n_heads, full_bias, interpret), (
        qkv, full_bias,
    )


def _packed_attention_ad_bwd(n_heads, interpret, res, g):
    qkv, full_bias = res
    _, vjp = jax.vjp(
        lambda qk, bb: _packed_attention_ref(qk, n_heads, bb), qkv, full_bias
    )
    return vjp(g.astype(qkv.dtype))


_packed_attention_ad.defvjp(_packed_attention_ad_fwd, _packed_attention_ad_bwd)


def _packed_attention_impl(qkv, n_heads, full_bias, interpret):
    b, s, three_e = qkv.shape
    e = three_e // 3
    d = e // n_heads
    precision = _HI if qkv.dtype == jnp.float32 else None

    group = 8
    while b % group:
        group -= 1

    out = pl.pallas_call(
        functools.partial(
            _packed_attn_kernel, n_heads=n_heads, head_dim=d,
            scale=1.0 / math.sqrt(d), precision=precision, group=group, seq=s,
        ),
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, s, three_e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, s, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, e), qkv.dtype),
        interpret=interpret,
    )(qkv, full_bias)
    return out


def fused_attention(q, k, v, bias=None, *, impl: str | None = None):
    """Scaled dot-product attention over [B, H, S, D] tensors.

    impl: "pallas" | "xla" | "pallas_interpret" | None (auto).

    Auto dispatch is measured, not dogmatic: at CLIP's sequence lengths
    (50-81 tokens) XLA's batched GEMM + fused softmax beats the Pallas
    kernel — attention is ~1% of tower FLOPs and the kernel's tile padding
    (S->128, D->128) plus grid overhead outweighs the fusion win; the
    Pallas path takes over at S >= 128 where blocks are tile-aligned.
    """
    if impl is None:
        on_tpu = jax.default_backend() == "tpu"
        impl = "pallas" if (on_tpu and q.shape[2] >= 128) else "xla"
    if impl == "xla":
        return _attention_xla(q, k, v, bias)
    if impl == "pallas":
        return _attention_pallas(q, k, v, bias)
    if impl == "pallas_interpret":
        return _attention_pallas(q, k, v, bias, interpret=True)
    raise ValueError(f"unknown attention impl {impl!r}")


def multi_head_attention(
    x: jax.Array,
    params: dict,
    n_heads: int,
    mask: jax.Array | None = None,
    *,
    impl: str | None = None,
    lora: "dict | None" = None,
    quant: "dict | None" = None,
    return_pre_proj: bool = False,  # context BEFORE the out projection
) -> jax.Array:
    """Self-attention block over batch-first [B, S, E] activations.

    params: {"w_qkv": [3E, E], "b_qkv": [3E], "w_out": [E, E], "b_out": [E]}
    — the packed in-projection layout of OpenAI CLIP checkpoints
    (``jclip/mha.py:129-146`` splits the same packed weight).

    lora: optional decomposed-path LoRA context for this layer:
    {"layer": {a_qkv [3,r,E], b_qkv [3,E,r][, a_out, b_out]},
     "gate": scalar, "proj_mask": [3], "spec": LoraSpec, "rng": key|None}
    (training path with branch dropout, reference ``ood.py:296-306``;
    for inference prefer ``peft.merge_lora_params`` — zero overhead).
    """
    b, s, e = x.shape
    d = e // n_heads

    if quant is not None:
        from jcf_tpu.ops.quant import int8_linear

        qkv = int8_linear(x, quant["w_qkv"])  # [B, S, 3E]
    else:
        qkv = linear(x, params["w_qkv"], params["b_qkv"])  # [B, S, 3E]
    if lora is not None:
        from jcf_tpu.peft.lora import lora_qkv_adjustment, lora_out_adjustment

        qkv = qkv + lora_qkv_adjustment(
            x, lora["layer"], lora["spec"], lora["gate"], lora["proj_mask"],
            lora.get("rng"),
        )

    if impl is None and jax.default_backend() == "tpu" and s < 128:
        # packed-qkv fused kernel: no head-split transposes, no [B,H,S,S]
        # score tensors in HBM — the measured win at CLIP sequence lengths
        out = packed_attention(qkv, n_heads, mask)
    else:
        qkv = qkv.reshape(b, s, 3, n_heads, d)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))  # [B, H, S, D]
        out = fused_attention(q, k, v, mask, impl=impl)
        out = jnp.moveaxis(out, 1, 2).reshape(b, s, e)
    if return_pre_proj:
        return out
    if quant is not None:
        from jcf_tpu.ops.quant import int8_linear

        y = int8_linear(out, quant["w_out"])
    else:
        y = linear(out, params["w_out"], params["b_out"])
    if lora is not None and "a_out" in lora["layer"]:
        y = y + lora_out_adjustment(
            out, lora["layer"], lora["spec"], lora["gate"], lora.get("rng")
        )
    return y


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """Strictly-upper-triangular -inf mask (``jclip/model.py:189-193``)."""
    return jnp.triu(jnp.full((length, length), -jnp.inf, dtype=dtype), k=1)
