"""Fused transformer-block Pallas kernels (inference fast path).

PERF.md analysis: after the packed-attention kernel, the encode gap to the
GEMM roofline is per-op activation traffic — every LN / projection /
residual round-trips the [B*S, 768] activation through HBM. These kernels
keep a tile of G crops resident in VMEM across half a block each:

  attention half:  y = x + out_proj(attention(LN1(x) @ Wqkv))
  MLP half:        y = x + c_proj(quick_gelu(c_fc(LN2(x))))

Key shapes trick: all row-wise ops (LN, projections, MLP) run on the
flattened [G*S_pad, E] tile — one large-M GEMM per projection instead of G
small ones — while attention indexes per-crop row ranges out of a VMEM
scratch. S is padded to a sublane multiple ONCE for the whole tower (pad
keys masked via the additive bias), so in-kernel row offsets stay
tile-aligned.

Weights stay VMEM-resident per program (qkv+out ≈ 4.7MB bf16, MLP ≈ 9.4MB
— each half fits; a whole block would not). Traffic per layer drops from
~1.9GB to ~330MB at batch 1024 crops.

Constraints (callers fall back to the composable path otherwise): no LoRA
decomposed branch (merge first), no int8, no deep prompt splicing.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST
_NEG_INF = -1e30


def _ln_rows(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _quant_rows(x32):
    """Dynamic per-row symmetric int8: (values int8, scale [rows, 1] f32).
    Runs on rows already resident in VMEM — the quantization passes that
    made the naive XLA int8 path a wash (PERF.md) fuse here for free."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_gemm(x_q, x_scale, w_int8_ref, w_scale_ref, bias_ref):
    """int8 x int8 -> int32 MXU GEMM with per-row/per-channel rescale.
    w layout: [out, in] int8 + [out] f32 scale (+ [out] f32 bias)."""
    acc = jax.lax.dot_general(
        x_q, w_int8_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * w_scale_ref[...].astype(jnp.float32)
    if bias_ref is not None:
        y = y + bias_ref[...].astype(jnp.float32)
    return y


def _attn_half_kernel(
    x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    bias_ref, out_ref, qkv_scratch, ctx_scratch,
    *, n_heads, head_dim, scale, precision, group, s_pad,
):
    e = n_heads * head_dim
    bias = bias_ref[...]
    gs = group * s_pad

    rows = x_ref[...].reshape(gs, e)
    h_in = _ln_rows(rows, ln_s_ref[...], ln_b_ref[...]).astype(rows.dtype)
    # one large-M GEMM for the whole tile's qkv
    qkv_scratch[...] = (
        jax.lax.dot_general(
            h_in, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(qkv_scratch.dtype)

    def crop_body(g, _):
        base = g * s_pad  # tile-aligned (s_pad is a sublane multiple)
        row_block = qkv_scratch[pl.ds(base, s_pad), :]
        for h in range(n_heads):
            q = row_block[:, h * head_dim : (h + 1) * head_dim]
            k = row_block[:, e + h * head_dim : e + (h + 1) * head_dim]
            v = row_block[:, 2 * e + h * head_dim : 2 * e + (h + 1) * head_dim]
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * scale + bias
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx_scratch[pl.ds(base, s_pad), h * head_dim : (h + 1) * head_dim] = (
                jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                        precision=precision).astype(ctx_scratch.dtype)
            )
        return 0

    jax.lax.fori_loop(0, group, crop_body, 0)

    proj = (
        jax.lax.dot_general(
            ctx_scratch[...], wout_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bout_ref[...].astype(jnp.float32)
    )
    out = rows.astype(jnp.float32) + proj
    out_ref[...] = out.astype(out_ref.dtype).reshape(group, s_pad, e)


def _attn_half_int8_kernel(
    x_ref, ln_s_ref, ln_b_ref, wqkv_i8_ref, wqkv_sc_ref, bqkv_ref,
    wout_i8_ref, wout_sc_ref, bout_ref, bias_ref, out_ref,
    qkv_scratch, ctx_scratch,
    *, n_heads, head_dim, scale, group, s_pad,
):
    e = n_heads * head_dim
    bias = bias_ref[...]
    gs = group * s_pad

    rows = x_ref[...].reshape(gs, e)
    h_ln = _ln_rows(rows, ln_s_ref[...], ln_b_ref[...])
    x_q, x_sc = _quant_rows(h_ln)
    qkv_scratch[...] = _int8_gemm(
        x_q, x_sc, wqkv_i8_ref, wqkv_sc_ref, bqkv_ref
    ).astype(qkv_scratch.dtype)

    def crop_body(g, _):
        base = g * s_pad
        row_block = qkv_scratch[pl.ds(base, s_pad), :]
        for h in range(n_heads):
            q = row_block[:, h * head_dim : (h + 1) * head_dim]
            k = row_block[:, e + h * head_dim : e + (h + 1) * head_dim]
            v = row_block[:, 2 * e + h * head_dim : 2 * e + (h + 1) * head_dim]
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx_scratch[pl.ds(base, s_pad), h * head_dim : (h + 1) * head_dim] = (
                jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
                .astype(ctx_scratch.dtype)
            )
        return 0

    jax.lax.fori_loop(0, group, crop_body, 0)

    c_q, c_sc = _quant_rows(ctx_scratch[...].astype(jnp.float32))
    proj = _int8_gemm(c_q, c_sc, wout_i8_ref, wout_sc_ref, bout_ref)
    out = rows.astype(jnp.float32) + proj
    out_ref[...] = out.astype(out_ref.dtype).reshape(group, s_pad, e)


def _mlp_half_int8_kernel(
    x_ref, ln_s_ref, ln_b_ref, wfc_i8_ref, wfc_sc_ref, bfc_ref,
    wproj_i8_ref, wproj_sc_ref, bproj_ref, out_ref,
    *, group, s_pad,
):
    e = x_ref.shape[-1]
    gs = group * s_pad
    rows = x_ref[...].reshape(gs, e)
    h_ln = _ln_rows(rows, ln_s_ref[...], ln_b_ref[...])
    x_q, x_sc = _quant_rows(h_ln)
    hidden = _int8_gemm(x_q, x_sc, wfc_i8_ref, wfc_sc_ref, bfc_ref)
    hidden = hidden * jax.nn.sigmoid(1.702 * hidden)  # QuickGELU in f32
    h_q, h_sc = _quant_rows(hidden)
    proj = _int8_gemm(h_q, h_sc, wproj_i8_ref, wproj_sc_ref, bproj_ref)
    out = rows.astype(jnp.float32) + proj
    out_ref[...] = out.astype(out_ref.dtype).reshape(group, s_pad, e)


def _mlp_half_kernel(
    x_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
    out_ref, *, precision, group, s_pad,
):
    e = x_ref.shape[-1]
    gs = group * s_pad
    rows = x_ref[...].reshape(gs, e)
    h_in = _ln_rows(rows, ln_s_ref[...], ln_b_ref[...]).astype(rows.dtype)
    hidden = (
        jax.lax.dot_general(
            h_in, wfc_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bfc_ref[...].astype(jnp.float32)
    )
    hidden = hidden * jax.nn.sigmoid(1.702 * hidden)  # QuickGELU in f32
    hidden = hidden.astype(rows.dtype)
    proj = (
        jax.lax.dot_general(
            hidden, wproj_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bproj_ref[...].astype(jnp.float32)
    )
    out = rows.astype(jnp.float32) + proj
    out_ref[...] = out.astype(out_ref.dtype).reshape(group, s_pad, e)


def _pick_group(b: int, target: int = 8) -> int:
    group = min(target, b)
    while b % group:
        group -= 1
    return group


def fused_block(
    x: jax.Array,  # [B, S_pad, E] — S_pad must be a multiple of 8
    params: dict,  # one layer's block params (unstacked)
    n_heads: int,
    bias: jax.Array,  # [S_pad, S_pad] additive mask (incl. pad-key masking)
    *,
    quant_layer: "dict | None" = None,  # int8 weights for this layer
    interpret: bool = False,
) -> jax.Array:
    """One full transformer block via the two fused half-kernels."""
    b, s_pad, e = x.shape
    d = e // n_heads
    precision = _HI if x.dtype == jnp.float32 else None
    group = _pick_group(b)
    gs = group * s_pad

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def full(shape):
        return vmem(shape, lambda i: tuple(0 for _ in shape))

    if quant_layer is not None:
        hidden_dim = quant_layer["mlp"]["c_fc"].w_int8.shape[0]
        x = pl.pallas_call(
            functools.partial(
                _attn_half_int8_kernel, n_heads=n_heads, head_dim=d,
                scale=1.0 / math.sqrt(d), group=group, s_pad=s_pad,
            ),
            grid=(b // group,),
            in_specs=[
                vmem((group, s_pad, e), lambda i: (i, 0, 0)),
                full((e,)), full((e,)),
                full((3 * e, e)), full((3 * e,)), full((3 * e,)),
                full((e, e)), full((e,)), full((e,)),
                full((s_pad, s_pad)),
            ],
            out_specs=vmem((group, s_pad, e), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, s_pad, e), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((gs, 3 * e), x.dtype),
                pltpu.VMEM((gs, e), x.dtype),
            ],
            interpret=interpret,
        )(
            x,
            params["ln_1"]["scale"].astype(x.dtype), params["ln_1"]["bias"].astype(x.dtype),
            quant_layer["attn"]["w_qkv"].w_int8, quant_layer["attn"]["w_qkv"].w_scale,
            quant_layer["attn"]["w_qkv"].bias,
            quant_layer["attn"]["w_out"].w_int8, quant_layer["attn"]["w_out"].w_scale,
            quant_layer["attn"]["w_out"].bias,
            bias,
        )
        x = pl.pallas_call(
            functools.partial(_mlp_half_int8_kernel, group=group, s_pad=s_pad),
            grid=(b // group,),
            in_specs=[
                vmem((group, s_pad, e), lambda i: (i, 0, 0)),
                full((e,)), full((e,)),
                full((hidden_dim, e)), full((hidden_dim,)), full((hidden_dim,)),
                full((e, hidden_dim)), full((e,)), full((e,)),
            ],
            out_specs=vmem((group, s_pad, e), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, s_pad, e), x.dtype),
            interpret=interpret,
        )(
            x,
            params["ln_2"]["scale"].astype(x.dtype), params["ln_2"]["bias"].astype(x.dtype),
            quant_layer["mlp"]["c_fc"].w_int8, quant_layer["mlp"]["c_fc"].w_scale,
            quant_layer["mlp"]["c_fc"].bias,
            quant_layer["mlp"]["c_proj"].w_int8, quant_layer["mlp"]["c_proj"].w_scale,
            quant_layer["mlp"]["c_proj"].bias,
        )
        return x

    x = pl.pallas_call(
        functools.partial(
            _attn_half_kernel, n_heads=n_heads, head_dim=d,
            scale=1.0 / math.sqrt(d), precision=precision, group=group,
            s_pad=s_pad,
        ),
        grid=(b // group,),
        in_specs=[
            vmem((group, s_pad, e), lambda i: (i, 0, 0)),
            full((e,)), full((e,)),
            full((3 * e, e)), full((3 * e,)),
            full((e, e)), full((e,)),
            full((s_pad, s_pad)),
        ],
        out_specs=vmem((group, s_pad, e), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, e), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((gs, 3 * e), x.dtype),
            pltpu.VMEM((gs, e), x.dtype),
        ],
        interpret=interpret,
    )(
        x,
        params["ln_1"]["scale"].astype(x.dtype), params["ln_1"]["bias"].astype(x.dtype),
        params["attn"]["w_qkv"].astype(x.dtype), params["attn"]["b_qkv"].astype(jnp.float32),
        params["attn"]["w_out"].astype(x.dtype), params["attn"]["b_out"].astype(jnp.float32),
        bias,
    )

    hidden_dim = params["mlp"]["c_fc"]["w"].shape[0]
    x = pl.pallas_call(
        functools.partial(
            _mlp_half_kernel, precision=precision, group=group, s_pad=s_pad
        ),
        grid=(b // group,),
        in_specs=[
            vmem((group, s_pad, e), lambda i: (i, 0, 0)),
            full((e,)), full((e,)),
            full((hidden_dim, e)), full((hidden_dim,)),
            full((e, hidden_dim)), full((e,)),
        ],
        out_specs=vmem((group, s_pad, e), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, e), x.dtype),
        interpret=interpret,
    )(
        x,
        params["ln_2"]["scale"].astype(x.dtype), params["ln_2"]["bias"].astype(x.dtype),
        params["mlp"]["c_fc"]["w"].astype(x.dtype), params["mlp"]["c_fc"]["b"].astype(jnp.float32),
        params["mlp"]["c_proj"]["w"].astype(x.dtype), params["mlp"]["c_proj"]["b"].astype(jnp.float32),
    )
    return x


def run_fused_tower(
    x: jax.Array,  # [B, S, E]
    stacked_blocks: dict,
    n_heads: int,
    mask: Optional[jax.Array] = None,
    *,
    quant: "dict | None" = None,  # stacked int8 weights (quantize_clip_params)
    interpret: bool = False,
) -> jax.Array:
    """Scan all layers through the fused block kernels.

    Pads S once to a sublane multiple (pad keys masked with -inf in the
    additive bias; pad rows carry garbage that never reaches real rows)
    and slices back at the end.
    """
    b, s, e = x.shape
    s_pad = ((s + 7) // 8) * 8
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))

    bias = jnp.full((s_pad, s_pad), _NEG_INF, dtype=jnp.float32)
    block = jnp.zeros((s, s), jnp.float32) if mask is None else mask.astype(jnp.float32)
    bias = bias.at[:s, :s].set(block)

    if quant is not None:
        def body(carry, scanned):
            layer_params, quant_layer = scanned
            return fused_block(
                carry, layer_params, n_heads, bias,
                quant_layer=quant_layer, interpret=interpret,
            ), None

        x, _ = jax.lax.scan(body, x, (stacked_blocks, quant))
    else:
        def body(carry, layer_params):
            return fused_block(carry, layer_params, n_heads, bias, interpret=interpret), None

        x, _ = jax.lax.scan(body, x, stacked_blocks)
    return x[:, :s] if s_pad != s else x
