"""Int8 weight/activation quantized linear for inference.

v5e's int8 MXU peak is ~2x bf16; the BASELINE throughput target sits near
the bf16 roofline for this workload (SURVEY.md §6), so the serving path
offers an optional W8A8 mode:

- weights: static per-output-channel symmetric int8 (scales from |W|max)
- activations: dynamic per-row symmetric int8 (scales from |x|max per
  token), computed on the fly — two cheap VPU passes around an int8 MXU
  matmul with int32 accumulation

Quality guard: CLIP towers tolerate W8A8 with per-channel/per-token scaling
well; the engine exposes it as an opt-in (`quant="int8"`), never the
default, and tests assert close agreement with the f32 path on random
towers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    w_int8: jax.Array  # [out, in] int8
    w_scale: jax.Array  # [out] f32 per-output-channel
    bias: jax.Array | None  # [out] f32


def quantize_weight(weight: jax.Array, bias: jax.Array | None = None) -> QuantizedLinear:
    """[out, in] float weight -> per-channel symmetric int8."""
    w = weight.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=1) / 127.0  # [out]
    scale = jnp.maximum(scale, 1e-8)
    w_int8 = jnp.clip(jnp.round(w / scale[:, None]), -127, 127).astype(jnp.int8)
    return QuantizedLinear(w_int8, scale, bias)


def int8_linear(x: jax.Array, q: QuantizedLinear) -> jax.Array:
    """Dynamic per-row activation quantization + int8 MXU matmul.

    x: [..., in] float -> [..., out] in x.dtype.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # [..., 1]
    x_scale = jnp.maximum(x_scale, 1e-8)
    x_int8 = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        x_int8, q.w_int8,
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [..., out] int32

    y = acc.astype(jnp.float32) * x_scale * q.w_scale
    if q.bias is not None:
        y = y + q.bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def quantize_clip_params(params: dict, *, fold: bool = False, heads=None,
                         act_scales=None, act_margin: float = 1.05,
                         act_static=("ctx", "hidden")) -> dict:
    """Quantize the heavy matmul weights of a CLIP param tree in place
    (blocks' qkv/out/mlp + patch embed); everything else stays float.
    Returns a tree holding QuantizedLinear leaves under 'quant'.

    ``fold=True`` produces the serving-folded variant the fused kernels
    consume with ``quant_folded=True`` (EXACT rewrites, PERF.md r3):

    - the LayerNorm affine folds into the following projection:
      ``W (x_n * g + b) = (W * g) x_n + W b`` — the kernel's LN then does
      only the normalization, dropping two VPU passes per LN'd tile;
    - the attention 1/sqrt(d) score scale folds into the q third of the
      qkv projection (weights AND bias), dropping the per-element score
      multiply. Requires ``heads = {"visual": H_v, "text": H_t}``.

    The folded tree computes the same function; only pair it with kernels
    that skip the LN affine and the score scale (double-applying either
    would be wrong), which is what ``run_fused_tower(quant_folded=True)``
    selects.

    ``act_scales`` (fold=True only): per-tower calibrated activation amax
    from ``models.clip.vision_ln_z_amax`` — [L, 2] (z-normalized LN1/LN2
    inputs) or [L, 4] (+ attention context and post-GELU hidden).
    When given, the tree carries per-layer STATIC activation quant scales
    (``ln_inv`` = 127/(amax*margin), with amax*margin/127 pre-folded into
    the weight dequant scales) — the kernels then skip the per-row |x|max
    reduction for the post-LN quantizations. Rows exceeding the
    calibrated range clip; the margin plus the bench ranking certificate
    gate the approximation. With a [L, 4+] ``act_scales``, ``act_static``
    selects which of the extra quants go static ("ctx", "hidden") — the
    post-LN pair is always static when calibration is present. With a
    [L, 6] calibration (vision_ln_z_amax(with_scores=True)), "score" in
    ``act_static`` additionally emits the max-free-softmax shift the
    mask-free attention kernels use to skip the per-row score max.
    """
    heads = heads or {}
    act_scales = act_scales or {}

    def quant_blocks(blocks, n_heads=None, act=None):
        if fold:
            w_qkv = blocks["attn"]["w_qkv"].astype(jnp.float32)  # [L, 3E, E]
            b_qkv = blocks["attn"]["b_qkv"].astype(jnp.float32)  # [L, 3E]
            w_fc = blocks["mlp"]["c_fc"]["w"].astype(jnp.float32)
            b_fc = blocks["mlp"]["c_fc"]["b"].astype(jnp.float32)
            e = w_qkv.shape[-1]
            g1 = blocks["ln_1"]["scale"].astype(jnp.float32)  # [L, E]
            be1 = blocks["ln_1"]["bias"].astype(jnp.float32)
            g2 = blocks["ln_2"]["scale"].astype(jnp.float32)
            be2 = blocks["ln_2"]["bias"].astype(jnp.float32)
            b_qkv = b_qkv + jnp.einsum("loe,le->lo", w_qkv, be1)
            w_qkv = w_qkv * g1[:, None, :]
            b_fc = b_fc + jnp.einsum("loe,le->lo", w_fc, be2)
            w_fc = w_fc * g2[:, None, :]
            # 1/sqrt(d) into the q third (weights + bias)
            s = 1.0 / jnp.sqrt(jnp.float32(e // n_heads))
            q_rows = (jnp.arange(w_qkv.shape[1]) < e)[None, :]
            w_qkv = jnp.where(q_rows[..., None], w_qkv * s, w_qkv)
            b_qkv = jnp.where(q_rows, b_qkv * s, b_qkv)
            qkv_q = jax.vmap(quantize_weight)(w_qkv, b_qkv)
            fc_q = jax.vmap(quantize_weight)(w_fc, b_fc)
            tree = {
                "attn": {
                    "w_qkv": qkv_q,
                    "w_out": jax.vmap(quantize_weight)(
                        blocks["attn"]["w_out"], blocks["attn"]["b_out"]
                    ),
                },
                "mlp": {
                    "c_fc": fc_q,
                    "c_proj": jax.vmap(quantize_weight)(
                        blocks["mlp"]["c_proj"]["w"], blocks["mlp"]["c_proj"]["b"]
                    ),
                },
            }
            if act is not None:
                a = jnp.asarray(act, jnp.float32) * act_margin  # [L, 2|4]
                tree["attn"]["ln_inv"] = (127.0 / a[:, 0]).reshape(-1, 1, 1)
                tree["mlp"]["ln_inv"] = (127.0 / a[:, 1]).reshape(-1, 1, 1)
                # static activation scale folds into the weight dequant
                tree["attn"]["w_qkv"] = qkv_q._replace(
                    w_scale=qkv_q.w_scale * (a[:, 0] / 127.0)[:, None]
                )
                tree["mlp"]["c_fc"] = fc_q._replace(
                    w_scale=fc_q.w_scale * (a[:, 1] / 127.0)[:, None]
                )
                if a.shape[1] >= 4:
                    # static ctx (attention out-proj input) and post-GELU
                    # hidden (c_proj input) scales; wider margin — their
                    # per-row amax varies more than z-scored LN inputs.
                    # Each is independently selectable via ``act_static``
                    # (the kernels branch on key presence), so a config
                    # can keep e.g. only the hidden quant static.
                    ah = a[:, 2:4] * (1.10 / act_margin)
                    if "ctx" in act_static:
                        tree["attn"]["ctx_inv"] = (127.0 / ah[:, 0]).reshape(-1, 1, 1)
                        tree["attn"]["w_out"] = tree["attn"]["w_out"]._replace(
                            w_scale=tree["attn"]["w_out"].w_scale
                            * (ah[:, 0] / 127.0)[:, None]
                        )
                    if "hidden" in act_static:
                        tree["mlp"]["h_inv"] = (127.0 / ah[:, 1]).reshape(-1, 1, 1)
                        tree["mlp"]["c_proj"] = tree["mlp"]["c_proj"]._replace(
                            w_scale=tree["mlp"]["c_proj"].w_scale
                            * (ah[:, 1] / 127.0)[:, None]
                        )
                if a.shape[1] >= 6 and "score" in act_static:
                    # max-free softmax shift: softmax is invariant to ANY
                    # constant shift, so correctness needs exp() inside
                    # f32 range on both sides. Upper: M = calibrated score
                    # amax minus 40 leaves ~e^48 of overflow headroom
                    # above the calibration. Lower (ADVICE r3): the
                    # unnormalized probabilities are cast to bf16, whose
                    # smallest normal is ~1.2e-38 = e^-87.3 — a row whose
                    # max score sits 87+ below the shift underflows to a
                    # ~zero context with no NaN to catch it. Clamping the
                    # shift to (weakest calibrated row max) + 80 keeps
                    # every row's exp >= e^-80 with margin; rows weaker
                    # than anything seen in calibration remain the
                    # residual risk (the bench cert gates the config).
                    tree["attn"]["score_shift"] = jnp.maximum(
                        jnp.minimum(a[:, 4] / act_margin - 40.0, a[:, 5] + 80.0),
                        0.0,
                    ).reshape(-1, 1, 1)
            return tree
        return {
            "attn": {
                "w_qkv": jax.vmap(lambda w, b: quantize_weight(w, b))(
                    blocks["attn"]["w_qkv"], blocks["attn"]["b_qkv"]
                ),
                "w_out": jax.vmap(lambda w, b: quantize_weight(w, b))(
                    blocks["attn"]["w_out"], blocks["attn"]["b_out"]
                ),
            },
            "mlp": {
                "c_fc": jax.vmap(lambda w, b: quantize_weight(w, b))(
                    blocks["mlp"]["c_fc"]["w"], blocks["mlp"]["c_fc"]["b"]
                ),
                "c_proj": jax.vmap(lambda w, b: quantize_weight(w, b))(
                    blocks["mlp"]["c_proj"]["w"], blocks["mlp"]["c_proj"]["b"]
                ),
            },
        }

    return {
        "visual": quant_blocks(
            params["visual"]["blocks"], heads.get("visual"), act_scales.get("visual")
        ),
        "text": quant_blocks(
            params["text"]["blocks"], heads.get("text"), act_scales.get("text")
        ),
    }
