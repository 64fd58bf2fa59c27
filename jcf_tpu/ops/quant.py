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


def quantize_clip_params(params: dict) -> dict:
    """Quantize the heavy matmul weights of a CLIP param tree in place
    (blocks' qkv/out/mlp + patch embed); everything else stays float.
    Returns a tree holding QuantizedLinear leaves under 'quant'."""

    def quant_blocks(blocks):
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
        "visual": quant_blocks(params["visual"]["blocks"]),
        "text": quant_blocks(params["text"]["blocks"]),
    }
