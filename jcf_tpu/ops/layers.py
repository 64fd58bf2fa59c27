"""Primitive functional layers shared by all towers.

These define the numeric contract of the reference blocks
(``/root/reference/jclip/model.py:17-62``) in pure JAX: LayerNorm with eps
1e-5 over the trailing feature axis, QuickGELU ``x * sigmoid(1.702 x)``, and
torch-layout linears (weight stored [out, in], applied as ``x @ W.T + b``)
so OpenAI CLIP checkpoints load without transposition bookkeeping.

Matmuls carry ``preferred_element_type=float32`` so the MXU accumulates in
f32 even when activations/weights are bf16, and ``precision=HIGHEST`` so
f32 inputs are not silently truncated to bf16 (bf16 inputs are MXU-native
and unaffected by the precision flag).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-5
HIGHEST = jax.lax.Precision.HIGHEST


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = LN_EPS) -> jax.Array:
    """LayerNorm over the last axis; statistics in f32 for bf16 stability."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def linear(x: jax.Array, weight: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Torch-layout linear: weight [out, in], y = x @ W.T + b.

    The weight is cast to the activation dtype BEFORE the dot: a mixed
    bf16 x f32 dot would promote to f32 and (with HIGHEST) run 6-pass on
    the MXU — ~6x slower than native bf16 with no accuracy benefit for the
    bf16 path. f32 activations keep full-precision matmuls.
    """
    y = jnp.dot(
        x, weight.astype(x.dtype).T, preferred_element_type=jnp.float32,
        precision=HIGHEST,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def mlp(x: jax.Array, params: dict, quant: "dict | None" = None) -> jax.Array:
    """CLIP MLP block: c_fc (d -> 4d) -> QuickGELU -> c_proj (4d -> d).

    `quant` optionally supplies int8 QuantizedLinear leaves for both
    matmuls (W8A8 serving path)."""
    if quant is not None:
        from jcf_tpu.ops.quant import int8_linear

        h = quick_gelu(int8_linear(x, quant["c_fc"]))
        return int8_linear(h, quant["c_proj"])
    h = linear(x, params["c_fc"]["w"], params["c_fc"]["b"])
    h = quick_gelu(h)
    return linear(h, params["c_proj"]["w"], params["c_proj"]["b"])


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """x / ||x||_2 along `axis` (reference: x / x.norm(dim=-1, keepdim=True))."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    if eps:
        norm = jnp.maximum(norm, eps)
    return (x.astype(jnp.float32) / norm).astype(x.dtype)
