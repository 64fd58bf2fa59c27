"""Logit post-processing and accuracy metrics.

Contracts from the reference:
- ``logit_normalize``: per-row mean subtraction, global std division
  (``/root/reference/test.py:1304-1308``).
- ``top_k_accuracy``: exact top-k match (``test.py:821-826``).
- ``boundary_accuracy``: ood.py's variant that counts a prediction correct
  when it lands on the same side of the base/new class boundary as the
  target (``ood.py:638-652``; boundary 373).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logit_normalize(logits: jax.Array) -> jax.Array:
    std = jnp.std(logits)
    mean = jnp.mean(logits, axis=1, keepdims=True)
    return (logits - mean) / std


def top_k_accuracy(logits: jax.Array, targets: jax.Array, k: int = 1) -> jax.Array:
    """Percentage of rows whose top-k predictions include the target."""
    _, pred = jax.lax.top_k(logits, k)  # [N, k]
    correct = jnp.any(pred == targets[:, None], axis=-1)
    return 100.0 * jnp.mean(correct.astype(jnp.float32))


def boundary_accuracy(
    logits: jax.Array, targets: jax.Array, k: int = 1, boundary: int = 373
) -> jax.Array:
    """Percentage of top-k predictions on the same side of `boundary` as the
    target (counts every one of the k entries, like the reference)."""
    _, pred = jax.lax.top_k(logits, k)  # [N, k]
    t = targets[:, None]
    same_base = (pred < boundary) & (t < boundary)
    same_new = (pred >= boundary) & (t >= boundary)
    correct = (same_base | same_new).astype(jnp.float32)
    return 100.0 * jnp.sum(correct) / targets.shape[0]
