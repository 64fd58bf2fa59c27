"""MTA: Gaussian-kernel robust mode seeking over a TTA crop-feature cloud.

Re-implements the reference solver (``/root/reference/ood.py:742-820``; the
feature-returning variant ``test.py:1391-1461``) as compiled XLA control
flow: the data-dependent inner convergence loops become ``lax.while_loop``
with the exact reference exit rule (at least one step; stop when the update
norm drops below 1e-6 or after 5 steps), and the outer loop is a fixed
5-iteration ``fori_loop`` (the reference's outer loop has no other exit).

All math stays in float32: the 513x513 distance/affinity matrices are
rank-sensitive (SURVEY.md §7.3). ``cdist`` clamps the squared distance at 0
before the sqrt — the reference can produce NaN on slightly-negative
diagonals and relies on sort order being unaffected; clamping preserves the
selected neighbor distances (row-sorted, excluding self) while staying
NaN-free.

Constants (``ood.py:755-758``): lambda_y=0.2, lambda_q=4, max_iter=5,
temperature=1, kNN fraction 0.3, logit scale 100.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

LAMBDA_Y = 0.2
LAMBDA_Q = 4.0
MAX_ITER = 5
TEMPERATURE = 1.0
KNN_FRAC = 0.3
LOGIT_SCALE = 100.0
CONVERGENCE_TH = 1e-6


class MTAParams(NamedTuple):
    lambda_y: float = LAMBDA_Y
    lambda_q: float = LAMBDA_Q
    max_iter: int = MAX_ITER
    temperature: float = TEMPERATURE
    knn_frac: float = KNN_FRAC
    th: float = CONVERGENCE_TH


def _pairwise_dist(x: jax.Array) -> jax.Array:
    """Euclidean cdist via the expanded quadratic (``ood.py:746-750``),
    clamped at zero before the sqrt."""
    sq = jnp.sum(x * x, axis=1, keepdims=True)
    d2 = sq - 2.0 * (x @ x.T) + sq.T
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def _bounded_fixed_point(update, init, th, max_iter):
    """Run `update` at least once, then until ||delta|| < th or max_iter
    steps — the reference's do-while inner loops (``ood.py:790-813``)."""

    def cond(carry):
        _, i, delta = carry
        return jnp.logical_or(i == 0, jnp.logical_and(delta >= th, i < max_iter))

    def body(carry):
        val, i, _ = carry
        new_val = update(val)
        delta = jnp.linalg.norm(new_val - val)
        return new_val, i + 1, delta

    out, _, _ = jax.lax.while_loop(cond, body, (init, jnp.int32(0), jnp.float32(jnp.inf)))
    return out


@functools.partial(jax.jit, static_argnames=("params",))
def solve_mta(
    image_features: jax.Array,
    text_features: jax.Array,
    params: MTAParams = MTAParams(),
) -> jax.Array:
    """Robust mode of the crop-feature cloud.

    image_features: [N, D] L2-normalized crop features (row 0 = center crop)
    text_features:  [C, D] L2-normalized class weights
    Returns the L2-normalized mode feature [D].
    """
    feats = image_features.astype(jnp.float32)
    n = feats.shape[0]

    logits = (feats @ text_features.astype(jnp.float32).T) * LOGIT_SCALE

    # per-point bandwidth from the k nearest neighbors (``ood.py:763-768``)
    dist = _pairwise_dist(feats)
    k = int(params.knn_frac * (n - 1))
    k = max(k, 1)
    sorted_vals = jnp.sort(dist, axis=1)
    mean_sq = jnp.mean(sorted_vals[:, 1 : k + 1] ** 2, axis=1)
    bandwidth = jnp.sqrt(0.5 * mean_sq)  # [N]

    probs = jax.nn.softmax(logits / params.temperature, axis=1)
    affinity = probs @ probs.T  # [N, N]

    y0 = jnp.full((n,), 1.0 / n, jnp.float32)
    mode0 = feats[0]

    def density(mode):
        d = jnp.linalg.norm(feats - mode, axis=-1)
        return jnp.exp(-(d**2) / (2.0 * bandwidth**2))

    def outer(_, carry):
        y, mode = carry

        dens = density(mode)

        def update_y(y):
            weighted = affinity * y[None, :]
            return jax.nn.softmax(
                (dens + params.lambda_q * jnp.sum(weighted, axis=1)) / params.lambda_y,
                axis=-1,
            )

        y = _bounded_fixed_point(update_y, y, params.th, params.max_iter)

        def update_mode(mode):
            wd = density(mode) * y
            new_mode = jnp.sum(wd[:, None] * feats, axis=0) / jnp.sum(wd)
            return new_mode / jnp.linalg.norm(new_mode)

        mode = _bounded_fixed_point(update_mode, mode, params.th, params.max_iter)
        return y, mode

    _, mode = jax.lax.fori_loop(0, params.max_iter, outer, (y0, mode0))
    return mode


def solve_mta_logits(
    image_features: jax.Array,
    text_features: jax.Array,
    params: MTAParams = MTAParams(),
) -> jax.Array:
    """Mode logits [1, C] — the ood/lora_train variant (``ood.py:819-820``)."""
    mode = solve_mta(image_features, text_features, params)
    return (mode[None, :] @ text_features.astype(jnp.float32).T) * LOGIT_SCALE


def solve_mta_batch(
    crop_features: jax.Array,
    text_features: jax.Array,
    params: MTAParams = MTAParams(),
) -> jax.Array:
    """vmapped solver over a batch of images' crop clouds.

    crop_features: [B, N, D]  ->  modes [B, D]
    One XLA program for the whole TTA batch (SURVEY.md §7.1).
    """
    return jax.vmap(lambda f: solve_mta(f, text_features, params))(crop_features)
