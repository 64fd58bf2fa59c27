"""MTA solver fixed-point tests vs a direct numpy translation of the
reference algorithm (ood.py:742-820), on synthetic feature clouds."""

import numpy as np

import jax.numpy as jnp

from jcf_tpu.tta import solve_mta, solve_mta_logits, solve_mta_batch


def np_solve_mta(image_features, text_features_t):
    """Direct numpy port of the reference solver for testing.
    text_features_t: [D, C] (reference passes the transpose)."""
    feats = image_features.astype(np.float64)
    logits = feats @ text_features_t * 100
    lambda_y, lambda_q, max_iter = 0.2, 4, 5
    n = feats.shape[0]

    sq = (feats**2).sum(1, keepdims=True)
    d2 = sq - 2 * feats @ feats.T + sq.T
    dist = np.sqrt(np.maximum(d2, 0))
    sorted_vals = np.sort(dist, axis=1)
    k = int(0.3 * (n - 1))
    mean_sq = (sorted_vals[:, 1 : k + 1] ** 2).mean(1)
    bandwidth = np.sqrt(0.5 * mean_sq)

    def softmax(x, axis=-1):
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    probs = softmax(logits, 1)
    affinity = probs @ probs.T
    y = np.ones(n) / n
    mode = feats[0].copy()
    th = 1e-6

    def density(mode):
        d = np.linalg.norm(feats - mode, axis=-1)
        return np.exp(-(d**2) / (2 * bandwidth**2))

    for _ in range(max_iter):
        dens = density(mode)
        i = 0
        while True:
            i += 1
            old_y = y
            weighted = affinity * y[None, :]
            y = softmax((dens + lambda_q * weighted.sum(1)) / lambda_y)
            if np.linalg.norm(old_y - y) < th or i >= max_iter:
                break
        i = 0
        while True:
            i += 1
            old_mode = mode
            wd = density(mode) * y
            mode = (wd[:, None] * feats).sum(0) / wd.sum()
            mode = mode / np.linalg.norm(mode)
            if np.linalg.norm(old_mode - mode) < th or i >= max_iter:
                break
    return mode


def _random_cloud(rng, n=17, d=8, c=5):
    feats = rng.standard_normal((n, d))
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    text = rng.standard_normal((c, d))
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    return feats.astype(np.float32), text.astype(np.float32)


def test_mta_matches_numpy_reference():
    rng = np.random.default_rng(3)
    for trial in range(3):
        feats, text = _random_cloud(rng)
        mode = np.asarray(solve_mta(jnp.asarray(feats), jnp.asarray(text)))
        expected = np_solve_mta(feats, text.T)
        np.testing.assert_allclose(mode, expected, atol=1e-4)


def test_mta_logits_variant():
    rng = np.random.default_rng(4)
    feats, text = _random_cloud(rng)
    logits = np.asarray(solve_mta_logits(jnp.asarray(feats), jnp.asarray(text)))
    mode = np_solve_mta(feats, text.T)
    np.testing.assert_allclose(logits, (mode[None] @ text.T.astype(np.float64)) * 100, atol=1e-3)


def test_mta_batch_matches_single():
    rng = np.random.default_rng(5)
    clouds, text = [], None
    for _ in range(3):
        f, text = _random_cloud(rng)
        clouds.append(f)
    batch = jnp.asarray(np.stack(clouds))
    modes = np.asarray(solve_mta_batch(batch, jnp.asarray(text)))
    for i, f in enumerate(clouds):
        single = np.asarray(solve_mta(jnp.asarray(f), jnp.asarray(text)))
        np.testing.assert_allclose(modes[i], single, atol=1e-5)


def test_mta_tight_cluster_recovers_center():
    """A tight cluster + far outliers: the mode should land near the cluster
    mean direction, robust to the outliers."""
    rng = np.random.default_rng(6)
    center = rng.standard_normal(8)
    center /= np.linalg.norm(center)
    cluster = center + 0.01 * rng.standard_normal((20, 8))
    outliers = rng.standard_normal((4, 8))
    feats = np.concatenate([cluster, outliers])
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    text = rng.standard_normal((5, 8))
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    mode = np.asarray(solve_mta(jnp.asarray(feats.astype(np.float32)), jnp.asarray(text.astype(np.float32))))
    assert float(mode @ center) > 0.99
