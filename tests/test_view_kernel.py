"""Fused view-sampling kernel vs the composable XLA view pipeline."""

import numpy as np

import jax
import jax.numpy as jnp

from jcf_tpu.infer.engine import device_tta_views_nhcw
from jcf_tpu.ops.view_kernel import fused_views_nchw, sample_view_centers

RNG = np.random.default_rng(17)


def test_fused_views_match_engine_pipeline():
    """Same key -> same boxes -> same NHCW views (incl. flips and the
    exact center crop as view 0)."""
    b, c, h, w = 2, 3, 64, 64
    out_size, patch, n_views = 32, 16, 6
    images = jnp.asarray(RNG.random((b, c, h, w)).astype(np.float32))
    key = jax.random.PRNGKey(5)

    ref = device_tta_views_nhcw(images, key, n_views - 1, out_size)

    cy, cx, inv = sample_view_centers(key, b, n_views, (h, w), out_size)
    got = fused_views_nchw(images, cy, cx, inv, out_size, interpret=True)

    assert got.shape == (b, n_views, c, out_size, out_size)
    # ref is NHCW [B, V, o, C, q]; kernel emits NCHW
    ref_nchw = np.asarray(ref).transpose(0, 1, 3, 2, 4)
    np.testing.assert_allclose(np.asarray(got), ref_nchw, atol=2e-5, rtol=1e-4)

    # view 0 is the exact center crop
    top = (h - out_size) // 2
    center = np.asarray(images)[:, :, top : top + out_size, top : top + out_size]
    np.testing.assert_allclose(np.asarray(got[:, 0]), center, atol=2e-5)
