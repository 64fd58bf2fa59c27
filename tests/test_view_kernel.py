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


def test_fused_views_py_split_matches_nchw():
    """py_split emission (PERF.md r4: conv1d patchify) is a pure store
    reordering of the same pixels: [B, V, g, C, p, o] slab (b,v,py,c,dy,x)
    == NCHW view row p*py+dy. Covers int8-quantized and float pixels."""
    b, c, h, w = 2, 3, 64, 64
    out_size, patch, n_views = 32, 8, 4
    g = out_size // patch
    images = jnp.asarray(RNG.random((b, c, h, w)).astype(np.float32))
    key = jax.random.PRNGKey(9)
    cy, cx, inv = sample_view_centers(key, b, n_views, (h, w), out_size)
    for quant in (False, True):
        base = np.asarray(fused_views_nchw(
            images, cy, cx, inv, out_size, interpret=True, quantize=quant))
        split = np.asarray(fused_views_nchw(
            images, cy, cx, inv, out_size, interpret=True, quantize=quant,
            py_split=patch))
        assert split.shape == (b, n_views, g, c, patch, out_size)
        expect = base.reshape(b, n_views, c, g, patch, out_size).transpose(
            0, 1, 3, 2, 4, 5)
        np.testing.assert_array_equal(split, expect)


def test_conv1d_patchify_matches_conv2d():
    """The (C*p)-channel stride-p conv1d over py-split slabs computes the
    SAME contraction as the stride-p 2D conv over NCHW views (engine
    conv_i8 py-split path). f32 with small integer values = exact."""
    rng = np.random.default_rng(3)
    bn, cch, o, p = 2, 3, 32, 8
    g = o // p
    e = 16
    v = rng.integers(-5, 6, (bn, cch, o, o)).astype(np.float32)
    k = rng.integers(-3, 4, (e, cch, p, p)).astype(np.float32)
    a = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(v), jnp.asarray(k), (p, p), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NHWC")))
    v1 = (v.reshape(bn, cch, g, p, o).transpose(0, 2, 1, 3, 4)
          .reshape(bn * g, cch * p, o))
    b1 = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(v1), jnp.asarray(k.reshape(e, cch * p, p)), (p,),
        "VALID", dimension_numbers=("NCW", "OIW", "NWC")))
    np.testing.assert_array_equal(a, b1.reshape(bn, g, g, e))
