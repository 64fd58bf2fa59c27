"""Fused TTA view sampling as one Pallas kernel.

The XLA pipeline for device-side crops (PERF.md, infer/engine.py)
materializes every intermediate in HBM: the interpolation matrices, the
row-resampled tensor, the flipped column matrices (a full `rev`), the
views — the bench trace shows ~9 ms/iter of pure layout traffic at 128x8
views (scripts/trace_bench.py: copy 2.9 + reshape 2.8 + rev 1.1 + view
fusions ~3).

This kernel keeps the whole view stage in VMEM, one image per program:

  per view v, per channel c:
    wy  = triangle(centers_y[v])   [224, H]       built in-kernel
    t   = wy @ X_c                 [224, W]       row resample (MXU)
    wxT = triangle(centers_x[v])   [W, 224]       built TRANSPOSED
    view_c = t @ wxT               [224, 224]     col resample (MXU)

Output is [B, V, C, out, out] NCHW views; patchify + embed happens
outside (engine.features_from_images, as a 6D dot_general) — an in-kernel
patch regroup needs a sublane->lane shape cast Mosaic doesn't support
(PERF.md). Horizontal flips are folded into the column centers (mirror),
so no `rev` pass, and the transposed column weights avoid any relayout.

Exactness: identical math to engine.device_tta_views_nhcw + patchify
(same triangle kernel, same normalization); verified in
tests/test_view_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _triangle_rows(centers, inv_support, n_src, n_out, transposed):
    """Normalized triangle-filter interpolation weights.

    transposed=False: [n_out, n_src] (rows = output coords)
    transposed=True:  [n_src, n_out] (built directly; no relayout)
    """
    # Mosaic's tpu.iota is integer-only; build int32 and convert
    if transposed:
        i = jax.lax.broadcasted_iota(jnp.int32, (n_src, n_out), 0).astype(jnp.float32)
        c = centers[None, :]
        axis = 0
    else:
        i = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_src), 1).astype(jnp.float32)
        c = centers[:, None]
        axis = 1
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c - i) * inv_support)
    denom = jnp.maximum(jnp.sum(w, axis=axis, keepdims=True), 1e-8)
    return w * (1.0 / denom)


def _view_kernel(
    x_ref,       # [1, C, H, W] bf16 source image, NCHW
    cy_ref,      # [1, V, out] f32 row centers
    cx_ref,      # [1, V, out] f32 col centers (flip already folded)
    inv_ref,     # [1, V, 2] f32 inverse supports (y, x)
    out_ref,     # [1, V, C, out, out] NCHW — or [1, V, g, C, p, out] with
                 # py_split (patch-row-split slabs for the conv1d embed)
    *, n_views, out_size, channels, h_src, w_src, quantize=False,
    py_split=0,
):
    # Mosaic rejects sublane<->lane shape casts and strided middle-dim
    # stores, so the patch regroup stays outside; in-kernel everything is
    # 2D GEMMs + trailing-2D loads/stores: per channel, t_c = wy @ X_c
    # (row resample), view_c = t_c @ wxT_c (col resample, weights built
    # transposed — no relayout), stored as trailing-2D NCHW slots.
    for v in range(n_views):
        inv_y = inv_ref[0, v, 0]
        inv_x = inv_ref[0, v, 1]
        wy = _triangle_rows(cy_ref[0, v], inv_y, h_src, out_size, False)
        wxt = _triangle_rows(cx_ref[0, v], inv_x, w_src, out_size, True)
        wy = wy.astype(x_ref.dtype)
        wxt = wxt.astype(x_ref.dtype)
        for c in range(channels):
            xc = x_ref[0, c]  # [H, W]
            t = jax.lax.dot_general(
                wy, xc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype)  # [out, W]
            view = jax.lax.dot_general(
                t, wxt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [out, out]
            if quantize:
                # exact affine int8 pixel quantization: resampled values
                # are convex combinations of [0,1] pixels, so
                # q = round(v*254 - 127) spans the full int8 range and
                # dequantizes as (q+127)/254 — the +127 offset folds into
                # the patch-embed bias (engine "conv_i8" path). 8-bit
                # steps == the JPEG source precision.
                view = jnp.clip(jnp.round(view * 254.0 - 127.0), -127, 127)
            if py_split:
                # patch-row-split emission (PERF.md r4): the same pixels
                # stored as [g(py), C, p(dy), out] slabs, so the patchify
                # becomes a 96-channel conv1d over lanes-x (XLA lowers it
                # 2.7x faster than the shallow C=3 conv2d). Pure store
                # reordering — g trailing-2D stores per channel.
                p = py_split
                view = view.astype(out_ref.dtype)
                for py in range(out_size // p):
                    out_ref[0, v, py, c] = view[py * p : (py + 1) * p]
            else:
                out_ref[0, v, c] = view.astype(out_ref.dtype)


def sample_view_centers(
    key: jax.Array,
    batch: int,
    n_views: int,
    src_hw: Tuple[int, int],
    out_size: int,
    scale: Tuple[float, float] = (0.5, 1.0),
):
    """Boxes -> per-view output-pixel centers + inverse supports, with the
    center crop as view 0 and horizontal flips folded into mirrored column
    centers. Same box distribution as engine.sample_tta_boxes (one key,
    batched draws — no per-image key splits; a DP caller computes the
    whole batch's centers once and shards them with the images)."""
    from jcf_tpu.infer.engine import sample_tta_boxes

    h_src, w_src = src_hw
    boxes, flips = sample_tta_boxes(
        key, batch, n_views - 1, (h_src, w_src), out_size, scale
    )

    top, left = boxes[..., 0], boxes[..., 1]
    hh, ww = boxes[..., 2], boxes[..., 3]
    o = jnp.arange(out_size, dtype=jnp.float32)
    cy = top[..., None] + (o + 0.5) * (hh / out_size)[..., None] - 0.5
    cx = left[..., None] + (o + 0.5) * (ww / out_size)[..., None] - 0.5
    # horizontal flip = reversed output-column order (the engine reverses
    # wx's output rows, engine.device_tta_views_nhcw) — fold into centers
    cx = jnp.where(flips[..., None], cx[..., ::-1], cx)
    inv = jnp.stack(
        [1.0 / jnp.maximum(hh / out_size, 1.0), 1.0 / jnp.maximum(ww / out_size, 1.0)],
        axis=-1,
    )  # [B, V, 2]
    return cy, cx, inv


def fused_views_nchw(
    images: jax.Array,  # [B, C, H, W] source images
    cy: jax.Array,      # [B, V, out]
    cx: jax.Array,      # [B, V, out]
    inv: jax.Array,     # [B, V, 2]
    out_size: int,
    *,
    interpret: bool = False,
    quantize: bool = False,
    py_split: int = 0,
) -> jax.Array:
    """-> [B, V, C, out, out] NCHW TTA views, value-identical to
    ``device_tta_views_nhcw`` (transposed) for the same boxes;
    interpolation weights, both resample GEMMs and the flip all stay in
    VMEM (one image per program) instead of materializing wy/wx/t/rev in
    HBM. ``quantize=True`` emits int8 pixels ``round(v*254 - 127)`` for
    the int8 patch embed (halves the views' HBM bytes).

    ``py_split=p`` (a patch size dividing ``out_size``) emits the SAME
    pixels as [B, V, g, C, p, out] patch-row-split slabs (g = out/p): a
    free reshape then feeds the patchify as a (C*p)-channel stride-p
    conv1d, which XLA lowers 2.7x faster than the shallow C-channel 2D
    conv (17.2 -> 6.3 ms at 4096 crops; scripts/exp_conv1d_patchify.py)."""
    b, c, h, w = images.shape
    n_views = cy.shape[1]
    out_dtype = jnp.int8 if quantize else images.dtype

    if py_split:
        assert out_size % py_split == 0
        g = out_size // py_split
        out_block = (1, n_views, g, c, py_split, out_size)
        out_index = lambda i: (i, 0, 0, 0, 0, 0)
        out_shape = (b, n_views, g, c, py_split, out_size)
    else:
        out_block = (1, n_views, c, out_size, out_size)
        out_index = lambda i: (i, 0, 0, 0, 0)
        out_shape = (b, n_views, c, out_size, out_size)

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _view_kernel, n_views=n_views, out_size=out_size,
            channels=c, h_src=h, w_src=w, quantize=quantize,
            py_split=py_split,
        ),
        grid=(b,),
        in_specs=[
            vmem((1, c, h, w), lambda i: (i, 0, 0, 0)),
            vmem((1, n_views, out_size), lambda i: (i, 0, 0)),
            vmem((1, n_views, out_size), lambda i: (i, 0, 0)),
            vmem((1, n_views, 2), lambda i: (i, 0, 0)),
        ],
        out_specs=vmem(out_block, out_index),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        interpret=interpret,
    )(images, cy, cx, inv)
