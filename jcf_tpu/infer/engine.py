"""Jitted TTA inference engine.

The reference's hot loop (``/root/reference/ood.py:867-883``) runs 513
ViT-B/32 crop-forwards per image, one host-side PIL crop at a time, then
the MTA solver. Here the whole thing is one XLA program per image batch:

  crops (host- or device-sampled) -> patchify matmul -> scanned blocks with
  fused Pallas attention -> L2 norm -> vmapped MTA -> logits

Device-side crop sampling re-designs the crop pipeline for TPU: a
RandomResizedCrop + flip is expressed as two small interpolation-matrix
matmuls per view (separable bilinear resampling), so the entire TTA view
stack is generated on-chip from one 256x256 source image — the host ships
B images instead of B*N crops (N x less PCIe/DCN traffic).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD
from jcf_tpu.models.clip import (
    CLIPConfig,
    embed_views_nhcw,
    encode_image,
    encode_image_rows_dense,
    encode_image_tokens,
    fold_normalize_into_embed,
)
from jcf_tpu.ops.layers import l2_normalize
from jcf_tpu.ops.view_kernel import fused_views_nchw, sample_view_centers
from jcf_tpu.tta.mta import MTAParams
from jcf_tpu.tta import solve_mta_batch


def _import_shard_map():
    """jax.shard_map (0.8+); the experimental fallback predates the
    check_vma kwarg, so wrap it to accept/ignore it (ADVICE r3)."""
    try:
        from jax import shard_map

        return shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm

        def shard_map(f, **kw):
            kw.pop("check_vma", None)
            return _sm(f, **kw)

        return shard_map


def encode_image_batched(
    params: dict,
    cfg: CLIPConfig,
    images: jax.Array,
    *,
    dtype=jnp.float32,
    impl: Optional[str] = None,
    normalize: bool = True,
) -> jax.Array:
    """encode_image + L2 norm over a flat [M, 3, H, W] batch."""
    feats = encode_image(params, cfg, images, dtype=dtype, impl=impl)
    return l2_normalize(feats) if normalize else feats


# ---------------------------------------------------------------------------
# device-side RandomResizedCrop as interpolation matmuls
# ---------------------------------------------------------------------------


def _interp_matrix(starts: jax.Array, sizes: jax.Array, src: int, dst: int) -> jax.Array:
    """Batched bilinear interpolation matrices W [B, dst, src]: output row o
    samples source coordinate start + (o + 0.5) * size/dst - 0.5 with a
    triangle kernel widened by the downscale factor (PIL-style antialias).
    starts/sizes: [B] floats (crop box edges in source pixels)."""
    o = jnp.arange(dst, dtype=jnp.float32)  # [dst]
    i = jnp.arange(src, dtype=jnp.float32)  # [src]
    scale = sizes[:, None] / dst  # [B, 1]
    centers = starts[:, None] + (o[None, :] + 0.5) * scale - 0.5  # [B, dst]
    support = jnp.maximum(scale, 1.0)  # antialias: widen kernel when downscaling
    dist = jnp.abs(centers[:, :, None] - i[None, None, :]) / support[:, :, None]
    w = jnp.maximum(0.0, 1.0 - dist)  # [B, dst, src]
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)


def crop_resize_matrices(
    boxes: jax.Array, src_hw: Tuple[int, int], out_size: int
) -> Tuple[jax.Array, jax.Array]:
    """boxes [B, 4] = (top, left, h, w) in source pixels -> row/col
    interpolation matrices ([B, out, H], [B, out, W])."""
    top, left, h, w = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    wy = _interp_matrix(top, h, src_hw[0], out_size)
    wx = _interp_matrix(left, w, src_hw[1], out_size)
    return wy, wx


def apply_crop_resize(images: jax.Array, wy: jax.Array, wx: jax.Array) -> jax.Array:
    """images [B, C, H, W] x (wy [B, out, H], wx [B, out, W]) ->
    [B, C, out, out] — two MXU matmuls per view.

    Default matmul precision: pixel resampling of 8-bit-origin data doesn't
    need the 6-pass f32 path (HIGHEST measured ~6x slower here; the
    truncation error is far below JPEG noise)."""
    wy = wy.astype(images.dtype)
    wx = wx.astype(images.dtype)
    t = jnp.einsum("boh,bchw->bcow", wy, images)
    return jnp.einsum("bow,bcqw->bcqo", wx, t)


def sample_crop_boxes(
    key: jax.Array,
    n: int,
    src_hw: Tuple[int, int],
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (0.75, 4.0 / 3.0),
) -> Tuple[jax.Array, jax.Array]:
    """Sample n (top, left, h, w) boxes + flip flags, torchvision-style
    (area uniform in `scale`, log-uniform aspect). Rejection sampling is
    replaced by clamping to the image — compiler-friendly, same coverage
    for the reference's scale ranges (boxes rarely overflow at scale<=1)."""
    boxes, flips = _sample_boxes_shaped(key, (n,), src_hw, scale, ratio)
    return boxes, flips


def _sample_boxes_shaped(key, shape, src_hw, scale, ratio):
    """Box sampling over an arbitrary leading shape from ONE key.

    Batched draws matter on TPU: a per-image ``vmap(split+sample)`` runs
    B threefry key-derivations and 5B tiny uniforms per batch — the bench
    trace showed ~1.3 ms/iter of fragmented "centers" fusions at 128x8.
    Five batch-shaped draws generate the same distribution in a handful
    of big VPU ops."""
    h_src, w_src = src_hw
    k_area, k_ratio, k_top, k_left, k_flip = jax.random.split(key, 5)
    area = w_src * h_src * jax.random.uniform(
        k_area, shape, minval=scale[0], maxval=scale[1]
    )
    log_r = jax.random.uniform(
        k_ratio, shape, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_r)
    w = jnp.sqrt(area * aspect)
    h = jnp.sqrt(area / aspect)
    w = jnp.clip(w, 8.0, w_src)
    h = jnp.clip(h, 8.0, h_src)
    top = jax.random.uniform(k_top, shape) * (h_src - h)
    left = jax.random.uniform(k_left, shape) * (w_src - w)
    flips = jax.random.bernoulli(k_flip, 0.5, shape)
    return jnp.stack([top, left, h, w], axis=-1), flips


def sample_tta_boxes(
    key: jax.Array,
    batch: int,
    n_random: int,
    src_hw: Tuple[int, int],
    out_size: int,
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (0.75, 4.0 / 3.0),
) -> Tuple[jax.Array, jax.Array]:
    """Whole-batch TTA boxes: the center crop first, then ``n_random``
    random crops per image -> (boxes [B, 1+n, 4], flips [B, 1+n] bool).
    One key, batched draws (see ``_sample_boxes_shaped``)."""
    h_src, w_src = src_hw
    boxes, flips = _sample_boxes_shaped(
        key, (batch, n_random), src_hw, scale, ratio
    )
    center = jnp.array(
        [(h_src - out_size) // 2, (w_src - out_size) // 2, out_size, out_size],
        jnp.float32,
    )
    boxes = jnp.concatenate(
        [jnp.broadcast_to(center, (batch, 1, 4)), boxes], axis=1
    )
    flips = jnp.concatenate([jnp.zeros((batch, 1), bool), flips], axis=1)
    return boxes, flips


def device_tta_views_nhcw(
    images: jax.Array,
    key: jax.Array,
    n_views: int,
    out_size: int = 224,
    scale: Tuple[float, float] = (0.5, 1.0),
) -> jax.Array:
    """[B, C, H, W] source images -> [B, n_views+1, out, C, out] TTA views
    (center crop first, then n_views random crops), in NHCW layout.

    Re-designed for the MXU: both resampling passes are single batched
    dot_generals over the whole batch — no per-image vmap, no Nx source
    broadcast, no output flip pass:

      - the center crop is just another crop box (integer offsets make the
        triangle kernel an exact selector), so it rides the same GEMMs;
      - horizontal flips fold into the column interpolation matrix
        (reversing wx's output rows == flipping the view), touching a
        [N, out, W] matrix instead of the [N, C, out, out] pixels;
      - pass 1 contracts H against [B, H, C*W]; pass 2 contracts W with
        lhs free dims (o, C) kept, so the result lands in [o, C, q] order
        with no transpose (``_patchify_nhcw`` consumes it directly).
    """
    b = images.shape[0]
    boxes, flips = sample_tta_boxes(
        key, b, n_views, images.shape[2:], out_size, scale
    )
    return tta_views_nhcw_from_boxes(images, boxes, flips, out_size)


def tta_views_nhcw_from_boxes(
    images: jax.Array,
    boxes: jax.Array,  # [B, N, 4] (center-first; see sample_tta_boxes)
    flips: jax.Array,  # [B, N] bool
    out_size: int = 224,
) -> jax.Array:
    """Resample pre-sampled TTA boxes -> [B, N, out, C, out] NHCW views
    (the GEMM pipeline of ``device_tta_views_nhcw``, sampling split out so
    a DP caller can shard the boxes with the images)."""
    b, c, h, w = images.shape
    n = boxes.shape[1]

    wy, wx = crop_resize_matrices(boxes.reshape(b * n, 4), (h, w), out_size)
    wy = wy.reshape(b, n, out_size, h).astype(images.dtype)
    wx = wx.reshape(b, n, out_size, w).astype(images.dtype)
    wx = jnp.where(flips[:, :, None, None], wx[:, :, ::-1, :], wx)

    # pass 1 contracts H straight out of NCHW (free dims C, W kept) — no
    # source transpose; XLA absorbs the operand layout into the GEMM
    t = jax.lax.dot_general(
        wy.reshape(b, n * out_size, h), images,
        (((2,), (2,)), ((0,), (0,))),
    )  # [B, N*o, C, W]
    t = t.reshape(b, n, out_size, c, w)
    views = jax.lax.dot_general(
        t, wx, (((4,), (3,)), ((0, 1), (0, 1))),
    )  # [B, N, o, C, q]
    return views


def device_random_crops(
    images: jax.Array,
    key: jax.Array,
    n_views: int,
    out_size: int = 224,
    scale: Tuple[float, float] = (0.5, 1.0),
) -> jax.Array:
    """[B, C, H, W] source images -> [B, n_views, C, out, out] TTA views,
    sampled and resampled entirely on device."""
    b, c, h, w = images.shape

    def per_image(img, k):
        boxes, flips = sample_crop_boxes(k, n_views, (h, w), scale)
        wy, wx = crop_resize_matrices(boxes, (h, w), out_size)
        views = apply_crop_resize(
            jnp.broadcast_to(img[None], (n_views, c, h, w)), wy, wx
        )
        return jnp.where(flips[:, None, None, None], views[..., ::-1], views)

    keys = jax.random.split(key, b)
    return jax.vmap(per_image)(images, keys)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


class TTAEngine:
    """Compiled end-to-end TTA: images -> MTA mode features / logits.

    Two entry modes:
    - ``features_from_crops``: host-prepared crop stacks [B, N, 3, s, s]
      (bit-parity path with the reference's PIL crops)
    - ``features_from_images``: source images [B, 3, H, W]; views are
      sampled on device (throughput path)

    Data parallelism: pass a ``mesh`` (1-D over axis "data", or any mesh
    containing that axis) and every entry point shards its image batch
    over the axis with parameters replicated — the TPU-native scale-out
    for the reference's serving loops (SURVEY.md §2.5 row 1: whole TTA
    batch = one XLA program per chip). The compute is embarrassingly
    parallel per image (``shard_map`` with no collectives); batches are
    padded to a device multiple by repeating the last image and sliced
    back, and per-image crop RNG keys are pre-split on the global batch so
    results are value-identical to the single-device path.
    """

    def __init__(
        self,
        params: dict,
        cfg: CLIPConfig,
        *,
        dtype=jnp.float32,
        impl: Optional[str] = None,
        n_views: int = 8,
        crop_scale: Tuple[float, float] = (0.5, 1.0),
        normalize_views: bool = True,
        mta_params: MTAParams = MTAParams(),
        quant: Optional[str] = None,  # "int8" -> W8A8 tower matmuls
        fused_views: bool = True,  # Pallas view+patchify kernel
        mesh=None,  # jax.sharding.Mesh with a "data" axis -> DP serving
        calibration_images=None,  # [B, 3, H, W] sample -> static act quant
        static_quant_mode: str = "full",  # "ln" (post-LN) | "hidden" (+post-GELU) | "full" (+ctx)
        embed_impl: Optional[str] = None,  # None=auto | "conv" | "conv_i8" | "gemm_i8" | "dot6"
    ):
        self.cfg = cfg
        self.dtype = dtype
        self.impl = impl
        self.n_views = n_views
        self.crop_scale = crop_scale
        self.normalize_views = normalize_views
        self.mta = mta_params
        if embed_impl is None:
            # int8 engines take the int8 patch embed by default (the same
            # ranking cert that gates the int8 towers gates it)
            embed_impl = "conv_i8" if quant == "int8" else "conv"
        # pre-cast the tower weights to the compute dtype once — casting
        # ~150M params inside every call costs HBM bandwidth and kernels.
        # ONE jitted program (not per-leaf ops): on a tunnel-attached chip
        # every tiny op costs a remote compile that is too quick for the
        # persistent cache to keep, so per-leaf casting alone ran minutes
        # per process (bench phase marks, r4); a single program persists.
        self._params = jax.jit(
            lambda p: jax.tree_util.tree_map(
                lambda x: (
                    x.astype(dtype)
                    if hasattr(x, "astype") and x.dtype == jnp.float32
                    else x
                ),
                p,
            )
        )(params)
        # optional W8A8 serving mode: block matmul weights quantized once.
        # On the fused-kernel path the LN affine and attention scale fold
        # into the int8 weights at quantization time (exact; PERF.md r3) —
        # the composable path (explicit impl / non-TPU backends) keeps the
        # unfolded tree.
        self._quant_visual = None
        self._quant_folded = False
        if quant == "int8":
            from jcf_tpu.ops.quant import quantize_clip_params

            # the fused kernels (and hence the folded tree) are only
            # dispatched for towers under 128 tokens (models.clip._run_blocks
            # gate); longer towers (e.g. ViT-B/16's 197) take the composable
            # path, which needs the UNFOLDED tree (ADVICE r3)
            fold = (
                impl in (None, "fused")
                and jax.default_backend() == "tpu"
                and cfg.vision_seq_len < 128
            )
            act_scales = None
            act_static = ("ctx", "hidden")
            if fold and calibration_images is not None:
                # per-layer static activation scales for the post-LN
                # quantizations, calibrated on a serving-distribution
                # sample (z-scored LN inputs; see vision_ln_z_amax).
                # Honest per-deployment calibration: scales derive from
                # runtime data, and the bench ranking cert still gates
                # int8-vs-f32 agreement on the final config.
                from jcf_tpu.models.clip import vision_ln_z_amax

                # "<base>[+score]": base picks which quants go static,
                # "+score" adds the max-free softmax shift (also
                # calibrated; exact up to f32 range, kernels skip the
                # per-row score max)
                base_mode, _, score_suffix = static_quant_mode.partition("+")
                with_scores = score_suffix == "score"
                imgs = jnp.asarray(calibration_images[:32], jnp.float32)
                if imgs.shape[-1] != cfg.image_resolution:
                    imgs = _center_crop_view(imgs, cfg.image_resolution)
                if normalize_views:
                    mean_ = jnp.asarray(CLIP_MEAN, jnp.float32).reshape(1, 3, 1, 1)
                    std_ = jnp.asarray(CLIP_STD, jnp.float32).reshape(1, 3, 1, 1)
                    imgs = (imgs - mean_) / std_
                amax = jax.jit(
                    lambda p, im: vision_ln_z_amax(p, cfg, im, with_scores=with_scores)
                )(params, imgs)
                amax = jax.device_get(amax)
                if base_mode == "ln":
                    # z-scored LN inputs have tight, stable ranges; the
                    # ctx/hidden ranges vary more per row — keeping those
                    # two quants dynamic preserves int8-vs-f32 ranking
                    # margin (the bench cert showed full-static plus the
                    # native-tanh GELU dips below the top-5 gate)
                    act_static = ()
                elif base_mode == "hidden":
                    # middle ground: the post-GELU hidden quant (the
                    # [rows, 3072] |x|max reduction — the widest one)
                    # goes static too; ctx stays per-row dynamic
                    act_static = ("hidden",)
                elif base_mode == "full":
                    act_static = ("ctx", "hidden")
                else:
                    raise ValueError(
                        f"unknown static_quant_mode {static_quant_mode!r}"
                    )
                if with_scores:
                    act_static = act_static + ("score",)
                act_scales = {"visual": amax}
            # one jitted program for the whole quantize+fold (same tunnel
            # tiny-compile reasoning as the cast above)
            heads_ = {"visual": cfg.vision_heads, "text": cfg.text_heads}
            if act_scales is None:
                self._quant_visual = jax.jit(
                    lambda p: quantize_clip_params(
                        p, fold=fold, heads=heads_, act_static=act_static
                    )["visual"]
                )(params)
            else:
                self._quant_visual = jax.jit(
                    lambda p, a: quantize_clip_params(
                        p, fold=fold, heads=heads_,
                        act_scales={"visual": a}, act_static=act_static,
                    )["visual"]
                )(params, act_scales["visual"])
            self._quant_folded = fold
        elif quant is not None:
            raise ValueError(f"unknown quant mode {quant!r}")

        mean = jnp.asarray(CLIP_MEAN, jnp.float32).reshape(3, 1, 1)
        std = jnp.asarray(CLIP_STD, jnp.float32).reshape(3, 1, 1)

        quant_visual = self._quant_visual
        quant_folded = self._quant_folded
        use_fused_views = fused_views

        def _encode_cloud(params, crops):  # [B, N, 3, s, s] -> [B, N, D]
            b, n = crops.shape[:2]
            flat = crops.reshape((b * n,) + crops.shape[2:])
            feats = encode_image(
                params, cfg, flat, dtype=dtype, impl=impl, quant=quant_visual,
                quant_folded=quant_folded,
            )
            feats = l2_normalize(feats)
            return feats.reshape(b, n, -1).astype(jnp.float32)

        def features_from_crops(params, crops, text_weights):
            clouds = _encode_cloud(params, crops)
            return solve_mta_batch(clouds, text_weights, self.mta)

        # CLIP normalization is per-channel affine and the crop resampling
        # is convex-linear, so the normalize folds EXACTLY into the patch
        # embedding (fold_normalize_into_embed) — raw pixels flow through
        # the sampler with no elementwise producer (XLA would otherwise
        # sink the normalize into the Nx-expanded views, recomputing it
        # per view — measured +8ms at 128x8 on v5e).
        w4_f32, fold_bias = fold_normalize_into_embed(
            params["visual"]["patch_embed"]["w"],
            CLIP_MEAN if normalize_views else (0.0, 0.0, 0.0),
            CLIP_STD if normalize_views else (1.0, 1.0, 1.0),
            cfg.vision_patch_size,
            dtype=jnp.float32,
        )
        w4 = w4_f32.astype(dtype)

        embed_q = None
        if embed_impl in ("conv_i8", "gemm_i8"):
            # int8 patch embed (PERF.md r4): the view kernel emits int8
            # pixels q = round(v*254 - 127) (exact 8-bit affine quant of
            # [0,1] data — the JPEG source precision), the patchify conv
            # runs s8 x s8 -> s32 on the int8 MXU, and the constant +127
            # pixel offset folds into the bias using the EXACT folded
            # weight: conv((q+127)/254, W) = conv(q, W)/254 + rowsum(W) *
            # 127/254. Only the weight-side int8 rounding approximates.
            def _embed_quant(w4f, fb):
                kern_f = jnp.transpose(w4f, (3, 0, 1, 2))  # [E, C, p, p]
                flat = kern_f.reshape(kern_f.shape[0], -1)
                kscale = jnp.maximum(jnp.max(jnp.abs(flat), axis=1) / 127.0, 1e-8)
                k_q = (
                    jnp.clip(jnp.round(flat / kscale[:, None]), -127, 127)
                    .astype(jnp.int8)
                    .reshape(kern_f.shape)
                )
                bias_i8 = fb + jnp.sum(flat, axis=1) * (127.0 / 254.0)
                return k_q, (kscale / 254.0).astype(jnp.float32), bias_i8

            embed_q = jax.jit(_embed_quant)(w4_f32, fold_bias)

        # fused token assembly (PERF.md r4): when the tower takes the dense
        # flat-row path, the conv epilogue + CLS + pos + ln_pre + bf16 cast
        # + dense flatten collapse into one Pallas pass and the padded
        # [B', S, E] f32 intermediates (~8 ms/iter of glue at 4096 crops)
        # never exist in HBM. TPU serving only; exact same numerics.
        from jcf_tpu.ops.block_kernel import dense_rows_eligible

        use_assembled_rows = (
            os.environ.get("JCF_ASSEMBLE", "1") == "1"
            and use_fused_views
            and embed_impl in ("conv", "conv_i8", "gemm_i8")
            and quant == "int8"
            and impl in (None, "fused")
            and jax.default_backend() == "tpu"
            and not cfg.vision_prompt_tokens
            and cfg.vision_seq_len < 128
            and dense_rows_eligible(cfg.vision_seq_len, cfg.vision_heads)
        )

        def _rows_feats(params, acc_nhwc, col_scale, col_bias, b, n,
                        text_weights):
            # fused assembly path: conv NHWC output -> flat dense rows ->
            # flat tower -> strided CLS extraction (no padded [B', S, E]
            # HBM intermediates anywhere on the vision path)
            from jcf_tpu.ops.assemble_kernel import (
                assemble_dense_rows,
                make_cls_row,
            )

            v_par = params["visual"]
            lnp = v_par["ln_pre"]
            pos = v_par["positional_embedding"]
            cls_row = make_cls_row(
                v_par["class_embedding"], pos[0], lnp["scale"], lnp["bias"],
                dtype=dtype,
            )
            rows = assemble_dense_rows(
                acc_nhwc, col_scale, col_bias, pos[1:], cls_row,
                lnp["scale"], lnp["bias"], dtype=dtype,
                interpret=jax.default_backend() != "tpu",
            )
            feats = encode_image_rows_dense(
                params, cfg, rows, dtype=dtype, quant=quant_visual,
                quant_folded=quant_folded,
            )
            feats = l2_normalize(feats).reshape(b, n, -1).astype(jnp.float32)
            return solve_mta_batch(feats, text_weights, self.mta)

        def sample_view_spec(key, b, src_hw):
            # the whole batch's crop geometry from ONE key, outside the
            # (possibly sharded) compute: batched draws replace B per-image
            # threefry splits (PERF.md r4), and the DP path shards the
            # result with the images — byte-identical to single-device
            if use_fused_views:
                return sample_view_centers(
                    key, b, n_views + 1, src_hw, cfg.image_resolution, crop_scale
                )
            return sample_tta_boxes(
                key, b, n_views, src_hw, cfg.image_resolution, crop_scale
            )

        def features_from_images_spec(params, images, text_weights, spec):
            # spec: (cy, cx, inv) per-view crop geometry (fused path) or
            # (boxes, flips) (XLA view path), leading dim = batch
            images = images.astype(dtype)
            b = images.shape[0]
            n = n_views + 1
            if use_fused_views:
                # one Pallas program per image: interpolation weights,
                # both resample GEMMs and the flip stay in VMEM — removes
                # the wy/wx/t/rev HBM materializations of the XLA view
                # pipeline (scripts/trace_bench.py; ops/view_kernel.py)
                cy, cx, inv = spec
                p = cfg.vision_patch_size
                g = cfg.image_resolution // p
                # patch-row-split emission for the conv1d patchify: the
                # (C*p)-channel 1D conv avoids XLA's shallow-conv batch-
                # minor layouts (17.2 -> 6.3 ms at 4096 crops, PERF.md r4)
                py_split = (
                    p if embed_impl == "conv_i8"
                    and jax.default_backend() == "tpu" else 0
                )
                views = fused_views_nchw(
                    images, cy, cx, inv, cfg.image_resolution,
                    interpret=jax.default_backend() != "tpu",
                    quantize=embed_impl in ("conv_i8", "gemm_i8"),
                    py_split=py_split,
                )  # [B, N, C, o, q] — or [B, N, g, C, p, o] py-split
                if embed_impl in ("conv_i8", "gemm_i8"):
                    # int8 patchify on TPU. Two forms, both int8 pixels:
                    # - conv_i8: stride-p conv. XLA has no true int8 conv
                    #   lowering (trace r4 post-assembly: conv fusion 9.8 +
                    #   batch-minor views relayout 5.2 + output relayout
                    #   2.0 = 17 ms/iter at b512 vs 2.4 int8-GEMM-ideal).
                    # - gemm_i8: explicit im2col (6D transpose) + ONE flat
                    #   s8xs8->s32 dot whose [B'*49, E] output is already
                    #   the assemble kernel's canonical input layout (no
                    #   conv layouts anywhere). Pre-assembly this benched
                    #   3235 vs 3347 (the dot output fed XLA glue then);
                    #   re-tested post-assembly where it replaces all three
                    #   conv-section relayouts.
                    k_q, k_sc, b_i8 = embed_q
                    if py_split:
                        # [B, N, g, 3, p, o] -> (C*p)-channel stride-p
                        # conv1d; output rows land (b, py, px)-ordered —
                        # exactly the NHWC acc the assemble path consumes
                        # (same integers as the 2D conv: conv1d==conv2d
                        # pinned in scripts/exp_conv1d_patchify.py + tests)
                        v1 = views.reshape(b * n * g, 3 * p, g * p)
                        acc = jax.lax.conv_general_dilated(
                            v1, k_q.reshape(k_q.shape[0], 3 * p, p),
                            (p,), "VALID",
                            dimension_numbers=("NCW", "OIW", "NWC"),
                            preferred_element_type=jnp.int32,
                        ).reshape(b * n, g, g, -1)  # [B', g, g, E]
                        if use_assembled_rows:
                            return _rows_feats(
                                params, acc, k_sc, b_i8, b, n, text_weights
                            )
                        acc = acc.reshape(b * n, g * g, -1)
                    elif embed_impl == "gemm_i8" and jax.default_backend() == "tpu":
                        vq = views.reshape(b * n, 3, g * p, g * p)
                        x6 = (
                            vq.reshape(b * n, 3, g, p, g, p)
                            .transpose(0, 2, 4, 1, 3, 5)
                            .reshape(b * n * g * g, 3 * p * p)
                        )
                        acc = jax.lax.dot_general(
                            x6, k_q.reshape(k_q.shape[0], -1).T,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        ).reshape(b * n, g, g, -1)  # [B', g, g, E]
                        if use_assembled_rows:
                            return _rows_feats(
                                params, acc, k_sc, b_i8, b, n, text_weights
                            )
                        acc = acc.reshape(b * n, g * g, -1)
                    elif jax.default_backend() == "tpu":
                        vq = views.reshape(b * n, 3, g * p, g * p)
                        acc = jax.lax.conv_general_dilated(
                            vq, k_q, (p, p), "VALID",
                            dimension_numbers=("NCHW", "OIHW", "NHWC"),
                            preferred_element_type=jnp.int32,
                        )  # [B', g, g, E] NHWC
                        if use_assembled_rows:
                            return _rows_feats(
                                params, acc, k_sc, b_i8, b, n, text_weights
                            )
                        acc = acc.reshape(b * n, g * g, -1)
                    else:
                        # im2col s32 dot — same integers on backends
                        # without an int8 conv path (CPU tests)
                        vq = views.reshape(b * n, 3, g * p, g * p)
                        x6 = (
                            vq.reshape(b * n, 3, g, p, g, p)
                            .transpose(0, 2, 4, 1, 3, 5)
                            .reshape(b * n, g * g, -1)
                        )
                        acc = jax.lax.dot_general(
                            x6, k_q.reshape(k_q.shape[0], -1),
                            (((2,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                    tokens = acc.astype(jnp.float32) * k_sc + b_i8
                elif embed_impl == "conv":
                    # stride-p conv with NHWC output (no output transpose).
                    # XLA's TPU conv lowering handles the patch regroup
                    # that the explicit 6D dot paid ~5.8 ms of layout
                    # copies for (PERF.md r3: 2699 -> 2873 img/s)
                    kern = jnp.transpose(w4, (3, 0, 1, 2))  # [E, C, p, p]
                    acc = jax.lax.conv_general_dilated(
                        views.reshape(b * n, 3, g * p, g * p), kern,
                        (p, p), "VALID",
                        dimension_numbers=("NCHW", "OIHW", "NHWC"),
                        preferred_element_type=jnp.float32,
                    )  # [B', g, g, E] NHWC
                    if use_assembled_rows:
                        ones = jnp.ones((acc.shape[-1],), jnp.float32)
                        return _rows_feats(
                            params, acc, ones, fold_bias, b, n, text_weights
                        )
                    tokens = acc.reshape(b * n, g * g, -1) + fold_bias
                else:
                    # patchify+embed as one 6D dot_general off NCHW
                    x6 = views.reshape(b * n, 3, g, p, g, p)
                    tokens = jax.lax.dot_general(
                        x6, w4, (((1, 3, 5), (0, 1, 2)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(b * n, g * g, -1) + fold_bias
            else:
                boxes, flips = spec
                views = tta_views_nhcw_from_boxes(
                    images, boxes, flips, cfg.image_resolution
                )  # [B, N+1, o, C, q] — center view first
                flat = views.reshape((b * n,) + views.shape[2:])
                tokens = embed_views_nhcw(flat, w4, fold_bias)
            feats = encode_image_tokens(
                params, cfg, tokens, dtype=dtype, impl=impl, quant=quant_visual,
                quant_folded=quant_folded,
            )
            feats = l2_normalize(feats).reshape(b, n, -1).astype(jnp.float32)
            return solve_mta_batch(feats, text_weights, self.mta)

        def cloud_features(params, crops):
            return _encode_cloud(params, crops)

        def mta_from_features(feats, text_weights):
            return solve_mta_batch(feats, text_weights, self.mta)

        def features_from_images_key(params, images, text_weights, key):
            # single-device path: sample in-jit — one dispatch per batch
            # (a separate host-side sampling step costs a full tunnel round
            # trip per iteration on remote-attached chips)
            spec = sample_view_spec(key, images.shape[0], images.shape[2:])
            return features_from_images_spec(params, images, text_weights, spec)

        self.mesh = mesh
        if mesh is None:
            self._features_from_crops = jax.jit(features_from_crops)
            self._features_from_images = jax.jit(features_from_images_key)
            self._cloud_features = jax.jit(cloud_features)
            self._mta_from_features = jax.jit(mta_from_features)
        else:
            # shard_map over the data axis: per-image compute, zero
            # collectives; each shard runs the single-device program on
            # its slice of the (padded) batch
            from jax.sharding import PartitionSpec as P

            shard_map = _import_shard_map()

            axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
            self._data_axis = axis
            self._n_data = mesh.shape[axis]
            bs = P(axis)  # dim-0 batch sharding (other dims replicated)
            rp = P()
            self._params = jax.device_put(
                self._params, jax.sharding.NamedSharding(mesh, rp)
            )

            def sharded(f, in_batch_argnums, n_args):
                specs = tuple(
                    bs if i in in_batch_argnums else rp for i in range(n_args)
                )
                return jax.jit(
                    shard_map(
                        f, mesh=mesh, in_specs=specs, out_specs=bs,
                        check_vma=False,  # pallas_call outputs carry no vma
                    )
                )

            def features_from_images_dp(params, images, text_weights, key):
                # crop geometry for the WHOLE padded batch from one key,
                # computed outside the shard_map (tiny tensors) and sharded
                # with the images — byte-identical to the 1-device path
                spec = sample_view_spec(key, images.shape[0], images.shape[2:])
                return shard_map(
                    features_from_images_spec,
                    mesh=mesh,
                    in_specs=(rp, bs, rp, bs),  # bs broadcasts over the spec tree
                    out_specs=bs,
                    check_vma=False,  # pallas_call outputs carry no vma
                )(params, images, text_weights, spec)

            self._features_from_crops = sharded(features_from_crops, {1}, 3)
            self._features_from_images = jax.jit(features_from_images_dp)
            self._cloud_features = sharded(cloud_features, {1}, 2)
            self._mta_from_features = sharded(mta_from_features, {0}, 2)

    # -- DP batch plumbing ---------------------------------------------

    def _pad_batch(self, x):
        """Pad dim 0 to a multiple of the data-axis size by repeating the
        last row (padded rows are sliced away after the call)."""
        b = x.shape[0]
        r = (-b) % self._n_data
        if r:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], r, axis=0)], axis=0)
        return x

    def _put_batch(self, x):
        from jcf_tpu.parallel import batch_sharding

        return jax.device_put(x, batch_sharding(self.mesh, x.ndim, self._data_axis))

    def _put_repl(self, x):
        from jcf_tpu.parallel import replicated_sharding

        return jax.device_put(x, replicated_sharding(self.mesh))

    # -- public API ----------------------------------------------------

    def features_from_crops(self, crops, text_weights):
        """crops [B, N, 3, s, s] (row 0 should be the center view) ->
        MTA mode features [B, D]."""
        if self.mesh is None:
            return self._features_from_crops(self._params, crops, text_weights)
        b = crops.shape[0]
        out = self._features_from_crops(
            self._params, self._put_batch(self._pad_batch(crops)),
            self._put_repl(text_weights),
        )
        return out[:b]

    def features_from_images(self, images, text_weights, key):
        """images [B, 3, H, W] (e.g. 256x256 resized, [0,1] range) ->
        MTA mode features [B, D]; views sampled on device."""
        b = images.shape[0]
        if self.mesh is None:
            return self._features_from_images(
                self._params, images, text_weights, key
            )
        # the crop geometry is drawn for the padded batch inside the jit
        # from this one key (batch-shaped draws have the prefix property:
        # the first b rows equal a b-sized draw), so modes match the
        # single-device path exactly
        out = self._features_from_images(
            self._params,
            self._put_batch(self._pad_batch(images)),
            self._put_repl(text_weights),
            key,
        )
        return out[:b]

    def crop_features(self, crops):
        """[B, N, 3, s, s] -> per-view L2-normalized features [B, N, D]."""
        if self.mesh is None:
            return self._cloud_features(self._params, crops)
        b = crops.shape[0]
        return self._cloud_features(
            self._params, self._put_batch(self._pad_batch(crops))
        )[:b]

    def mta_from_features(self, feats, text_weights):
        """Cached per-view features [B, N, D] -> MTA mode features [B, D].

        ``features_from_crops(crops, t) == mta_from_features(crop_features(
        crops), t)`` — lets callers encode a crop cloud once and solve MTA
        against several classifiers (the reference encodes once per tower,
        /root/reference/test.py:1705-1710)."""
        if self.mesh is None:
            return self._mta_from_features(feats, text_weights)
        b = feats.shape[0]
        return self._mta_from_features(
            self._put_batch(self._pad_batch(feats)), self._put_repl(text_weights)
        )[:b]

    def logits(self, modes, text_weights):
        return (modes @ text_weights.T) * 100.0


def _center_crop_view(images: jax.Array, size: int) -> jax.Array:
    """Central size x size crop of [B, C, H, W] (H, W >= size)."""
    b, c, h, w = images.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return jax.lax.dynamic_slice(
        images, (0, 0, top, left), (b, c, size, size)
    )
