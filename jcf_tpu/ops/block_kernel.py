"""Fused transformer-block Pallas kernels (inference fast path).

PERF.md analysis: after the packed-attention kernel, the encode gap to the
GEMM roofline is per-op activation traffic — every LN / projection /
residual round-trips the [B*S, 768] activation through HBM. These kernels
keep a tile of G crops resident in VMEM across half a block each:

  attention half:  y = x + out_proj(attention(LN1(x) @ Wqkv))
  MLP half:        y = x + c_proj(quick_gelu(c_fc(LN2(x))))

Key shapes trick: all row-wise ops (LN, projections, MLP) run on the
flattened [G*S_pad, E] tile — one large-M GEMM per projection instead of G
small ones — while attention indexes per-crop row ranges out of a VMEM
scratch. S is padded to a sublane multiple ONCE for the whole tower (pad
keys masked via the additive bias), so in-kernel row offsets stay
tile-aligned.

Weights stay VMEM-resident per program (qkv+out ≈ 4.7MB bf16, MLP ≈ 9.4MB
— each half fits; a whole block would not). Traffic per layer drops from
~1.9GB to ~330MB at batch 1024 crops.

Constraints (callers fall back to the composable path otherwise): no LoRA
decomposed branch (merge first), no deep prompt splicing. int8 W8A8 runs
IN these kernels (folded weights + static/dynamic activation scales).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST
_NEG_INF = -1e30
# Run the widest VPU epilogues (the [rows, 3072] MLP dequant+GELU+requant
# chain, the attention exp) at bf16 instead of f32 — half the vector
# elements per op on values that feed an int8 quantizer anyway. A/B knob
# (JCF_BENCH_EPI_BF16); cert-gated.
_EPI_BF16 = False
# All head-pairs in one tile-aligned dot per attention stage instead of a
# per-pair loop (3 small dots x 6 pairs x 12 layers x 64 tiles per b512
# iteration): see _batched_pairs_attention_nomask. A/B knob
# (JCF_BENCH_ATTN_BATCHPAIRS); requires s_pad <= 64.
_ATTN_BATCHPAIRS = False


def _ln_rows(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _ln_norm(x, eps=1e-5):
    """LayerNorm without the affine — the g/b pair is folded into the
    following int8 projection (quantize_clip_params(fold=True))."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps)


def _round_f32(x):
    """round-to-nearest-even, via f32: Mosaic cannot legalize
    math.roundeven on bf16 operands (measured r4) — the _EPI_BF16 chains
    run everything else half-wide and pay one f32 pass here."""
    return jnp.round(x if x.dtype == jnp.float32 else x.astype(jnp.float32))


def _quant_rows(x32):
    """Dynamic per-row symmetric int8: (values int8, scale [rows, 1] f32).
    Runs on rows already resident in VMEM — the quantization passes that
    made the naive XLA int8 path a wash (PERF.md) fuse here for free.
    Quantizes via reciprocal-multiply (per-row reciprocal, per-element
    mul) — VPU divides cost ~4x a multiply and this runs on every
    activation element in the tower."""
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-8)
    inv = 127.0 / amax
    q = jnp.clip(_round_f32(x32 * inv), -127, 127).astype(jnp.int8)
    return q, (amax * (1.0 / 127.0)).astype(jnp.float32)


def _quick_gelu32(h):
    """QuickGELU h*sigmoid(1.702h) in f32. With _GELU_TANH, uses the
    EXACT identity sigmoid(y) = (1 + tanh(y/2))/2 — Mosaic lowers tanh
    natively on the VPU while sigmoid goes through exp + divide."""
    if _GELU_TANH:
        return h * (0.5 + 0.5 * jnp.tanh(0.851 * h))
    return h * jax.nn.sigmoid(1.702 * h)


def _gelu_quant_static(hidden_scaled, h_inv):
    """GELU + STATIC int8 requant on a c_fc output whose h_inv requant
    scale was PRE-FOLDED into the weight scales/bias at trace time
    (hidden_scaled = h * h_inv, a [rows, hidden] tile).

    The scale commutes through QuickGELU exactly: with y = k*h,
    gelu(h)*k == y * sigmoid(1.702*y/k) == y * (0.5 + 0.5*tanh(0.851*y/k))
    — same real function, so the requant collapses to round+clip and the
    unfolded chain's [rows, hidden] requant multiply disappears (one full
    VPU pass per layer over the widest tensor in the tower). Only fp
    association inside the tanh/sigmoid argument differs.
    """
    c = ((0.851 if _GELU_TANH else 1.702) / h_inv).astype(hidden_scaled.dtype)
    if _GELU_TANH:
        g = hidden_scaled * (0.5 + 0.5 * jnp.tanh(c * hidden_scaled))
    else:
        g = hidden_scaled * jax.nn.sigmoid(c * hidden_scaled)
    return _round_clip_int8(g)


def _round_clip_int8(x):
    """round + saturate to int8 — the quant tail for values already in
    the quantized domain (static scale folded upstream)."""
    return jnp.clip(_round_f32(x), -127, 127).astype(jnp.int8)


def _fold_h_static(fc, factor):
    """Trace-time h_inv fold for _gelu_quant_static: scale the c_fc
    dequant scales and bias by the static hidden requant scale (scalar
    per layer; [L, 1]-shaped for the stacked stream variant). [hidden]-
    sized work per layer — free next to the [rows, hidden] pass it
    deletes from the kernel."""
    return fc.w_scale * factor, fc.bias * factor


def _quant_rows_static(x, inv):
    """Static-scale symmetric int8 (inv = 127/amax_calibrated, scalar);
    the dequant scale amax/127 is pre-folded into the weight scales.
    The scale multiply runs in x's dtype (bf16 on the _EPI_BF16 path);
    the round must be f32 (see _round_f32)."""
    return jnp.clip(_round_f32(x * inv.astype(x.dtype)), -127, 127).astype(jnp.int8)


def _int8_gemm(x_q, x_scale, w_int8_ref, w_scale_ref, bias_ref,
               out_dtype=jnp.float32):
    """int8 x int8 -> int32 MXU GEMM with per-row/per-channel rescale.
    w layout: [out, in] int8 + [out] f32 scale (+ [out] f32 bias).
    x_scale=None: static activation scale already folded into w_scale.
    ``out_dtype=bfloat16`` runs the dequant epilogue at half width
    (_EPI_BF16 path: the int32->bf16 cast rounds the accumulated dot to
    8 mantissa bits, ~0.4% relative — on par with the int8 input noise)."""
    acc = jax.lax.dot_general(
        x_q, w_int8_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(out_dtype) * w_scale_ref[...].astype(out_dtype)
    if x_scale is not None:
        y = y * x_scale.astype(out_dtype)
    if bias_ref is not None:
        y = y + bias_ref[...].astype(out_dtype)
    return y


def _batched_attention(qkv, bias, n_heads, head_dim, scale, group, s_pad,
                       precision=None, *, s_real=None, use_mask=True,
                       score_shift=None, post_scale=None):
    """qkv [G*S, 3E] -> context [G*S, E].

    Per head: one crop-batched dot_general pair ([G, S, D] x [G, S, D]) —
    Mosaic vectorizes the batch dim on the MXU, replacing the former
    G x H fori_loop of tiny matmuls (measured ~20x faster at tower shapes).

    ``scale=None`` means 1/sqrt(d) is already folded into the q projection
    (quantize_clip_params(fold=True)). ``use_mask=False`` (no causal mask;
    the serving vision tower) selects the cheap paired epilogue: pad-key
    masking moves out of the additive bias into zeroed K/V rows + a sum
    selector, so ``bias`` is ignored and ``s_real`` carries the unpadded
    sequence length.
    """
    e = n_heads * head_dim
    if _ATTN_STUB:  # perf attribution: skip scores/softmax/PV entirely
        return qkv[:, :e].astype(jnp.float32)
    q3 = qkv.reshape(group, s_pad, 3 * e)  # row-major view, free
    if _PAIR_HEADS and n_heads % 2 == 0:
        if use_mask:
            out = _paired_attention(
                q3, bias, n_heads, head_dim, scale, group, s_pad, precision
            )
            # masked path (text tower): no normalizer to fold into —
            # apply the static ctx quant scale as a plain post-multiply
            # (identical cost to the unfolded chain)
            return out if post_scale is None else out * post_scale
        if _ATTN_BATCHPAIRS and s_pad <= 64 and not _INT8_ATTN:
            return _batched_pairs_attention_nomask(
                q3, n_heads, head_dim, scale, group, s_pad, precision,
                s_real=s_real if s_real is not None else s_pad,
                score_shift=score_shift, post_scale=post_scale,
            )
        return _paired_attention_nomask(
            q3, n_heads, head_dim, scale, group, s_pad, precision,
            s_real=s_real if s_real is not None else s_pad,
            # _INT8_ATTN's p quantization assumes the row max is exactly 1
            score_shift=None if _INT8_ATTN else score_shift,
            post_scale=post_scale,
        )
    ctx = []
    for h in range(n_heads):
        q = q3[:, :, h * head_dim : (h + 1) * head_dim]
        k = q3[:, :, e + h * head_dim : e + (h + 1) * head_dim]
        v = q3[:, :, 2 * e + h * head_dim : 2 * e + (h + 1) * head_dim]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )
        if scale is not None:
            scores = scores * scale
        scores = scores + bias[None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx.append(
            jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )
        )
    out = jnp.concatenate(ctx, axis=-1).reshape(group * s_pad, e)
    return out if post_scale is None else out * post_scale


def _batched_pairs_attention_nomask(q3, n_heads, head_dim, scale, group,
                                    s_pad, precision=None, *, s_real,
                                    score_shift=None, post_scale=None):
    """All head-pairs in ONE dot_general per stage (r4).

    The per-pair loop issues 3 small dot_generals per pair — 18 per tile,
    13,824 per serving iteration at b512 — and the b512 trace puts the
    attention half 22 ms over its GEMM ideal while the MLP half sits 8%
    over: per-op issue/pipeline overhead, not FLOPs. Here the six pairs
    stack on a new leading batch dim and the key rows pad to 64 per half
    (fully (8,128)-tile-aligned scores [6G, S, 128]):

      - zero-padded keys/values are harmless WITHOUT masking: zero V rows
        add nothing to PV, the selector matmul excludes them from the
        normalizers, and the joint row max over real+zero columns is
        still a valid softmax stabilizer (max(real, 0) >= real max);
      - one scores dot, one joint max, one exp, one PV, one selector
        matmul, one reciprocal multiply — over 6x-bigger operands.

    Stacking writes q as well as k/v (the loop variant only wrote k/v),
    ~0.5 MB extra VPU moves per tile — traded for 15 fewer MXU ops.
    """
    e = n_heads * head_dim
    d2 = 2 * head_dim
    np_half = 64  # keys per half, padded (s_real <= 64 asserted by caller)
    n_pairs = n_heads // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d2), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * np_half, 1), 1)
    lo_sel = (lane < head_dim) & (row < s_real)
    hi_sel = (lane >= head_dim) & (row >= np_half) & (row < np_half + s_real)

    # [2*64, 2D] normalizer selector: 1 where a real key row feeds a half
    r_i = jax.lax.broadcasted_iota(jnp.int32, (2 * np_half, d2), 0)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (2 * np_half, d2), 1)
    sel = jnp.where(
        ((l_i < head_dim) & (r_i < s_real))
        | ((l_i >= head_dim) & (r_i >= np_half) & (r_i < np_half + s_real)),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )

    # k6/v6 rows [0,64) = head-lo keys (lanes 0..D), [64,128) = head-hi
    # (lanes D..2D); everything else zero. blk = two stacked copies of the
    # 64-padded slice, then one select keeps each half's own lanes/rows.
    def build(slices):
        out = []
        for p_idx in range(n_pairs):
            o = p_idx * d2
            t = slices[:, :, o : o + d2]  # [G, S_pad, 2D]
            pad_lo = jnp.pad(t, ((0, 0), (0, np_half - s_pad), (0, 0)))
            blk = jnp.concatenate([pad_lo, pad_lo], axis=1)  # [G, 128, 2D]
            out.append(jnp.where(lo_sel | hi_sel, blk, jnp.zeros_like(blk)))
        return jnp.stack(out)  # [P, G, 128, 2D]

    k6 = build(q3[:, :, e : 2 * e]).reshape(n_pairs * group, 2 * np_half, d2)
    v6 = build(q3[:, :, 2 * e : 3 * e]).reshape(n_pairs * group, 2 * np_half, d2)
    q6 = jnp.stack(
        [q3[:, :, p_idx * d2 : (p_idx + 1) * d2] for p_idx in range(n_pairs)]
    ).reshape(n_pairs * group, s_pad, d2)

    scores = jax.lax.dot_general(
        q6, k6, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [P*G, S, 128]
    if scale is not None:
        scores = scores * scale
    if score_shift is None:
        m = jnp.max(scores, axis=-1, keepdims=True)
    else:
        m = score_shift
    if _EPI_BF16:
        p = jnp.exp((scores - m).astype(jnp.bfloat16))
    else:
        p = jnp.exp(scores - m)
    pc = p.astype(v6.dtype)
    ctx_u = jax.lax.dot_general(
        pc, v6, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [P*G, S, 2D]
    sums = jax.lax.dot_general(
        pc, sel.astype(v6.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # post_scale (static ctx quant): folds into the normalizer divide —
    # the downstream quant's [rows, E] multiply disappears (exact)
    num = jnp.float32(1.0) if post_scale is None else post_scale
    ctx = (ctx_u * (num / jnp.maximum(sums, 1e-30))).reshape(
        n_pairs, group, s_pad, d2
    )
    return jnp.concatenate(
        [ctx[i] for i in range(n_pairs)], axis=-1
    ).reshape(group * s_pad, e)


def _paired_attention_nomask(q3, n_heads, head_dim, scale, group, s_pad,
                             precision=None, *, s_real, score_shift=None,
                             post_scale=None):
    """Paired-head attention, no-causal-mask epilogue (PERF.md r3).

    Same zero-masked K/V pairing as ``_paired_attention`` (two heads per
    128-lane MXU pass, exact math), but the softmax epilogue touches the
    [G, S, 2S] probability tensor as little as possible:

    - pad keys are zeroed in K2/V2 (the row mask rides the lane masks the
      pairing already applies), so no additive bias pass and garbage pad
      rows can't poison real rows;
    - ONE joint row max (zero pad-columns bound it below by 0) replaces
      the two masked maxima — any per-row constant is valid for softmax;
    - PV runs on UNNORMALIZED probabilities; the per-half normalizers
      come from one [2S, 2D] 0/1 selector MATMUL that lands them already
      lane-broadcast against the context (an [2S, 2] matvec wastes 126
      MXU lanes and measured slower), excluding pad keys, and divide the
      [G, S, 2D] context post-PV — far fewer elements than normalizing
      the probabilities.

    vs the masked epilogue: 4 masked reductions + bias add + probability
    divide (~10 VPU passes over [G, S, 2S]) become max + exp (2 passes).
    """
    e = n_heads * head_dim
    d2 = 2 * head_dim
    # stacking masks at FULL width E (lane % 2D picks each pair's lo/hi
    # half): one select pass over [G, S, E] replaces n_heads//2 passes
    # over [G, S, 2D] slices — same elements, 1/(n_heads//2) the VPU op
    # issues (the b512 trace put ~2.5 ms/iter in the stacking section)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2)
    lo_lane = (lane % d2) < head_dim
    if s_real != s_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad, 1), 1)
        row_ok = row < s_real
        lo_mask = lo_lane & row_ok
        hi_mask = (~lo_lane) & row_ok
    else:
        lo_mask = lo_lane
        hi_mask = ~lo_lane

    # [2S, 2D] per-half sum selector in BROADCAST position: lane block
    # 0..D is 1 for head-lo's (real) keys, D..2D for head-hi's — so
    # p @ sel lands the per-half normalizers directly on the context's
    # lane layout at full MXU width (an [2S, 2] matvec wastes 126 lanes
    # and measured slower).
    r_i = jax.lax.broadcasted_iota(jnp.int32, (2 * s_pad, d2), 0)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (2 * s_pad, d2), 1)
    sel = jnp.where(
        ((l_i < head_dim) & (r_i < s_real))
        | ((l_i >= head_dim) & (r_i >= s_pad) & (r_i < s_pad + s_real)),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )

    k_all = q3[:, :, e : 2 * e]
    v_all = q3[:, :, 2 * e : 3 * e]
    zero = jnp.zeros_like(k_all)
    # [G, 2S, E]: rows 0..S = each pair's lo-head keys in its lower 2D
    # lane half, rows S..2S = hi-head keys in the upper half; per-pair
    # [G, 2S, 2D] views below are free 128-aligned lane slices
    k2_all = jnp.concatenate(
        [jnp.where(lo_mask, k_all, zero), jnp.where(hi_mask, k_all, zero)], axis=1
    )
    v2_all = jnp.concatenate(
        [jnp.where(lo_mask, v_all, zero), jnp.where(hi_mask, v_all, zero)], axis=1
    )
    selc = sel.astype(q3.dtype)
    ctx = []
    for p_idx in range(n_heads // 2):
        o = p_idx * d2
        qp = q3[:, :, o : o + d2]
        k2 = k2_all[:, :, o : o + d2]
        v2 = v2_all[:, :, o : o + d2]
        if _INT8_ATTN:
            q32 = qp.astype(jnp.float32)
            k32 = k2.astype(jnp.float32)
            q_am = jnp.maximum(jnp.max(jnp.abs(q32), -1, keepdims=True), 1e-8)
            k_am = jnp.maximum(jnp.max(jnp.abs(k32), -1, keepdims=True), 1e-8)
            q_q = jnp.clip(jnp.round(q32 * (127.0 / q_am)), -127, 127).astype(jnp.int8)
            k_q = jnp.clip(jnp.round(k32 * (127.0 / k_am)), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                q_q, k_q, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            scores = (
                acc.astype(jnp.float32)
                * (q_am * (1.0 / 127.0))
                * (jnp.swapaxes(k_am, 1, 2) * (1.0 / 127.0))
            )
        else:
            scores = jax.lax.dot_general(
                qp, k2, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [G, S, 2S] = [lo | hi]
        if scale is not None:
            scores = scores * scale
        if score_shift is None:
            m = jnp.max(scores, axis=-1, keepdims=True)
        else:
            # max-free softmax: shift-invariant for any constant; the
            # calibrated per-layer shift keeps exp() in f32 range and
            # skips the row-max reduction over [G, S, 2S] entirely
            m = score_shift
        if _EPI_BF16 and not _INT8_ATTN:
            # exp at half vector width; max-subtracted arguments are <= 0
            # and p feeds a bf16 PV dot anyway (the cast pass disappears)
            p = jnp.exp((scores - m).astype(jnp.bfloat16))
        else:
            p = jnp.exp(scores - m)
        if _INT8_ATTN:
            # p's row max is exactly 1 -> static scale 127; one scalar
            # per-tile v scale keeps the dequant a single multiply
            p_q = jnp.round(p * 127.0).astype(jnp.int8)
            v32 = v2.astype(jnp.float32)
            v_am = jnp.maximum(jnp.max(jnp.abs(v32)), 1e-8)
            v_q = jnp.clip(jnp.round(v32 * (127.0 / v_am)), -127, 127).astype(jnp.int8)
            ctx_u = jax.lax.dot_general(
                p_q, v_q, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (v_am / (127.0 * 127.0))
            sums = jax.lax.dot_general(
                p_q.astype(jnp.bfloat16), sel.astype(jnp.bfloat16),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (1.0 / 127.0)
        else:
            pc = p.astype(v2.dtype)
            ctx_u = jax.lax.dot_general(
                pc, v2, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [G, S, 2D] unnormalized [ctx_lo | ctx_hi]
            sums = jax.lax.dot_general(
                pc, selc, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [G, S, 2D] — normalizers already lane-broadcast
        # post_scale folds the static ctx quant scale into the normalizer
        num = jnp.float32(1.0) if post_scale is None else post_scale
        ctx.append(ctx_u * (num / jnp.maximum(sums, 1e-30)))
    return jnp.concatenate(ctx, axis=-1).reshape(group * s_pad, e)


def _paired_attention(q3, bias, n_heads, head_dim, scale, group, s_pad,
                      precision=None):
    """Two heads per MXU pass via zero-masked key/value stacking — exact.

    For a head pair (lo, hi) occupying one 128-lane slice of the packed
    qkv, build K2/V2 [G, 2S, 2D] where rows 0..S carry head-lo's keys in
    lanes 0..D (zeros elsewhere) and rows S..2S carry head-hi's keys in
    lanes D..2D. Then

      scores2 = Q_pair @ K2^T   -> [G, S, 2S] = [lo scores | hi scores]
      ctx2    = P2 @ V2         -> [G, S, 2D] = [ctx_lo | ctx_hi]

    because the zero lanes kill all cross-head terms. The contraction runs
    at full 128-lane MXU width (vs 64 per-head) and halves the number of
    dot_generals; softmax normalizes each S-wide half separately via
    masked reductions. Head-pair stacking via scratch staging regressed
    (PERF.md r1) — this variant needs no staging copies, only cheap lane
    masks that fuse with the loads."""
    e = n_heads * head_dim
    d2 = 2 * head_dim
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d2), 2)
    lo_mask = lane < head_dim  # [1, 1, 2D]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * s_pad), 1)
    is_lo_col = col < s_pad  # [1, 2S] (score columns 0..S = head-lo keys)
    bias2 = jnp.concatenate([bias, bias], axis=-1)[None]  # [1, S, 2S]

    ctx = []
    for p_idx in range(n_heads // 2):
        o = p_idx * d2
        qp = q3[:, :, o : o + d2]
        kp = q3[:, :, e + o : e + o + d2]
        vp = q3[:, :, 2 * e + o : 2 * e + o + d2]
        zero = jnp.zeros_like(kp)
        k2 = jnp.concatenate(
            [jnp.where(lo_mask, kp, zero), jnp.where(lo_mask, zero, kp)], axis=1
        )  # [G, 2S, 2D]
        v2 = jnp.concatenate(
            [jnp.where(lo_mask, vp, zero), jnp.where(lo_mask, zero, vp)], axis=1
        )
        scores = jax.lax.dot_general(
            qp, k2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [G, S, 2S]
        if scale is not None:
            scores = scores * scale
        scores = scores + bias2
        # per-half softmax via masked reductions (halves stay independent)
        neg = jnp.float32(_NEG_INF)
        m_lo = jnp.max(jnp.where(is_lo_col[:, None], scores, neg), -1, keepdims=True)
        m_hi = jnp.max(jnp.where(is_lo_col[:, None], neg, scores), -1, keepdims=True)
        m = jnp.where(is_lo_col[:, None], m_lo, m_hi)
        p = jnp.exp(scores - m)
        s_lo = jnp.sum(jnp.where(is_lo_col[:, None], p, 0.0), -1, keepdims=True)
        s_hi = jnp.sum(jnp.where(is_lo_col[:, None], 0.0, p), -1, keepdims=True)
        p = p / jnp.where(is_lo_col[:, None], s_lo, s_hi)
        ctx.append(
            jax.lax.dot_general(
                p.astype(v2.dtype), v2, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [G, S, 2D] = [ctx_lo | ctx_hi]
        )
    return jnp.concatenate(ctx, axis=-1).reshape(group * s_pad, e)


def _attn_half_kernel(
    x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    bias_ref, out_ref,
    *, n_heads, head_dim, scale, precision, group, s_pad,
    s_real=None, use_mask=True,
):
    e = n_heads * head_dim
    bias = bias_ref[...]
    gs = group * s_pad

    rows = x_ref[...].reshape(gs, e)
    h_in = _ln_rows(rows, ln_s_ref[...], ln_b_ref[...]).astype(rows.dtype)
    # one large-M GEMM for the whole tile's qkv
    qkv = (
        jax.lax.dot_general(
            h_in, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(rows.dtype)

    ctx = _batched_attention(
        qkv, bias, n_heads, head_dim, scale, group, s_pad, precision,
        s_real=s_real, use_mask=use_mask,
    ).astype(rows.dtype)

    proj = (
        jax.lax.dot_general(
            ctx, wout_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bout_ref[...].astype(jnp.float32)
    )
    out = rows.astype(jnp.float32) + proj
    out_ref[...] = out.astype(out_ref.dtype).reshape(group, s_pad, e)


def _attn_half_int8_kernel(
    x_ref, ln_s_ref, ln_b_ref, ln_inv_ref, ctx_inv_ref, shift_ref,
    wqkv_i8_ref, wqkv_sc_ref, bqkv_ref,
    wout_i8_ref, wout_sc_ref, bout_ref, bias_ref, out_ref,
    *, n_heads, head_dim, scale, group, s_pad,
    s_real=None, use_mask=True, folded=False, static_act=False,
    static_ctx=False, static_shift=False, dense=False,
):
    e = n_heads * head_dim
    bias = bias_ref[...]
    s_row = s_real if dense else s_pad  # rows per crop in the stream
    gs = group * s_row

    rows = x_ref[...] if dense else x_ref[...].reshape(gs, e)
    n_sub = _SUBTILES if group % _SUBTILES == 0 else 1
    g_sub, m = group // n_sub, gs // n_sub
    outs = []
    for j in range(n_sub):  # independent chains -> scheduler can overlap
        r = rows[j * m : (j + 1) * m]
        h_ln = (
            _ln_norm(r) if folded
            else _ln_rows(r, ln_s_ref[...], ln_b_ref[...])
        )
        if static_act:
            x_q, x_sc = _quant_rows_static(h_ln, ln_inv_ref[0, 0]), None
        else:
            x_q, x_sc = _quant_rows(h_ln)
        # _EPI_BF16: dequant straight to bf16 — drops the separate
        # [rows, 3E] cast pass and runs the mul/bias epilogue half-wide
        qkv = (
            _int8_gemm(x_q, x_sc, wqkv_i8_ref, wqkv_sc_ref, bqkv_ref,
                       out_dtype=jnp.bfloat16)
            if _EPI_BF16
            else _int8_gemm(x_q, x_sc, wqkv_i8_ref, wqkv_sc_ref, bqkv_ref)
            .astype(jnp.bfloat16)
        )
        if dense:
            # VMEM repack: dense [g_sub*S, 3E] -> padded [g_sub*S_pad, 3E]
            # for the [G, S_pad, .] attention views, then unpack the
            # context back to dense rows (pad rows never leave the kernel)
            qkv_att = jnp.concatenate(
                [
                    jnp.pad(
                        qkv[g * s_real : (g + 1) * s_real],
                        ((0, s_pad - s_real), (0, 0)),
                    )
                    for g in range(g_sub)
                ],
                axis=0,
            )
        else:
            qkv_att = qkv
        ctx = _batched_attention(
            qkv_att, bias, n_heads, head_dim, None if folded else scale,
            g_sub, s_pad, s_real=s_real, use_mask=use_mask,
            score_shift=shift_ref[0, 0] if static_shift else None,
            post_scale=ctx_inv_ref[0, 0] if static_ctx else None,
        )
        if dense:
            ctx = jnp.concatenate(
                [
                    ctx[g * s_pad : g * s_pad + s_real]
                    for g in range(g_sub)
                ],
                axis=0,
            )
        if static_ctx:
            # ctx_inv folded into the attention normalizer (post_scale)
            c_q, c_sc = _round_clip_int8(ctx), None
        else:
            c_q, c_sc = _quant_rows(ctx)
        proj = _int8_gemm(c_q, c_sc, wout_i8_ref, wout_sc_ref, bout_ref)
        outs.append(r.astype(jnp.float32) + proj)
    out = outs[0] if n_sub == 1 else jnp.concatenate(outs, axis=0)
    out = out.astype(out_ref.dtype)
    out_ref[...] = out if dense else out.reshape(group, s_pad, e)


def _mlp_half_int8_kernel(
    x_ref, ln_s_ref, ln_b_ref, ln_inv_ref, h_inv_ref,
    wfc_i8_ref, wfc_sc_ref, bfc_ref,
    wproj_i8_ref, wproj_sc_ref, bproj_ref, out_ref,
    *, group, s_pad, folded=False, static_act=False, static_h=False,
    s_real=None, dense=False,
):
    e = x_ref.shape[-1]
    hidden_dim = wfc_i8_ref.shape[0]
    gs = group * (s_real if dense else s_pad)
    rows = x_ref[...] if dense else x_ref[...].reshape(gs, e)
    n_sub = _SUBTILES if gs % _SUBTILES == 0 else 1
    m = gs // n_sub
    nsp = _MLP_NSPLIT if hidden_dim % _MLP_NSPLIT == 0 else 1
    hs = hidden_dim // nsp
    outs = []
    for j in range(n_sub):  # independent chains -> scheduler can overlap
        r = rows[j * m : (j + 1) * m]
        h_ln = (
            _ln_norm(r) if folded
            else _ln_rows(r, ln_s_ref[...], ln_b_ref[...])
        )
        if static_act:
            x_q, x_sc = _quant_rows_static(h_ln, ln_inv_ref[0, 0]), None
        else:
            x_q, x_sc = _quant_rows(h_ln)
        # optional hidden-dim split: each c_fc column block's GELU/requant
        # epilogue can overlap the next block's GEMMs (per-block h_sc is
        # just a finer quantization group — exactness unchanged)
        acc = None
        # the [rows, 3072] dequant+GELU+requant chain is the widest VPU
        # tail in the tower; _EPI_BF16 runs it at bf16 (half the vector
        # width per element; values are int8-quantized right after, so the
        # 8-bit mantissa is not the precision bottleneck — cert-gated)
        h_dt = jnp.bfloat16 if _EPI_BF16 else jnp.float32
        for k in range(nsp):
            sl = slice(k * hs, (k + 1) * hs)
            hidden = _int8_gemm(
                x_q, x_sc, wfc_i8_ref[sl], wfc_sc_ref[sl], bfc_ref[sl],
                out_dtype=h_dt,
            )
            if static_h:
                # h_inv pre-folded into wfc_sc/bfc by the caller: the GEMM
                # lands in the quantized domain and GELU commutes exactly
                h_q, h_sc = _gelu_quant_static(hidden, h_inv_ref[0, 0]), None
            else:
                h_q, h_sc = _quant_rows(_quick_gelu32(hidden))
            part = jax.lax.dot_general(
                h_q, wproj_i8_ref[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * wproj_sc_ref[...].astype(jnp.float32)
            if h_sc is not None:
                part = part * h_sc
            acc = part if acc is None else acc + part
        proj = acc + bproj_ref[...].astype(jnp.float32)
        outs.append(r.astype(jnp.float32) + proj)
    out = outs[0] if n_sub == 1 else jnp.concatenate(outs, axis=0)
    out = out.astype(out_ref.dtype)
    out_ref[...] = out if dense else out.reshape(group, s_pad, e)


def _mlp_half_kernel(
    x_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
    out_ref, *, precision, group, s_pad,
):
    e = x_ref.shape[-1]
    gs = group * s_pad
    rows = x_ref[...].reshape(gs, e)
    h_in = _ln_rows(rows, ln_s_ref[...], ln_b_ref[...]).astype(rows.dtype)
    hidden = (
        jax.lax.dot_general(
            h_in, wfc_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bfc_ref[...].astype(jnp.float32)
    )
    hidden = _quick_gelu32(hidden)
    hidden = hidden.astype(rows.dtype)
    proj = (
        jax.lax.dot_general(
            hidden, wproj_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bproj_ref[...].astype(jnp.float32)
    )
    out = rows.astype(jnp.float32) + proj
    out_ref[...] = out.astype(out_ref.dtype).reshape(group, s_pad, e)


def _block_int8_kernel(
    x_ref, ln1_s_ref, ln1_b_ref, ln1_inv_ref, ctx_inv_ref, shift_ref,
    wqkv_i8_ref, wqkv_sc_ref, bqkv_ref,
    wout_i8_ref, wout_sc_ref, bout_ref,
    ln2_s_ref, ln2_b_ref, ln2_inv_ref, h_inv_ref,
    wfc_i8_ref, wfc_sc_ref, bfc_ref, wproj_i8_ref, wproj_sc_ref, bproj_ref,
    bias_ref, out_ref,
    *, n_heads, head_dim, scale, group, s_pad,
    s_real=None, use_mask=True, folded=False, static_act=False,
    static_ctx=False, static_h=False, static_shift=False, dense=False,
):
    """One whole transformer block, int8 W8A8: the residual stream never
    leaves VMEM between the attention and MLP halves — half the kernel
    boundaries of the halves variant, each worth ~1.07 ms of x HBM
    round-trip at serving scale (scripts/exp_boundary_cost.py, r4).
    Supports the same folded/static-quant/mask-free/dense options as the
    halves kernels."""
    e = n_heads * head_dim
    gs = group * (s_real if dense else s_pad)

    rows = x_ref[...] if dense else x_ref[...].reshape(gs, e)
    h_ln = (
        _ln_norm(rows) if folded
        else _ln_rows(rows, ln1_s_ref[...], ln1_b_ref[...])
    )
    if static_act:
        x_q, x_sc = _quant_rows_static(h_ln, ln1_inv_ref[0, 0]), None
    else:
        x_q, x_sc = _quant_rows(h_ln)
    qkv = _int8_gemm(x_q, x_sc, wqkv_i8_ref, wqkv_sc_ref, bqkv_ref).astype(
        jnp.bfloat16
    )
    if dense:
        # VMEM repack: dense [G*S, 3E] -> padded [G*S_pad, 3E] for the
        # attention views, unpacked right after (same as the attn half)
        qkv = jnp.concatenate(
            [
                jnp.pad(
                    qkv[g * s_real : (g + 1) * s_real],
                    ((0, s_pad - s_real), (0, 0)),
                )
                for g in range(group)
            ],
            axis=0,
        )
    ctx = _batched_attention(
        qkv, bias_ref[...], n_heads, head_dim, None if folded else scale,
        group, s_pad, s_real=s_real, use_mask=use_mask,
        score_shift=shift_ref[0, 0] if static_shift else None,
        post_scale=ctx_inv_ref[0, 0] if static_ctx else None,
    )
    if dense:
        ctx = jnp.concatenate(
            [ctx[g * s_pad : g * s_pad + s_real] for g in range(group)],
            axis=0,
        )
    if static_ctx:
        # ctx_inv folded into the attention normalizer (post_scale)
        c_q, c_sc = _round_clip_int8(ctx), None
    else:
        c_q, c_sc = _quant_rows(ctx)
    mid = rows.astype(jnp.float32) + _int8_gemm(
        c_q, c_sc, wout_i8_ref, wout_sc_ref, bout_ref
    )

    h2 = (
        _ln_norm(mid) if folded
        else _ln_rows(mid, ln2_s_ref[...], ln2_b_ref[...])
    )
    if static_act:
        q2, s2 = _quant_rows_static(h2, ln2_inv_ref[0, 0]), None
    else:
        q2, s2 = _quant_rows(h2)
    # _MLP_NSPLIT (r5): chunk the hidden dim like the MLP-half kernel does
    # — the whole-block kernel's peak VMEM includes the [rows, hidden] f32
    # hidden (9.8 MB at G=16), the r4 rejection's named cause; per-chunk
    # h_sc is a finer quant group, exact w.r.t. the scheme
    hidden_dim = wfc_i8_ref.shape[0]
    nsp = _MLP_NSPLIT if hidden_dim % _MLP_NSPLIT == 0 else 1
    hs = hidden_dim // nsp
    acc = None
    for k in range(nsp):
        sl = slice(k * hs, (k + 1) * hs)
        hidden = _int8_gemm(q2, s2, wfc_i8_ref[sl], wfc_sc_ref[sl], bfc_ref[sl])
        if static_h:
            # h_inv pre-folded into wfc_sc/bfc (see _gelu_quant_static)
            h_q, h_sc = _gelu_quant_static(hidden, h_inv_ref[0, 0]), None
        else:
            h_q, h_sc = _quant_rows(_quick_gelu32(hidden))
        part = jax.lax.dot_general(
            h_q, wproj_i8_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * wproj_sc_ref[...].astype(jnp.float32)
        if h_sc is not None:
            part = part * h_sc
        acc = part if acc is None else acc + part
    out = mid + (acc + bproj_ref[...].astype(jnp.float32))
    out = out.astype(out_ref.dtype)
    out_ref[...] = out if dense else out.reshape(group, s_pad, e)


def _stream_tower_int8_kernel(
    x_ref, ln1_s_ref, ln1_b_ref, ln1_inv_ref, ctx_inv_ref, shift_ref,
    wqkv_i8_ref, wqkv_sc_ref, bqkv_ref,
    wout_i8_ref, wout_sc_ref, bout_ref,
    ln2_s_ref, ln2_b_ref, ln2_inv_ref, h_inv_ref,
    wfc_i8_ref, wfc_sc_ref, bfc_ref, wproj_i8_ref, wproj_sc_ref, bproj_ref,
    bias_ref, out_ref,
    *, n_heads, head_dim, scale, group, s_pad, s_real,
    folded, static_act, static_ctx, static_h, static_shift,
):
    """Layer-streaming tower body (``_FUSE = "stream"``): one grid step per
    (crop group, HALF-step) with half-steps innermost. The residual tile
    lives in ``out_ref``'s VMEM block for all ``2 * n_layers`` consecutive
    steps (the block index only changes with the group), so the residual
    stream NEVER round-trips HBM between halves or layers — the dominant
    HBM term of the halves variant (~30 GB/iter at 8192 crops). Each
    half's weights stream per layer via ``l // 2`` index maps (fetched
    once per layer per group, auto double-buffered by the Pallas
    pipeline). Dense row stream + mask-free paired epilogue only — the
    serving vision tower. Same math as the halves kernels, subtiles=1.
    """
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _seed():
        out_ref[...] = x_ref[...]

    rows = out_ref[...]
    dense = s_pad != s_real

    @pl.when(l % 2 == 0)
    def _attn_half():
        h_ln = (
            _ln_norm(rows) if folded
            else _ln_rows(rows, ln1_s_ref[0, 0], ln1_b_ref[0, 0])
        )
        if static_act:
            x_q, x_sc = _quant_rows_static(h_ln, ln1_inv_ref[0, 0, 0]), None
        else:
            x_q, x_sc = _quant_rows(h_ln)
        qkv = _int8_gemm(
            x_q, x_sc, wqkv_i8_ref[0], wqkv_sc_ref[0, 0], bqkv_ref[0, 0]
        ).astype(jnp.bfloat16)
        if dense:
            qkv_att = jnp.concatenate(
                [
                    jnp.pad(
                        qkv[g * s_real : (g + 1) * s_real],
                        ((0, s_pad - s_real), (0, 0)),
                    )
                    for g in range(group)
                ],
                axis=0,
            )
        else:
            qkv_att = qkv
        ctx = _batched_attention(
            qkv_att, bias_ref[...], n_heads, head_dim,
            None if folded else scale, group, s_pad, s_real=s_real,
            use_mask=False,
            score_shift=shift_ref[0, 0, 0] if static_shift else None,
            post_scale=ctx_inv_ref[0, 0, 0] if static_ctx else None,
        )
        if dense:
            ctx = jnp.concatenate(
                [
                    ctx[g * s_pad : g * s_pad + s_real]
                    for g in range(group)
                ],
                axis=0,
            )
        if static_ctx:
            # ctx_inv folded into the attention normalizer (post_scale)
            c_q, c_sc = _round_clip_int8(ctx), None
        else:
            c_q, c_sc = _quant_rows(ctx)
        proj = _int8_gemm(c_q, c_sc, wout_i8_ref[0], wout_sc_ref[0, 0], bout_ref[0, 0])
        out_ref[...] = (rows.astype(jnp.float32) + proj).astype(out_ref.dtype)

    @pl.when(l % 2 == 1)
    def _mlp_half():
        hidden_dim = wfc_i8_ref.shape[1]
        h_ln = (
            _ln_norm(rows) if folded
            else _ln_rows(rows, ln2_s_ref[0, 0], ln2_b_ref[0, 0])
        )
        if static_act:
            x_q, x_sc = _quant_rows_static(h_ln, ln2_inv_ref[0, 0, 0]), None
        else:
            x_q, x_sc = _quant_rows(h_ln)
        nsp = _MLP_NSPLIT if hidden_dim % _MLP_NSPLIT == 0 else 1
        hs = hidden_dim // nsp
        acc = None
        for k in range(nsp):
            sl = slice(k * hs, (k + 1) * hs)
            hidden = _int8_gemm(
                x_q, x_sc, wfc_i8_ref[0, sl], wfc_sc_ref[0, 0, sl],
                bfc_ref[0, 0, sl],
            )
            if static_h:
                # h_inv pre-folded into wfc_sc/bfc (see _gelu_quant_static)
                h_q, h_sc = _gelu_quant_static(hidden, h_inv_ref[0, 0, 0]), None
            else:
                h_q, h_sc = _quant_rows(_quick_gelu32(hidden))
            part = jax.lax.dot_general(
                h_q, wproj_i8_ref[0, :, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * wproj_sc_ref[0, 0].astype(jnp.float32)
            if h_sc is not None:
                part = part * h_sc
            acc = part if acc is None else acc + part
        proj = acc + bproj_ref[0, 0].astype(jnp.float32)
        out_ref[...] = (rows.astype(jnp.float32) + proj).astype(out_ref.dtype)


def _block_kernel(
    x_ref, ln1_s_ref, ln1_b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    ln2_s_ref, ln2_b_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
    bias_ref, out_ref,
    *, n_heads, head_dim, scale, precision, group, s_pad,
):
    """One whole transformer block (bf16/f32 weights)."""
    e = n_heads * head_dim
    gs = group * s_pad

    rows = x_ref[...].reshape(gs, e)
    h_in = _ln_rows(rows, ln1_s_ref[...], ln1_b_ref[...]).astype(rows.dtype)
    qkv = (
        jax.lax.dot_general(
            h_in, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(rows.dtype)
    ctx = _batched_attention(
        qkv, bias_ref[...], n_heads, head_dim, scale, group, s_pad, precision
    ).astype(rows.dtype)
    mid = rows.astype(jnp.float32) + (
        jax.lax.dot_general(
            ctx, wout_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bout_ref[...].astype(jnp.float32)
    )

    h2 = _ln_rows(mid, ln2_s_ref[...], ln2_b_ref[...]).astype(rows.dtype)
    hidden = (
        jax.lax.dot_general(
            h2, wfc_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bfc_ref[...].astype(jnp.float32)
    )
    hidden = (hidden * jax.nn.sigmoid(1.702 * hidden)).astype(rows.dtype)
    out = mid + (
        jax.lax.dot_general(
            hidden, wproj_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + bproj_ref[...].astype(jnp.float32)
    )
    out_ref[...] = out.astype(out_ref.dtype).reshape(group, s_pad, e)


def _pick_group(b: int, target: int = 8) -> int:
    group = min(target, b)
    while b % group:
        group -= 1
    return group


# v5e/v5p have 128MiB of physical VMEM; the XLA scoped-vmem default (16MiB)
# strands most of it. The whole-block kernel holds one layer's weights +
# the residual tile + f32 intermediates — raise the cap so Mosaic can keep
# everything resident AND double-buffer the activation tiles.
_VMEM_LIMIT = 100 * 1024 * 1024
_GROUP_TARGET = 16
# Optional per-half group overrides (None = _GROUP_TARGET). The MLP half
# holds a [G*S, 3072] f32 hidden in VMEM (G=32 overflows); the attention
# half's tensors are ~4x smaller, so a larger G can amortize fixed costs.
_GROUP_ATTN = None
_GROUP_MLP = None
_FUSE = "halves"  # "halves": attn + mlp kernels; "block": one kernel/layer;
# "stream": ONE kernel for the whole tower, grid (groups, 2*layers) with
# half-steps innermost — the residual tile stays VMEM-resident across all
# 24 half-steps (out block revisited as the carry) while each half's
# weights stream per layer (index_map l//2, auto double-buffered). Trades
# the per-half residual-stream HBM round trips (~30 GB/iter at 8192 crops
# = ~37 ms at 819 GB/s) for per-group weight re-streaming (85 MB x
# groups). int8 + dense + mask-free serving tower only; other configs
# fall back to the halves scan.
# Streaming-tower group size: bigger G amortizes the weight re-streaming
# (traffic = 85 MB x B/G) but every VMEM tensor scales with G — at 32 the
# union of the attn branch (~55 MB: qkv + padded repack + K2/V2 stacks +
# ctx) and the MLP branch (~35 MB: f32 hidden) plus double-buffered
# weights fits the 100 MB cap; 64 overflows unless _MLP_NSPLIT >= 2.
_GROUP_STREAM = 32
_ATTN_STUB = False  # debug: bypass attention math (perf attribution only)
# Split each tile into independent row-block chains so the Mosaic
# scheduler can overlap one chain's VPU epilogue with the other's MXU
# GEMMs. With the r2 masked epilogue 2 chains won; the r3 mask-free
# epilogue + LN folding shrank the VPU tail enough that the split's extra
# copies now lose (38.47 ms at 1 vs 38.86 at 2 — PERF.md r3 sweep).
_SUBTILES = 1
# declare the halves grids parallel (independent crop tiles) so Mosaic may
# overlap adjacent grid steps' compute; A/B knob (JCF_BENCH_PARGRID)
_PAR_GRID = False
# Two heads per MXU pass (zero-masked K/V stacking, exact): full 128-lane
# contraction and half the dot_general count vs the per-head loop.
_PAIR_HEADS = True
# Split the MLP hidden dim into this many c_fc column blocks so each
# block's GELU/requant epilogue overlaps the next block's GEMMs (per-block
# activation scales = finer quant groups; exact w.r.t. the scheme).
_MLP_NSPLIT = 1
# Use the mask-free paired softmax epilogue for no-causal-mask towers
# (joint max + post-PV normalization); False = additive-bias masked path.
_NOMASK_EPILOGUE = True
# QuickGELU x*sigmoid(1.702x) as x*(1+tanh(0.851x))/2 — EXACT identity;
# TPU VPUs lower tanh natively while sigmoid goes through exp+divide.
_GELU_TANH = True
# int8 the attention inner GEMMs (scores: per-row dynamic q/k; PV: static
# 127 on p — row max is exactly 1 — and one per-tile v scale). A/B knob
# (VERDICT r2 #7): the inner GEMMs are ~2 ms of bf16 content per tower,
# so this trades ~1 ms of MXU for several dequant/quant VPU passes.
_INT8_ATTN = False
# Sequence padding multiple. 8 is the f32 sublane tile; 16 aligns per-crop
# row blocks to the bf16 sublane tile (S=50 -> 64), trading ~14% more GEMM
# rows for relayout-free [G, S, D] views inside the attention section.
# Default 16 since the r4 on-chip A/B (4114 vs 3987 img/s at b1024, +3.2%):
# with _DENSE_ROWS the pad exists only inside the attn-half kernel's VMEM
# repack, so the tile-aligned [G, 64, 128] score/PV dots come pad-free in
# HBM — the combination the r3 pad-to-64 experiment couldn't reach while
# the structural pad still rode every GEMM. JCF_BENCH_S_ALIGN overrides.
_S_ALIGN = 16
# Dense row stream (JCF_BENCH_DENSE): the tower activations ride as a FLAT
# [B*S, E] array — no per-crop S->S_pad padding anywhere in HBM or in the
# GEMMs (any [B, S, E] array with S=50 is PHYSICALLY padded to the sublane
# tile by TPU tiling, so dense requires staying 2D). The attention section
# still needs [G, S_pad, .] views, so the attn-half kernel repacks qkv into
# a padded layout IN VMEM (per-group pad+concat) and unpacks the context
# after — trading two in-kernel copy passes per layer for the structural
# +12% GEMM rows the pad costs everywhere (roofline: 4790 -> 5360 img/s at
# 100% int8 MFU). Serving vision tower only (nomask + int8 halves).
# Default ON since the r4 on-chip A/B: 3502 vs 3363 img/s at b1024 (+4.1%)
# — the VMEM repack is cheaper than the structural pad everywhere else.
# JCF_BENCH_DENSE=0 flips it off for A/Bs.
_DENSE_ROWS = True
# CLS-only last layer (r5): serving reads only ln_post(x[:, 0]) @ proj, so
# the final layer computes on CLS rows alone (full K/V, 1 query row/crop,
# MLP on B rows instead of B*S) — exact; see _last_layer_cls_dense.
# JCF_BENCH_CLS_LAST overrides.
_CLS_LAST = True
# _FUSE="layer" (r5): one kernel per layer, MLP weight chunks streamed on
# an inner grid dim (see _layer_fused_int8_kernel). Tile and chunk count:
_GROUP_LAYER = 8
_LAYER_NSPLIT = 4
# CLS-query final ATTENTION half (r5): with _CLS_LAST on, also drop the
# query side of the last attention half to the CLS rows — K/V for all
# rows, scores/softmax/context/out-proj for 1 row/crop, and the qkv GEMM
# loses its Q third on non-CLS rows (_attn_cls_int8_kernel).
# JCF_BENCH_CLS_ATTNQ overrides.
_CLS_ATTNQ = True


def _halves_block(x, params, n_heads, bias, quant_layer, interpret,
                  s_real=None, use_mask=True, quant_folded=False,
                  dense=False, s_pad=None, mlp_half=True):
    """Two-kernel variant (attention half, MLP half) of fused_block.

    ``dense``: x is a FLAT [B*S_real, E] row stream (no per-crop pad rows
    in HBM or the GEMMs); ``s_pad`` then carries the in-kernel attention
    pad target. int8 path only.
    ``mlp_half=False``: run only the attention half and return its output
    (the CLS-only last layer runs its MLP half on gathered CLS rows)."""
    if dense:
        b_rows, e = x.shape
        b = b_rows // s_real
    else:
        b, s_pad, e = x.shape
    d = e // n_heads
    precision = _HI if x.dtype == jnp.float32 else None
    group_a = _pick_group(b, _GROUP_ATTN or _GROUP_TARGET)
    group_m = _pick_group(b, _GROUP_MLP or _GROUP_TARGET)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def full(shape):
        return vmem(shape, lambda i: tuple(0 for _ in shape))

    def tile_common(group):
        if dense:
            rows_t = group * s_real
            tile = vmem((rows_t, e), lambda i: (i, 0))
            shape = (b_rows, e)
        else:
            tile = vmem((group, s_pad, e), lambda i: (i, 0, 0))
            shape = (b, s_pad, e)
        cp = dict(vmem_limit_bytes=_VMEM_LIMIT)
        if _PAR_GRID:
            # grid steps are independent crop tiles: declaring the grid
            # dimension parallel lets Mosaic overlap adjacent steps'
            # compute (not just their DMAs) — targets the MXU-idle-during-
            # VPU serial chain the r4 attribution measured
            cp["dimension_semantics"] = ("parallel",)
        return tile, dict(
            grid=(b // group,),
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            # f32 halves (cert/reference runs) exceed the 16MB scoped-vmem
            # default (c_fc+c_proj f32 ~19MB); raise the cap like the
            # whole-block variant does
            compiler_params=pltpu.CompilerParams(**cp),
            interpret=interpret,
        )

    if quant_layer is not None:
        hidden_dim = quant_layer["mlp"]["c_fc"].w_int8.shape[0]
        static_act = "ln_inv" in quant_layer["attn"]
        static_ctx = "ctx_inv" in quant_layer["attn"]
        static_h = "h_inv" in quant_layer["mlp"]
        static_shift = "score_shift" in quant_layer["attn"]
        ones11 = jnp.ones((1, 1), jnp.float32)
        ln1_inv = quant_layer["attn"].get("ln_inv", ones11)
        ln2_inv = quant_layer["mlp"].get("ln_inv", ones11)
        ctx_inv = quant_layer["attn"].get("ctx_inv", ones11)
        h_inv = quant_layer["mlp"].get("h_inv", ones11)
        shift = quant_layer["attn"].get("score_shift", ones11)
        tile, common = tile_common(group_a)
        x = pl.pallas_call(
            functools.partial(
                _attn_half_int8_kernel, n_heads=n_heads, head_dim=d,
                scale=1.0 / math.sqrt(d), group=group_a, s_pad=s_pad,
                s_real=s_real, use_mask=use_mask, folded=quant_folded,
                static_act=static_act, static_ctx=static_ctx,
                static_shift=static_shift, dense=dense,
            ),
            in_specs=[
                tile, full((e,)), full((e,)), full((1, 1)), full((1, 1)),
                full((1, 1)),
                full((3 * e, e)), full((3 * e,)), full((3 * e,)),
                full((e, e)), full((e,)), full((e,)),
                full((s_pad, s_pad)),
            ],
            **common,
        )(
            x,
            params["ln_1"]["scale"].astype(x.dtype), params["ln_1"]["bias"].astype(x.dtype),
            ln1_inv, ctx_inv, shift,
            quant_layer["attn"]["w_qkv"].w_int8, quant_layer["attn"]["w_qkv"].w_scale,
            quant_layer["attn"]["w_qkv"].bias,
            quant_layer["attn"]["w_out"].w_int8, quant_layer["attn"]["w_out"].w_scale,
            quant_layer["attn"]["w_out"].bias,
            bias,
        )
        if not mlp_half:
            return x
        tile, common = tile_common(group_m)
        return pl.pallas_call(
            functools.partial(_mlp_half_int8_kernel, group=group_m, s_pad=s_pad,
                              folded=quant_folded, static_act=static_act,
                              static_h=static_h, s_real=s_real, dense=dense),
            in_specs=[
                tile, full((e,)), full((e,)), full((1, 1)), full((1, 1)),
                full((hidden_dim, e)), full((hidden_dim,)), full((hidden_dim,)),
                full((e, hidden_dim)), full((e,)), full((e,)),
            ],
            **common,
        )(
            x,
            params["ln_2"]["scale"].astype(x.dtype), params["ln_2"]["bias"].astype(x.dtype),
            ln2_inv, h_inv,
            quant_layer["mlp"]["c_fc"].w_int8,
            *(_fold_h_static(quant_layer["mlp"]["c_fc"], h_inv[0, 0])
              if static_h else
              (quant_layer["mlp"]["c_fc"].w_scale,
               quant_layer["mlp"]["c_fc"].bias)),
            quant_layer["mlp"]["c_proj"].w_int8, quant_layer["mlp"]["c_proj"].w_scale,
            quant_layer["mlp"]["c_proj"].bias,
        )

    hidden_dim = params["mlp"]["c_fc"]["w"].shape[0]
    tile, common = tile_common(group_a)
    x = pl.pallas_call(
        functools.partial(
            _attn_half_kernel, n_heads=n_heads, head_dim=d,
            scale=1.0 / math.sqrt(d), precision=precision, group=group_a,
            s_pad=s_pad, s_real=s_real, use_mask=use_mask,
        ),
        in_specs=[
            tile, full((e,)), full((e,)),
            full((3 * e, e)), full((3 * e,)),
            full((e, e)), full((e,)),
            full((s_pad, s_pad)),
        ],
        **common,
    )(
        x,
        params["ln_1"]["scale"].astype(x.dtype), params["ln_1"]["bias"].astype(x.dtype),
        params["attn"]["w_qkv"].astype(x.dtype), params["attn"]["b_qkv"].astype(jnp.float32),
        params["attn"]["w_out"].astype(x.dtype), params["attn"]["b_out"].astype(jnp.float32),
        bias,
    )
    if not mlp_half:
        return x
    tile, common = tile_common(group_m)
    return pl.pallas_call(
        functools.partial(
            _mlp_half_kernel, precision=precision, group=group_m, s_pad=s_pad
        ),
        in_specs=[
            tile, full((e,)), full((e,)),
            full((hidden_dim, e)), full((hidden_dim,)),
            full((e, hidden_dim)), full((e,)),
        ],
        **common,
    )(
        x,
        params["ln_2"]["scale"].astype(x.dtype), params["ln_2"]["bias"].astype(x.dtype),
        params["mlp"]["c_fc"]["w"].astype(x.dtype), params["mlp"]["c_fc"]["b"].astype(jnp.float32),
        params["mlp"]["c_proj"]["w"].astype(x.dtype), params["mlp"]["c_proj"]["b"].astype(jnp.float32),
    )


def _stream_tower(x, stacked_blocks, quant, n_heads, bias, *, s_real,
                  s_pad, interpret, quant_folded):
    """Whole-tower layer-streaming pallas_call (``_FUSE = "stream"``).

    ``x``: flat dense [B*S_real, E] row stream (the serving layout);
    ``stacked_blocks`` / ``quant``: [L, ...]-stacked float block params and
    int8 weights (the same stacked trees the scan path consumes). See
    ``_stream_tower_int8_kernel`` for the grid/residency design.
    """
    b_rows, e = x.shape
    b = b_rows // s_real
    d = e // n_heads
    n_layers = jax.tree_util.tree_leaves(stacked_blocks)[0].shape[0]
    group = _pick_group(b, _GROUP_STREAM)
    rows_t = group * s_real
    hidden_dim = quant["mlp"]["c_fc"].w_int8.shape[1]

    static_act = "ln_inv" in quant["attn"]
    static_ctx = "ctx_inv" in quant["attn"]
    static_h = "h_inv" in quant["mlp"]
    static_shift = "score_shift" in quant["attn"]
    ones = jnp.ones((n_layers, 1, 1), jnp.float32)

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def by_group(shape):
        return vmem(shape, lambda i, l: (i,) + (0,) * (len(shape) - 1))

    def by_layer(shape):
        # one layer's slice of an [L, ...]-stacked operand; the index only
        # changes every other step, so each half's weights are fetched
        # once per (layer, group) and stay resident for both half-steps
        # lax.div, not //: floor-div lowers with a sign-correction jaxpr
        # Mosaic rejects in block index maps; grid indices are non-negative
        # so truncating division is identical
        return vmem(
            (1,) + shape,
            lambda i, l: (jax.lax.div(l, 2),) + (0,) * len(shape),
        )

    def by_layer_vec(x_len):
        # [L, X] stacked vectors can't block as (1, X): Mosaic requires the
        # last two block dims to divide (8, 128) or equal the array's, and
        # 1 != L. Carry them as [L, 1, X] so the block's trailing (1, X)
        # equals the array's trailing dims exactly.
        return by_layer((1, x_len))

    def const(shape):
        return vmem(shape, lambda i, l: (0,) * len(shape))

    def v3(a):  # [L, X] -> [L, 1, X] to match by_layer_vec blocks
        return a.reshape(a.shape[0], 1, a.shape[1])

    return pl.pallas_call(
        functools.partial(
            _stream_tower_int8_kernel, n_heads=n_heads, head_dim=d,
            scale=1.0 / math.sqrt(d), group=group, s_pad=s_pad,
            s_real=s_real, folded=quant_folded, static_act=static_act,
            static_ctx=static_ctx, static_h=static_h,
            static_shift=static_shift,
        ),
        grid=(b // group, 2 * n_layers),
        in_specs=[
            by_group((rows_t, e)),
            by_layer_vec(e), by_layer_vec(e),
            by_layer((1, 1)), by_layer((1, 1)), by_layer((1, 1)),
            by_layer((3 * e, e)), by_layer_vec(3 * e), by_layer_vec(3 * e),
            by_layer((e, e)), by_layer_vec(e), by_layer_vec(e),
            by_layer_vec(e), by_layer_vec(e),
            by_layer((1, 1)), by_layer((1, 1)),
            by_layer((hidden_dim, e)), by_layer_vec(hidden_dim),
            by_layer_vec(hidden_dim),
            by_layer((e, hidden_dim)), by_layer_vec(e), by_layer_vec(e),
            const((s_pad, s_pad)),
        ],
        out_specs=by_group((rows_t, e)),
        out_shape=jax.ShapeDtypeStruct((b_rows, e), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x,
        v3(stacked_blocks["ln_1"]["scale"].astype(x.dtype)),
        v3(stacked_blocks["ln_1"]["bias"].astype(x.dtype)),
        quant["attn"].get("ln_inv", ones),
        quant["attn"].get("ctx_inv", ones),
        quant["attn"].get("score_shift", ones),
        quant["attn"]["w_qkv"].w_int8, v3(quant["attn"]["w_qkv"].w_scale),
        v3(quant["attn"]["w_qkv"].bias),
        quant["attn"]["w_out"].w_int8, v3(quant["attn"]["w_out"].w_scale),
        v3(quant["attn"]["w_out"].bias),
        v3(stacked_blocks["ln_2"]["scale"].astype(x.dtype)),
        v3(stacked_blocks["ln_2"]["bias"].astype(x.dtype)),
        quant["mlp"].get("ln_inv", ones),
        quant["mlp"].get("h_inv", ones),
        quant["mlp"]["c_fc"].w_int8,
        *(tuple(map(v3, _fold_h_static(
            quant["mlp"]["c_fc"], quant["mlp"]["h_inv"][:, 0])))
          if static_h else
          (v3(quant["mlp"]["c_fc"].w_scale), v3(quant["mlp"]["c_fc"].bias))),
        quant["mlp"]["c_proj"].w_int8, v3(quant["mlp"]["c_proj"].w_scale),
        v3(quant["mlp"]["c_proj"].bias),
        bias,
    )


def fused_block(
    x: jax.Array,  # [B, S_pad, E] — S_pad must be a multiple of 8
    params: dict,  # one layer's block params (unstacked)
    n_heads: int,
    bias: jax.Array,  # [S_pad, S_pad] additive mask (incl. pad-key masking)
    *,
    quant_layer: "dict | None" = None,  # int8 weights for this layer
    interpret: bool = False,
    s_real: "int | None" = None,  # unpadded sequence length
    use_mask: bool = True,  # False -> mask-free paired epilogue
    quant_folded: bool = False,  # quant_layer built with fold=True
    dense: bool = False,  # x is a flat [B*S_real, E] dense row stream
    s_pad: "int | None" = None,  # attention pad target when dense
) -> jax.Array:
    """One full transformer block through the fused kernels.

    Default is the two-kernel halves variant (attention half / MLP half) —
    measured faster than the single whole-block kernel on v5e both pre-
    dense (45.0 vs 47.5 ms at 1024 crops, r2) and on the dense row stream
    (3745 vs 3440 img/s full-bench at b1024, r4): the whole-block
    program's VMEM working set (weights + qkv + f32 hidden per tile)
    costs more in pipelining than the saved inter-half x round-trip
    (~1.07 ms/boundary, scripts/exp_boundary_cost.py) buys.
    ``_FUSE = "block"`` selects the whole-block kernel (dense supported
    since r4)."""
    if dense and quant_layer is None:
        raise ValueError("dense row stream requires the int8 kernels")
    if _FUSE != "block":
        # "halves" (default) — also the per-layer fallback for "stream"
        # configs that aren't stream-eligible (masked/f32/non-dense towers)
        return _halves_block(x, params, n_heads, bias, quant_layer, interpret,
                             s_real=s_real, use_mask=use_mask,
                             quant_folded=quant_folded, dense=dense,
                             s_pad=s_pad)

    if dense:
        b_rows, e = x.shape
        b = b_rows // s_real
    else:
        b, s_pad, e = x.shape
    d = e // n_heads
    precision = _HI if x.dtype == jnp.float32 else None
    group = _pick_group(b, _GROUP_TARGET)

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def full(shape):
        return vmem(shape, lambda i: tuple(0 for _ in shape))

    if dense:
        x_tile = vmem((group * s_real, e), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((b_rows, e), x.dtype)
    else:
        x_tile = vmem((group, s_pad, e), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((b, s_pad, e), x.dtype)

    if quant_layer is not None:
        hidden_dim = quant_layer["mlp"]["c_fc"].w_int8.shape[0]
        static_act = "ln_inv" in quant_layer["attn"]
        static_ctx = "ctx_inv" in quant_layer["attn"]
        static_h = "h_inv" in quant_layer["mlp"]
        static_shift = "score_shift" in quant_layer["attn"]
        ones11 = jnp.ones((1, 1), jnp.float32)
        return pl.pallas_call(
            functools.partial(
                _block_int8_kernel, n_heads=n_heads, head_dim=d,
                scale=1.0 / math.sqrt(d), group=group, s_pad=s_pad,
                s_real=s_real, use_mask=use_mask, folded=quant_folded,
                static_act=static_act, static_ctx=static_ctx,
                static_h=static_h, static_shift=static_shift, dense=dense,
            ),
            grid=(b // group,),
            in_specs=[
                x_tile,
                full((e,)), full((e,)), full((1, 1)), full((1, 1)),
                full((1, 1)),
                full((3 * e, e)), full((3 * e,)), full((3 * e,)),
                full((e, e)), full((e,)), full((e,)),
                full((e,)), full((e,)), full((1, 1)), full((1, 1)),
                full((hidden_dim, e)), full((hidden_dim,)), full((hidden_dim,)),
                full((e, hidden_dim)), full((e,)), full((e,)),
                full((s_pad, s_pad)),
            ],
            out_specs=x_tile,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(
            x,
            params["ln_1"]["scale"].astype(x.dtype), params["ln_1"]["bias"].astype(x.dtype),
            quant_layer["attn"].get("ln_inv", ones11),
            quant_layer["attn"].get("ctx_inv", ones11),
            quant_layer["attn"].get("score_shift", ones11),
            quant_layer["attn"]["w_qkv"].w_int8, quant_layer["attn"]["w_qkv"].w_scale,
            quant_layer["attn"]["w_qkv"].bias,
            quant_layer["attn"]["w_out"].w_int8, quant_layer["attn"]["w_out"].w_scale,
            quant_layer["attn"]["w_out"].bias,
            params["ln_2"]["scale"].astype(x.dtype), params["ln_2"]["bias"].astype(x.dtype),
            quant_layer["mlp"].get("ln_inv", ones11),
            quant_layer["mlp"].get("h_inv", ones11),
            quant_layer["mlp"]["c_fc"].w_int8,
            *(_fold_h_static(quant_layer["mlp"]["c_fc"],
                             quant_layer["mlp"]["h_inv"][0, 0])
              if static_h else
              (quant_layer["mlp"]["c_fc"].w_scale,
               quant_layer["mlp"]["c_fc"].bias)),
            quant_layer["mlp"]["c_proj"].w_int8, quant_layer["mlp"]["c_proj"].w_scale,
            quant_layer["mlp"]["c_proj"].bias,
            bias,
        )

    hidden_dim = params["mlp"]["c_fc"]["w"].shape[0]
    return pl.pallas_call(
        functools.partial(
            _block_kernel, n_heads=n_heads, head_dim=d,
            scale=1.0 / math.sqrt(d), precision=precision, group=group,
            s_pad=s_pad,
        ),
        grid=(b // group,),
        in_specs=[
            vmem((group, s_pad, e), lambda i: (i, 0, 0)),
            full((e,)), full((e,)),
            full((3 * e, e)), full((3 * e,)),
            full((e, e)), full((e,)),
            full((e,)), full((e,)),
            full((hidden_dim, e)), full((hidden_dim,)),
            full((e, hidden_dim)), full((e,)),
            full((s_pad, s_pad)),
        ],
        out_specs=vmem((group, s_pad, e), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, e), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        x,
        params["ln_1"]["scale"].astype(x.dtype), params["ln_1"]["bias"].astype(x.dtype),
        params["attn"]["w_qkv"].astype(x.dtype), params["attn"]["b_qkv"].astype(jnp.float32),
        params["attn"]["w_out"].astype(x.dtype), params["attn"]["b_out"].astype(jnp.float32),
        params["ln_2"]["scale"].astype(x.dtype), params["ln_2"]["bias"].astype(x.dtype),
        params["mlp"]["c_fc"]["w"].astype(x.dtype), params["mlp"]["c_fc"]["b"].astype(jnp.float32),
        params["mlp"]["c_proj"]["w"].astype(x.dtype), params["mlp"]["c_proj"]["b"].astype(jnp.float32),
        bias,
    )


def _attn_cls_int8_kernel(
    x_ref, ln_s_ref, ln_b_ref, ln_inv_ref, ctx_inv_ref, shift_ref,
    wkv_i8_ref, wkv_sc_ref, bkv_ref,
    wq_i8_ref, wq_sc_ref, bq_ref,
    wout_i8_ref, wout_sc_ref, bout_ref, out_ref,
    *, n_heads, head_dim, scale, group, s_real,
    folded=False, static_act=False, static_ctx=False, static_shift=False,
):
    """Final-layer attention half, CLS QUERIES only (dense int8 path).

    With _CLS_LAST, only each crop's CLS row is read downstream — but the
    plain attn-half kernel still computes S x S scores, softmax, context
    and out-proj for every row. This kernel computes K/V for all rows
    (the CLS token attends to every token) and everything query-side for
    the one CLS row per crop: scores [P*G, 1, 128] instead of
    [P*G, S, 128], context/out-proj on [G, E] rows, and the qkv GEMM
    drops its Q third for the S-1 non-CLS rows. Same zero-masked K/V
    head-pairing + joint-max + half-normalizer epilogue as
    _batched_pairs_attention_nomask; per-row quant and LN are
    row-independent, so the CLS outputs match the full kernel at the
    same quant scheme (rankings-exact; cert-gated like everything else).
    Output tile: [G, E] — one row per crop.
    """
    e = n_heads * head_dim
    d2 = 2 * head_dim
    n_pairs = n_heads // 2
    np_half = 64  # keys per half, zero-padded (s_real <= 64, caller-gated)
    rows = x_ref[...]  # [G*s_real, E] dense
    h_ln = (
        _ln_norm(rows) if folded
        else _ln_rows(rows, ln_s_ref[...], ln_b_ref[...])
    )
    if static_act:
        x_q, x_sc = _quant_rows_static(h_ln, ln_inv_ref[0, 0]), None
    else:
        x_q, x_sc = _quant_rows(h_ln)
    kv = _int8_gemm(x_q, x_sc, wkv_i8_ref, wkv_sc_ref, bkv_ref).astype(
        jnp.bfloat16
    )  # [G*S, 2E]
    cls_q = x_q.reshape(group, s_real, e)[:, 0]  # [G, E] int8
    cls_sc = None if x_sc is None else x_sc.reshape(group, s_real, 1)[:, 0]
    q = _int8_gemm(cls_q, cls_sc, wq_i8_ref, wq_sc_ref, bq_ref).astype(
        jnp.bfloat16
    )  # [G, E]

    kv3 = kv.reshape(group, s_real, 2 * e)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d2), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * np_half, 1), 1)
    lo_sel = (lane < head_dim) & (row < s_real)
    hi_sel = (lane >= head_dim) & (row >= np_half) & (row < np_half + s_real)

    def build(slices):  # [G, S, 2D] -> zero-masked double-block [G, 128, 2D]
        pad_lo = jnp.pad(slices, ((0, 0), (0, np_half - s_real), (0, 0)))
        blk = jnp.concatenate([pad_lo, pad_lo], axis=1)
        return jnp.where(lo_sel | hi_sel, blk, jnp.zeros_like(blk))

    k6 = jnp.stack(
        [build(kv3[:, :, p * d2 : (p + 1) * d2]) for p in range(n_pairs)]
    ).reshape(n_pairs * group, 2 * np_half, d2)
    v6 = jnp.stack(
        [build(kv3[:, :, e + p * d2 : e + (p + 1) * d2]) for p in range(n_pairs)]
    ).reshape(n_pairs * group, 2 * np_half, d2)
    q6 = jnp.stack(
        [q[:, p * d2 : (p + 1) * d2] for p in range(n_pairs)]
    ).reshape(n_pairs * group, 1, d2)

    scores = jax.lax.dot_general(
        q6, k6, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [P*G, 1, 128]
    if scale is not None:
        scores = scores * scale
    if static_shift:
        m = shift_ref[0, 0]
    else:
        # joint max over real + zero-pad columns: max(real, 0) is still a
        # valid softmax stabilizer (pad lanes score exactly 0)
        m = jnp.max(scores, axis=-1, keepdims=True)
    p_ = jnp.exp(scores - m)
    pc = p_.astype(v6.dtype)
    ctx_u = jax.lax.dot_general(
        pc, v6, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [P*G, 1, 2D]
    # per-half normalizers: pad lanes are EXCLUDED (their v rows are zero
    # in PV and their p mass never enters a half's sum)
    lo_sum = jnp.sum(p_[:, :, :s_real], axis=-1, keepdims=True)
    hi_sum = jnp.sum(p_[:, :, np_half : np_half + s_real], axis=-1, keepdims=True)
    # static ctx quant scale folds into the normalizer (post_scale style)
    num = ctx_inv_ref[0, 0] if static_ctx else jnp.float32(1.0)
    inv = jnp.where(
        lane < head_dim,
        num / jnp.maximum(lo_sum, 1e-30),
        num / jnp.maximum(hi_sum, 1e-30),
    )
    ctx = (ctx_u * inv).reshape(n_pairs, group, d2)
    ctx = jnp.concatenate([ctx[i] for i in range(n_pairs)], axis=-1)  # [G, E]
    if static_ctx:
        c_q, c_sc = _round_clip_int8(ctx), None
    else:
        c_q, c_sc = _quant_rows(ctx)
    proj = _int8_gemm(c_q, c_sc, wout_i8_ref, wout_sc_ref, bout_ref)
    cls_rows = rows.reshape(group, s_real, e)[:, 0]
    out_ref[...] = (cls_rows.astype(jnp.float32) + proj).astype(out_ref.dtype)


def _attn_cls_dense(x, params, n_heads, quant_layer, interpret, *,
                    s_real, quant_folded):
    """pallas_call wrapper for _attn_cls_int8_kernel: dense [B*S, E] rows
    in, [B, E] CLS attention outputs out (the _CLS_LAST final layer)."""
    b_rows, e = x.shape
    b = b_rows // s_real
    d = e // n_heads
    group = _pick_group(b, _GROUP_ATTN or _GROUP_TARGET)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def full(shape):
        return vmem(shape, lambda i: tuple(0 for _ in shape))

    static_act = "ln_inv" in quant_layer["attn"]
    static_ctx = "ctx_inv" in quant_layer["attn"]
    static_shift = "score_shift" in quant_layer["attn"]
    ones11 = jnp.ones((1, 1), jnp.float32)
    attn_q = quant_layer["attn"]
    wqkv = attn_q["w_qkv"]
    # slice Q / KV thirds of the packed qkv projection at trace time (the
    # per-output-channel scales/biases slice with their rows, so static
    # folding is preserved)
    cp = dict(vmem_limit_bytes=_VMEM_LIMIT)
    if _PAR_GRID:
        cp["dimension_semantics"] = ("parallel",)
    return pl.pallas_call(
        functools.partial(
            _attn_cls_int8_kernel, n_heads=n_heads, head_dim=d,
            scale=None if quant_folded else 1.0 / math.sqrt(d),
            group=group, s_real=s_real, folded=quant_folded,
            static_act=static_act, static_ctx=static_ctx,
            static_shift=static_shift,
        ),
        in_specs=[
            vmem((group * s_real, e), lambda i: (i, 0)),
            full((e,)), full((e,)), full((1, 1)), full((1, 1)), full((1, 1)),
            full((2 * e, e)), full((2 * e,)), full((2 * e,)),
            full((e, e)), full((e,)), full((e,)),
            full((e, e)), full((e,)), full((e,)),
        ],
        grid=(b // group,),
        out_specs=vmem((group, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, e), x.dtype),
        compiler_params=pltpu.CompilerParams(**cp),
        interpret=interpret,
    )(
        x,
        params["ln_1"]["scale"].astype(x.dtype),
        params["ln_1"]["bias"].astype(x.dtype),
        attn_q.get("ln_inv", ones11), attn_q.get("ctx_inv", ones11),
        attn_q.get("score_shift", ones11),
        wqkv.w_int8[e:], wqkv.w_scale[e:], wqkv.bias[e:],
        wqkv.w_int8[:e], wqkv.w_scale[:e], wqkv.bias[:e],
        attn_q["w_out"].w_int8, attn_q["w_out"].w_scale,
        attn_q["w_out"].bias,
    )


def _layer_fused_int8_kernel(
    x_ref, ln1_s_ref, ln1_b_ref, ln1_inv_ref, ctx_inv_ref, shift_ref,
    wqkv_i8_ref, wqkv_sc_ref, bqkv_ref,
    wout_i8_ref, wout_sc_ref, bout_ref,
    ln2_s_ref, ln2_b_ref, ln2_inv_ref, h_inv_ref,
    wfc_i8_ref, wfc_sc_ref, bfc_ref,          # chunk j-1: [hs, E]/[hs]/[hs]
    wproj_i8_ref, wproj_sc_ref, bproj_ref,    # chunk j-1: [E, hs]; [E]; [E]
    out_ref,
    mid_ref, xq_ref, xsc_ref, acc_ref,        # VMEM scratch (persist over j)
    *, n_heads, head_dim, scale, group, s_pad, s_real, nsp,
    folded, static_act, static_ctx, static_h, static_shift,
):
    """ONE kernel per transformer layer, MLP weights streamed on an inner
    grid dim (r5, VERDICT r4 #1a).

    The halves scan pays an HBM round-trip of the full [B*S, E] residual
    between the attention and MLP kernels of every layer (~1.26 GB/layer
    at b1024, ~13-18 ms/iter over 12 layers — scripts/exp_boundary_cost).
    The r4 whole-block kernel removed the boundary but lost more to VMEM
    pressure: ALL weights (7.1 MB int8) + the [rows, 3072] f32 hidden
    resident at once degrade Mosaic's pipelining (PERF.md r4: 3937 vs
    4298 halves).

    This variant keeps the boundary in VMEM **without** the working-set
    cliff by making the MLP hidden chunk a GRID dimension:

      grid = (B/G, 1 + nsp)   [both "arbitrary": inner steps are a
                               sequential reduction]
      j = 0      attention half on the x tile -> mid (VMEM scratch,
                 rounded through x.dtype exactly like the halves kernel
                 boundary) + the MLP's LN2+quant, computed once
      j = 1..nsp c_fc/c_proj CHUNK j-1 GEMM -> GELU -> requant -> partial
                 out-proj, accumulated in f32 scratch; chunk weights ride
                 j-indexed BlockSpecs so Mosaic double-buffers their HBM
                 fetches against the previous chunk's compute — only
                 2/nsp of the MLP weights are ever resident
      j = nsp    writes mid + (acc + b_proj) to the (revisited) out tile

    x is read once and written once per layer; the intra-layer boundary
    never exists in HBM. Accumulation order (chunk 0..nsp-1) matches the
    halves kernel at _MLP_NSPLIT=nsp, so outputs are bit-identical to
    that config (pinned in tests/test_block_kernel.py). Dense row stream
    only (the serving vision tower path).
    """
    e = n_heads * head_dim
    j = pl.program_id(1)
    rows = x_ref[...]  # [G*s_real, E] dense

    @pl.when(j == 0)
    def _attn_half():
        h_ln = (
            _ln_norm(rows) if folded
            else _ln_rows(rows, ln1_s_ref[...], ln1_b_ref[...])
        )
        if static_act:
            x_q, x_sc = _quant_rows_static(h_ln, ln1_inv_ref[0, 0]), None
        else:
            x_q, x_sc = _quant_rows(h_ln)
        qkv = _int8_gemm(x_q, x_sc, wqkv_i8_ref, wqkv_sc_ref, bqkv_ref).astype(
            jnp.bfloat16
        )
        # VMEM repack: dense rows -> [G, s_pad, .] views (as the attn half)
        qkv_att = jnp.concatenate(
            [
                jnp.pad(
                    qkv[g * s_real : (g + 1) * s_real],
                    ((0, s_pad - s_real), (0, 0)),
                )
                for g in range(group)
            ],
            axis=0,
        )
        ctx = _batched_attention(
            qkv_att, None, n_heads, head_dim, scale,
            group, s_pad, s_real=s_real, use_mask=False,
            score_shift=shift_ref[0, 0] if static_shift else None,
            post_scale=ctx_inv_ref[0, 0] if static_ctx else None,
        )
        ctx = jnp.concatenate(
            [ctx[g * s_pad : g * s_pad + s_real] for g in range(group)],
            axis=0,
        )
        if static_ctx:
            c_q, c_sc = _round_clip_int8(ctx), None
        else:
            c_q, c_sc = _quant_rows(ctx)
        proj = _int8_gemm(c_q, c_sc, wout_i8_ref, wout_sc_ref, bout_ref)
        # round through x.dtype — bit-identical to the halves HBM boundary
        mid = (rows.astype(jnp.float32) + proj).astype(mid_ref.dtype)
        mid_ref[...] = mid
        # the MLP's LN2 + input quant, once for all chunks
        h2 = (
            _ln_norm(mid) if folded
            else _ln_rows(mid, ln2_s_ref[...], ln2_b_ref[...])
        )
        if static_act:
            xq_ref[...] = _quant_rows_static(h2, ln2_inv_ref[0, 0])
        else:
            q2, s2 = _quant_rows(h2)
            xq_ref[...] = q2
            xsc_ref[...] = s2

    @pl.when(j > 0)
    def _mlp_chunk():
        s2 = None if static_act else xsc_ref[...]
        # chunked per-channel vectors ride as [nsp, 1, hs] rows (1-D or
        # (1, hs) blocked slices violate Mosaic's tiling rules)
        hidden = _int8_gemm(
            xq_ref[...], s2, wfc_i8_ref, wfc_sc_ref[0, 0], bfc_ref[0, 0]
        )
        if static_h:
            # h_inv pre-folded into wfc_sc/bfc (see _gelu_quant_static)
            h_q, h_sc = _gelu_quant_static(hidden, h_inv_ref[0, 0]), None
        else:
            h_q, h_sc = _quant_rows(_quick_gelu32(hidden))
        part = jax.lax.dot_general(
            h_q, wproj_i8_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * wproj_sc_ref[...].astype(jnp.float32)
        if h_sc is not None:
            part = part * h_sc
        prev = jnp.where(j == 1, jnp.float32(0.0), acc_ref[...])
        acc_ref[...] = prev + part

        @pl.when(j == nsp)
        def _write_out():
            out = mid_ref[...].astype(jnp.float32) + (
                acc_ref[...] + bproj_ref[...].astype(jnp.float32)
            )
            out_ref[...] = out.astype(out_ref.dtype)


def _layer_block(x, params, n_heads, quant_layer, interpret, *,
                 s_real, s_pad, quant_folded):
    """pallas_call wrapper for _layer_fused_int8_kernel: one fused layer
    on the dense [B*S, E] row stream (``_FUSE = "layer"``)."""
    b_rows, e = x.shape
    b = b_rows // s_real
    d = e // n_heads
    group = _pick_group(b, _GROUP_LAYER or _GROUP_TARGET)
    hidden_dim = quant_layer["mlp"]["c_fc"].w_int8.shape[0]
    nsp = _LAYER_NSPLIT if hidden_dim % _LAYER_NSPLIT == 0 else 1
    hs = hidden_dim // nsp
    rows_t = group * s_real
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def full(shape):
        return vmem(shape, lambda i, j: tuple(0 for _ in shape))

    def chunk_row(shape):  # c_fc chunk: rows j-1 (chunk 0 prefetched at j=0)
        return vmem(
            shape,
            lambda i, j: (jnp.maximum(j - 1, 0),) + (0,) * (len(shape) - 1),
        )

    def chunk_vec(hs_):
        # per-channel chunk vectors carried [nsp, 1, hs]: a (1, hs) block
        # on [nsp, hs] violates the divide-(8,128)-or-equal rule (same
        # fix as the stream kernel's stacked per-layer vectors)
        return vmem((1, 1, hs_), lambda i, j: (jnp.maximum(j - 1, 0), 0, 0))

    def chunk_col(shape):  # c_proj chunk: cols j-1
        return vmem(shape, lambda i, j: (0, jnp.maximum(j - 1, 0)))

    static_act = "ln_inv" in quant_layer["attn"]
    static_ctx = "ctx_inv" in quant_layer["attn"]
    static_h = "h_inv" in quant_layer["mlp"]
    static_shift = "score_shift" in quant_layer["attn"]
    ones11 = jnp.ones((1, 1), jnp.float32)
    h_inv = quant_layer["mlp"].get("h_inv", ones11)
    fc = quant_layer["mlp"]["c_fc"]
    fc_sc, fc_b = (
        _fold_h_static(fc, h_inv[0, 0]) if static_h else (fc.w_scale, fc.bias)
    )
    return pl.pallas_call(
        functools.partial(
            _layer_fused_int8_kernel, n_heads=n_heads, head_dim=d,
            scale=None if quant_folded else 1.0 / math.sqrt(d),
            group=group, s_pad=s_pad, s_real=s_real, nsp=nsp,
            folded=quant_folded, static_act=static_act,
            static_ctx=static_ctx, static_h=static_h,
            static_shift=static_shift,
        ),
        grid=(b // group, nsp + 1),
        in_specs=[
            vmem((rows_t, e), lambda i, j: (i, 0)),
            full((e,)), full((e,)), full((1, 1)), full((1, 1)), full((1, 1)),
            full((3 * e, e)), full((3 * e,)), full((3 * e,)),
            full((e, e)), full((e,)), full((e,)),
            full((e,)), full((e,)), full((1, 1)), full((1, 1)),
            chunk_row((hs, e)), chunk_vec(hs), chunk_vec(hs),
            chunk_col((e, hs)), full((e,)), full((e,)),
        ],
        out_specs=vmem((rows_t, e), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_rows, e), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_t, e), x.dtype),       # mid
            pltpu.VMEM((rows_t, e), jnp.int8),      # quantized LN2 rows
            pltpu.VMEM((rows_t, 1), jnp.float32),   # dynamic act scales
            pltpu.VMEM((rows_t, e), jnp.float32),   # out-proj accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x,
        params["ln_1"]["scale"].astype(x.dtype),
        params["ln_1"]["bias"].astype(x.dtype),
        quant_layer["attn"].get("ln_inv", ones11),
        quant_layer["attn"].get("ctx_inv", ones11),
        quant_layer["attn"].get("score_shift", ones11),
        quant_layer["attn"]["w_qkv"].w_int8, quant_layer["attn"]["w_qkv"].w_scale,
        quant_layer["attn"]["w_qkv"].bias,
        quant_layer["attn"]["w_out"].w_int8, quant_layer["attn"]["w_out"].w_scale,
        quant_layer["attn"]["w_out"].bias,
        params["ln_2"]["scale"].astype(x.dtype),
        params["ln_2"]["bias"].astype(x.dtype),
        quant_layer["mlp"].get("ln_inv", ones11), h_inv,
        fc.w_int8, fc_sc.reshape(nsp, 1, hs), fc_b.reshape(nsp, 1, hs),
        quant_layer["mlp"]["c_proj"].w_int8, quant_layer["mlp"]["c_proj"].w_scale,
        quant_layer["mlp"]["c_proj"].bias,
    )


def _mlp_half_cls_rows(mid, layer_params, quant_layer, *, quant_folded):
    """Final-layer MLP half on CLS rows only (r5, JCF_BENCH_CLS_LAST).

    Serving reads ONLY ``ln_post(x[:, 0]) @ proj`` downstream
    (/root/reference/jclip/model.py:119-124), so the LAST layer's MLP
    half is dead work for the other S-1 rows — ~1/L of the tower's MLP
    cost. The attention half still runs through the fused kernel on all
    rows (CLS attends to every token, and an XLA re-implementation of it
    materializes the h_ln/qkv intermediates the kernels keep in VMEM —
    measured -10.5% full-bench); only the MLP half moves here, on the
    gathered [B, E] CLS rows where every intermediate is tiny.

    Op-for-op the fused MLP-half math: LN -> (static|per-row) int8 quant
    -> s8xs8->s32 c_fc -> QuickGELU -> h quant -> c_proj -> residual.
    Per-row quantization is row-independent, so dropping rows changes
    nothing for the rows kept.
    """
    mlp = quant_layer["mlp"]
    static_act = "ln_inv" in mlp
    static_h = "h_inv" in mlp
    h2 = (
        _ln_norm(mid) if quant_folded
        else _ln_rows(mid, layer_params["ln_2"]["scale"], layer_params["ln_2"]["bias"])
    )
    if static_act:
        q2, s2 = _quant_rows_static(h2, mlp["ln_inv"][0, 0]), None
    else:
        q2, s2 = _quant_rows(h2)
    fc = mlp["c_fc"]
    if static_h:
        # same h_inv fold as the fused kernels (see _gelu_quant_static)
        fc_sc, fc_b = _fold_h_static(fc, mlp["h_inv"][0, 0])
        hidden = _int8_gemm(q2, s2, fc.w_int8, fc_sc, fc_b)
        h_q, h_sc = _gelu_quant_static(hidden, mlp["h_inv"][0, 0]), None
    else:
        hidden = _quick_gelu32(_int8_gemm(q2, s2, fc.w_int8, fc.w_scale, fc.bias))
        h_q, h_sc = _quant_rows(hidden)
    pr = mlp["c_proj"]
    out = mid.astype(jnp.float32) + _int8_gemm(h_q, h_sc, pr.w_int8, pr.w_scale, pr.bias)
    return out.astype(mid.dtype)


def dense_rows_eligible(s: int, n_heads: int, has_quant: bool = True) -> bool:
    """True iff run_fused_tower would take the dense flat-row path for a
    mask-free tower of sequence length ``s`` — the gate callers (engine
    assembly fusion) must mirror before pre-flattening inputs."""
    s_pad = ((s + _S_ALIGN - 1) // _S_ALIGN) * _S_ALIGN
    use_mask = (
        not (_PAIR_HEADS and n_heads % 2 == 0) or not _NOMASK_EPILOGUE
    )
    return (
        _DENSE_ROWS and s_pad != s and not use_mask and has_quant
        and _FUSE in ("halves", "stream", "block", "layer")
    )


def run_fused_tower(
    x: jax.Array,  # [B, S, E] — or [B*S, E] flat dense rows with flat_s=S
    stacked_blocks: dict,
    n_heads: int,
    mask: Optional[jax.Array] = None,
    *,
    quant: "dict | None" = None,  # stacked int8 weights (quantize_clip_params)
    quant_folded: bool = False,  # quant built with fold=True (LN/scale folded)
    interpret: bool = False,
    flat_s: Optional[int] = None,  # rows-per-crop when x is pre-flattened
    cls_only: bool = False,  # only CLS rows are read downstream
) -> jax.Array:
    """Scan all layers through the fused block kernels.

    Pads S once to a sublane multiple and slices back at the end. With a
    causal ``mask`` pad keys are masked with -inf in the additive bias;
    without one (the serving vision tower) the paired-attention kernels
    mask pad keys themselves (zeroed K/V rows + sum selector) and the bias
    operand is unused. Pad rows carry garbage that never reaches real
    rows either way.

    ``cls_only=True`` declares that the caller reads only each crop's CLS
    row: on the dense int8 path with ``_CLS_LAST`` the final layer then
    runs CLS-only (exact — _last_layer_cls_dense) and the return value is
    ``[B, E]``; on every other path the full tower runs and the CLS rows
    are sliced out, so the return shape is ``[B, E]`` either way.
    """
    if flat_s is not None:
        s, e = flat_s, x.shape[-1]
        b = x.shape[0] // s
    else:
        b, s, e = x.shape
    s_pad = ((s + _S_ALIGN - 1) // _S_ALIGN) * _S_ALIGN

    use_mask = (
        mask is not None
        or not (_PAIR_HEADS and n_heads % 2 == 0)
        or not _NOMASK_EPILOGUE
    )
    # dense row stream (no pad rows in HBM/GEMMs; attention repacks in
    # VMEM) — serving vision tower only: int8 halves, mask-free epilogue
    # (_ATTN_BATCHPAIRS composes with dense since r5: at the shipped
    # _S_ALIGN=16 the in-VMEM attention views are already 64-padded, so
    # the batched-pairs key pad is a no-op; s_pad > 64 configs fall back
    # to the per-pair epilogue inside _batched_attention)
    dense = (
        _DENSE_ROWS and s_pad != s and not use_mask
        and quant is not None and _FUSE in ("halves", "stream", "block", "layer")
    )
    if not dense:
        # _S_ALIGN=16's win exists ONLY inside the dense path's in-VMEM
        # attention repack; on the padded routes (bf16 towers, masked
        # text) the structural pad rides every GEMM and all HBM traffic,
        # so fall back to the minimal sublane alignment (r5: the bf16
        # parity config measured 1700 img/s at s_pad 64 vs 2095 at 56)
        s_pad = ((s + 7) // 8) * 8
    if flat_s is not None and not dense:
        # pre-flattened caller but a non-dense kernel config: un-flatten
        # (a compaction copy — correctness fallback, not the fast path)
        x = x.reshape(b, s, e)
    if s_pad != s and not dense:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))

    bias = jnp.full((s_pad, s_pad), _NEG_INF, dtype=jnp.float32)
    block = jnp.zeros((s, s), jnp.float32) if mask is None else mask.astype(jnp.float32)
    bias = bias.at[:s, :s].set(block)

    kw = dict(interpret=interpret, s_real=s, use_mask=use_mask,
              quant_folded=quant_folded, dense=dense, s_pad=s_pad)
    if dense and flat_s is None:
        x = x.reshape(b * s, e)  # physical compaction: drops tile pad rows
    if dense and _FUSE == "stream":
        x = _stream_tower(x, stacked_blocks, quant, n_heads, bias,
                          s_real=s, s_pad=s_pad, interpret=interpret,
                          quant_folded=quant_folded)
        if cls_only:
            return x[::s]
        return x if flat_s is not None else x.reshape(b, s, e)
    cls_route = cls_only and dense and quant is not None and _CLS_LAST
    if quant is not None:
        if dense and _FUSE == "layer":
            def body(carry, scanned):
                layer_params, quant_layer = scanned
                return _layer_block(
                    carry, layer_params, n_heads, quant_layer, interpret,
                    s_real=s, s_pad=s_pad, quant_folded=quant_folded,
                ), None
        else:
            def body(carry, scanned):
                layer_params, quant_layer = scanned
                return fused_block(
                    carry, layer_params, n_heads, bias,
                    quant_layer=quant_layer, **kw,
                ), None

        if cls_route:
            # scan L-1 layers; the last layer runs its attention half
            # through the fused kernel on all rows (CLS attends to every
            # token) and its MLP half on the gathered CLS rows only
            tm = jax.tree_util.tree_map
            x, _ = jax.lax.scan(
                body, x,
                (tm(lambda a: a[:-1], stacked_blocks), tm(lambda a: a[:-1], quant)),
            )
            last_b = tm(lambda a: a[-1], stacked_blocks)
            last_q = tm(lambda a: a[-1], quant)
            if (_CLS_ATTNQ and _PAIR_HEADS and n_heads % 2 == 0
                    and s <= 64 and not _INT8_ATTN):
                mid = _attn_cls_dense(
                    x, last_b, n_heads, last_q, interpret,
                    s_real=s, quant_folded=quant_folded,
                )
            else:
                x = _halves_block(
                    x, last_b, n_heads, bias, last_q, interpret,
                    s_real=s, use_mask=use_mask, quant_folded=quant_folded,
                    dense=dense, s_pad=s_pad, mlp_half=False,
                )
                mid = x.reshape(-1, s, e)[:, 0]  # CLS rows [B, E]
            return _mlp_half_cls_rows(
                mid, last_b, last_q, quant_folded=quant_folded
            )
        x, _ = jax.lax.scan(body, x, (stacked_blocks, quant))
    else:
        def body(carry, layer_params):
            return fused_block(carry, layer_params, n_heads, bias, **kw), None

        x, _ = jax.lax.scan(body, x, stacked_blocks)
    if cls_only:
        if dense:
            return x[::s]
        return x[:, 0]
    if dense:
        return x if flat_s is not None else x.reshape(b, s, e)
    if flat_s is not None:
        # non-dense fallback for a flat caller: re-flatten real rows
        return (x[:, :s] if s_pad != s else x).reshape(b * s, e)
    return x[:, :s] if s_pad != s else x
