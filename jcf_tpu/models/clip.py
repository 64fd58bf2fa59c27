"""Functional CLIP: ViT image tower + causal text transformer, TPU-first.

Capability parity with the reference models
(``/root/reference/jclip/model.py`` vanilla; ``jclip/model1.py`` IVLP
prompted variant) with a TPU-native architecture:

- Parameters are plain pytrees; transformer blocks are **stacked along a
  leading layer axis** and executed with ``lax.scan`` — one compiled block
  body instead of 12 unrolled layers (faster compiles, identical math).
- Patchify is a single big matmul on the MXU (conv with stride==kernel is
  an exact reshape+matmul), replacing the reference's Conv2d
  (``jclip/model.py:105-108``).
- Attention runs through the fused Pallas kernel (``jcf_tpu.ops.attention``).
- Batch-first [B, S, E] activations throughout — the reference's LND
  permutes (``jclip/model.py:117-119``) are a torch artifact with no TPU
  benefit.

IVLP prompting (``jclip/model1.py``): ``vision_prompt_tokens`` learnable
VPT tokens are appended to the patch sequence after pos-embed and before
ln_pre (``model1.py:190-196``); deep per-layer prompts (inactive in the
reference, ``model1.py:175,244``) are supported via ``*_prompt_depth`` —
visual prompts replace the trailing tokens, text prompts splice into
positions [1, 1+n_ctx) (``model1.py:100-121``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jcf_tpu.ops.attention import causal_mask, multi_head_attention
from jcf_tpu.ops.layers import layer_norm, linear, mlp


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision tower
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    # text tower
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    # IVLP prompting (0 = vanilla CLIP)
    vision_prompt_tokens: int = 0
    vision_prompt_depth: int = 0
    text_prompt_tokens: int = 4
    text_prompt_depth: int = 0

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def vision_seq_len(self) -> int:
        return self.grid_size**2 + 1 + self.vision_prompt_tokens

    def with_prompts(self, vision_ctx=4, vision_depth=3, language_ctx=4, language_depth=3):
        """IVLP design (``jclip/clip1.py:199-205``). Note: the reference
        builds both transformers with prompts_needed=0 so deep prompts are
        inactive; we mirror that by default (depth knobs only take effect
        when explicitly set on this config)."""
        return dataclasses.replace(
            self,
            vision_prompt_tokens=vision_ctx,
            text_prompt_tokens=language_ctx,
        )


VIT_B_32 = CLIPConfig()


# ---------------------------------------------------------------------------
# initialization (reference distributions, jclip/model.py:93-102,172-187)
# ---------------------------------------------------------------------------


def _init_blocks(rng: np.random.Generator, layers: int, width: int) -> dict:
    proj_std = (width**-0.5) * ((2 * layers) ** -0.5)
    attn_std = width**-0.5
    fc_std = (2 * width) ** -0.5

    def norm(shape, std):
        return jnp.asarray(rng.normal(0.0, std, size=shape).astype(np.float32))

    def zeros(shape):
        return jnp.zeros(shape, jnp.float32)

    L, W = layers, width
    return {
        "ln_1": {"scale": jnp.ones((L, W)), "bias": zeros((L, W))},
        "attn": {
            "w_qkv": norm((L, 3 * W, W), attn_std),
            "b_qkv": zeros((L, 3 * W)),
            "w_out": norm((L, W, W), proj_std),
            "b_out": zeros((L, W)),
        },
        "ln_2": {"scale": jnp.ones((L, W)), "bias": zeros((L, W))},
        "mlp": {
            "c_fc": {"w": norm((L, 4 * W, W), fc_std), "b": zeros((L, 4 * W))},
            "c_proj": {"w": norm((L, W, 4 * W), proj_std), "b": zeros((L, W))},
        },
    }


def init_clip_params(seed: int, cfg: CLIPConfig) -> dict:
    rng = np.random.default_rng(seed)
    w, tw = cfg.vision_width, cfg.text_width
    scale = w**-0.5

    def norm(shape, std):
        return jnp.asarray(rng.normal(0.0, std, size=shape).astype(np.float32))

    visual = {
        "patch_embed": {
            "w": norm((w, 3 * cfg.vision_patch_size**2), scale)
        },
        "class_embedding": norm((w,), scale),
        "positional_embedding": norm((cfg.grid_size**2 + 1, w), scale),
        "ln_pre": {"scale": jnp.ones(w), "bias": jnp.zeros(w)},
        "blocks": _init_blocks(rng, cfg.vision_layers, w),
        "ln_post": {"scale": jnp.ones(w), "bias": jnp.zeros(w)},
        "proj": norm((w, cfg.embed_dim), scale),
    }
    if cfg.vision_prompt_tokens:
        visual["vpt"] = norm((cfg.vision_prompt_tokens, w), 0.02)
    if cfg.vision_prompt_depth > 1:
        visual["vpt_deep"] = norm(
            (cfg.vision_prompt_depth - 1, cfg.vision_prompt_tokens, w), 0.02
        )

    text = {
        "token_embedding": norm((cfg.vocab_size, tw), 0.02),
        "positional_embedding": norm((cfg.context_length, tw), 0.01),
        "blocks": _init_blocks(rng, cfg.text_layers, tw),
        "ln_final": {"scale": jnp.ones(tw), "bias": jnp.zeros(tw)},
        "text_projection": norm((tw, cfg.embed_dim), tw**-0.5),
    }
    if cfg.text_prompt_depth > 1:
        text["ctx_deep"] = norm(
            (cfg.text_prompt_depth - 1, cfg.text_prompt_tokens, tw), 0.02
        )

    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _run_blocks(
    x: jax.Array,
    blocks: dict,
    n_heads: int,
    mask: Optional[jax.Array],
    *,
    deep_prompts: Optional[jax.Array] = None,
    prompt_mode: str = "none",
    n_prompt: int = 0,
    impl: Optional[str] = None,
    lora_ctx: Optional[dict] = None,
    quant: Optional[dict] = None,
    quant_folded: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Scan the stacked residual blocks over [B, S, E] activations.

    remat: rematerialize each block in the backward pass (training path) —
    without it the saved per-layer attention probabilities/hiddens of the
    two towers OOM a 16 GB chip at the reference batch sizes (stage-1
    bs 256 measured 16.7 GB); with per-layer remat only the [B, S, E]
    layer inputs are kept, traded for ~1/3 more backward FLOPs.

    deep_prompts: [L-ish, n_prompt, E] per-layer prompt replacements for
    layers 1..depth-1 (IVLP deep prompting, jclip/model1.py:97-121);
    prompt_mode "visual" replaces the trailing n_prompt tokens, "text"
    splices positions [1, 1+n_prompt).

    lora_ctx: per-tower LoRA context (``peft.lora.make_lora_context``) —
    the decomposed training path; stacked factors scan alongside the block
    params, gates select the active layers.
    """
    n_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    # deep prompts apply to layers 1..depth-1 (layer 0's prompt is installed
    # by the caller before the scan, jclip/model1.py:78-91)
    depth = (deep_prompts.shape[0] + 1) if deep_prompts is not None else 0

    # fused-block fast path (PERF.md): whole half-blocks in VMEM. Only for
    # plain inference — LoRA/quant/deep-prompt variants use the composable
    # path below.
    use_fused = (
        impl in (None, "fused")
        and jax.default_backend() == "tpu"
        and lora_ctx is None
        and deep_prompts is None
        and x.shape[1] < 128
    )
    if impl == "fused" or use_fused:
        from jcf_tpu.ops.block_kernel import run_fused_tower

        return run_fused_tower(
            x, blocks, n_heads, mask, quant=quant, quant_folded=quant_folded,
            interpret=jax.default_backend() != "tpu",
        )
    if quant_folded:
        raise ValueError(
            "quant_folded trees are serving-only (fused kernels); the "
            "composable path needs an unfolded quantize_clip_params tree"
        )

    def body(carry, scanned):
        x, layer_idx = carry
        params, prompt, lora_layer, lora_gate, quant_layer = scanned
        lora = None
        if lora_layer is not None:
            rng = lora_ctx.get("rng")
            lora = {
                "layer": lora_layer,
                "gate": lora_gate,
                "proj_mask": lora_ctx["proj_mask"],
                "spec": lora_ctx["spec"],
                "rng": (jax.random.fold_in(rng, layer_idx) if rng is not None else None),
            }
        if prompt is not None:
            p = jnp.broadcast_to(
                prompt.astype(x.dtype)[None], (x.shape[0], n_prompt, x.shape[-1])
            )
            if prompt_mode == "visual":
                # replace the trailing prompt tokens (model1.py:100-109)
                spliced = jnp.concatenate([x[:, : x.shape[1] - n_prompt], p], axis=1)
            else:
                # splice between SOT and the class-name suffix (model1.py:110-121)
                spliced = jnp.concatenate([x[:, :1], p, x[:, 1 + n_prompt :]], axis=1)
            gate = (layer_idx > 0) & (layer_idx < depth)
            x = jnp.where(gate, spliced, x)
        x = x + multi_head_attention(
            layer_norm(x, params["ln_1"]["scale"], params["ln_1"]["bias"]),
            params["attn"],
            n_heads,
            mask,
            impl=impl,
            lora=lora,
            quant=(quant_layer["attn"] if quant_layer is not None else None),
        )
        x = x + mlp(
            layer_norm(x, params["ln_2"]["scale"], params["ln_2"]["bias"]),
            params["mlp"],
            quant=(quant_layer["mlp"] if quant_layer is not None else None),
        )
        return (x, layer_idx + 1), None

    if deep_prompts is not None:
        # layer i consumes all_prompts[i]; deep_prompts[j] belongs to layer
        # j+1, so prepend a (gated-off) dummy row for layer 0
        pad = jnp.zeros(
            (n_layers - depth,) + deep_prompts.shape[1:], deep_prompts.dtype
        )
        dummy = jnp.zeros((1,) + deep_prompts.shape[1:], deep_prompts.dtype)
        all_prompts = jnp.concatenate([dummy, deep_prompts, pad], axis=0)
    else:
        all_prompts = None

    if lora_ctx is not None:
        lora_stack, lora_gates = lora_ctx["stacked"], lora_ctx["gates"]
    else:
        lora_stack = lora_gates = None

    # scan over whichever per-layer streams exist; None streams are closed
    # over as missing (not scanned)
    streams = [blocks]
    pattern = [0]  # positions: 0=params, 1=prompt, 2=lora, 3=gate, 4=quant
    if all_prompts is not None:
        streams.append(all_prompts)
        pattern.append(1)
    if lora_stack is not None:
        streams.extend([lora_stack, lora_gates])
        pattern.extend([2, 3])
    if quant is not None:
        streams.append(quant)
        pattern.append(4)

    def scan_body(carry, scanned_tuple):
        slots = [None, None, None, None, None]
        for pos, val in zip(pattern, scanned_tuple):
            slots[pos] = val
        return body(carry, tuple(slots))

    if remat:
        scan_body = jax.checkpoint(scan_body)
    (x, _), _ = jax.lax.scan(scan_body, (x, jnp.int32(0)), tuple(streams))
    return x


def vision_ln_z_amax(
    params: dict,
    cfg: CLIPConfig,
    images: jax.Array,  # [B, 3, 224, 224] calibration crops
    with_scores: bool = False,
) -> jax.Array:
    """Per-layer activation amax statistics of the vision tower over a
    calibration batch -> [L, 4] f32 columns:

      0: amax of the Z-NORMALIZED LN1 input (qkv quantizer input with the
         LN affine folded into the weights)
      1: amax of the z-normalized LN2 input (c_fc quantizer input)
      2: amax of the attention context (out-proj quantizer input)
      3: amax of the post-QuickGELU MLP hidden (c_proj quantizer input)

    ``with_scores=True`` appends two columns: amax of the scaled
    attention scores q.k/sqrt(d), and the MIN over rows of the per-row
    score max — the max-free softmax shift calibration (softmax is
    shift-invariant for ANY constant; the shift must keep exp() below f32
    overflow AND above underflow for the weakest row, see
    quantize_clip_params(act_static=("score",))).

    These are the statistics the static-scale int8 kernels consume: a
    per-layer static scale replaces the per-row |x|max reduction at every
    in-kernel quantization. Composable f32 forward, jit-able.
    """
    from jcf_tpu.ops.attention import multi_head_attention
    from jcf_tpu.ops.layers import layer_norm, linear, quick_gelu

    v = params["visual"]
    x = linear(_patchify(images.astype(jnp.float32), cfg.vision_patch_size),
               v["patch_embed"]["w"].astype(jnp.float32))
    cls = jnp.broadcast_to(
        v["class_embedding"].astype(jnp.float32)[None, None, :],
        (x.shape[0], 1, x.shape[-1]),
    )
    x = jnp.concatenate([cls, x], axis=1) + v["positional_embedding"].astype(jnp.float32)
    x = layer_norm(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"])

    def z_amax(t):
        t32 = t.astype(jnp.float32)
        mu = jnp.mean(t32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t32 - mu), axis=-1, keepdims=True)
        return jnp.max(jnp.abs((t32 - mu) * jax.lax.rsqrt(var + 1e-5)))

    blocks = v["blocks"]
    n_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    n_heads = cfg.vision_heads
    head_dim = cfg.vision_width // n_heads
    rows = []
    for i in range(n_layers):
        layer = jax.tree_util.tree_map(lambda a: a[i], blocks)
        a1 = z_amax(x)
        h1 = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"])
        if with_scores:
            qkv = jnp.einsum("bse,oe->bso", h1, layer["attn"]["w_qkv"]) + layer["attn"]["b_qkv"]
            bsz, s, _ = qkv.shape
            qh = qkv[..., : n_heads * head_dim].reshape(bsz, s, n_heads, head_dim)
            kh = qkv[..., n_heads * head_dim : 2 * n_heads * head_dim].reshape(
                bsz, s, n_heads, head_dim
            )
            sc = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
                jnp.float32(head_dim)
            )
            a_sc = jnp.max(jnp.abs(sc))
            # weakest row's max: lower-bounds how far a valid shift can sit
            # above any row (exp underflow guard, ADVICE r3)
            a_sc_rowmin = jnp.min(jnp.max(sc, axis=-1))
        ctx = multi_head_attention(
            h1, layer["attn"], cfg.vision_heads, None, impl="xla",
            return_pre_proj=True,
        )
        a_ctx = jnp.max(jnp.abs(ctx))
        x = x + (
            jnp.einsum("bse,oe->bso", ctx, layer["attn"]["w_out"])
            + layer["attn"]["b_out"]
        )
        a2 = z_amax(x)
        h = layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"])
        hidden = quick_gelu(
            jnp.einsum("bse,he->bsh", h, layer["mlp"]["c_fc"]["w"])
            + layer["mlp"]["c_fc"]["b"]
        )
        a_h = jnp.max(jnp.abs(hidden))
        x = x + (
            jnp.einsum("bsh,oh->bso", hidden, layer["mlp"]["c_proj"]["w"])
            + layer["mlp"]["c_proj"]["b"]
        )
        cols = [a1, a2, a_ctx, a_h]
        if with_scores:
            cols.extend([a_sc, a_sc_rowmin])
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # [L, 4] or [L, 6]


def _patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, 3, H, W] -> [B, gh*gw, 3*p*p] with (c, ph, pw) pixel order,
    matching Conv2d weight layout [width, 3, p, p] flattened."""
    b, c, h, w_ = images.shape
    gh, gw = h // patch, w_ // patch
    x = images.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, c, p, p]
    return x.reshape(b, gh * gw, c * patch * patch)


def _patchify_nhcw(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, 3, W] -> same tokens as ``_patchify`` on [B, 3, H, W].

    The device-side TTA crop sampler emits views in NHCW layout (the
    row-resample GEMM leaves H outermost); patchifying that layout
    directly avoids a full-size transpose back to NCHW.
    """
    b, h, c, w_ = images.shape
    gh, gw = h // patch, w_ // patch
    x = images.reshape(b, gh, patch, c, gw, patch)
    x = x.transpose(0, 1, 4, 3, 2, 5)  # [B, gh, gw, c, p, p]
    return x.reshape(b, gh * gw, c * patch * patch)


def embed_views_nhcw(
    views: jax.Array,  # [M, (gh p), C, (gw p)]
    w4: jax.Array,  # [C, p, p, E] — patch_embed.w transposed/reshaped
    bias: Optional[jax.Array] = None,  # [E] (e.g. folded normalization)
) -> jax.Array:
    """Patchify + patch-embed of NHCW views as ONE dot_general (no explicit
    patch transpose — XLA folds the regroup into the GEMM operand read).
    Returns [M, gh*gw, E] tokens identical to
    ``linear(_patchify(views_nchw), w)``."""
    m, hh, c, ww = views.shape
    p = w4.shape[1]
    g = hh // p
    x = views.reshape(m, g, p, c, g, p)
    out = jax.lax.dot_general(
        x, w4, (((2, 3, 5), (1, 0, 2)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, gh, gw, E]
    out = out.reshape(m, g * g, -1)
    return out if bias is None else out + bias


def fold_normalize_into_embed(
    w: jax.Array,  # [E, C*p*p] patch_embed weight, (c, ph, pw) pixel order
    mean, std, patch: int, dtype=jnp.float32,
):
    """CLIP normalization is per-channel affine and crop resampling is a
    convex linear map (interp rows sum to 1), so they commute; fold the
    affine into the patch embedding instead of touching pixels:
      W'_j = W_j / std_c(j);  bias = -sum_j W_j * mean_c(j) / std_c(j)
    Returns (w4 [C, p, p, E] for ``embed_views_nhcw``, bias [E] f32).
    """
    import numpy as np

    w_np = np.asarray(w, np.float32)
    pp = patch * patch
    chan = np.repeat(np.arange(w_np.shape[1] // pp), pp)
    mean = np.asarray(mean, np.float32)[chan]
    std = np.asarray(std, np.float32)[chan]
    w_fold = w_np / std[None, :]
    bias = -(w_np * (mean / std)[None, :]).sum(axis=1)
    w4 = w_fold.T.reshape(-1, patch, patch, w_np.shape[0])
    return jnp.asarray(w4).astype(dtype), jnp.asarray(bias)


def encode_image(
    params: dict,
    cfg: CLIPConfig,
    images: jax.Array,
    *,
    dtype=jnp.float32,
    impl: Optional[str] = None,
    lora_ctx: Optional[dict] = None,
    quant: Optional[dict] = None,
    quant_folded: bool = False,
    layout: str = "nchw",
    remat: bool = False,
) -> jax.Array:
    """Image features [B, embed_dim] (pre-normalization), as
    ``jclip/model.py:104-126`` / prompted ``model1.py:180-207``."""
    v = params["visual"]
    patchify = _patchify if layout == "nchw" else _patchify_nhcw
    x = patchify(images.astype(dtype), cfg.vision_patch_size)
    x = linear(x, v["patch_embed"]["w"].astype(dtype))  # [B, G², W]
    return encode_image_tokens(
        params, cfg, x, dtype=dtype, impl=impl, lora_ctx=lora_ctx, quant=quant,
        quant_folded=quant_folded, remat=remat,
    )


def encode_image_tokens(
    params: dict,
    cfg: CLIPConfig,
    x: jax.Array,  # [B, G², W] embedded patch tokens (pre-CLS)
    *,
    dtype=jnp.float32,
    impl: Optional[str] = None,
    lora_ctx: Optional[dict] = None,
    quant: Optional[dict] = None,
    quant_folded: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Vision tower from embedded patch tokens (CLS prepend onward)."""
    v = params["visual"]
    x = x.astype(dtype)

    cls = jnp.broadcast_to(
        v["class_embedding"].astype(dtype)[None, None, :],
        (x.shape[0], 1, x.shape[-1]),
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(dtype)

    if cfg.vision_prompt_tokens and "vpt" in v:
        vpt = jnp.broadcast_to(
            v["vpt"].astype(dtype)[None],
            (x.shape[0], cfg.vision_prompt_tokens, x.shape[-1]),
        )
        x = jnp.concatenate([x, vpt], axis=1)

    x = layer_norm(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"])

    deep = v.get("vpt_deep")
    x = _run_blocks(
        x,
        v["blocks"],
        cfg.vision_heads,
        None,
        deep_prompts=deep,
        prompt_mode="visual",
        n_prompt=cfg.vision_prompt_tokens,
        impl=impl,
        lora_ctx=lora_ctx,
        quant=quant,
        quant_folded=quant_folded,
        remat=remat,
    )

    x = layer_norm(x[:, 0], v["ln_post"]["scale"], v["ln_post"]["bias"])
    return jnp.dot(
        x, v["proj"].astype(dtype), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(dtype)


def encode_image_rows_dense(
    params: dict,
    cfg: CLIPConfig,
    rows: jax.Array,  # [B*S, E] flat dense rows (assemble_dense_rows)
    *,
    dtype=jnp.float32,
    quant: Optional[dict] = None,
    quant_folded: bool = False,
) -> jax.Array:
    """Vision tower over pre-assembled flat dense rows (TPU serving path).

    ``rows`` is ``ops.assemble_kernel.assemble_dense_rows`` output: CLS
    prepend, positional add and ln_pre are already applied and every crop
    occupies S consecutive rows (CLS first). Together with
    ``run_fused_tower(flat_s=)`` this keeps the whole vision path free of
    padded [B, S, E] HBM intermediates (PERF.md r4 assembly fusion).
    Numerically identical to ``encode_image_tokens`` for the same tokens.
    """
    from jcf_tpu.ops.block_kernel import run_fused_tower

    v = params["visual"]
    s = (cfg.image_resolution // cfg.vision_patch_size) ** 2 + 1
    # cls_only: only ln_post(CLS) @ proj is read below — the tower returns
    # the CLS rows directly ([B, E]) and, on the dense int8 path, computes
    # the FINAL layer on CLS rows only (exact; block_kernel._CLS_LAST)
    cls_rows = run_fused_tower(
        rows.astype(dtype), v["blocks"], cfg.vision_heads, None,
        quant=quant, quant_folded=quant_folded,
        interpret=jax.default_backend() != "tpu", flat_s=s, cls_only=True,
    )
    cls = layer_norm(cls_rows, v["ln_post"]["scale"], v["ln_post"]["bias"])
    return jnp.dot(
        cls, v["proj"].astype(dtype), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(dtype)


def encode_text_embeddings(
    params: dict,
    cfg: CLIPConfig,
    embeddings: jax.Array,
    eot_positions: jax.Array,
    *,
    dtype=jnp.float32,
    impl: Optional[str] = None,
    lora_ctx: Optional[dict] = None,
    quant: Optional[dict] = None,
    remat: bool = False,
) -> jax.Array:
    """Text features from pre-built token embeddings [B, 77, tw].

    This is the prompt-tuning entry point (reference ``TextEncoder``,
    slow_pace.py:828-848): the prompt learner supplies embeddings directly.
    """
    t = params["text"]
    x = embeddings.astype(dtype) + t["positional_embedding"].astype(dtype)
    mask = causal_mask(cfg.context_length)
    deep = t.get("ctx_deep")
    x = _run_blocks(
        x,
        t["blocks"],
        cfg.text_heads,
        mask,
        deep_prompts=deep,
        prompt_mode="text",
        n_prompt=cfg.text_prompt_tokens,
        impl=impl,
        lora_ctx=lora_ctx,
        quant=quant,
        remat=remat,
    )
    x = layer_norm(x, t["ln_final"]["scale"], t["ln_final"]["bias"])
    x = x[jnp.arange(x.shape[0]), eot_positions]  # EOT gather
    return jnp.dot(
        x, t["text_projection"].astype(dtype), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(dtype)


def encode_text(
    params: dict,
    cfg: CLIPConfig,
    token_ids: jax.Array,
    *,
    dtype=jnp.float32,
    impl: Optional[str] = None,
    lora_ctx: Optional[dict] = None,
    quant: Optional[dict] = None,
    remat: bool = False,
) -> jax.Array:
    """Text features [B, embed_dim] from int token ids [B, 77]
    (``jclip/model.py:202-215``; EOT position = argmax of ids since EOT is
    the largest id)."""
    t = params["text"]
    emb = t["token_embedding"][token_ids]
    eot = jnp.argmax(token_ids, axis=-1)
    return encode_text_embeddings(
        params, cfg, emb, eot, dtype=dtype, impl=impl, lora_ctx=lora_ctx,
        quant=quant, remat=remat,
    )


def clip_forward(
    params: dict,
    cfg: CLIPConfig,
    images: jax.Array,
    token_ids: jax.Array,
    *,
    dtype=jnp.float32,
    impl: Optional[str] = None,
):
    """(logits_per_image, logits_per_text), as ``jclip/model.py:217-232``."""
    img = encode_image(params, cfg, images, dtype=dtype, impl=impl)
    txt = encode_text(params, cfg, token_ids, dtype=dtype, impl=impl)
    img = img / jnp.linalg.norm(img, axis=1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T
