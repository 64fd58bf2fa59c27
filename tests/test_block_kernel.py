"""Fused transformer-tower kernels vs the composable path (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from jcf_tpu.models import CLIPConfig, init_clip_params, encode_image, encode_text
from jcf_tpu.ops.attention import causal_mask, multi_head_attention
from jcf_tpu.ops.block_kernel import run_fused_tower
from jcf_tpu.ops.layers import layer_norm, mlp

CFG = CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=8, context_length=16, vocab_size=120, text_width=128,
    text_heads=2, text_layers=2,
)

RNG = np.random.default_rng(41)


def _composable_tower(params, tower, x, n_heads, mask=None):
    blocks = params[tower]["blocks"]
    n_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    for i in range(n_layers):
        layer = jax.tree_util.tree_map(lambda a: a[i], blocks)
        x = x + multi_head_attention(
            layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"]),
            layer["attn"], n_heads, mask, impl="xla",
        )
        x = x + mlp(layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"]), layer["mlp"])
    return x


def test_fused_tower_unpadded_seq():
    """S=17 (not a sublane multiple) exercises the pad+mask path."""
    params = init_clip_params(0, CFG)
    x = jnp.asarray(RNG.standard_normal((4, 17, 64)).astype(np.float32))
    ref = _composable_tower(params, "visual", x, 1)
    out = run_fused_tower(x, params["visual"]["blocks"], 1, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_tower_with_causal_mask():
    params = init_clip_params(1, CFG)
    x = jnp.asarray(RNG.standard_normal((3, 16, 128)).astype(np.float32))
    mask = causal_mask(16)
    ref = _composable_tower(params, "text", x, 2, mask)
    out = run_fused_tower(x, params["text"]["blocks"], 2, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_tower_matches_composable():
    params = init_clip_params(2, CFG)
    images = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32))
    ref = np.asarray(encode_image(params, CFG, images, impl="xla"))
    out = np.asarray(encode_image(params, CFG, images, impl="fused"))
    np.testing.assert_allclose(out, ref, atol=2e-4)

    ids = np.zeros((2, 16), np.int32)
    ids[:, 0] = 118
    ids[:, 1:3] = [[5, 119], [40, 119]]
    ref_t = np.asarray(encode_text(params, CFG, jnp.asarray(ids), impl="xla"))
    out_t = np.asarray(encode_text(params, CFG, jnp.asarray(ids), impl="fused"))
    np.testing.assert_allclose(out_t, ref_t, atol=2e-4)


def test_fused_tower_int8_tracks_float():
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(3, CFG)
    quant = quantize_clip_params(params)
    x = jnp.asarray(RNG.standard_normal((4, 17, 64)).astype(np.float32))
    ref = np.asarray(run_fused_tower(x, params["visual"]["blocks"], 1, None, interpret=True))
    out = np.asarray(
        run_fused_tower(
            x, params["visual"]["blocks"], 1, None,
            quant=quant["visual"], interpret=True,
        )
    )
    cos = (ref * out).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-9
    )
    assert cos.min() > 0.98, cos.min()


def test_fused_tower_nomask_paired_epilogue():
    """Even heads + no causal mask selects the mask-free paired epilogue
    (zeroed pad keys, joint max, post-PV normalization — PERF.md r3);
    S=17 is not a sublane multiple so pad-key masking is load-bearing."""
    params = init_clip_params(5, CFG)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    ref = _composable_tower(params, "text", x, 2)
    out = run_fused_tower(x, params["text"]["blocks"], 2, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_tower_int8_folded_matches_unfolded():
    """fold=True bakes the LN affine + attention scale into the int8
    weights (exact rewrites); with quant_folded=True the kernels skip
    both. Checked against the unfolded int8 path and the float tower,
    with and without a causal mask, on even heads (paired attention)."""
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(6, CFG)
    q_plain = quantize_clip_params(params)
    q_fold = quantize_clip_params(
        params, fold=True, heads={"visual": 1, "text": 2}
    )
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))

    for mask in (None, causal_mask(17)):
        ref = np.asarray(_composable_tower(params, "text", x, 2, mask))
        out_plain = np.asarray(
            run_fused_tower(x, params["text"]["blocks"], 2, mask,
                            quant=q_plain["text"], interpret=True)
        )
        out_fold = np.asarray(
            run_fused_tower(x, params["text"]["blocks"], 2, mask,
                            quant=q_fold["text"], quant_folded=True,
                            interpret=True)
        )

        def cos(a, b):
            return (
                (a * b).sum(-1)
                / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
            ).min()

        assert cos(out_fold, ref) > 0.98, (mask is None, cos(out_fold, ref))
        # folded and unfolded are the same quantized function up to the
        # (re)quantization of the folded weights
        assert cos(out_fold, out_plain) > 0.995, (mask is None, cos(out_fold, out_plain))


def test_fused_tower_int8_mlp_nsplit(monkeypatch):
    """_MLP_NSPLIT=2 (hidden-dim column blocks with per-block activation
    scales) stays equivalent to the unsplit int8 tower."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(7, CFG)
    q = quantize_clip_params(params)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    base = np.asarray(
        run_fused_tower(x, params["text"]["blocks"], 2, None,
                        quant=q["text"], interpret=True)
    )
    monkeypatch.setattr(bk, "_MLP_NSPLIT", 2)
    split = np.asarray(
        run_fused_tower(x, params["text"]["blocks"], 2, None,
                        quant=q["text"], interpret=True)
    )
    cos = ((base * split).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(split, axis=-1) + 1e-9
    )).min()
    assert cos > 0.999, cos


def test_fused_tower_int8_attention_inner(monkeypatch):
    """_INT8_ATTN quantizes the paired-attention scores/PV GEMMs; must
    stay rankings-equivalent to the bf16-inner int8 tower."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(8, CFG)
    q = quantize_clip_params(params)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                      quant=q["text"], interpret=True))
    monkeypatch.setattr(bk, "_INT8_ATTN", True)
    i8 = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                    quant=q["text"], interpret=True))
    cos = ((base * i8).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(i8, axis=-1) + 1e-9
    )).min()
    assert cos > 0.99, cos


def test_whole_block_int8_matches_halves(monkeypatch):
    """_FUSE='block' (single whole-block kernel) now supports the folded
    + static-quant options; bit-identical to the halves kernels in
    interpret mode. (Perf: measured SLOWER than halves on v5e at every
    tried G — PERF.md r3 — so halves stay the default; this pins the
    capability.)"""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.models.clip import vision_ln_z_amax
    from jcf_tpu.ops.quant import quantize_clip_params

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=120,
        text_width=128, text_heads=2, text_layers=2,
    )
    rng = np.random.default_rng(23)
    params = init_clip_params(12, cfg)
    amax = np.asarray(vision_ln_z_amax(
        params, cfg, jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32))
    ))
    q = quantize_clip_params(
        params, fold=True, heads={"visual": 2, "text": 2},
        act_scales={"visual": amax},
    )
    x = jnp.asarray(rng.standard_normal((4, 17, 64)).astype(np.float32))
    halves = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None,
        quant=q["visual"], quant_folded=True, interpret=True))
    monkeypatch.setattr(bk, "_FUSE", "block")
    block = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None,
        quant=q["visual"], quant_folded=True, interpret=True))
    np.testing.assert_allclose(block, halves, atol=1e-5)


def test_fused_tower_static_hidden_only():
    """act_static=("hidden",) makes the post-GELU quant static while ctx
    stays per-row dynamic (engine static_quant_mode="hidden") — the
    kernel dispatch combination static_act+static_h without static_ctx
    must stay close to the fully-dynamic folded tower."""
    from jcf_tpu.models.clip import vision_ln_z_amax
    from jcf_tpu.ops.quant import quantize_clip_params

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=120,
        text_width=128, text_heads=2, text_layers=2,
    )
    rng = np.random.default_rng(31)
    params = init_clip_params(13, cfg)
    amax = np.asarray(vision_ln_z_amax(
        params, cfg, jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32))
    ))
    q_dyn = quantize_clip_params(
        params, fold=True, heads={"visual": 2, "text": 2},
        act_scales={"visual": amax[:, :2]},
    )
    q_h = quantize_clip_params(
        params, fold=True, heads={"visual": 2, "text": 2},
        act_scales={"visual": amax}, act_static=("hidden",),
    )
    assert "h_inv" in q_h["visual"]["mlp"]
    assert "ctx_inv" not in q_h["visual"]["attn"]
    x = jnp.asarray(rng.standard_normal((4, 17, 64)).astype(np.float32))
    base = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None,
        quant=q_dyn["visual"], quant_folded=True, interpret=True))
    hid = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None,
        quant=q_h["visual"], quant_folded=True, interpret=True))
    cos = ((base * hid).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(hid, axis=-1) + 1e-9
    )).min()
    assert cos > 0.999, cos


def test_fused_tower_max_free_softmax():
    """act_static=("score",) swaps the per-row score max for a calibrated
    per-layer shift — softmax is shift-invariant for any constant, so the
    tower output must match the row-max version to float precision."""
    from jcf_tpu.models.clip import vision_ln_z_amax
    from jcf_tpu.ops.quant import quantize_clip_params

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=120,
        text_width=128, text_heads=2, text_layers=2,
    )
    rng = np.random.default_rng(37)
    params = init_clip_params(17, cfg)
    amax = np.asarray(vision_ln_z_amax(
        params, cfg, jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32)),
        with_scores=True,
    ))
    assert amax.shape[1] == 6
    q_base = quantize_clip_params(
        params, fold=True, heads={"visual": 2, "text": 2},
        act_scales={"visual": amax}, act_static=(),
    )
    q_shift = quantize_clip_params(
        params, fold=True, heads={"visual": 2, "text": 2},
        act_scales={"visual": amax}, act_static=("score",),
    )
    assert "score_shift" in q_shift["visual"]["attn"]
    x = jnp.asarray(rng.standard_normal((4, 17, 64)).astype(np.float32))
    base = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None,
        quant=q_base["visual"], quant_folded=True, interpret=True))
    shifted = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None,
        quant=q_shift["visual"], quant_folded=True, interpret=True))
    # elementwise comparison is confounded by int8 requant rounding flips
    # (a 1-ulp softmax difference can flip an int8 step); rankings-level
    # cosine is the right gate, like the other int8 variants
    cos = ((base * shifted).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(shifted, axis=-1) + 1e-9
    )).min()
    assert cos > 0.999, cos


def test_paired_attention_nomask_shift_exact():
    """The max-free epilogue itself (f32, no quantization in the way) is
    exact: any constant shift cancels in the normalization."""
    from jcf_tpu.ops.block_kernel import _paired_attention_nomask

    rng = np.random.default_rng(41)
    q3 = jnp.asarray(rng.standard_normal((2, 24, 6 * 64)).astype(np.float32))
    base = np.asarray(_paired_attention_nomask(
        q3, 2, 64, None, 2, 24, s_real=17))
    shifted = np.asarray(_paired_attention_nomask(
        q3, 2, 64, None, 2, 24, s_real=17, score_shift=jnp.float32(7.5)))
    np.testing.assert_allclose(shifted, base, atol=2e-5, rtol=2e-5)


def test_fused_tower_int8_bf16_epilogue(monkeypatch):
    """_EPI_BF16 runs the MLP dequant+GELU+requant chain and the attention
    exp at bf16; values feed int8 quantizers, so rankings-level agreement
    with the f32-epilogue tower must hold."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(9, CFG)
    q = quantize_clip_params(params)
    x = jnp.asarray(RNG.standard_normal((4, 17, 64)).astype(np.float32))
    base = np.asarray(run_fused_tower(x, params["visual"]["blocks"], 2, None,
                                      quant=q["visual"], interpret=True))
    monkeypatch.setattr(bk, "_EPI_BF16", True)
    b16 = np.asarray(run_fused_tower(x, params["visual"]["blocks"], 2, None,
                                     quant=q["visual"], interpret=True))
    cos = ((base * b16).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(b16, axis=-1) + 1e-9
    )).min()
    assert cos > 0.99, cos


def test_fused_tower_batched_pairs_attention(monkeypatch):
    """_ATTN_BATCHPAIRS stacks all head-pairs into one tile-aligned dot
    per attention stage (64-padded key halves) — exact vs the composable
    tower (pad keys are zero-K/V + selector-excluded, not approximated)."""
    import jcf_tpu.ops.block_kernel as bk

    params = init_clip_params(11, CFG)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    ref = _composable_tower(params, "text", x, 2)
    monkeypatch.setattr(bk, "_ATTN_BATCHPAIRS", True)
    out = run_fused_tower(x, params["text"]["blocks"], 2, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_tower_batched_pairs_int8_folded(monkeypatch):
    """Batched-pairs attention under the serving int8 folded config."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(12, CFG)
    q = quantize_clip_params(params, fold=True, heads={"visual": 1, "text": 2})
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                      quant=q["text"], quant_folded=True,
                                      interpret=True))
    monkeypatch.setattr(bk, "_ATTN_BATCHPAIRS", True)
    out = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                     quant=q["text"], quant_folded=True,
                                     interpret=True))
    cos = ((base * out).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-9
    )).min()
    assert cos > 0.999, cos


def test_fused_tower_dense_rows_matches_padded(monkeypatch):
    """JCF_BENCH_DENSE: the flat [B*S, E] dense row stream (in-kernel
    attention repack, no pad rows in HBM/GEMMs) computes the IDENTICAL
    quantized function as the padded layout — the repack is exact data
    movement and every quantization is per-row. S=17 is not a sublane
    multiple so both the pad handling and the repack are load-bearing."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(13, CFG)
    q = quantize_clip_params(params, fold=True, heads={"visual": 1, "text": 2})
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                      quant=q["text"], quant_folded=True,
                                      interpret=True))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    out = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                     quant=q["text"], quant_folded=True,
                                     interpret=True))
    np.testing.assert_allclose(out, base, atol=1e-5, rtol=1e-5)


def test_fused_tower_dense_batched_pairs(monkeypatch):
    """_ATTN_BATCHPAIRS composes with the DENSE row stream (r5): the
    batched-pairs stage runs on the in-kernel repacked [G, s_pad, .]
    views, whose zero pad rows the selectors exclude exactly like the
    per-pair epilogue's row masks — rankings-level agreement with the
    dense per-pair default. S=17 -> s_pad=32 <= 64 keeps the stage
    eligible while the key pad (32->64) is load-bearing."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(29, CFG)
    q = quantize_clip_params(params, fold=True, heads={"visual": 1, "text": 2})
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                      quant=q["text"], quant_folded=True,
                                      interpret=True))
    monkeypatch.setattr(bk, "_ATTN_BATCHPAIRS", True)
    assert bk.dense_rows_eligible(17, 2)
    out = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                     quant=q["text"], quant_folded=True,
                                     interpret=True))
    flat = np.asarray(run_fused_tower(
        x.reshape(4 * 17, 128), params["text"]["blocks"], 2, None,
        quant=q["text"], quant_folded=True, interpret=True, flat_s=17,
    ))
    cos = ((base * out).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-9
    )).min()
    assert cos > 0.999, cos
    np.testing.assert_array_equal(flat, out.reshape(4 * 17, 128))


def test_fused_tower_cls_only_last_layer(monkeypatch):
    """_CLS_LAST: the dense int8 tower with cls_only=True computes the
    final layer on CLS rows only (full K/V, 1 query row/crop, MLP on B
    rows) — same math as running the full last layer and slicing CLS,
    op for op; only MXU accumulation order differs, so agreement is
    near-exact (and rankings-exact after the downstream ln_post/proj).
    Covers folded+static-full and plain dynamic quant trees, and both
    final-attention routes (_CLS_ATTNQ: CLS-query kernel vs full
    attn-half + slice)."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(31, CFG)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    for fold in (True, False):
        q = quantize_clip_params(
            params, fold=fold, heads={"visual": 1, "text": 2}
        ) if fold else quantize_clip_params(params)
        monkeypatch.setattr(bk, "_CLS_LAST", False)
        full = np.asarray(run_fused_tower(
            x, params["text"]["blocks"], 2, None, quant=q["text"],
            quant_folded=fold, interpret=True, cls_only=True))
        assert full.shape == (4, 128)
        monkeypatch.setattr(bk, "_CLS_LAST", True)
        for attnq in (False, True):
            monkeypatch.setattr(bk, "_CLS_ATTNQ", attnq)
            cls = np.asarray(run_fused_tower(
                x, params["text"]["blocks"], 2, None, quant=q["text"],
                quant_folded=fold, interpret=True, cls_only=True))
            flat = np.asarray(run_fused_tower(
                x.reshape(4 * 17, 128), params["text"]["blocks"], 2, None,
                quant=q["text"], quant_folded=fold, interpret=True,
                flat_s=17, cls_only=True))
            assert cls.shape == (4, 128)
            np.testing.assert_array_equal(flat, cls)
            np.testing.assert_allclose(cls, full, atol=5e-2, rtol=5e-2)
            cos = ((full * cls).sum(-1) / (
                np.linalg.norm(full, axis=-1)
                * np.linalg.norm(cls, axis=-1) + 1e-9
            )).min()
            assert cos > 0.999, (attnq, fold, cos)


def test_fused_tower_cls_only_static_full(monkeypatch):
    """CLS-only last layer under the SERVING quant config (folded +
    calibrated static ln/ctx/hidden scales): same agreement bar."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.models.clip import vision_ln_z_amax
    from jcf_tpu.ops.quant import quantize_clip_params

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=120,
        text_width=128, text_heads=2, text_layers=2,
    )
    rng = np.random.default_rng(43)
    params = init_clip_params(19, cfg)
    amax = np.asarray(vision_ln_z_amax(
        params, cfg, jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32)),
    ))
    q = quantize_clip_params(
        params, fold=True, heads={"visual": 2, "text": 2},
        act_scales={"visual": amax}, act_static=("ctx", "hidden"),
    )
    x = jnp.asarray(rng.standard_normal((4, 17, 64)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    monkeypatch.setattr(bk, "_CLS_LAST", False)
    full = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None, quant=q["visual"],
        quant_folded=True, interpret=True, cls_only=True))
    monkeypatch.setattr(bk, "_CLS_LAST", True)
    cls = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None, quant=q["visual"],
        quant_folded=True, interpret=True, cls_only=True))
    cos = ((full * cls).sum(-1) / (
        np.linalg.norm(full, axis=-1) * np.linalg.norm(cls, axis=-1) + 1e-9
    )).min()
    assert cos > 0.999, cos


def test_fused_tower_dense_block_matches_halves(monkeypatch):
    """_FUSE="block" on the DENSE row stream (r4): the whole-block kernel
    repacks/unpacks around attention exactly like the attn half, so the
    single-kernel layer (one x HBM round-trip instead of two) computes
    the identical quantized function as the dense halves scan. Covers
    folded+static and plain dynamic trees, plus the flat_s entry."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(23, CFG)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    for fold in (True, False):
        q = quantize_clip_params(
            params, fold=fold, heads={"visual": 1, "text": 2}
        ) if fold else quantize_clip_params(params)
        base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                          quant=q["text"], quant_folded=fold,
                                          interpret=True))
        monkeypatch.setattr(bk, "_FUSE", "block")
        out = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                         quant=q["text"], quant_folded=fold,
                                         interpret=True))
        flat = np.asarray(run_fused_tower(
            x.reshape(4 * 17, 128), params["text"]["blocks"], 2, None,
            quant=q["text"], quant_folded=fold, interpret=True, flat_s=17,
        ))
        monkeypatch.setattr(bk, "_FUSE", "halves")
        np.testing.assert_array_equal(out, base)
        np.testing.assert_array_equal(flat, base.reshape(4 * 17, 128))


def test_fused_tower_block_nsplit(monkeypatch):
    """_FUSE="block" + _MLP_NSPLIT (r5): the whole-block kernel chunks
    the MLP hidden dim like the MLP-half kernel — per-chunk h scales are
    a finer quantization group, so dynamic-quant agreement is at the
    rankings level while static-h (serving) chunking is EXACT (the same
    static scale applies to every chunk)."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(23, CFG)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    q = quantize_clip_params(params, fold=True, heads={"visual": 1, "text": 2})
    monkeypatch.setattr(bk, "_FUSE", "block")
    base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                      quant=q["text"], quant_folded=True,
                                      interpret=True))
    monkeypatch.setattr(bk, "_MLP_NSPLIT", 2)
    out = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                     quant=q["text"], quant_folded=True,
                                     interpret=True))
    cos = ((base * out).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-9
    )).min()
    assert cos > 0.999, cos
    # hidden_dim 512 % 3 != 0 -> nsplit falls back to 1, bitwise base
    monkeypatch.setattr(bk, "_MLP_NSPLIT", 3)
    fb = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                    quant=q["text"], quant_folded=True,
                                    interpret=True))
    np.testing.assert_array_equal(fb, base)


def test_fused_tower_layer_matches_halves(monkeypatch):
    """_FUSE="layer" (r5): one kernel per layer with the MLP weight
    chunks streamed on an inner grid dim — the intra-layer residual
    boundary lives in VMEM scratch (rounded through x.dtype exactly like
    the halves HBM boundary) and chunk accumulation follows the halves
    kernel's _MLP_NSPLIT order. Outputs are bit-identical to the halves
    scan at _MLP_NSPLIT = _LAYER_NSPLIT on the TPU backend (verified on
    chip); on CPU, XLA fuses the two program structures with different
    FMA contractions, so this test allows 1-ULP f32 noise (measured max
    4.8e-7 abs on values O(1)). The layer/flat entries must still agree
    bitwise with each other (same program)."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(23, CFG)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    monkeypatch.setattr(bk, "_LAYER_NSPLIT", 4)
    for fold in (True, False):
        q = quantize_clip_params(
            params, fold=fold, heads={"visual": 1, "text": 2}
        ) if fold else quantize_clip_params(params)
        monkeypatch.setattr(bk, "_MLP_NSPLIT", 4)
        base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                          quant=q["text"], quant_folded=fold,
                                          interpret=True))
        monkeypatch.setattr(bk, "_MLP_NSPLIT", 1)
        monkeypatch.setattr(bk, "_FUSE", "layer")
        out = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                         quant=q["text"], quant_folded=fold,
                                         interpret=True))
        flat = np.asarray(run_fused_tower(
            x.reshape(4 * 17, 128), params["text"]["blocks"], 2, None,
            quant=q["text"], quant_folded=fold, interpret=True, flat_s=17,
        ))
        monkeypatch.setattr(bk, "_FUSE", "halves")
        np.testing.assert_array_equal(flat, out.reshape(4 * 17, 128))
        np.testing.assert_allclose(out, base, atol=5e-6, rtol=2e-6)


def test_fused_tower_layer_static_full(monkeypatch):
    """_FUSE="layer" under the SERVING quant config (folded + calibrated
    static ln/ctx/hidden scales + CLS-only) vs the halves scan at
    matching nsplit, through the cls_only entry (same 1-ULP CPU-FMA
    allowance as test_fused_tower_layer_matches_halves; bit-identical on
    the TPU backend)."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.models.clip import vision_ln_z_amax
    from jcf_tpu.ops.quant import quantize_clip_params

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=120,
        text_width=128, text_heads=2, text_layers=2,
    )
    rng = np.random.default_rng(47)
    params = init_clip_params(19, cfg)
    amax = np.asarray(vision_ln_z_amax(
        params, cfg, jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32)),
    ))
    q = quantize_clip_params(
        params, fold=True, heads={"visual": 2, "text": 2},
        act_scales={"visual": amax}, act_static=("ctx", "hidden"),
    )
    x = jnp.asarray(rng.standard_normal((4, 17, 64)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    monkeypatch.setattr(bk, "_LAYER_NSPLIT", 4)
    monkeypatch.setattr(bk, "_MLP_NSPLIT", 4)
    base = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None, quant=q["visual"],
        quant_folded=True, interpret=True, cls_only=True))
    monkeypatch.setattr(bk, "_MLP_NSPLIT", 1)
    monkeypatch.setattr(bk, "_FUSE", "layer")
    out = np.asarray(run_fused_tower(
        x, params["visual"]["blocks"], 2, None, quant=q["visual"],
        quant_folded=True, interpret=True, cls_only=True))
    monkeypatch.setattr(bk, "_FUSE", "halves")
    np.testing.assert_allclose(out, base, atol=5e-6, rtol=2e-6)


def test_fused_tower_stream_matches_halves(monkeypatch):
    """_FUSE="stream": the layer-streaming whole-tower kernel (residual
    tile VMEM-resident across all 2L half-steps, weights streamed per
    layer) computes the IDENTICAL quantized function as the dense halves
    scan — the carry is exact data residency, not a numeric change.
    Covers folded+static and plain dynamic quant trees."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(15, CFG)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    for fold in (True, False):
        q = quantize_clip_params(
            params, fold=fold, heads={"visual": 1, "text": 2}
        ) if fold else quantize_clip_params(params)
        base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                          quant=q["text"], quant_folded=fold,
                                          interpret=True))
        monkeypatch.setattr(bk, "_FUSE", "stream")
        out = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                         quant=q["text"], quant_folded=fold,
                                         interpret=True))
        monkeypatch.setattr(bk, "_FUSE", "halves")
        np.testing.assert_allclose(out, base, atol=1e-5, rtol=1e-5)


def test_fused_tower_stream_noneligible_falls_back(monkeypatch):
    """_FUSE="stream" on a non-eligible tower (causal mask) falls back to
    the halves scan — same results as the default config."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(16, CFG)
    q = quantize_clip_params(params)
    x = jnp.asarray(RNG.standard_normal((4, 16, 128)).astype(np.float32))
    mask = causal_mask(16)
    base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, mask,
                                      quant=q["text"], interpret=True))
    monkeypatch.setattr(bk, "_FUSE", "stream")
    out = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, mask,
                                     quant=q["text"], interpret=True))
    np.testing.assert_allclose(out, base, atol=1e-6, rtol=1e-6)


def test_fused_tower_dense_rows_subtiles(monkeypatch):
    """Dense rows compose with the subtile split (per-subtile repack)."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(14, CFG)
    q = quantize_clip_params(params)
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    base = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                      quant=q["text"], interpret=True))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    monkeypatch.setattr(bk, "_SUBTILES", 2)
    out = np.asarray(run_fused_tower(x, params["text"]["blocks"], 2, None,
                                     quant=q["text"], interpret=True))
    np.testing.assert_allclose(out, base, atol=1e-5, rtol=1e-5)
