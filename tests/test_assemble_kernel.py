"""Fused token-assembly kernel (conv output -> dense tower rows).

The assembly pass replaces the reference's VisionTransformer glue
(jclip/model.py: conv1 -> flatten -> cls concat -> +pos -> ln_pre) with
one Pallas kernel emitting the flat dense rows the serving tower
consumes. These tests pin (a) equivalence vs the unfused XLA twin (within one
bf16 ULP: XLA contracts f32 mul+add chains into FMAs differently per
program structure, so bit-exactness across program shapes is not a
stable contract — data movement and cast points ARE exact), (b) the
flat-rows tower entry vs the 3-D entry (pure data movement, exact),
and (c) the whole rows path vs encode_image_tokens end to end.
"""

import numpy as np

import jax
import jax.numpy as jnp

from jcf_tpu.models import CLIPConfig, init_clip_params
from jcf_tpu.models.clip import encode_image_rows_dense, encode_image_tokens
from jcf_tpu.ops.assemble_kernel import (
    assemble_dense_rows,
    assemble_reference,
    make_cls_row,
)
from jcf_tpu.ops.block_kernel import run_fused_tower

RNG = np.random.default_rng(7)

# width 128 -> 2 heads (even pair) so the dense tower path is eligible
CFG = CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=128,
    vision_patch_size=8, context_length=16, vocab_size=120,
    text_width=128, text_heads=2, text_layers=2,
)


def _assembly_inputs(e=128, b=6, g=4, dtype=np.float32):
    conv_out = RNG.standard_normal((b, g, g, e)).astype(dtype)
    if dtype == np.int32:
        conv_out = (RNG.integers(-(2**20), 2**20, (b, g, g, e))).astype(dtype)
    col_scale = (RNG.random(e) * 0.01 + 0.001).astype(np.float32)
    col_bias = RNG.standard_normal(e).astype(np.float32)
    pos = RNG.standard_normal((g * g + 1, e)).astype(np.float32)
    cls = RNG.standard_normal(e).astype(np.float32)
    lns = (RNG.random(e) + 0.5).astype(np.float32)
    lnb = RNG.standard_normal(e).astype(np.float32)
    return conv_out, col_scale, col_bias, pos, cls, lns, lnb


def _both(conv_out, col_scale, col_bias, pos, cls, lns, lnb):
    cls_row = make_cls_row(jnp.asarray(cls), jnp.asarray(pos[0]),
                           jnp.asarray(lns), jnp.asarray(lnb))
    args = (jnp.asarray(conv_out), jnp.asarray(col_scale),
            jnp.asarray(col_bias), jnp.asarray(pos[1:]), cls_row,
            jnp.asarray(lns), jnp.asarray(lnb))
    fused = assemble_dense_rows(*args, interpret=True)
    ref = assemble_reference(*args)
    return np.asarray(fused), np.asarray(ref)


def _close(fused, ref):
    # 1 bf16 ULP at O(1) LN-output magnitudes (FMA-contraction variance)
    np.testing.assert_allclose(
        fused.astype(np.float32), ref.astype(np.float32), atol=0.04, rtol=0
    )
    # the CLS rows are the same precomputed vector on both sides: exact
    e = fused.shape[-1]
    s = 17
    np.testing.assert_array_equal(
        fused.reshape(-1, s, e)[:, 0], ref.reshape(-1, s, e)[:, 0]
    )


def test_assemble_matches_reference_f32():
    fused, ref = _both(*_assembly_inputs(dtype=np.float32))
    _close(fused, ref)


def test_assemble_matches_reference_int32():
    """int32 conv accumulators (the conv_i8 serving path): the in-kernel
    astype(f32) rounds like XLA's."""
    fused, ref = _both(*_assembly_inputs(dtype=np.int32))
    _close(fused, ref)


def test_assemble_odd_batch_group():
    """b=6 with group target 32 -> group 6; b=9 -> group 9 (any divisor)."""
    fused, ref = _both(*_assembly_inputs(b=9))
    _close(fused, ref)


def test_flat_tower_matches_3d(monkeypatch):
    """run_fused_tower(flat_s=S) over pre-flattened rows == the [B, S, E]
    entry (dense config): the flat entry skips only data movement."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(13, CFG)
    q = quantize_clip_params(params, fold=True, heads={"visual": 2, "text": 2})
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    base = np.asarray(run_fused_tower(x, params["visual"]["blocks"], 2, None,
                                      quant=q["visual"], quant_folded=True,
                                      interpret=True))
    flat = np.asarray(run_fused_tower(
        x.reshape(4 * 17, 128), params["visual"]["blocks"], 2, None,
        quant=q["visual"], quant_folded=True, interpret=True, flat_s=17,
    ))
    np.testing.assert_array_equal(flat, base.reshape(4 * 17, 128))


def test_flat_tower_noneligible_falls_back(monkeypatch):
    """flat_s with a non-dense config (dense knob off) un-flattens, runs
    the padded path, and re-flattens — correctness, not speed."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    params = init_clip_params(13, CFG)
    q = quantize_clip_params(params, fold=True, heads={"visual": 2, "text": 2})
    x = jnp.asarray(RNG.standard_normal((4, 17, 128)).astype(np.float32))
    monkeypatch.setattr(bk, "_DENSE_ROWS", False)
    base = np.asarray(run_fused_tower(x, params["visual"]["blocks"], 2, None,
                                      quant=q["visual"], quant_folded=True,
                                      interpret=True))
    flat = np.asarray(run_fused_tower(
        x.reshape(4 * 17, 128), params["visual"]["blocks"], 2, None,
        quant=q["visual"], quant_folded=True, interpret=True, flat_s=17,
    ))
    np.testing.assert_array_equal(flat, base.reshape(4 * 17, 128))


def test_rows_path_matches_tokens_path(monkeypatch):
    """End to end: assemble_dense_rows + encode_image_rows_dense ==
    encode_image_tokens(impl='fused') for the same conv output — the
    assembly fusion changes data movement only (PERF.md r4)."""
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.ops.quant import quantize_clip_params

    monkeypatch.setattr(bk, "_DENSE_ROWS", True)
    params = init_clip_params(21, CFG)
    q = quantize_clip_params(params, fold=True, heads={"visual": 2, "text": 2})
    g = CFG.image_resolution // CFG.vision_patch_size
    e = CFG.vision_width
    bn = 6
    conv_out = jnp.asarray(
        RNG.standard_normal((bn, g, g, e)).astype(np.float32)
    )
    fold_bias = jnp.asarray(RNG.standard_normal(e).astype(np.float32))
    dtype = jnp.bfloat16

    tokens = conv_out.reshape(bn, g * g, e) + fold_bias
    ref = encode_image_tokens(
        params, CFG, tokens, dtype=dtype, impl="fused",
        quant=q["visual"], quant_folded=True,
    )

    v = params["visual"]
    cls_row = make_cls_row(
        v["class_embedding"], v["positional_embedding"][0],
        v["ln_pre"]["scale"], v["ln_pre"]["bias"], dtype=dtype,
    )
    rows = assemble_dense_rows(
        conv_out, jnp.ones((e,), jnp.float32), fold_bias,
        v["positional_embedding"][1:], cls_row,
        v["ln_pre"]["scale"], v["ln_pre"]["bias"],
        dtype=dtype, interpret=True,
    )
    out = encode_image_rows_dense(
        params, CFG, rows, dtype=dtype, quant=q["visual"], quant_folded=True,
    )
    a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()
