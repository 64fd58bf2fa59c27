"""LoRA transform tests: merged/decomposed equivalence, masking, gradient
flow, and reference-format persistence (incl. SWA averaging)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jcf_tpu.models import CLIPConfig, init_clip_params, encode_image, encode_text
from jcf_tpu.peft import (
    LoraSpec,
    init_lora_params,
    merge_lora_params,
    make_lora_context,
    save_lora,
    load_lora,
    load_lora_swa,
)

CFG = CLIPConfig(
    embed_dim=48,
    image_resolution=32,
    vision_layers=4,
    vision_width=64,
    vision_patch_size=8,
    context_length=16,
    vocab_size=120,
    text_width=128,
    text_heads=2,
    text_layers=4,
)

SPEC = LoraSpec(r=2, alpha=1.0, dropout_rate=0.0, params=("q", "k", "v"),
                encoder="both", position="mid", backbone="ViT-B/16")
# position "mid" = layers 4-7; with 4 layers, no layer selected — use a
# custom position that exists at this depth:
SPEC = LoraSpec(r=2, alpha=1.0, dropout_rate=0.0, params=("q", "k", "v"),
                encoder="both", position="bottom", backbone="ViT-B/16")
# "bottom" = layers 0-3 -> all 4 tiny layers active


RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(0, CFG)
    lora = init_lora_params(1, SPEC, CFG.text_layers, CFG.text_width,
                            CFG.vision_layers, CFG.vision_width)
    # give B nonzero values so LoRA actually changes the output
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.asarray(RNG.standard_normal(x.shape).astype(np.float32)),
        lora,
    )
    images = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32))
    ids = np.zeros((3, 16), dtype=np.int32)
    ids[:, 0] = 118
    ids[:, 1:4] = RNG.integers(1, 100, (3, 3))
    ids[:, 4] = 119
    return params, lora, images, jnp.asarray(ids)


def test_merged_equals_decomposed(setup):
    """W + scaling*B@A applied to x must equal Wx + scaling*x@A^T B^T
    (no dropout) — the reference's merge/unmerge invariant (ood.py:218-245)."""
    params, lora, images, ids = setup

    merged = merge_lora_params(params, lora, SPEC)
    img_merged = np.asarray(encode_image(merged, CFG, images, impl="xla"))
    txt_merged = np.asarray(encode_text(merged, CFG, ids, impl="xla"))

    vis_ctx = make_lora_context(lora, SPEC, "vision", CFG.vision_layers)
    txt_ctx = make_lora_context(lora, SPEC, "text", CFG.text_layers)
    img_dec = np.asarray(encode_image(params, CFG, images, impl="xla", lora_ctx=vis_ctx))
    txt_dec = np.asarray(encode_text(params, CFG, ids, impl="xla", lora_ctx=txt_ctx))

    np.testing.assert_allclose(img_merged, img_dec, atol=1e-4)
    np.testing.assert_allclose(txt_merged, txt_dec, atol=1e-4)


def test_lora_changes_output(setup):
    params, lora, images, _ = setup
    merged = merge_lora_params(params, lora, SPEC)
    base = np.asarray(encode_image(params, CFG, images, impl="xla"))
    adapted = np.asarray(encode_image(merged, CFG, images, impl="xla"))
    assert np.abs(base - adapted).max() > 1e-5


def test_position_mask_blocks_unselected_layers(setup):
    """With position top-like selection (no layers at this depth for
    vision 'mid'), the merged params must equal the originals."""
    params, lora, images, _ = setup
    spec_none = LoraSpec(r=2, alpha=1.0, params=("q", "k", "v"),
                         encoder="both", position="mid", backbone="ViT-B/16")
    # 'mid' = layers 4-7, but towers have only 4 layers -> empty selection
    merged = merge_lora_params(params, lora, spec_none)
    a = np.asarray(encode_image(params, CFG, images, impl="xla"))
    b = np.asarray(encode_image(merged, CFG, images, impl="xla"))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_gradients_only_flow_to_enabled_projections(setup):
    params, lora, images, _ = setup
    spec_qv = LoraSpec(r=2, alpha=1.0, dropout_rate=0.0, params=("q", "v"),
                       encoder="vision", position="bottom", backbone="ViT-B/16")

    def loss_fn(lora_tree):
        ctx = make_lora_context(lora_tree, spec_qv, "vision", CFG.vision_layers)
        feats = encode_image(params, CFG, images, impl="xla", lora_ctx=ctx)
        return jnp.sum(feats**2)

    grads = jax.grad(loss_fn)(lora)
    ga = np.asarray(grads["vision"]["a_qkv"])  # [L, 3, r, W]
    gb = np.asarray(grads["vision"]["b_qkv"])
    # k (index 1) disabled -> zero grads; q/v have signal
    assert np.abs(ga[:, 1]).max() == 0.0
    assert np.abs(gb[:, 1]).max() == 0.0
    assert np.abs(gb[:, 0]).max() > 0.0
    assert np.abs(gb[:, 2]).max() > 0.0
    # text tower untouched in 'vision' encoder mode
    assert np.abs(np.asarray(grads["text"]["a_qkv"])).max() == 0.0


def test_dropout_path_differs_and_is_deterministic(setup):
    params, lora, images, _ = setup
    spec_do = LoraSpec(r=2, alpha=1.0, dropout_rate=0.5, params=("q", "k", "v"),
                       encoder="vision", position="bottom", backbone="ViT-B/16")
    key = jax.random.PRNGKey(0)
    ctx1 = make_lora_context(lora, spec_do, "vision", CFG.vision_layers, rng=key)
    ctx2 = make_lora_context(lora, spec_do, "vision", CFG.vision_layers, rng=key)
    ctx3 = make_lora_context(lora, spec_do, "vision", CFG.vision_layers,
                             rng=jax.random.PRNGKey(7))
    a = np.asarray(encode_image(params, CFG, images, impl="xla", lora_ctx=ctx1))
    b = np.asarray(encode_image(params, CFG, images, impl="xla", lora_ctx=ctx2))
    c = np.asarray(encode_image(params, CFG, images, impl="xla", lora_ctx=ctx3))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.0


def test_save_load_roundtrip(tmp_path, setup):
    _, lora, _, _ = setup
    path = str(tmp_path / "lora_weights.pkl")
    save_lora(lora, SPEC, path, n_text=CFG.text_layers, n_vision=CFG.vision_layers)
    loaded = load_lora(path, SPEC, n_text=CFG.text_layers, text_width=CFG.text_width,
                       n_vision=CFG.vision_layers, vision_width=CFG.vision_width)
    for tower in ("text", "vision"):
        np.testing.assert_allclose(
            np.asarray(loaded[tower]["a_qkv"]), np.asarray(lora[tower]["a_qkv"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(loaded[tower]["b_qkv"]), np.asarray(lora[tower]["b_qkv"]), atol=1e-6
        )


def test_load_validates_metadata(tmp_path, setup):
    _, lora, _, _ = setup
    path = str(tmp_path / "lora_weights.pkl")
    save_lora(lora, SPEC, path, n_text=CFG.text_layers, n_vision=CFG.vision_layers)
    import dataclasses

    bad = dataclasses.replace(SPEC, r=8)
    with pytest.raises(ValueError, match="r mismatch"):
        load_lora(path, bad, n_text=CFG.text_layers, text_width=CFG.text_width,
                  n_vision=CFG.vision_layers, vision_width=CFG.vision_width)
    with pytest.raises(FileNotFoundError):
        load_lora(str(tmp_path / "missing.pkl"), SPEC)


def test_swa_averaging(tmp_path, setup):
    _, lora, _, _ = setup
    folder = tmp_path / "swa"
    folder.mkdir()
    lora2 = jax.tree_util.tree_map(lambda x: x * 3.0, lora)
    save_lora(lora, SPEC, str(folder / "a.pkl"), n_text=CFG.text_layers, n_vision=CFG.vision_layers)
    save_lora(lora2, SPEC, str(folder / "b.pkl"), n_text=CFG.text_layers, n_vision=CFG.vision_layers)
    avg = load_lora_swa(str(folder), SPEC, n_text=CFG.text_layers, text_width=CFG.text_width,
                        n_vision=CFG.vision_layers, vision_width=CFG.vision_width)
    np.testing.assert_allclose(
        np.asarray(avg["vision"]["a_qkv"]),
        np.asarray(lora["vision"]["a_qkv"]) * 2.0,
        atol=1e-5,
    )
