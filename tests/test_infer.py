"""Inference engine and predict/ensemble tests."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from jcf_tpu.infer import (
    TTAEngine,
    crop_resize_matrices,
    device_random_crops,
    ensemble_base_logits,
    format_impath,
    ood_side,
    process_result_lines,
    update_txt_file,
    write_top5,
)
from jcf_tpu.infer.engine import apply_crop_resize, _center_crop_view
from jcf_tpu.models import CLIPConfig, init_clip_params

TINY = CLIPConfig(
    embed_dim=48, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=8, context_length=16, vocab_size=120, text_width=128,
    text_heads=2, text_layers=2,
)

RNG = np.random.default_rng(31)


def test_crop_resize_matches_pil_bilinear():
    """Device crop+resize (interp matmuls) vs PIL crop+resize BILINEAR."""
    src = RNG.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    img = Image.fromarray(src)
    top, left, h, w = 8, 4, 32, 40
    pil = img.crop((left, top, left + w, top + h)).resize((16, 16), Image.BILINEAR)
    pil_arr = np.asarray(pil, np.float32).transpose(2, 0, 1) / 255.0

    x = jnp.asarray(src.transpose(2, 0, 1)[None].astype(np.float32) / 255.0)
    boxes = jnp.asarray([[top, left, h, w]], jnp.float32)
    wy, wx = crop_resize_matrices(boxes, (48, 48), 16)
    ours = np.asarray(apply_crop_resize(x, wy, wx))[0]
    # PIL uses the same triangle-filter downsampling; small filter-support
    # and quantization differences remain (exact parity uses host crops)
    assert np.abs(ours - pil_arr).max() < 0.1
    assert np.abs(ours - pil_arr).mean() < 0.01


def test_center_crop_view():
    x = jnp.asarray(RNG.standard_normal((2, 3, 40, 40)).astype(np.float32))
    c = _center_crop_view(x, 32)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(x[:, :, 4:36, 4:36]))


def test_device_random_crops_shapes_and_determinism():
    imgs = jnp.asarray(RNG.random((2, 3, 48, 48)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    v1 = device_random_crops(imgs, key, 4, out_size=32)
    v2 = device_random_crops(imgs, key, 4, out_size=32)
    v3 = device_random_crops(imgs, jax.random.PRNGKey(1), 4, out_size=32)
    assert v1.shape == (2, 4, 3, 32, 32)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert np.abs(np.asarray(v1) - np.asarray(v3)).max() > 0
    assert np.asarray(v1).min() >= -1e-5 and np.asarray(v1).max() <= 1.0 + 1e-5


def test_engine_crops_path_matches_manual():
    params = init_clip_params(0, TINY)
    engine = TTAEngine(params, TINY, impl="xla", n_views=5)
    crops = jnp.asarray(RNG.standard_normal((2, 6, 3, 32, 32)).astype(np.float32))
    text = jnp.asarray(RNG.standard_normal((7, 48)).astype(np.float32))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)

    modes = engine.features_from_crops(crops, text)
    assert modes.shape == (2, 48)

    # manual: encode all crops then solve per image
    from jcf_tpu.infer import encode_image_batched
    from jcf_tpu.tta import solve_mta

    flat = crops.reshape(12, 3, 32, 32)
    feats = encode_image_batched(params, TINY, flat, impl="xla").reshape(2, 6, 48)
    for i in range(2):
        expected = solve_mta(feats[i], text)
        np.testing.assert_allclose(np.asarray(modes[i]), np.asarray(expected), atol=1e-5)

    logits = engine.logits(modes, text)
    assert logits.shape == (2, 7)


def test_engine_single_encode_matches_per_classifier_encode():
    """Cached-features MTA (encode once, solve per classifier) must be
    bit-identical to features_from_crops per classifier — the predict base
    path relies on this to halve its ViT cost (VERDICT weak #1)."""
    params = init_clip_params(0, TINY)
    engine = TTAEngine(params, TINY, impl="xla", n_views=5)
    crops = jnp.asarray(RNG.standard_normal((2, 6, 3, 32, 32)).astype(np.float32))

    def classifier(seed, c):
        t = np.random.default_rng(seed).standard_normal((c, 48)).astype(np.float32)
        return jnp.asarray(t / np.linalg.norm(t, axis=-1, keepdims=True))

    t1, t2 = classifier(1, 7), classifier(2, 7)
    feats = engine.crop_features(crops)
    for t in (t1, t2):
        old = engine.features_from_crops(crops, t)
        new = engine.mta_from_features(feats, t)
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


def test_engine_device_crop_path_runs():
    params = init_clip_params(0, TINY)
    engine = TTAEngine(params, TINY, impl="xla", n_views=4, normalize_views=False)
    images = jnp.asarray(RNG.random((2, 3, 40, 40)).astype(np.float32))
    text = jnp.asarray(RNG.standard_normal((7, 48)).astype(np.float32))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    modes = engine.features_from_images(images, text, jax.random.PRNGKey(0))
    assert modes.shape == (2, 48)
    assert np.isfinite(np.asarray(modes)).all()

    # fused Pallas view kernel vs composable XLA view pipeline: same key,
    # same crops, matching MTA modes
    engine_x = TTAEngine(
        params, TINY, impl="xla", n_views=4, normalize_views=False,
        fused_views=False,
    )
    modes_x = engine_x.features_from_images(images, text, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(modes), np.asarray(modes_x), atol=1e-4, rtol=1e-4
    )


def test_engine_int8_embed_tracks_float():
    """conv_i8 patch embed (int8 pixels + int8 weights, PERF.md r4): the
    exact +127 offset fold means only the 1/254 pixel rounding and the
    per-channel weight rounding differ from the float path."""
    params = init_clip_params(0, TINY)
    images = jnp.asarray(RNG.random((2, 3, 40, 40)).astype(np.float32))
    text = jnp.asarray(RNG.standard_normal((7, 48)).astype(np.float32))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(3)

    ref = TTAEngine(params, TINY, impl="xla", n_views=4, normalize_views=True)
    q = TTAEngine(
        params, TINY, impl="xla", n_views=4, normalize_views=True,
        embed_impl="conv_i8",
    )
    m_ref = np.asarray(ref.features_from_images(images, text, key))
    m_q = np.asarray(q.features_from_images(images, text, key))
    assert np.isfinite(m_q).all()
    cos = np.sum(m_ref * m_q, -1) / (
        np.linalg.norm(m_ref, axis=-1) * np.linalg.norm(m_q, axis=-1)
    )
    assert cos.min() > 0.99, cos


def test_engine_int8_long_sequence_tower():
    """int8 engine on a >=128-token vision tower (ViT-B/16 shape class):
    the fused path and quant folding are gated on vision_seq_len < 128
    (ADVICE r3 medium — folding used to be decided without the gate and
    the composable path then crashed on folded trees). This pins the
    composable int8 path end to end at 145 tokens."""
    cfg = CLIPConfig(
        embed_dim=48, image_resolution=96, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=120,
        text_width=128, text_heads=2, text_layers=2,
    )
    assert cfg.vision_seq_len >= 128, cfg.vision_seq_len
    params = init_clip_params(0, cfg)
    images = jnp.asarray(RNG.random((2, 3, 112, 112)).astype(np.float32))
    text = jnp.asarray(RNG.standard_normal((5, 48)).astype(np.float32))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(5)

    ref = TTAEngine(params, cfg, n_views=2, normalize_views=True)
    q = TTAEngine(params, cfg, n_views=2, normalize_views=True, quant="int8")
    m_ref = np.asarray(ref.features_from_images(images, text, key))
    m_q = np.asarray(q.features_from_images(images, text, key))
    assert np.isfinite(m_q).all()
    cos = np.sum(m_ref * m_q, -1) / (
        np.linalg.norm(m_ref, axis=-1) * np.linalg.norm(m_q, axis=-1)
    )
    assert cos.min() > 0.99, cos


def test_ensemble_formulas():
    d, c = 8, 5
    g = lambda *s: jnp.asarray(RNG.standard_normal(s).astype(np.float32))
    mh, mp, mz = g(2, d), g(2, d), g(2, d)
    th, tp, tz = g(c, d), g(c, d), g(c, d)
    lp, moco = g(2, c), g(2, c)
    out = ensemble_base_logits(mh, mp, mz, th, tp, tz, lp, moco)
    np.testing.assert_allclose(
        np.asarray(out["cs2"]), (np.asarray(out["cs"]) + np.asarray(out["cs1"])) / 2, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["cs4"]), (np.asarray(out["cs2"]) + np.asarray(out["cs3"])) / 2, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["cs6"]), np.asarray(out["cs4"]) + 0.5 * np.asarray(moco), atol=1e-6
    )


def test_result_file_pipeline(tmp_path):
    base = tmp_path / "top5_results6.txt"
    ood = tmp_path / "top5_results_ood.txt"
    final = tmp_path / "result.txt"

    write_top5(str(base), [
        ("Dataset/TestSetB/a.jpg", np.array([1, 2, 3, 4, 5])),
        ("Dataset/TestSetB/b.jpg", np.array([9, 8, 7, 6, 5])),
    ])
    write_top5(str(ood), [
        ("Dataset/TestSetB/b.jpg", np.array([400, 399, 398, 397, 396])),
    ])
    # merge: ood overrides b.jpg
    update_txt_file(str(base), str(ood))
    lines = base.read_text().splitlines()
    assert lines[0] == "['Dataset/TestSetB/a.jpg'] 1 2 3 4 5"
    assert lines[1] == "['Dataset/TestSetB/b.jpg'] 400 399 398 397 396"

    process_result_lines(str(base), str(final))
    assert final.read_text().splitlines() == [
        "a.jpg 1 2 3 4 5",
        "b.jpg 400 399 398 397 396",
    ]


def test_ood_side_boundary():
    assert ood_side(372) == "base"
    assert ood_side(373) == "new"
    assert format_impath("x/y.jpg") == "['x/y.jpg']"
