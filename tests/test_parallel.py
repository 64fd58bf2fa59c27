"""Multi-device tests on the 8-virtual-CPU-device mesh: DP sharding of the
TTA encode and the stage-1 train step; parity with single-device results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from jcf_tpu.models import CLIPConfig, init_clip_params, encode_image
from jcf_tpu.ops.layers import l2_normalize
from jcf_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

TINY = CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=8, context_length=16, vocab_size=120, text_width=128,
    text_heads=2, text_layers=2,
)

RNG = np.random.default_rng(13)


def test_mesh_and_shardings():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    s = batch_sharding(mesh, 4)
    assert s.spec == P("data", None, None, None)


def test_dp_encode_matches_single_device():
    params = init_clip_params(0, TINY)
    images = jnp.asarray(RNG.standard_normal((16, 3, 32, 32)).astype(np.float32))

    single = np.asarray(
        jax.jit(lambda p, x: l2_normalize(encode_image(p, TINY, x, impl="xla")))(params, images)
    )

    mesh = make_mesh()
    params_r = replicate(params, mesh)
    images_s = jax.device_put(images, batch_sharding(mesh, 4))
    fn = jax.jit(
        lambda p, x: l2_normalize(encode_image(p, TINY, x, impl="xla")),
        in_shardings=(replicated_sharding(mesh), batch_sharding(mesh, 4)),
        out_shardings=batch_sharding(mesh, 2),
    )
    with mesh:
        sharded = fn(params_r, images_s)
    # output really is sharded over devices
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded), single, atol=1e-5)


def test_dp_train_step_matches_single_device():
    from jcf_tpu.peft import LoraSpec, init_lora_params
    from jcf_tpu.tokenizer import tokenize
    from jcf_tpu.train import adamw, make_stage1_step

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=77, vocab_size=49408, text_width=128,
        text_heads=2, text_layers=2,
    )
    spec = LoraSpec(r=2, dropout_rate=0.0, params=("q", "k", "v"),
                    encoder="both", position="bottom", backbone="ViT-B/16")
    params = init_clip_params(0, cfg)
    lora = init_lora_params(1, spec, cfg.text_layers, cfg.text_width,
                            cfg.vision_layers, cfg.vision_width)
    banks = jnp.asarray(
        tokenize([f"a photo of a c{i}." for i in range(4)])[None]
    )
    init_state, step_fn, frozen = make_stage1_step(params, cfg, spec, banks, adamw(1e-3), impl="xla")

    images = jnp.asarray(RNG.standard_normal((8, 3, 32, 32)).astype(np.float32))
    targets = jnp.asarray(RNG.integers(0, 4, 8).astype(np.int32))
    key = jax.random.PRNGKey(0)

    state1, m1 = jax.jit(step_fn)(frozen, init_state(lora), images, targets, 0, key)

    mesh = make_mesh()
    repl = replicated_sharding(mesh)
    state_r = jax.device_put(init_state(lora), repl)
    step_dp = jax.jit(
        step_fn,
        in_shardings=(repl, repl, batch_sharding(mesh, 4), batch_sharding(mesh, 1), None, None),
        out_shardings=(repl, repl),
    )
    with mesh:
        state2, m2 = step_dp(
            jax.device_put(frozen, repl),
            state_r,
            jax.device_put(images, batch_sharding(mesh, 4)),
            jax.device_put(targets, batch_sharding(mesh, 1)),
            0,
            key,
        )
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    a = np.asarray(state1.lora["vision"]["b_qkv"])
    b = np.asarray(state2.lora["vision"]["b_qkv"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_shard_batch_tree():
    mesh = make_mesh()
    tree = {"x": np.zeros((8, 4), np.float32), "y": np.zeros((16,), np.float32)}
    sharded = shard_batch(tree, mesh)
    assert len(sharded["x"].sharding.device_set) == 8
    assert len(sharded["y"].sharding.device_set) == 8


def test_engine_dp_matches_single_device():
    """TTAEngine with a mesh (production DP serving wiring, VERDICT r2 #4)
    equals the single-device engine exactly — including a batch that does
    not divide the device count (pad + slice) and device-sampled crop RNG
    (pre-split per-image keys)."""
    from jcf_tpu.infer import TTAEngine

    params = init_clip_params(0, TINY)
    b = 10  # not a multiple of 8 -> exercises padding
    images = jnp.asarray(RNG.standard_normal((b, 3, 48, 48)).astype(np.float32))
    text = RNG.standard_normal((7, TINY.embed_dim)).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    key = jax.random.PRNGKey(3)

    kw = dict(dtype=jnp.float32, impl="xla", n_views=3)
    e1 = TTAEngine(params, TINY, **kw)
    e8 = TTAEngine(params, TINY, mesh=make_mesh(), **kw)

    single = np.asarray(e1.features_from_images(images, text, key))
    multi = np.asarray(e8.features_from_images(images, text, key))
    assert multi.shape == single.shape == (b, TINY.embed_dim)
    np.testing.assert_allclose(multi, single, atol=1e-6)

    crops = jnp.asarray(RNG.standard_normal((5, 4, 3, 32, 32)).astype(np.float32))
    s = np.asarray(e1.features_from_crops(crops, text))
    m = np.asarray(e8.features_from_crops(crops, text))
    np.testing.assert_allclose(m, s, atol=1e-6)

    # cached-feature entry points (predict pipeline path)
    fs = np.asarray(e1.crop_features(crops))
    fm = np.asarray(e8.crop_features(crops))
    np.testing.assert_allclose(fm, fs, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(e8.mta_from_features(jnp.asarray(fs), text)),
        np.asarray(e1.mta_from_features(jnp.asarray(fs), text)),
        atol=1e-6,
    )
