"""Training step tests: stage-1 loss decreases and only LoRA moves;
stage-2 joint step updates every trainable; cosine schedule semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jcf_tpu.heads import init_channel_lp, init_moco_adapter
from jcf_tpu.models import CLIPConfig, init_clip_params
from jcf_tpu.peft import LoraSpec, init_lora_params, init_prompt_learner
from jcf_tpu.train import (
    Stage1State,
    adamw,
    cosine_annealing_lr,
    make_stage1_step,
    make_stage2_step,
)

CFG = CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=8, context_length=77, vocab_size=49408, text_width=128,
    text_heads=2, text_layers=2, vision_prompt_tokens=2,
)

SPEC = LoraSpec(r=2, alpha=1.0, dropout_rate=0.25, params=("q", "k", "v"),
                encoder="both", position="bottom", backbone="ViT-B/16")

RNG = np.random.default_rng(5)


def test_cosine_annealing_matches_torch_formula():
    sched = cosine_annealing_lr(2e-4, 20, 1e-6)
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(20)) == pytest.approx(1e-6)
    # periodic (un-clamped) past T_max, like torch/jittor
    assert float(sched(40)) == pytest.approx(2e-4)
    mid = 1e-6 + (2e-4 - 1e-6) / 2
    assert float(sched(10)) == pytest.approx(mid)


def test_stage1_step_trains():
    from jcf_tpu.tokenizer import tokenize

    params = init_clip_params(0, CFG)
    lora = init_lora_params(1, SPEC, CFG.text_layers, CFG.text_width,
                            CFG.vision_layers, CFG.vision_width)
    c = 5
    banks = np.stack([
        tokenize([f"a photo of a class{i} v{b}." for i in range(c)])
        for b in range(2)
    ])  # [2, C, 77]

    init_state, step, frozen = make_stage1_step(
        params, CFG, SPEC, jnp.asarray(banks), adamw(lr=1e-3), impl="xla"
    )
    step = jax.jit(step)
    state = init_state(lora)

    images = jnp.asarray(RNG.standard_normal((8, 3, 32, 32)).astype(np.float32))
    targets = jnp.asarray(RNG.integers(0, c, 8).astype(np.int32))

    losses = []
    for i in range(8):
        state, metrics = step(frozen, state, images, targets, i % 2, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert state.step == 8
    # overfitting a fixed batch must reduce loss
    assert losses[-1] < losses[0]
    # B factors must have moved away from zero
    assert np.abs(np.asarray(state.lora["vision"]["b_qkv"])).max() > 0


def test_stage2_step_updates_all_trainables():
    params = init_clip_params(0, CFG)
    lora = init_lora_params(1, SPEC, CFG.text_layers, CFG.text_width,
                            CFG.vision_layers, CFG.vision_width)
    c, d = 4, CFG.embed_dim
    learner = init_prompt_learner(params, CFG, [f"Dom_class{i}" for i in range(c)])

    from jcf_tpu.models.resnet import init_resnet50_params

    moco_params = init_resnet50_params(0)

    zs_feats = jnp.asarray(RNG.standard_normal((10, d)).astype(np.float32))
    zs_feats = zs_feats / jnp.linalg.norm(zs_feats, axis=-1, keepdims=True)
    text_zs = jnp.asarray(RNG.standard_normal((c, d)).astype(np.float32))
    text_zs = text_zs / jnp.linalg.norm(text_zs, axis=-1, keepdims=True)
    banks = jnp.asarray(RNG.standard_normal((2, c, d)).astype(np.float32))

    trainable = {
        "lora": lora,
        "ctx": learner.ctx,
        "vpt": params["visual"]["vpt"],
        "channel_lp": init_channel_lp(c, d, text_zs),
        # the reference always initializes this head from per-class feature
        # sums (slow_pace.py:1545-1551); zero weights would make
        # logit_normalize produce 0/0
        "moco_adapter": init_moco_adapter(
            c, 2048, RNG.standard_normal((c, 2048)).astype(np.float32)
        ),
    }

    init_state, step, frozen = make_stage2_step(
        params, CFG, SPEC, learner, moco_params, zs_feats, text_zs, banks,
        adamw(lr=1e-3), impl="xla",
    )
    step = jax.jit(step)
    state = init_state(trainable)

    images = jnp.asarray(RNG.random((2, 3, 32, 32)).astype(np.float32))
    targets = jnp.asarray([0, 2], jnp.int32)
    index = jnp.asarray([3, 7], jnp.int32)

    state2, metrics = step(frozen, state, images, targets, index, 0, jax.random.PRNGKey(0))
    for k in ("loss", "sim_ce", "l_scl", "lp_ce", "loss_aux", "acc"):
        assert np.isfinite(float(metrics[k])), k

    # every trainable leaf group moved
    def moved(a, b):
        return np.abs(np.asarray(a) - np.asarray(b)).max() > 0

    assert moved(state.trainable["ctx"], state2.trainable["ctx"])
    assert moved(state.trainable["vpt"], state2.trainable["vpt"])
    assert moved(state.trainable["channel_lp"]["fc"]["w"], state2.trainable["channel_lp"]["fc"]["w"])
    assert moved(state.trainable["moco_adapter"]["fc"]["w"], state2.trainable["moco_adapter"]["fc"]["w"])
    assert moved(state.trainable["lora"]["vision"]["a_qkv"], state2.trainable["lora"]["vision"]["a_qkv"])
