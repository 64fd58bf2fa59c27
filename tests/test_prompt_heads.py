"""Prompt learner and classification head tests."""

import numpy as np

import jax.numpy as jnp

from jcf_tpu.heads import (
    channel_lp,
    init_channel_lp,
    init_moco_adapter,
    moco_adapter,
    moco_adapter_init_from_features,
)
from jcf_tpu.models import CLIPConfig, init_clip_params, encode_text
from jcf_tpu.peft import init_prompt_learner, build_prompt_embeddings, prompt_text_features
from jcf_tpu.tokenizer import tokenize

CFG = CLIPConfig(
    embed_dim=48,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=8,
    context_length=77,
    vocab_size=49408,
    text_width=128,
    text_heads=2,
    text_layers=2,
)

RNG = np.random.default_rng(2)


def test_prompt_learner_init_matches_ctx_tokens():
    params = init_clip_params(0, CFG)
    learner = init_prompt_learner(params, CFG, ["Animal_Giant_panda", "Food_pizza"])
    # ctx initialized from the embeddings of "a photo of a" tokens 1..4
    ids = tokenize("a photo of a")[0]
    expected = np.asarray(params["text"]["token_embedding"])[ids[1:5]]
    np.testing.assert_allclose(np.asarray(learner.ctx), expected, atol=1e-6)
    assert learner.token_prefix.shape == (2, 1, 128)
    assert learner.token_suffix.shape == (2, 72, 128)
    assert learner.tokenized.shape == (2, 77)


def test_prompt_embeddings_equal_plain_tokenization():
    """With the original ctx, prompt embeddings must equal the raw token
    embeddings of 'a photo of a {name}.' — so prompt-tuned text features
    with untouched ctx == encode_text of the full prompt."""
    params = init_clip_params(0, CFG)
    names = ["Animal_Giant_panda", "Food_pizza", "Caltech_pagoda"]
    learner = init_prompt_learner(params, CFG, names)

    emb = np.asarray(build_prompt_embeddings(learner))
    ids = tokenize([f"a photo of a {n.replace('_',' ')}." for n in names])
    expected = np.asarray(params["text"]["token_embedding"])[ids]
    np.testing.assert_allclose(emb, expected, atol=1e-6)

    feats = np.asarray(prompt_text_features(params, CFG, learner, impl="xla"))
    direct = np.asarray(encode_text(params, CFG, jnp.asarray(ids), impl="xla"))
    np.testing.assert_allclose(feats, direct, atol=1e-4)


def test_channel_lp():
    text_w = RNG.standard_normal((5, 16)).astype(np.float32)
    params = init_channel_lp(5, 16, text_w)
    feats = jnp.asarray(RNG.standard_normal((3, 16)).astype(np.float32))
    out = np.asarray(channel_lp(params, feats))
    # scale=1, bias=0 at init -> plain linear with the text weights
    np.testing.assert_allclose(out, np.asarray(feats) @ text_w.T, atol=1e-5)


def test_moco_adapter_and_class_sums():
    feats = jnp.asarray(RNG.standard_normal((6, 8)).astype(np.float32))
    labels = jnp.asarray([0, 1, 1, 2, 0, 2])
    sums = moco_adapter_init_from_features(feats, labels, 3)
    expected = np.zeros((3, 8), np.float32)
    for f, l in zip(np.asarray(feats), np.asarray(labels)):
        expected[l] += f
    np.testing.assert_allclose(np.asarray(sums), expected, atol=1e-5)

    params = init_moco_adapter(3, 8, sums)
    out = np.asarray(moco_adapter(params, feats))
    np.testing.assert_allclose(out, np.asarray(feats) @ expected.T, atol=1e-4)
