"""On-chip training-step throughput at real ViT-B/32 scale (VERDICT r3 #2).

Times ONE warm-cache jitted step of each reference training workload on the
real TPU chip, with a loss-decreases sanity assert over ~20 steps of a
fixed synthetic few-shot batch:

  stage-1  LoRA CE training      bs 256  (/root/reference/lora_train_vlp.py:940,946,1218)
  stage-2  joint prompts+heads   bs 128  (/root/reference/slow_pace.py:1577,1591-1592,1935)

Synthetic data (random pixels / labels / caches) exercises the identical
compiled program as real data — throughput and memory are shape-determined.

Env knobs: JCF_TRAIN_STAGES=1,2  JCF_TRAIN_STEPS (default 20)
           JCF_TRAIN_TIMED (default 10)  JCF_TRAIN_DTYPE=bfloat16|float32
Prints one JSON line per stage: {"stage": .., "images_per_sec": ..,
"step_ms": .., "loss_first": .., "loss_last": ..}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jcf_tpu.models import VIT_B_32, init_clip_params
from jcf_tpu.peft import LoraSpec, init_lora_params, init_prompt_learner
from jcf_tpu.tokenizer import tokenize
from jcf_tpu.train import adamw, make_stage1_step, make_stage2_step

N_CLASSES = 403  # classes.txt
N_BASE = 374  # train labels cover 0..373 (Dataset/train.txt)
N_TRAIN = 1496


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _classnames():
    return [f"Domain_class_{i}" for i in range(N_CLASSES)]


def _banks_tokens(n_banks=8):
    rows = []
    for b in range(n_banks):
        rows.append(
            tokenize(
                [f"a photo of a class {i} variant {b}." for i in range(N_CLASSES)],
                truncate=True,
            )
        )
    return jnp.asarray(np.stack(rows))


def _timed_steps(step, frozen, state, args, n_warm, n_timed, n_sanity):
    losses = []
    for i in range(max(n_warm, n_sanity)):
        state, metrics = step(frozen, state, *args(i))
        losses.append(float(metrics["loss"]))
    t0 = time.perf_counter()
    for i in range(n_timed):
        state, metrics = step(frozen, state, *args(1000 + i))
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_timed
    return dt, losses


def bench_stage1(dtype, steps, timed):
    cfg = VIT_B_32
    bs = int(os.environ.get("JCF_TRAIN_BS1", "256"))  # lora_train_vlp.py:1218
    params = init_clip_params(0, cfg)
    spec = LoraSpec()  # r=4, alpha=1, dropout .25, q/k/v, both, all
    lora = init_lora_params(
        1, spec, cfg.text_layers, cfg.text_width, cfg.vision_layers, cfg.vision_width
    )
    banks = _banks_tokens()
    opt = adamw(lr=2e-4, weight_decay=1e-2)  # lora_train_vlp.py:946
    init_state, step_fn, frozen = make_stage1_step(
        params, cfg, spec, banks, opt, dtype=dtype
    )
    step = jax.jit(step_fn, donate_argnums=(1,))
    state = init_state(lora)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((bs, 3, 224, 224)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, N_BASE, bs).astype(np.int32))

    def args(i):
        return (images, targets, i % banks.shape[0], jax.random.PRNGKey(i))

    _log("stage-1: compiling + sanity steps ...")
    dt, losses = _timed_steps(step, frozen, state, args, 3, timed, steps)
    assert losses[-1] < losses[0], f"stage-1 loss did not decrease: {losses}"
    return {
        "stage": "stage1_lora",
        "batch_size": bs,
        "images_per_sec": round(bs / dt, 1),
        "step_ms": round(dt * 1e3, 1),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "dtype": str(np.dtype(dtype)) if dtype != jnp.bfloat16 else "bfloat16",
    }


def bench_stage2(dtype, steps, timed):
    cfg = VIT_B_32.with_prompts()  # IVLP: 4 visual prompt tokens live
    bs = int(os.environ.get("JCF_TRAIN_BS2", "128"))  # slow_pace.py:1935
    params = init_clip_params(0, cfg)
    spec = LoraSpec()
    lora = init_lora_params(
        1, spec, cfg.text_layers, cfg.text_width, cfg.vision_layers, cfg.vision_width
    )
    learner = init_prompt_learner(params, cfg, _classnames())

    from jcf_tpu.heads import init_channel_lp, init_moco_adapter
    from jcf_tpu.models.resnet import init_resnet50_params

    moco_params = init_resnet50_params(0)
    rng = np.random.default_rng(0)

    def unit(shape):
        t = rng.standard_normal(shape).astype(np.float32)
        return jnp.asarray(t / np.linalg.norm(t, axis=-1, keepdims=True))

    zs_feats = unit((N_TRAIN, cfg.embed_dim))
    text_zs = unit((N_CLASSES, cfg.embed_dim))
    banks_zs = unit((8, N_CLASSES, cfg.embed_dim))

    trainable = {
        "lora": lora,
        "ctx": learner.ctx,
        "vpt": params["visual"]["vpt"],
        "channel_lp": init_channel_lp(N_CLASSES, cfg.embed_dim, text_zs),
        "moco_adapter": init_moco_adapter(
            N_CLASSES, 2048, rng.standard_normal((N_CLASSES, 2048)).astype(np.float32)
        ),
    }
    opt = adamw(lr=2e-4)  # slow_pace.py:1591 (cosine schedule is host-side)
    init_state, step_fn, frozen = make_stage2_step(
        params, cfg, spec, learner, moco_params, zs_feats, text_zs, banks_zs,
        opt, dtype=dtype,
    )
    step = jax.jit(step_fn, donate_argnums=(1,))
    state = init_state(trainable)

    images = jnp.asarray(rng.random((bs, 3, 224, 224)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, N_BASE, bs).astype(np.int32))
    index = jnp.asarray(rng.integers(0, N_TRAIN, bs).astype(np.int32))

    def args(i):
        return (images, targets, index, i % 8, jax.random.PRNGKey(i))

    _log("stage-2: compiling + sanity steps ...")
    dt, losses = _timed_steps(step, frozen, state, args, 3, timed, steps)
    assert losses[-1] < losses[0], f"stage-2 loss did not decrease: {losses}"
    return {
        "stage": "stage2_joint",
        "batch_size": bs,
        "images_per_sec": round(bs / dt, 1),
        "step_ms": round(dt * 1e3, 1),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "dtype": str(np.dtype(dtype)) if dtype != jnp.bfloat16 else "bfloat16",
    }


def main():
    stages = os.environ.get("JCF_TRAIN_STAGES", "1,2").split(",")
    steps = int(os.environ.get("JCF_TRAIN_STEPS", "20"))
    timed = int(os.environ.get("JCF_TRAIN_TIMED", "10"))
    dtype = (
        jnp.float32
        if os.environ.get("JCF_TRAIN_DTYPE", "bfloat16") == "float32"
        else jnp.bfloat16
    )
    for s in stages:
        row = bench_stage1(dtype, steps, timed) if s.strip() == "1" else bench_stage2(
            dtype, steps, timed
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
