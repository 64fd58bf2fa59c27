"""Stage-1 LoRA training pipeline — the ``lora_train_vlp.py`` entry point.

50 epochs of CE over 100*img@text with per-step random template banks
(``/root/reference/lora_train_vlp.py:921-1024``); from epoch 20, MTA
validation gates saving to ``lora_weights1/lora_weights.pkl``.

TPU redesign: the 8 banks are tokenized once into a [8, C, 77] device
tensor; every optimizer step (both tower forwards + backward + AdamW) is
one XLA program.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from jcf_tpu.config import PipelineConfig
from jcf_tpu.data import (
    DataLoader,
    RandomResizedCrop,
    TrainDataset,
    generate_fewshot,
    normalize,
    read_classnames,
    read_labeled_split,
    to_chw_array,
)
from jcf_tpu.data.datasets import label_to_classname
from jcf_tpu.data.templates import load_template_file
from jcf_tpu.infer import TTAEngine
from jcf_tpu.ops.stats import boundary_accuracy
from jcf_tpu.peft import LoraSpec, init_lora_params, merge_lora_params, save_lora
from jcf_tpu.pipelines.common import (
    build_text_weights,
    compute_dtype,
    ensure_templates,
    load_model_for_pipeline,
    stack_center_and_crops,
    tta_loader,
)
from jcf_tpu.tokenizer import tokenize
from jcf_tpu.train import Stage1State, adamw, make_stage1_step
from jcf_tpu.utils import MetricLogger, get_logger, set_random_seed

logger = get_logger()


def tokenize_banks(cfg: PipelineConfig, n_banks: int = 8) -> jnp.ndarray:
    """[n_banks, C, 77] token ids for every template bank."""
    banks = []
    for idx in range(1, n_banks + 1):
        bank = load_template_file(cfg.data.template_dir, idx)
        texts = [bank[i][0] for i in sorted(bank.keys())]
        banks.append(tokenize(texts, truncate=True))
    return jnp.asarray(np.stack(banks))


def lora_spec_from_config(cfg: PipelineConfig) -> LoraSpec:
    lc = cfg.lora
    return LoraSpec(
        r=lc.r, alpha=lc.alpha, dropout_rate=lc.dropout_rate,
        params=tuple(lc.params), encoder=lc.encoder, position=lc.position,
        backbone=lc.backbone,
    )


def evaluate_lora_val(cfg, params, mcfg, text_weights, val_data) -> dict:
    """Stage-1 validation triple (``lora_train_vlp.py:822-855``): boundary
    accuracy of the MTA head, the single center-crop head, and the
    crop-mean ensemble head."""
    engine = TTAEngine(
        params, mcfg, dtype=compute_dtype(cfg), impl=cfg.runtime.attention_impl,
        n_views=cfg.tta.n_views, crop_scale=cfg.tta.crop_scale,
    )
    loader = tta_loader(cfg, val_data, mcfg, normalize=True)
    total = 0
    sums = {"acc_mta": 0.0, "acc_center": 0.0, "acc_mean": 0.0}
    for center, crops, labels, _, _ in loader:
        stacked = stack_center_and_crops(center, crops)
        t = jnp.asarray(labels)
        b = len(labels)

        feats = engine.crop_features(stacked)  # [B, N+1, D]
        modes = engine.features_from_crops(stacked, text_weights)

        logits_mta = engine.logits(modes, text_weights)
        logits_center = engine.logits(feats[:, 0], text_weights)
        logits_mean = engine.logits(feats.mean(axis=1), text_weights)

        sums["acc_mta"] += float(boundary_accuracy(logits_mta, t)) * b
        sums["acc_center"] += float(boundary_accuracy(logits_center, t)) * b
        sums["acc_mean"] += float(boundary_accuracy(logits_mean, t)) * b
        total += b
    return {k: v / max(total, 1) for k, v in sums.items()}


def evaluate_mta(cfg, params, mcfg, text_weights, val_data) -> float:
    """MTA-head boundary accuracy (gating metric)."""
    return evaluate_lora_val(cfg, params, mcfg, text_weights, val_data)["acc_mta"]


def run_train_lora(cfg: PipelineConfig) -> dict:
    set_random_seed(cfg.stage1.seed)
    params, mcfg = load_model_for_pipeline(cfg)
    ensure_templates(cfg)
    spec = lora_spec_from_config(cfg)

    classname_map = read_classnames(cfg.data.classes_file)
    l2c = label_to_classname(classname_map)
    train_data = read_labeled_split(cfg.data.train_split, classname_of=l2c.get)
    train_data = generate_fewshot(train_data, cfg.data.shots)

    rrc = RandomResizedCrop(size=mcfg.image_resolution, scale=cfg.stage1.crop_scale)

    def transform(img, rng):
        view = rrc(img, rng)
        if rng.random() < 0.5:
            from PIL import Image

            view = view.transpose(Image.FLIP_LEFT_RIGHT)
        return normalize(to_chw_array(view))

    dataset = TrainDataset(train_data, transform, seed=cfg.stage1.seed)
    loader = DataLoader(
        dataset, batch_size=cfg.stage1.batch_size, shuffle=True,
        num_workers=cfg.data.num_workers, seed=cfg.stage1.seed, drop_last=False,
    )

    banks = tokenize_banks(cfg)
    lora = init_lora_params(
        cfg.stage1.seed, spec, mcfg.text_layers, mcfg.text_width,
        mcfg.vision_layers, mcfg.vision_width,
    )
    optimizer = adamw(
        lr=cfg.stage1.lr, betas=cfg.stage1.betas, weight_decay=cfg.stage1.weight_decay
    )
    init_state, step_fn, frozen = make_stage1_step(
        params, mcfg, spec, banks, optimizer,
        logit_scale=cfg.stage1.logit_scale, dtype=compute_dtype(cfg),
        impl=cfg.runtime.attention_impl,
    )
    # frozen weights ride as runtime args (donated state), never as
    # program constants — see make_stage1_step
    step_fn = jax.jit(step_fn, donate_argnums=(1,))
    state = init_state(lora)
    start_epoch = 0

    from jcf_tpu.utils import load_pytree, save_pytree

    if cfg.stage1.resume and os.path.exists(cfg.stage1.checkpoint_path):
        ckpt = load_pytree(cfg.stage1.checkpoint_path)
        state = Stage1State(*ckpt["state"])
        start_epoch = int(ckpt["epoch"]) + 1
        logger.info("resuming stage-1 from epoch %d", start_epoch)

    metrics_log = MetricLogger(jsonl_path="logs/train_lora.jsonl")
    rng = np.random.default_rng(cfg.stage1.seed)
    key = jax.random.PRNGKey(cfg.stage1.seed)

    val_data = None
    if os.path.exists(cfg.data.val_split):
        val_data = read_labeled_split(cfg.data.val_split, classname_of=l2c.get)

    best_acc = 0.0
    step_count = 0
    for epoch in range(start_epoch, cfg.stage1.epochs):
        loader.set_epoch(epoch)
        epoch_loss, epoch_acc, n = 0.0, 0.0, 0
        for images, targets, _ in loader:
            bank_idx = int(rng.integers(0, banks.shape[0]))
            key, sub = jax.random.split(key)
            state, metrics = step_fn(
                frozen, state, jnp.asarray(images), jnp.asarray(targets),
                bank_idx, sub
            )
            bsz = len(targets)
            epoch_loss += float(metrics["loss"]) * bsz
            epoch_acc += float(metrics["acc"]) * bsz
            n += bsz
            step_count += 1
        metrics_log.log(step_count, epoch=epoch, loss=epoch_loss / n, acc=epoch_acc / n)
        save_pytree({"state": tuple(state), "epoch": epoch}, cfg.stage1.checkpoint_path)

        if epoch >= cfg.stage1.eval_from_epoch and val_data:
            merged = merge_lora_params(params, state.lora, spec)
            templates = ensure_templates(cfg)
            tw = build_text_weights(merged, mcfg, templates, cfg)
            accs = evaluate_lora_val(cfg, merged, mcfg, tw, val_data)
            acc_val = accs["acc_mta"]
            metrics_log.log(step_count, epoch=epoch,
                            val_acc=acc_val, val_acc_center=accs["acc_center"],
                            val_acc_mean=accs["acc_mean"])
            if acc_val > best_acc:
                best_acc = acc_val
                save_lora(
                    state.lora, spec, cfg.stage1.save_path,
                    n_text=mcfg.text_layers, n_vision=mcfg.vision_layers,
                )
                logger.info("epoch %d: saved best LoRA (val %.2f)", epoch, acc_val)

    # always persist the final adapter if nothing was gated in
    if not os.path.exists(cfg.stage1.save_path):
        save_lora(
            state.lora, spec, cfg.stage1.save_path,
            n_text=mcfg.text_layers, n_vision=mcfg.vision_layers,
        )
    return {"steps": step_count, "best_val_acc": best_acc, "save_path": cfg.stage1.save_path}
