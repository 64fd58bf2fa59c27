"""Stage-2 joint training pipeline — the ``slow_pace.py`` entry point.

Flow (``/root/reference/slow_pace.py:1479-1716``):
1. apply stage-1 LoRA to both the prompted model and the "zs" model
2. build / load the cached zero-shot MTA feature banks
   (``features_zs1.pkl`` over the train set, ``features_zs2.pkl`` +
   ``label_zs2.pkl`` over the val set)
3. init prompt learner (ctx from "a photo of a"), Channel_LP (fc <- zs
   text classifier), Moco_Adapter (fc <- per-class MoCo feature sums)
4. 20 epochs of the joint step; per-epoch ensemble validation gates
   saving the ``test_pkl/`` artifact set

The reference's save gate reads an unbound name (``best_acc``,
``slow_pace.py:1707`` — a latent NameError); we gate on the tracked best
accuracy, documented as the intended behavior.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from jcf_tpu.config import PipelineConfig
from jcf_tpu.data import (
    DataLoader,
    RandomResizedCrop,
    TrainDataset,
    generate_fewshot,
    read_classnames,
    read_labeled_split,
    to_chw_array,
)
from jcf_tpu.data.datasets import label_to_classname
from jcf_tpu.data.templates import load_template_file
from jcf_tpu.heads import (
    init_channel_lp,
    init_moco_adapter,
    moco_adapter_init_from_features,
)
from jcf_tpu.infer import TTAEngine
from jcf_tpu.models.loader import load_state_dict_file, state_dict_from_params
from jcf_tpu.models.resnet import moco_params_from_state_dict, resnet50_features
from jcf_tpu.ops.layers import l2_normalize
from jcf_tpu.peft import (
    LoraSpec,
    init_prompt_learner,
    load_lora,
    merge_lora_params,
    save_lora,
)
from jcf_tpu.pipelines.common import (
    build_text_weights,
    compute_dtype,
    ensure_templates,
    load_model_for_pipeline,
    stack_center_and_crops,
    tta_loader,
)
from jcf_tpu.pipelines.train_lora import lora_spec_from_config
from jcf_tpu.tta import build_classifier_weights
from jcf_tpu.train import adamw, cosine_annealing_lr, make_stage2_step
from jcf_tpu.utils import MetricLogger, get_logger, load_pytree, save_pytree, set_random_seed

logger = get_logger()


def _precompute_zs_features(cfg, params_merged, mcfg, text_weights, data, cache_path, label_cache=None):
    """Cached MTA features over a split (``pre_load_zs``,
    ``slow_pace.py:1435-1477``)."""
    if os.path.exists(cache_path):
        feats = load_pytree(cache_path)
        labels = load_pytree(label_cache) if label_cache and os.path.exists(label_cache) else None
        return jnp.asarray(feats), labels

    engine = TTAEngine(
        params_merged, mcfg, dtype=compute_dtype(cfg), impl=cfg.runtime.attention_impl,
        n_views=cfg.tta.n_views,
    )
    loader = tta_loader(cfg, data, mcfg, normalize=False)  # raw pixels; tfm on device
    from jcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    mean = np.asarray(CLIP_MEAN, np.float32).reshape(1, 1, 3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(1, 1, 3, 1, 1)
    feats, labels = [], []
    for center, crops, lab, _, _ in loader:
        stacked = np.concatenate([center, crops], axis=1)
        stacked = (stacked - mean) / std
        modes = engine.features_from_crops(jnp.asarray(stacked), text_weights)
        feats.append(np.asarray(modes))
        labels.append(np.asarray(lab))
    feats = np.concatenate(feats)
    labels = np.concatenate(labels)
    save_pytree(feats, cache_path)
    if label_cache:
        save_pytree(labels, label_cache)
    return jnp.asarray(feats), jnp.asarray(labels)


def run_train_joint(cfg: PipelineConfig) -> dict:
    set_random_seed(cfg.stage2.seed)
    spec = lora_spec_from_config(cfg)
    dtype = compute_dtype(cfg)
    impl = cfg.runtime.attention_impl

    # prompted model + zs model, both with stage-1 LoRA (slow_pace.py:1489-1495)
    params, mcfg = load_model_for_pipeline(cfg, prompted=True)
    params_zs, mcfg_zs = load_model_for_pipeline(cfg, prompted=False)
    lora = load_lora(
        cfg.stage1.save_path, spec,
        n_text=mcfg.text_layers, text_width=mcfg.text_width,
        n_vision=mcfg.vision_layers, vision_width=mcfg.vision_width,
    )
    params_zs_merged = merge_lora_params(params_zs, lora, spec)

    templates = ensure_templates(cfg)
    text_zs = build_text_weights(params_zs_merged, mcfg_zs, templates, cfg)  # [C, D]

    classname_map = read_classnames(cfg.data.classes_file)
    l2c = label_to_classname(classname_map)
    classnames = [l2c[i] for i in sorted(l2c)]
    num_classes = len(classnames)

    train_data = read_labeled_split(cfg.data.train_split, classname_of=l2c.get)
    train_data = generate_fewshot(train_data, cfg.data.shots)

    # cached zero-shot MTA features over the train set (features_zs1)
    zs_feats, _ = _precompute_zs_features(
        cfg, params_zs_merged, mcfg_zs, text_zs, train_data, cfg.stage2.feature_cache_1
    )

    # val-split cache + zero-shot sanity accuracy (slow_pace.py:1516-1529)
    if os.path.exists(cfg.data.val_split):
        val_data_for_cache = read_labeled_split(cfg.data.val_split, classname_of=l2c.get)
        test_feats, test_labels = _precompute_zs_features(
            cfg, params_zs_merged, mcfg_zs, text_zs, val_data_for_cache,
            cfg.stage2.feature_cache_2, label_cache=cfg.stage2.label_cache_2,
        )
        if test_labels is not None:
            from jcf_tpu.ops.stats import top_k_accuracy

            zs_logits_val = 100.0 * test_feats @ text_zs.T
            zs_acc = float(top_k_accuracy(zs_logits_val, jnp.asarray(test_labels)))
            logger.info("**** Zero-shot CLIP's val accuracy: %.2f ****", zs_acc)

    # per-bank zs text features (slow_pace.py:1600-1609)
    banks: List[jnp.ndarray] = []
    for idx in range(1, 9):
        bank = load_template_file(cfg.data.template_dir, idx)
        banks.append(
            build_classifier_weights(params_zs_merged, mcfg_zs, bank, dtype=dtype, impl=impl)
        )
    text_banks = jnp.stack(banks)

    learner = init_prompt_learner(
        params, mcfg, classnames, cfg.stage2.ctx_init, cfg.stage2.n_ctx
    )

    # MoCo tower + adapter init from per-class train feature sums
    moco_sd = load_state_dict_file(cfg.stage2.moco_checkpoint)
    moco_params = moco_params_from_state_dict(moco_sd)

    from jcf_tpu.data.transforms import MOCO_MEAN, MOCO_STD, preprocess_center
    from jcf_tpu.data.datasets import read_image

    moco_feats, moco_labels = [], []
    feats_fn = jax.jit(lambda x: resnet50_features(moco_params, x, dtype=dtype))
    batch: List[np.ndarray] = []
    batch_labels: List[int] = []

    def flush():
        if not batch:
            return
        arr = np.stack(batch)
        arr = (arr - np.asarray(MOCO_MEAN, np.float32).reshape(1, 3, 1, 1)) / np.asarray(
            MOCO_STD, np.float32
        ).reshape(1, 3, 1, 1)
        moco_feats.append(np.asarray(feats_fn(jnp.asarray(arr))))
        moco_labels.extend(batch_labels)
        batch.clear()
        batch_labels.clear()

    for d in train_data:
        batch.append(
            preprocess_center(read_image(d.impath), size=mcfg.image_resolution,
                              resize_to=max(cfg.tta.resize_to * mcfg.image_resolution // 224,
                                            mcfg.image_resolution),
                              apply_normalize=False)
        )
        batch_labels.append(d.label)
        if len(batch) >= 64:
            flush()
    flush()
    moco_feat_arr = jnp.asarray(np.concatenate(moco_feats))
    moco_label_arr = jnp.asarray(np.asarray(moco_labels, np.int32))
    class_sums = moco_adapter_init_from_features(moco_feat_arr, moco_label_arr, num_classes)

    trainable = {
        "lora": lora,
        "ctx": learner.ctx,
        "vpt": params["visual"]["vpt"],
        "channel_lp": init_channel_lp(num_classes, mcfg.embed_dim, text_zs),
        "moco_adapter": init_moco_adapter(num_classes, 2048, class_sums),
    }

    lr = (
        cosine_annealing_lr(cfg.stage2.lr, cfg.stage2.epochs, cfg.stage2.cosine_eta_min)
        if cfg.stage2.scheduler_step_per_batch
        else cfg.stage2.lr
    )
    optimizer = adamw(lr=lr, betas=cfg.stage2.betas, weight_decay=cfg.stage2.weight_decay)
    init_state, step_fn, frozen = make_stage2_step(
        params, mcfg, spec, learner, moco_params, zs_feats, text_zs, text_banks,
        optimizer, logit_scale=cfg.stage2.logit_scale, dtype=dtype, impl=impl,
    )
    # frozen weights/caches ride as runtime args, never program constants
    step_fn = jax.jit(step_fn, donate_argnums=(1,))
    state = init_state(trainable)
    start_epoch = 0
    if cfg.stage2.resume and os.path.exists(cfg.stage2.checkpoint_path):
        from jcf_tpu.train.joint_stage2 import Stage2State

        ckpt = load_pytree(cfg.stage2.checkpoint_path)
        state = Stage2State(*ckpt["state"])
        start_epoch = int(ckpt["epoch"]) + 1
        logger.info("resuming stage-2 from epoch %d", start_epoch)

    rrc = RandomResizedCrop(size=mcfg.image_resolution, scale=(0.05, 1.0))

    def transform(img, rng):
        view = rrc(img, rng)
        if rng.random() < 0.5:
            from PIL import Image

            view = view.transpose(Image.FLIP_LEFT_RIGHT)
        return to_chw_array(view)  # raw [0,1]; tfm_clip/tfm_moco on device

    dataset = TrainDataset(train_data, transform, seed=cfg.stage2.seed)
    loader = DataLoader(
        dataset, batch_size=cfg.stage2.batch_size, shuffle=True,
        num_workers=cfg.data.num_workers, seed=cfg.stage2.seed,
    )

    metrics_log = MetricLogger(jsonl_path="logs/train_joint.jsonl")
    rng = np.random.default_rng(cfg.stage2.seed)
    key = jax.random.PRNGKey(cfg.stage2.seed)

    val_data = None
    if os.path.exists(cfg.data.val_split):
        val_data = read_labeled_split(cfg.data.val_split, classname_of=l2c.get)

    best_acc = -1.0
    step_count = 0
    for epoch in range(start_epoch, cfg.stage2.epochs):
        loader.set_epoch(epoch)
        agg: Dict[str, float] = {}
        n = 0
        for images, targets, index in loader:
            bank_idx = int(rng.integers(0, text_banks.shape[0]))
            key, sub = jax.random.split(key)
            state, metrics = step_fn(
                frozen, state, jnp.asarray(images), jnp.asarray(targets),
                jnp.asarray(index), bank_idx, sub,
            )
            bsz = len(targets)
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v) * bsz
            n += bsz
            step_count += 1
        metrics_log.log(step_count, epoch=epoch, **{k: v / n for k, v in agg.items()})
        save_pytree({"state": tuple(state), "epoch": epoch}, cfg.stage2.checkpoint_path)

        # validation: full 8-head ensemble table (slow_pace.py:946-1136);
        # the gate uses the MTA/hand head ('acc'), the rest are logged
        acc_val = 0.0
        if val_data:
            vpt_params = dict(params)
            vis = dict(params["visual"])
            vis["vpt"] = state.trainable["vpt"]
            vpt_params["visual"] = vis
            merged = merge_lora_params(vpt_params, state.trainable["lora"], spec)
            tw = build_text_weights(merged, mcfg, templates, cfg)
            if cfg.stage2.full_ensemble_val:
                from jcf_tpu.data.transforms import (
                    CLIP_MEAN, CLIP_STD, MOCO_MEAN, MOCO_STD,
                )
                from jcf_tpu.infer.validate import evaluate_stage2_ensemble
                from jcf_tpu.ops.layers import l2_normalize
                from jcf_tpu.peft import prompt_text_features

                pt_feats = l2_normalize(prompt_text_features(
                    merged, mcfg, learner, state.trainable["ctx"],
                    dtype=dtype, impl=impl,
                ))
                text_pt = l2_normalize((tw + pt_feats) / 2)
                engine_pt = TTAEngine(merged, mcfg, dtype=dtype, impl=impl,
                                      n_views=cfg.tta.n_views)
                engine_zs = TTAEngine(params_zs_merged, mcfg_zs, dtype=dtype,
                                      impl=impl, n_views=cfg.tta.n_views)
                val_loader = tta_loader(cfg, val_data, mcfg, normalize=False)
                mk = lambda m, s: (
                    np.asarray(m, np.float32).reshape(1, 1, 3, 1, 1),
                    np.asarray(s, np.float32).reshape(1, 1, 3, 1, 1),
                )
                accs = evaluate_stage2_ensemble(
                    engine_pt, engine_zs, moco_params,
                    state.trainable["channel_lp"], state.trainable["moco_adapter"],
                    tw, text_pt, text_zs, val_loader,
                    clip_mean_std=mk(CLIP_MEAN, CLIP_STD),
                    moco_mean_std=mk(MOCO_MEAN, MOCO_STD),
                    dtype=dtype,
                )
                acc_val = accs["acc"]
                metrics_log.log(step_count, epoch=epoch, **{f"val_{k}": v for k, v in accs.items()})
            else:
                from jcf_tpu.pipelines.train_lora import evaluate_mta

                acc_val = evaluate_mta(cfg, merged, mcfg, tw, val_data)
                metrics_log.log(step_count, epoch=epoch, val_acc=acc_val)

        if not val_data or acc_val > best_acc:
            best_acc = acc_val
            out = cfg.stage2.out_dir
            os.makedirs(out, exist_ok=True)
            save_pytree(state.trainable["channel_lp"], os.path.join(out, "channel.pkl"))
            save_pytree(state.trainable["moco_adapter"], os.path.join(out, "moco_adapter.pkl"))
            clip_sd_params = dict(params)
            vis = dict(params["visual"])
            vis["vpt"] = state.trainable["vpt"]
            clip_sd_params["visual"] = vis
            save_pytree(
                state_dict_from_params(clip_sd_params, mcfg),
                os.path.join(out, "clip_model.pkl"),
            )
            save_pytree(
                {"ctx": np.asarray(state.trainable["ctx"])},
                os.path.join(out, "PromptLearner.pkl"),
            )
            save_lora(
                state.trainable["lora"], spec, os.path.join(out, "lora_weights.pkl"),
                n_text=mcfg.text_layers, n_vision=mcfg.vision_layers,
            )
            logger.info("epoch %d: saved test_pkl artifacts (val %.2f)", epoch, acc_val)

    return {"steps": step_count, "best_val_acc": best_acc, "out_dir": cfg.stage2.out_dir}
