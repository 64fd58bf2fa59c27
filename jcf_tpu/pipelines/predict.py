"""Final prediction pipeline — the ``test.py`` entry point.

Flow (``/root/reference/test.py:1798-1849``):
1. zs model = base CLIP + stage-1 LoRA (merged)
2. prompted model = IVLP CLIP loaded from ``test_pkl/clip_model.pkl``
   (includes trained VPT) + stage-2 LoRA; prompt ctx from
   ``test_pkl/PromptLearner.pkl``; heads from their pkls
3. evaluate_base over TestSetB_1: three text classifiers, per image 513
   crop-forwards on two towers, three MTA solves, ensemble — emitted
   prediction is top-5 of ``cs1`` (``test.py:1738``)
4. evaluate_new over TestSetB_2: pristine zero-shot CLIP MTA top-5
5. dict-merge + filename cleanup -> ``final_results/result.txt``
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from jcf_tpu.config import PipelineConfig
from jcf_tpu.data import read_path_list
from jcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD, MOCO_MEAN, MOCO_STD
from jcf_tpu.heads import channel_lp, moco_adapter
from jcf_tpu.infer import TTAEngine
from jcf_tpu.infer.predict import (
    combine_lp_logits,
    ensemble_base_logits,
    process_result_lines,
    update_txt_file,
    write_top5,
)
from jcf_tpu.models.loader import load_state_dict_file, config_from_state_dict, params_from_state_dict
from jcf_tpu.models.resnet import moco_params_from_state_dict, resnet50_features
from jcf_tpu.ops.layers import l2_normalize
from jcf_tpu.ops.stats import logit_normalize
from jcf_tpu.peft import init_prompt_learner, load_lora, merge_lora_params, prompt_text_features
from jcf_tpu.pipelines.common import (
    build_text_weights,
    compute_dtype,
    ensure_templates,
    load_model_for_pipeline,
    serving_mesh,
    stack_center_and_crops,
    tta_loader,
)
from jcf_tpu.pipelines.train_lora import lora_spec_from_config
from jcf_tpu.data.datasets import label_to_classname
from jcf_tpu.data import read_classnames
from jcf_tpu.utils import get_logger, load_pytree

logger = get_logger()


def run_predict(cfg: PipelineConfig, results_dir: str = "final_results") -> dict:
    spec = lora_spec_from_config(cfg)
    dtype = compute_dtype(cfg)
    impl = cfg.runtime.attention_impl
    out_dir = cfg.stage2.out_dir

    # --- zs tower: base CLIP + stage-1 LoRA (optionally folder-averaged
    # SWA, the reference's load_lora_swa capability — test.py:736-816)
    params_zs, mcfg_zs = load_model_for_pipeline(cfg, prompted=False)
    lora_kwargs = dict(
        n_text=mcfg_zs.text_layers, text_width=mcfg_zs.text_width,
        n_vision=mcfg_zs.vision_layers, vision_width=mcfg_zs.vision_width,
    )
    if cfg.stage1.swa_dir:
        from jcf_tpu.peft import load_lora_swa

        lora1 = load_lora_swa(cfg.stage1.swa_dir, spec, **lora_kwargs)
    else:
        lora1 = load_lora(cfg.stage1.save_path, spec, **lora_kwargs)
    params_zs_merged = merge_lora_params(params_zs, lora1, spec)

    # --- prompted tower: stage-2 checkpoint (with VPT) + stage-2 LoRA
    sd = load_state_dict_file(os.path.join(out_dir, "clip_model.pkl"))
    mcfg = config_from_state_dict(sd)
    params = params_from_state_dict(sd, mcfg)
    lora2 = load_lora(
        os.path.join(out_dir, "lora_weights.pkl"), spec,
        n_text=mcfg.text_layers, text_width=mcfg.text_width,
        n_vision=mcfg.vision_layers, vision_width=mcfg.vision_width,
    )
    params_merged = merge_lora_params(params, lora2, spec)

    # --- pristine zero-shot CLIP for the "new" split (test.py:1825)
    params_ori, mcfg_ori = load_model_for_pipeline(cfg, prompted=False)

    # --- heads
    channel_params = load_pytree(os.path.join(out_dir, "channel.pkl"))
    adapter_params = load_pytree(os.path.join(out_dir, "moco_adapter.pkl"))
    prompt_state = load_pytree(os.path.join(out_dir, "PromptLearner.pkl"))
    moco_sd = load_state_dict_file(cfg.stage2.moco_checkpoint)
    moco_params = moco_params_from_state_dict(moco_sd)

    templates = ensure_templates(cfg)
    classname_map = read_classnames(cfg.data.classes_file)
    l2c = label_to_classname(classname_map)
    classnames = [l2c[i] for i in sorted(l2c)]

    # --- three text classifiers (test.py:1677-1686)
    text_hand = build_text_weights(params_merged, mcfg, templates, cfg)
    text_zs = build_text_weights(params_zs_merged, mcfg_zs, templates, cfg)
    learner = init_prompt_learner(params, mcfg, classnames, cfg.stage2.ctx_init, cfg.stage2.n_ctx)
    ctx = jnp.asarray(prompt_state["ctx"])
    pt_feats = l2_normalize(
        prompt_text_features(params_merged, mcfg, learner, ctx, dtype=dtype, impl=impl)
    )
    text_pt = l2_normalize((text_hand + pt_feats) / 2)

    mesh = serving_mesh(cfg)
    if mesh is not None:
        logger.info("data-parallel serving over %d devices", mesh.devices.size)
    # runtime.quant applies to the crop towers here too (the dominant
    # cost: 513 crop-forwards x 2 towers per image, test.py:1705-1713);
    # the certified int8 serving mode is opt-in like in the OOD pipeline
    quant = cfg.runtime.quant
    engine_pt = TTAEngine(params_merged, mcfg, dtype=dtype, impl=impl,
                          n_views=cfg.tta.n_views, mesh=mesh, quant=quant)
    engine_zs = TTAEngine(params_zs_merged, mcfg_zs, dtype=dtype, impl=impl,
                          n_views=cfg.tta.n_views, mesh=mesh, quant=quant)
    engine_ori = TTAEngine(params_ori, mcfg_ori, dtype=dtype, impl=impl,
                           n_views=cfg.tta.n_views, mesh=mesh, quant=quant)

    moco_fn = jax.jit(lambda x: resnet50_features(moco_params, x, dtype=dtype))

    clip_mean = np.asarray(CLIP_MEAN, np.float32).reshape(1, 1, 3, 1, 1)
    clip_std = np.asarray(CLIP_STD, np.float32).reshape(1, 1, 3, 1, 1)
    moco_mean = np.asarray(MOCO_MEAN, np.float32).reshape(1, 3, 1, 1)
    moco_std = np.asarray(MOCO_STD, np.float32).reshape(1, 3, 1, 1)

    # ---------------- base split (test.py:1675-1747) ----------------
    base_rows: List[Tuple[str, np.ndarray]] = []
    base_list = os.path.join(cfg.data.root, "TestSetB_1.txt")
    data1 = read_path_list(base_list)
    # stage-2-style loaders ship raw pixels; normalization on device
    loader1 = tta_loader(cfg, data1, mcfg, normalize=False, crop_scale=(0.2, 1.0))
    for center, crops, _, impaths, _ in loader1:
        stacked = np.concatenate([center, crops], axis=1)
        clip_in = jnp.asarray((stacked - clip_mean) / clip_std)

        # encode the crop cloud ONCE per tower, then solve MTA per
        # classifier (the reference does the same: one encode, three
        # solves — /root/reference/test.py:1705-1710); bit-identical to
        # features_from_crops but halves the dominant ViT cost
        feats_pt = engine_pt.crop_features(clip_in)
        mode_pt = engine_pt.mta_from_features(feats_pt, text_pt)
        mode_hand = engine_pt.mta_from_features(feats_pt, text_hand)
        mode_zs = engine_zs.features_from_crops(clip_in, text_zs)
        combine = (mode_pt + mode_hand) / 2

        lp_combined = channel_lp(channel_params, combine)
        lp_zs = channel_lp(channel_params, mode_zs)
        lp_logits = combine_lp_logits(lp_combined, lp_zs)

        moco_in = jnp.asarray((stacked[:, 0] - moco_mean) / moco_std)
        moco_logits = logit_normalize(moco_adapter(adapter_params, moco_fn(moco_in).astype(jnp.float32)))

        out = ensemble_base_logits(
            mode_hand, mode_pt, mode_zs, text_hand, text_pt, text_zs,
            lp_logits, moco_logits,
        )
        top5 = np.asarray(jax.lax.top_k(out["cs1"], 5)[1])
        for impath, row in zip(impaths, top5):
            base_rows.append((impath, row))

    os.makedirs(results_dir, exist_ok=True)
    base_txt = os.path.join(results_dir, "top5_results6.txt")
    write_top5(base_txt, base_rows)

    # ---------------- new split (test.py:1749-1785) ----------------
    new_rows: List[Tuple[str, np.ndarray]] = []
    new_list = os.path.join(cfg.data.root, "TestSetB_2.txt")
    data2 = read_path_list(new_list)
    text_zs_ori = build_text_weights(params_ori, mcfg_ori, templates, cfg)
    loader2 = tta_loader(cfg, data2, mcfg_ori, normalize=False, crop_scale=(0.2, 1.0))
    for center, crops, _, impaths, _ in loader2:
        stacked = np.concatenate([center, crops], axis=1)
        clip_in = jnp.asarray((stacked - clip_mean) / clip_std)
        mode = engine_ori.features_from_crops(clip_in, text_zs_ori)
        logits = engine_ori.logits(mode, text_zs_ori)
        top5 = np.asarray(jax.lax.top_k(logits, 5)[1])
        for impath, row in zip(impaths, top5):
            new_rows.append((impath, row))

    ood_txt = os.path.join(results_dir, "top5_results_ood.txt")
    write_top5(ood_txt, new_rows)

    # ---------------- merge + cleanup (test.py:1837-1849) ----------------
    update_txt_file(base_txt, ood_txt)
    result_txt = os.path.join(results_dir, "result.txt")
    process_result_lines(base_txt, result_txt)
    logger.info(
        "predict done: %d base + %d new -> %s", len(base_rows), len(new_rows), result_txt
    )
    return {
        "n_base": len(base_rows),
        "n_new": len(new_rows),
        "result": result_txt,
    }
