"""OOD split pipeline — the ``ood.py`` entry point.

Walks TestSetB, runs zero-shot MTA over the TTA crop cloud per image, and
splits paths into base (pred <= 372) vs new classes
(``/root/reference/ood.py:857-883``), writing ``TestSetB_1.txt`` and
``TestSetB_2.txt`` under the dataset root.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from jcf_tpu.config import PipelineConfig
from jcf_tpu.data import walk_test_dir
from jcf_tpu.infer import TTAEngine
from jcf_tpu.infer.predict import OOD_BOUNDARY_PRED
from jcf_tpu.pipelines.common import (
    build_text_weights,
    compute_dtype,
    ensure_templates,
    load_model_for_pipeline,
    serving_mesh,
    stack_center_and_crops,
    tta_loader,
)
from jcf_tpu.utils import Timer, get_logger

logger = get_logger()


def run_ood_split(cfg: PipelineConfig) -> dict:
    params, mcfg = load_model_for_pipeline(cfg)
    templates = ensure_templates(cfg)
    text_weights = build_text_weights(params, mcfg, templates, cfg)

    data = walk_test_dir(cfg.data.test_dir)
    logger.info("OOD split over %d images (%d views/image)", len(data), cfg.tta.n_views)

    mesh = serving_mesh(cfg)
    if mesh is not None:
        logger.info("data-parallel serving over %d devices", mesh.devices.size)

    def build_engine(calibration_images=None):
        return TTAEngine(
            params,
            mcfg,
            dtype=compute_dtype(cfg),
            impl=cfg.runtime.attention_impl,
            n_views=cfg.tta.n_views,
            crop_scale=cfg.tta.crop_scale,
            quant=cfg.runtime.quant,
            mesh=mesh,
            calibration_images=calibration_images,
            static_quant_mode=cfg.runtime.static_quant_mode,
        )

    engine = None if cfg.runtime.static_quant and cfg.tta.device_crops else build_engine()

    base_path = os.path.join(cfg.data.root, "TestSetB_1.txt")
    new_path = os.path.join(cfg.data.root, "TestSetB_2.txt")
    os.makedirs(cfg.data.root, exist_ok=True)

    timer = Timer()
    n_base = n_new = 0
    with open(base_path, "w") as f1, open(new_path, "w") as f2:

        def write_preds(impaths, preds):
            nonlocal n_base, n_new
            for impath, pred in zip(impaths, preds):
                if pred <= OOD_BOUNDARY_PRED:
                    f1.write(impath + "\n")
                    n_base += 1
                else:
                    f2.write(impath + "\n")
                    n_new += 1

        if cfg.tta.device_crops:
            # throughput path (--perf): the host ships ONE square source
            # image per input (native C++ decode when available); crop
            # views are sampled on-chip (PERF.md). Host decode is
            # double-buffered against device compute: chunk N+1 decodes in
            # the native thread pool while chunk N runs on-chip (the JAX
            # dispatch is async; only the final np.asarray blocks).
            from concurrent.futures import ThreadPoolExecutor

            import jax

            from jcf_tpu.native import decode_batch

            key = jax.random.PRNGKey(0)
            bsz = cfg.tta.batch_images
            src = max(cfg.tta.resize_to * mcfg.image_resolution // 224,
                      mcfg.image_resolution)
            chunks = [data[s : s + bsz] for s in range(0, len(data), bsz)]

            def decode(chunk):
                paths = [d.impath for d in chunk]
                return paths, decode_batch(paths, resize_to=src, out_size=src)

            with ThreadPoolExecutor(max_workers=1) as pool:
                fut = pool.submit(decode, chunks[0]) if chunks else None
                for i in range(len(chunks)):
                    with timer.phase("decode_wait"):
                        impaths, images = fut.result()
                    if i + 1 < len(chunks):
                        fut = pool.submit(decode, chunks[i + 1])
                    if engine is None:
                        # static activation quant: calibrate the
                        # per-layer scales on the first decoded batch
                        # (runtime.static_quant)
                        engine = build_engine(calibration_images=images)
                    with timer.phase("tta_batch"):
                        key, sub = jax.random.split(key)
                        modes = engine.features_from_images(
                            jnp.asarray(images), text_weights, sub
                        )
                        logits = engine.logits(modes, text_weights)
                        preds = np.asarray(jnp.argmax(logits, axis=-1))
                    write_preds(impaths, preds)
        else:
            # parity path: seeded host PIL crops (reference crop semantics)
            loader = tta_loader(cfg, data, mcfg, normalize=True)
            for center, crops, _, impaths, _ in loader:
                with timer.phase("tta_batch"):
                    stacked = stack_center_and_crops(center, crops)
                    modes = engine.features_from_crops(stacked, text_weights)
                    logits = engine.logits(modes, text_weights)
                    preds = np.asarray(jnp.argmax(logits, axis=-1))
                write_preds(impaths, preds)

    summary = timer.summary()
    logger.info("OOD split done: %d base / %d new — %s", n_base, n_new, summary)
    return {"n_base": n_base, "n_new": n_new, "base_path": base_path, "new_path": new_path}
