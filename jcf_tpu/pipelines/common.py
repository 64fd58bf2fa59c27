"""Shared pipeline plumbing: model loading, text classifiers, TTA loaders."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from jcf_tpu.config import PipelineConfig
from jcf_tpu.data import (
    DataLoader,
    TTACropSampler,
    TTADataset,
    load_class_templates,
    synthesize_templates,
)
from jcf_tpu.models import load_clip
from jcf_tpu.models.clip import CLIPConfig
from jcf_tpu.tta import build_classifier_weights
from jcf_tpu.utils import get_logger

logger = get_logger()


def serving_mesh(cfg: PipelineConfig):
    """A 1-D data-parallel mesh over all visible devices for the serving
    pipelines (SURVEY.md §2.5), or None when DP is off / single-device."""
    import jax

    if not cfg.runtime.data_parallel or jax.device_count() <= 1:
        return None
    from jcf_tpu.parallel import make_mesh

    return make_mesh(axis=cfg.runtime.mesh_axis)


def compute_dtype(cfg: PipelineConfig):
    return jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jnp.float32


def load_model_for_pipeline(cfg: PipelineConfig, prompted: bool = False):
    """(params, model_cfg) — ``clip.load`` / ``clip1.load_vlp`` equivalent."""
    kwargs = {}
    path = cfg.runtime.clip_checkpoint
    params, mcfg = load_clip(path, **kwargs)
    if prompted and mcfg.vision_prompt_tokens == 0:
        # IVLP design_details (jclip/clip1.py:199-205): 4 visual prompt
        # tokens, initialized fresh (std 0.02) as in model1.py:161-164
        import dataclasses

        mcfg = dataclasses.replace(mcfg, vision_prompt_tokens=4)
        rng = np.random.default_rng(0)
        params["visual"]["vpt"] = jnp.asarray(
            (0.02 * rng.standard_normal((4, mcfg.vision_width))).astype(np.float32)
        )
    return params, mcfg


def ensure_templates(cfg: PipelineConfig) -> Dict[int, List[str]]:
    """Load the template bank directory, synthesizing it when missing (the
    reference assets are absent from the snapshot — SURVEY.md §7.3)."""
    tdir = cfg.data.template_dir
    if not os.path.isdir(tdir) or not os.listdir(tdir):
        logger.info("template dir %s missing — synthesizing from %s", tdir, cfg.data.classes_file)
        synthesize_templates(cfg.data.classes_file, tdir, cfg.data.captions_file)
    return load_class_templates(tdir)


def _classifier_cache_key(params, mcfg, templates, cfg) -> str:
    """Content key for the built text classifier: text-tower weight bytes
    + template texts + model config + compute dtype. Hashing the actual
    weights (not a checkpoint path) makes stale-cache reuse impossible."""
    import hashlib

    import jax

    h = hashlib.sha256()
    h.update(repr(mcfg).encode())
    h.update(str(cfg.runtime.compute_dtype).encode())
    h.update(str(cfg.runtime.attention_impl).encode())
    for cid in sorted(templates.keys()):
        h.update(str(cid).encode())
        for s in templates[cid]:
            h.update(s.encode())
    # one batched device_get: leaf-by-leaf np.asarray pays a device
    # round-trip per leaf (~20 s for the B/32 text tower through the
    # axon tunnel); fetching the whole tree at once pipelines it
    host_text = jax.device_get(params["text"])
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(host_text)[0],
        key=lambda kv: str(kv[0]),
    ):
        h.update(str(path).encode())
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:16]


def build_text_weights(
    params: dict,
    mcfg: CLIPConfig,
    templates: Dict[int, List[str]],
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Zero-shot classifier weights, with a content-keyed disk cache.

    Building the 403-class classifier costs minutes per invocation (every
    template through the text tower); a serving deployment pays it once.
    This is the reference's own feature-cache idea
    (``/root/reference/slow_pace.py:1498``) applied to serving: the built
    weights persist under ``runtime.classifier_cache`` keyed by the text
    tower's actual bytes + templates + config (VERDICT r3 #7)."""
    import time as _time

    t0 = _time.perf_counter()
    cache_dir = cfg.runtime.classifier_cache
    path = None
    if cache_dir:
        key = _classifier_cache_key(params, mcfg, templates, cfg)
        path = os.path.join(cache_dir, f"text_classifier_{key}.npy")
        if os.path.exists(path):
            # stored f32 (numpy has no bfloat16 — a raw np.save of a bf16
            # array round-trips as void '|V2' and jnp.asarray rejects it)
            w = jnp.asarray(np.load(path)).astype(compute_dtype(cfg))
            logger.info(
                "text classifier cache HIT: %s (%.2fs)",
                path, _time.perf_counter() - t0,
            )
            return w
    w = build_classifier_weights(
        params, mcfg, templates, dtype=compute_dtype(cfg), impl=cfg.runtime.attention_impl
    )
    logger.info(
        "text classifier built in %.1fs (cache %s)",
        _time.perf_counter() - t0, "miss" if cache_dir else "disabled",
    )
    if path is not None:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, np.asarray(w.astype(jnp.float32)))
        os.replace(tmp, path)
        logger.info("text classifier cached: %s", path)
    return w


def tta_loader(
    cfg: PipelineConfig,
    data,
    mcfg: CLIPConfig,
    normalize: bool = True,
    crop_scale: Optional[Tuple[float, float]] = None,
) -> DataLoader:
    """Loader yielding (center, crops, label, impath, index) batches sized
    for the model's input resolution."""
    size = mcfg.image_resolution
    sampler = TTACropSampler(
        n_views=cfg.tta.n_views,
        size=size,
        scale=crop_scale or cfg.tta.crop_scale,
        apply_normalize=normalize,
        seed=0,
    )
    # center preprocess sized to the model resolution
    from jcf_tpu.data.transforms import preprocess_center

    class _SizedTTADataset(TTADataset):
        def __getitem__(self, index):
            d = self.data[index]
            from jcf_tpu.data.datasets import read_image

            img = read_image(d.impath)
            center = preprocess_center(
                img,
                size=size,
                resize_to=max(cfg.tta.resize_to * size // 224, size),
                apply_normalize=normalize,
            )
            crops = self.crop_sampler(img, index)
            return center[None], crops, d.label, d.impath, index

    sized = _SizedTTADataset(data, sampler, center_normalize=normalize)
    return DataLoader(
        sized,
        batch_size=cfg.tta.batch_images,
        num_workers=cfg.data.num_workers,
        shuffle=False,
    )


def stack_center_and_crops(center: np.ndarray, crops: np.ndarray) -> jnp.ndarray:
    """[B,1,3,s,s] + [B,N,3,s,s] -> [B, N+1, 3, s, s] with the center view
    first (``ood.py:868-872``)."""
    return jnp.asarray(np.concatenate([center, crops], axis=1))
