"""Stage-2 validation: the 8-head ensemble accuracy table
(``/root/reference/slow_pace.py:946-1136``).

Per validation image: both towers encode the TTA crop cloud, three MTA
solves produce hand/prompt/zs mode features, the channel-LP head scores
the per-crop features (normalized then averaged over crops), the MoCo head
scores all crops likewise, and eight logit combinations are scored with
exact top-1 accuracy:

  acc  : 100*hand@text_hand      acc1: 100*pt@text_pt
  acc2 : (cs+cs1)/2              acc3: 100*zs@text_zs
  acc4 : (cs2+cs3)/2             acc5: cs4 + 0.5*lp
  acc6 : cs4 + 0.5*moco          acc7: cs4 + 0.25*(lp+moco)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from jcf_tpu.heads import channel_lp, moco_adapter
from jcf_tpu.models.resnet import resnet50_features
from jcf_tpu.ops.stats import logit_normalize, top_k_accuracy
from jcf_tpu.tta import solve_mta


def evaluate_stage2_ensemble(
    engine_pt,
    engine_zs,
    moco_params: dict,
    channel_params: dict,
    adapter_params: dict,
    text_hand: jnp.ndarray,
    text_pt: jnp.ndarray,
    text_zs: jnp.ndarray,
    loader,
    *,
    clip_mean_std,
    moco_mean_std,
    dtype=jnp.float32,
) -> Dict[str, float]:
    """loader yields raw-pixel (center, crops, labels, impaths, index)
    batches; returns the 8 accuracies keyed acc..acc7."""
    (clip_mean, clip_std), (moco_mean, moco_std) = clip_mean_std, moco_mean_std
    moco_fn = jax.jit(lambda x: resnet50_features(moco_params, x, dtype=dtype))

    sums = {f"acc{i}" if i else "acc": 0.0 for i in range(8)}
    total = 0
    for center, crops, labels, _, _ in loader:
        stacked = np.concatenate([center, crops], axis=1)  # [B, N+1, 3, s, s]
        clip_in = jnp.asarray((stacked - clip_mean) / clip_std)
        b = stacked.shape[0]

        feats_pt = engine_pt.crop_features(clip_in)  # [B, N+1, D] normalized
        feats_zs = engine_zs.crop_features(clip_in)

        mode_pt = jax.vmap(lambda f: solve_mta(f, text_pt))(feats_pt)
        mode_hand = jax.vmap(lambda f: solve_mta(f, text_hand))(feats_pt)
        mode_zs = jax.vmap(lambda f: solve_mta(f, text_zs))(feats_zs)

        # channel-LP over per-crop features, normalized then crop-averaged
        lp = jax.vmap(lambda f: logit_normalize(channel_lp(channel_params, f)).mean(axis=0))(
            feats_pt
        )  # [B, C]

        moco_in = jnp.asarray((stacked - moco_mean) / moco_std)
        flat = moco_in.reshape((-1,) + moco_in.shape[2:])
        moco_feats = moco_fn(flat).astype(jnp.float32)
        moco_feats = moco_feats.reshape(b, -1, moco_feats.shape[-1])
        moco_logits = jax.vmap(
            lambda f: logit_normalize(moco_adapter(adapter_params, f)).mean(axis=0)
        )(moco_feats)

        cs = 100.0 * mode_hand @ text_hand.T
        cs1 = 100.0 * mode_pt @ text_pt.T
        cs3 = 100.0 * mode_zs @ text_zs.T
        cs2 = (cs + cs1) / 2
        cs4 = (cs2 + cs3) / 2
        cs5 = cs4 + 0.5 * lp
        cs6 = cs4 + 0.5 * moco_logits
        cs7 = cs4 + 0.5 * (lp + moco_logits) / 2

        t = jnp.asarray(labels)
        for key, logits in (
            ("acc", cs), ("acc1", cs1), ("acc2", cs2), ("acc3", cs3),
            ("acc4", cs4), ("acc5", cs5), ("acc6", cs6), ("acc7", cs7),
        ):
            sums[key] += float(top_k_accuracy(logits, t, 1)) * b
        total += b

    return {k: v / max(total, 1) for k, v in sums.items()}
