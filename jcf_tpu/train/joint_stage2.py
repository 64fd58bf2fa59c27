"""Stage-2 joint training: prompts + VPT + LoRA + both heads, one jitted step.

Reference loop (``/root/reference/slow_pace.py:1611-1695``), losses at
:1660-1688:

  sim_ce     = CE(100 * img @ prompt_text^T, target)
  L_SCL      = KL(log_sm(cos) || log_sm(zs_logits)) / numel
             + L1(text_features, text_zs) + L1(img_features, zs_feats[idx])
  lp_ce      = CE(logit_norm(channel_lp(cat(img_feats_nograd, text_bank))),
                  cat(target, arange(C)))          [text-as-samples]
  loss_aux   = CE(logit_norm(moco_adapter(moco(images))), target)
  loss       = sim_ce + L_SCL + lp_ce + loss_aux

Faithful quirks preserved: the channel-LP branch re-encodes the images in
a second stop-gradient forward and feeds UN-normalized features
(``slow_pace.py:1666-1671``); zs logits come from the cached MTA feature
bank indexed by dataset row (``slow_pace.py:1658``); CLIP and MoCo
normalizations are applied on device (``tfm_clip``/``tfm_moco``,
``slow_pace.py:1273-1274``) so the host ships raw [0,1] pixels once.

Trainables: {lora, ctx, vpt, channel_lp, moco_adapter} — everything else
(CLIP weights, MoCo tower, caches) rides as the ``frozen`` argument tree,
the functional equivalent of the reference's requires_grad masks
(``slow_pace.py:1556-1586``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from jcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD, MOCO_MEAN, MOCO_STD
from jcf_tpu.heads import channel_lp, moco_adapter
from jcf_tpu.models.clip import CLIPConfig, encode_image
from jcf_tpu.models.resnet import resnet50_features
from jcf_tpu.ops.layers import l2_normalize
from jcf_tpu.ops.stats import logit_normalize
from jcf_tpu.peft.lora import LoraSpec, make_lora_context
from jcf_tpu.peft.prompt import PromptLearner, prompt_text_features


class Stage2State(NamedTuple):
    trainable: dict  # {"lora", "ctx", "vpt", "channel_lp", "moco_adapter"}
    opt_state: optax.OptState
    step: jnp.ndarray


def _norm_images(images, mean, std):
    mean = jnp.asarray(mean, images.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(std, images.dtype).reshape(1, 3, 1, 1)
    return (images - mean) / std


def kl_div_logspace(log_p: jnp.ndarray, log_q: jnp.ndarray) -> jnp.ndarray:
    """sum(exp(log_q) * (log_q - log_p)) — the reference's kl_div
    (``slow_pace.py:1171-1178``; target in log space)."""
    return jnp.sum(jnp.exp(log_q) * (log_q - log_p))


def make_stage2_step(
    clip_params: dict,
    cfg: CLIPConfig,
    spec: LoraSpec,
    learner: PromptLearner,
    moco_params: dict,
    zs_image_features: jnp.ndarray,  # [N_train, D] cached MTA features (features_zs1)
    text_features_zs: jnp.ndarray,  # [C, D] zero-shot classifier
    text_banks_zs: jnp.ndarray,  # [n_banks, C, D] per-bank zs text features
    optimizer: optax.GradientTransformation,
    *,
    logit_scale: float = 100.0,
    dtype=jnp.float32,
    impl: Optional[str] = None,
    axis_name: Optional[str] = None,
):
    """Returns (init_state_fn, step_fn, frozen).

    ``frozen`` = (clip_params, moco_params, prompt-learner buffers,
    zs feature cache, zs classifier, zs text banks) and MUST be passed as
    ``step_fn``'s first argument: closed-over trees become jit program
    CONSTANTS — at real scale that embeds ~175M frozen weights plus the
    caches into the lowered program (GBs of StableHLO; see
    lora_stage1.make_stage1_step).
    """
    num_classes = text_features_zs.shape[0]
    # the frozen clip tree must NOT contain the vpt buffer: trainable["vpt"]
    # is typically initialized AS params["visual"]["vpt"], and the same
    # buffer arriving once donated (state) and once not (frozen) is a
    # runtime error ("f(a, donate(a))"); the loss installs the trainable
    # vpt into the tree anyway. Same reason the learner rides ctx-less.
    clip_frozen = dict(clip_params)
    clip_frozen["visual"] = {
        k: v for k, v in clip_params["visual"].items() if k != "vpt"
    }
    frozen = (
        clip_frozen,
        moco_params,
        learner._replace(ctx=jnp.zeros((0,), jnp.float32)),  # buffers only
        zs_image_features,
        text_features_zs,
        text_banks_zs,
    )

    def loss_fn(trainable, frozen, images, targets, index, bank_idx, rng):
        (clip_params, moco_params, learner_frozen, zs_image_features,
         text_features_zs, text_banks_zs) = frozen
        learner = learner_frozen
        rng_v1, rng_v2, rng_t = jax.random.split(rng, 3)
        lora = trainable["lora"]
        vis_ctx = make_lora_context(lora, spec, "vision", cfg.vision_layers, rng=rng_v1)
        txt_ctx = make_lora_context(lora, spec, "text", cfg.text_layers, rng=rng_t)

        # install the trainable VPT tokens into the (frozen) clip tree
        visual = dict(clip_params["visual"])
        visual["vpt"] = trainable["vpt"]
        params = dict(clip_params)
        params["visual"] = visual

        # prompt-tuned text features (TextEncoder path)
        text_raw = prompt_text_features(
            params, cfg, learner, trainable["ctx"], dtype=dtype, impl=impl,
            lora_ctx=txt_ctx, remat=True,
        )
        text_features = l2_normalize(text_raw)

        clip_in = _norm_images(images, CLIP_MEAN, CLIP_STD)
        img_raw = encode_image(params, cfg, clip_in, dtype=dtype, impl=impl,
                               lora_ctx=vis_ctx, remat=True)
        image_features = l2_normalize(img_raw)

        cos = logit_scale * image_features @ text_features.T
        sim_ce = optax.softmax_cross_entropy_with_integer_labels(
            cos.astype(jnp.float32), targets
        ).mean()

        # distillation vs the cached zero-shot features (no grad)
        zs_feats = jax.lax.stop_gradient(zs_image_features[index])
        zs_logits = logit_scale * zs_feats @ text_features_zs.T
        loss_scl_text = jnp.mean(jnp.abs(text_features - text_features_zs))
        loss_scl_image = jnp.mean(jnp.abs(image_features - zs_feats))
        a = jax.nn.log_softmax(cos.astype(jnp.float32), axis=1)
        b = jax.nn.log_softmax(zs_logits.astype(jnp.float32), axis=1)
        l_scl_logits = kl_div_logspace(a, b) / cos.size
        l_scl = l_scl_logits + loss_scl_text + loss_scl_image

        # channel-LP with text-as-samples: second stop-grad forward, raw
        # (un-normalized) features, like the reference
        img_raw2 = jax.lax.stop_gradient(
            encode_image(
                params, cfg, clip_in, dtype=dtype, impl=impl,
                lora_ctx=make_lora_context(lora, spec, "vision", cfg.vision_layers, rng=rng_v2),
                remat=True,
            )
        )
        bank = jax.lax.stop_gradient(text_banks_zs[bank_idx])  # [C, D]
        lp_in = jnp.concatenate([img_raw2.astype(jnp.float32), bank], axis=0)
        lp_out = logit_normalize(channel_lp(trainable["channel_lp"], lp_in))
        lp_targets = jnp.concatenate([targets, jnp.arange(num_classes, dtype=targets.dtype)])
        lp_ce = optax.softmax_cross_entropy_with_integer_labels(lp_out, lp_targets).mean()

        # MoCo auxiliary head over the frozen RN50
        moco_in = _norm_images(images, MOCO_MEAN, MOCO_STD)
        moco_feats = jax.lax.stop_gradient(
            resnet50_features(moco_params, moco_in, dtype=dtype)
        ).astype(jnp.float32)
        moco_out = logit_normalize(moco_adapter(trainable["moco_adapter"], moco_feats))
        loss_aux = optax.softmax_cross_entropy_with_integer_labels(moco_out, targets).mean()

        loss = sim_ce + l_scl + lp_ce + loss_aux
        acc = jnp.mean((jnp.argmax(cos, axis=-1) == targets).astype(jnp.float32))
        metrics = {
            "loss": loss,
            "sim_ce": sim_ce,
            "l_scl": l_scl,
            "lp_ce": lp_ce,
            "loss_aux": loss_aux,
            "acc": acc,
        }
        return loss, metrics

    def init_state(trainable: dict) -> Stage2State:
        return Stage2State(trainable, optimizer.init(trainable), jnp.zeros((), jnp.int32))

    def step_fn(frozen, state: Stage2State, images, targets, index, bank_idx, rng):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.trainable, frozen, images, targets, index, bank_idx, rng
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return Stage2State(trainable, opt_state, state.step + 1), metrics

    return init_state, step_fn, frozen
