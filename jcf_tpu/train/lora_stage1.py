"""Stage-1 LoRA training: one jitted step, data-parallel ready.

Reference loop (``/root/reference/lora_train_vlp.py:956-1023``): every
batch re-reads a random template bank from disk and re-encodes all 403
class texts through the LoRA'd text tower (gradients flow into the text
LoRA through this path), encodes the image batch through the LoRA'd vision
tower, and minimizes CE over ``100 * img @ text^T``. AdamW 2e-4/wd 1e-2,
no scheduler, 50 epochs.

TPU redesign (SURVEY.md §7.2 step 5): all 8 template banks are tokenized
once up-front into a [8, C, 77] tensor; the per-step bank choice is a
traced index — identical math, no per-batch host I/O. The whole step
(two tower forwards + backward + AdamW update) is ONE XLA program; with a
device mesh the batch shards over the data axis and gradients psum over
ICI (see jcf_tpu.parallel).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from jcf_tpu.models.clip import CLIPConfig, encode_image, encode_text
from jcf_tpu.ops.layers import l2_normalize
from jcf_tpu.peft.lora import LoraSpec, make_lora_context

class Stage1State(NamedTuple):
    lora: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_stage1_step(
    clip_params: dict,
    cfg: CLIPConfig,
    spec: LoraSpec,
    bank_token_ids: jnp.ndarray,  # [n_banks, C, 77]
    optimizer: optax.GradientTransformation,
    *,
    logit_scale: float = 100.0,
    dtype=jnp.float32,
    impl: Optional[str] = None,
    axis_name: Optional[str] = None,
):
    """Returns (init_state_fn, step_fn, frozen).

    step_fn(frozen, state, images [B,3,H,W], targets [B], bank_idx, rng)
      -> (state, metrics dict)
    ``frozen`` is the returned (clip_params, bank_token_ids) pytree and
    MUST be passed as the argument (not closed over): a jit-traced closure
    embeds the ~150M frozen CLIP weights as program CONSTANTS — the
    lowered stage-1 step measured ~1.2 GB of StableHLO, which blows
    compile memory/time (and any compile-payload limit) for zero benefit.
    As a runtime argument the weights are just device buffers.
    When `axis_name` is set the step is shard_map/pmap-compatible:
    gradients are psum-averaged over that axis.
    """
    frozen = (clip_params, bank_token_ids)

    def loss_fn(lora, frozen, images, targets, bank_idx, rng):
        clip_params, bank_token_ids = frozen
        rng_t, rng_v = jax.random.split(rng)
        txt_ctx = make_lora_context(lora, spec, "text", cfg.text_layers, rng=rng_t)
        vis_ctx = make_lora_context(lora, spec, "vision", cfg.vision_layers, rng=rng_v)

        text_ids = bank_token_ids[bank_idx]  # [C, 77]
        # remat: per-layer recompute in backward — the saved attention
        # probabilities of both towers OOM 16 GB HBM at bs 256 otherwise
        emb = encode_text(clip_params, cfg, text_ids, dtype=dtype, impl=impl,
                          lora_ctx=txt_ctx, remat=True)
        # per-template norm -> mean over the single template -> re-norm
        # (lora_train_vlp.py:983-988); with one template both norms compose
        # to a single normalization
        text_features = l2_normalize(l2_normalize(emb))

        img = encode_image(clip_params, cfg, images, dtype=dtype, impl=impl,
                           lora_ctx=vis_ctx, remat=True)
        image_features = l2_normalize(img)

        logits = logit_scale * image_features @ text_features.T
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), targets
        ).mean()
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32))
        return loss, acc

    def init_state(lora: dict) -> Stage1State:
        return Stage1State(lora, optimizer.init(lora), jnp.zeros((), jnp.int32))

    def step_fn(frozen, state: Stage1State, images, targets, bank_idx, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.lora, frozen, images, targets, bank_idx, rng
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            acc = jax.lax.pmean(acc, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        new_state = Stage1State(lora, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc}

    return init_state, step_fn, frozen
