"""CoOp-style text prompt tuning (the reference ``VLPromptLearner``,
``/root/reference/slow_pace.py:110-205``).

Four learnable context vectors are initialized from the token embeddings of
``"a photo of a"`` (``slow_pace.py:124-131``); per-class prompts are
assembled as ``[SOT-embedding, ctx, classname-suffix-embedding]``
(``slow_pace.py:180-194``) and run through the text tower via
``encode_text_embeddings`` (the reference's ``TextEncoder``,
``slow_pace.py:828-848``).

Functional split: ``ctx`` is the only trainable leaf; prefix/suffix/token
ids are frozen buffers computed once at init.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jcf_tpu.models.clip import CLIPConfig, encode_text_embeddings
from jcf_tpu.tokenizer import tokenize


class PromptLearner(NamedTuple):
    ctx: jax.Array  # [n_ctx, text_width] — TRAINABLE
    token_prefix: jax.Array  # [C, 1, text_width] (SOT embedding, frozen)
    token_suffix: jax.Array  # [C, 77-1-n_ctx, text_width] (frozen)
    tokenized: jax.Array  # [C, 77] int32 prompt token ids (frozen)


def init_prompt_learner(
    clip_params: dict,
    cfg: CLIPConfig,
    classnames: List[str],
    ctx_init: str = "a photo of a",
    n_ctx: int = 4,
) -> PromptLearner:
    token_embedding = np.asarray(clip_params["text"]["token_embedding"])

    init_ids = tokenize(ctx_init)[0]  # [77]
    ctx = jnp.asarray(token_embedding[init_ids[1 : 1 + n_ctx]])

    names = [name.replace("_", " ") for name in classnames]
    prompts = [f"{ctx_init} {name}." for name in names]
    tokenized = tokenize(prompts, truncate=True)  # [C, 77]
    embedding = token_embedding[tokenized]  # [C, 77, tw]

    return PromptLearner(
        ctx=ctx,
        token_prefix=jnp.asarray(embedding[:, :1, :]),
        token_suffix=jnp.asarray(embedding[:, 1 + n_ctx :, :]),
        tokenized=jnp.asarray(tokenized),
    )


def build_prompt_embeddings(learner: PromptLearner, ctx: Optional[jax.Array] = None) -> jax.Array:
    """[C, 77, tw] prompt embeddings with the (possibly updated) ctx spliced
    in (``slow_pace.py:180-205``)."""
    ctx = learner.ctx if ctx is None else ctx
    c = learner.token_prefix.shape[0]
    ctx_expanded = jnp.broadcast_to(ctx[None], (c,) + ctx.shape)
    return jnp.concatenate(
        [learner.token_prefix, ctx_expanded, learner.token_suffix], axis=1
    )


def prompt_text_features(
    clip_params: dict,
    cfg: CLIPConfig,
    learner: PromptLearner,
    ctx: Optional[jax.Array] = None,
    *,
    dtype=jnp.float32,
    impl: Optional[str] = None,
    lora_ctx: Optional[dict] = None,
    remat: bool = False,
) -> jax.Array:
    """Prompt-tuned class text features [C, embed_dim] (un-normalized)."""
    emb = build_prompt_embeddings(learner, ctx)
    eot = jnp.argmax(learner.tokenized, axis=-1)
    return encode_text_embeddings(
        clip_params, cfg, emb, eot, dtype=dtype, impl=impl, lora_ctx=lora_ctx,
        remat=remat,
    )
