"""Zero-shot classifier construction from class templates.

Parity with ``clip_classifier`` (``/root/reference/ood.py:656-675``): for
each class, encode every template sentence, L2-normalize each embedding,
average over templates, re-normalize; stack into [C, D] weights.

TPU-first: instead of the reference's per-class, per-template Python loop
(one text-tower dispatch per sentence), all C*T prompts are tokenized once
and encoded in a handful of batched text-tower calls inside one jit.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jcf_tpu.models.clip import CLIPConfig, encode_text
from jcf_tpu.ops.layers import l2_normalize
from jcf_tpu.tokenizer import tokenize


def encode_class_templates(
    params: dict,
    cfg: CLIPConfig,
    token_ids: jax.Array,
    *,
    batch_size: int = 512,
    dtype=jnp.float32,
    impl: Optional[str] = None,
    quant: Optional[dict] = None,
) -> jax.Array:
    """Encode [C, T, 77] template token ids -> [C, D] classifier weights.

    quant: optional int8 W8A8 weights for the text tower
    (``quantize_clip_params(params)["text"]`` — same scheme the vision
    tower serves with; classifier building is offline so int8 here is a
    memory/latency option, certified by tests/test_quant.py)."""
    c, t, ctx = token_ids.shape
    flat = token_ids.reshape(c * t, ctx)

    chunks = []
    encode = jax.jit(
        lambda ids: l2_normalize(
            encode_text(params, cfg, ids, dtype=dtype, impl=impl, quant=quant)
        )
    )
    for start in range(0, c * t, batch_size):
        chunks.append(encode(flat[start : start + batch_size]))
    emb = jnp.concatenate(chunks, axis=0).reshape(c, t, -1)
    return l2_normalize(jnp.mean(emb, axis=1))


def build_classifier_weights(
    params: dict,
    cfg: CLIPConfig,
    templates: Dict[int, List[str]] | Sequence[List[str]],
    **kwargs,
) -> jax.Array:
    """Classifier weights [C, D] from {class_id: [template strings]}.

    Template counts may differ per class (the reference's dict-of-lists
    allows it); rows are padded by repeating the last template, which leaves
    the per-class mean of distinct embeddings unchanged only when counts are
    equal — for unequal counts we fall back to exact per-class averaging.
    """
    if isinstance(templates, dict):
        items = [templates[k] for k in sorted(templates.keys())]
    else:
        items = list(templates)

    counts = {len(v) for v in items}
    if len(counts) == 1:
        t = counts.pop()
        ids = np.stack(
            [tokenize(v, context_length=cfg.context_length, truncate=True) for v in items]
        )  # [C, T, ctx]
        return encode_class_templates(params, cfg, jnp.asarray(ids), **kwargs)

    # ragged fallback: exact math, one batched encode over all sentences
    flat: List[str] = [s for v in items for s in v]
    ids = jnp.asarray(tokenize(flat, context_length=cfg.context_length, truncate=True))
    dtype = kwargs.get("dtype", jnp.float32)
    impl = kwargs.get("impl")
    emb = l2_normalize(encode_text(params, cfg, ids, dtype=dtype, impl=impl,
                                   quant=kwargs.get("quant")))
    weights = []
    offset = 0
    for v in items:
        weights.append(l2_normalize(jnp.mean(emb[offset : offset + len(v)], axis=0)))
        offset += len(v)
    return jnp.stack(weights)
