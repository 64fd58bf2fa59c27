"""Batch tokenization into fixed-length id arrays for the text tower.

Parity with the reference wrapper (``/root/reference/jclip/clip.py:190-214``):
SOT + ids + EOT, zero-padded to context length 77; over-long inputs either
raise or truncate keeping EOT as the final token. Output is int32 (jittor
used int64; the id range < 2^16 so int32 is lossless and TPU-friendlier).
"""

from __future__ import annotations

from typing import Iterable, List, Union

import numpy as np

from jcf_tpu.tokenizer.bpe import get_tokenizer

CONTEXT_LENGTH = 77
SOT_TOKEN = 49406
EOT_TOKEN = 49407


def tokenize(
    texts: Union[str, Iterable[str]],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = False,
) -> np.ndarray:
    """Tokenize one or more strings into a [N, context_length] int32 array."""
    if isinstance(texts, str):
        texts = [texts]

    tok = get_tokenizer()
    all_ids: List[List[int]] = [
        [tok.sot_token] + tok.encode(text) + [tok.eot_token] for text in texts
    ]

    out = np.zeros((len(all_ids), context_length), dtype=np.int32)
    for row, ids in enumerate(all_ids):
        if len(ids) > context_length:
            if truncate:
                ids = ids[:context_length]
                ids[-1] = tok.eot_token
            else:
                raise RuntimeError(
                    f"Input {texts[row]} is too long for context length {context_length}"
                )
        out[row, : len(ids)] = ids
    return out
