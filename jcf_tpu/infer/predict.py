"""Test-time ensembling, OOD split rule, and result-file writers.

Formula parity with ``evaluate_base`` (``/root/reference/test.py:1675-1747``)
and ``evaluate_new`` (``test.py:1749-1785``); file-format parity with the
reference's writers, including the batch-of-1 list-repr impath quirk
(``test.py:1742``: lines read ``['path'] l1 l2 l3 l4 l5``) that
``process_line`` later strips (``test.py:1788-1796``) to produce
``final_results/result.txt``.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Iterable, List, Tuple

import jax.numpy as jnp
import numpy as np

from jcf_tpu.ops.stats import logit_normalize

OOD_BOUNDARY_PRED = 372  # pred <= 372 -> base (ood.py:880)


def ensemble_base_logits(
    mode_hand: jnp.ndarray,  # MTA mode vs handcrafted prompted-tower text [B, D]
    mode_pt: jnp.ndarray,  # MTA mode vs (handcrafted+prompt-learner)/2 text [B, D]
    mode_zs: jnp.ndarray,  # MTA mode from the zs tower [B, D]
    text_hand: jnp.ndarray,  # [C, D]
    text_pt: jnp.ndarray,  # [C, D]
    text_zs: jnp.ndarray,  # [C, D]
    lp_logits_combined: jnp.ndarray,  # channel_lp((pt+hand)/2 mode), normalized+avg'd
    moco_logits: jnp.ndarray,  # moco head on the center image, normalized
) -> Dict[str, jnp.ndarray]:
    """All ensemble variants cs..cs6 (``test.py:1729-1736``). The emitted
    base prediction is ``cs1`` (``test.py:1738``)."""
    cs = 100.0 * mode_hand @ text_hand.T
    cs1 = 100.0 * mode_pt @ text_pt.T
    cs3 = 100.0 * mode_zs @ text_zs.T
    cs2 = (cs + cs1) / 2
    cs4 = (cs2 + cs3) / 2
    cs5 = cs4 + 0.5 * lp_logits_combined
    cs6 = cs4 + 0.5 * moco_logits
    cs7 = cs4 + 0.25 * (lp_logits_combined + moco_logits)
    return {
        "cs": cs, "cs1": cs1, "cs2": cs2, "cs3": cs3,
        "cs4": cs4, "cs5": cs5, "cs6": cs6, "cs7": cs7,
    }


def combine_lp_logits(logits_combined: jnp.ndarray, logits_zs: jnp.ndarray) -> jnp.ndarray:
    """Channel-LP fusion (``test.py:1715-1722``): normalize each, average,
    normalize again."""
    l1 = logit_normalize(logits_combined)
    l2 = logit_normalize(logits_zs)
    return logit_normalize((l1 + l2) / 2)


def ood_side(pred: int) -> str:
    """'base' when pred <= 372 else 'new' (``ood.py:877-883``)."""
    return "base" if pred <= OOD_BOUNDARY_PRED else "new"


def format_impath(impath: str) -> str:
    """Reproduce the reference's batch-of-1 stringified-list impath."""
    return f"['{impath}']"


def write_top5(path: str, rows: Iterable[Tuple[str, np.ndarray]], reference_format: bool = True) -> None:
    """rows: (impath, top5 label array). reference_format wraps the path in
    the list-repr the reference emits pre-cleanup."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for impath, top5 in rows:
            key = format_impath(impath) if reference_format else impath
            f.write(f"{key} {' '.join(str(int(t)) for t in top5)}\n")


def load_txt_to_dict(path: str) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if parts:
                out[parts[0]] = parts[1:]
    return out


def update_txt_file(base_txt: str, update_txt: str) -> None:
    """Dict-merge keyed by impath; update wins (``test.py:1666-1674``)."""
    base = load_txt_to_dict(base_txt)
    base.update(load_txt_to_dict(update_txt))
    with open(base_txt, "w") as f:
        for key, values in base.items():
            f.write(f"{key} {' '.join(values)}\n")


_LIST_RE = re.compile(r"\['(.*?)'\]")


def process_line(line: str) -> str:
    """Strip the list-repr down to the bare filename (``test.py:1788-1796``)."""
    m = _LIST_RE.search(line)
    if m:
        file_name = m.group(1).split("/")[-1]
        line = line.replace(m.group(0), file_name)
    return line


def process_result_lines(input_file: str, output_file: str) -> None:
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    with open(input_file) as infile, open(output_file, "w") as outfile:
        for line in infile:
            outfile.write(process_line(line))
