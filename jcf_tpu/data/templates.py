"""Class-template management.

The reference globs a ``text_template/`` directory of files
``text_template{1..8}.txt`` — 403 lines each, line *i* = a caption for
class *i* (``/root/reference/ood.py:89-119``). Those files are absent from
the snapshot (SURVEY.md §7.3), so this module both loads an existing
directory with the same semantics and synthesizes an equivalent template
bank from ``classes.txt`` prompt patterns (the in-repo evidence:
``class_caption.txt`` and the IMAGENET_TEMPLATES list, ``test.py:43-50``).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

# Eight prompt patterns -> eight template files, mirroring the reference's
# IMAGENET_TEMPLATES (test.py:43-50) plus two common CLIP prompts.
TEMPLATE_PATTERNS = [
    "a photo of a {}.",
    "a photo of the {}.",
    "a sketch of a {}.",
    "a sketch of the {}.",
    "an image of a {}.",
    "an image of the {}.",
    "a bright photo of a {}.",
    "a good photo of a {}.",
]


def _clean_classname(raw: str) -> str:
    """'Animal_Giant_panda' -> 'Giant panda' (domain prefix dropped,
    underscores to spaces)."""
    parts = raw.split("_", 1)
    name = parts[1] if len(parts) == 2 else parts[0]
    return name.replace("_", " ")


def load_class_templates(template_dir: str) -> Dict[int, List[str]]:
    """All *.txt files in the directory; line i of each file is one template
    for class i (``ood.py:89-101``)."""
    out: Dict[int, List[str]] = {}
    for path in sorted(glob.glob(os.path.join(template_dir, "*.txt"))):
        with open(path) as f:
            for i, line in enumerate(f):
                out.setdefault(i, []).append(line.strip())
    return out


def load_template_file(template_dir: str, idx: int) -> Dict[int, List[str]]:
    """One bank: text_template{idx}.txt (``slow_pace.py:1221-1235``)."""
    out: Dict[int, List[str]] = {}
    with open(os.path.join(template_dir, f"text_template{idx}.txt")) as f:
        for i, line in enumerate(f):
            out[i] = [line.strip()]
    return out


def synthesize_templates(
    classes_file: str,
    out_dir: str,
    captions_file: Optional[str] = None,
    n_banks: int = 8,
) -> None:
    """Write text_template{1..n}.txt from classes.txt patterns; bank 1 can
    optionally use LLM captions (class_caption.txt covers base classes)."""
    names: List[str] = []
    with open(classes_file) as f:
        for line in f:
            if line.strip():
                names.append(_clean_classname(line.strip().split()[0]))

    captions: List[str] = []
    if captions_file and os.path.exists(captions_file):
        with open(captions_file) as f:
            captions = [line.strip() for line in f if line.strip()]

    os.makedirs(out_dir, exist_ok=True)
    for bank in range(1, n_banks + 1):
        pattern = TEMPLATE_PATTERNS[(bank - 1) % len(TEMPLATE_PATTERNS)]
        path = os.path.join(out_dir, f"text_template{bank}.txt")
        with open(path, "w") as f:
            for i, name in enumerate(names):
                if bank == 1 and i < len(captions):
                    f.write(captions[i] + "\n")
                else:
                    f.write(pattern.format(name) + "\n")
