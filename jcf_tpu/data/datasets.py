"""Dataset records and split readers.

Parity with the reference ``JtDataset`` family (``/root/reference/
ood.py:911-1034``): labeled ``"path label"`` splits grouped by class,
unlabeled path lists, a recursive TestSetB directory walk skipping
``__MACOSX``, a classes.txt name<->label map, and the few-shot subsampler
(which, as in the reference, keeps all entries when the split is already
few-shot — ``ood.py:1016-1034`` never actually truncates; we add real
subsampling behind ``strict_shots=True``).

Host IO uses bounded retries instead of the reference's infinite retry
loop (``ood.py:720-740``; SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import numpy as np
from PIL import Image

from jcf_tpu.data.transforms import TTACropSampler, preprocess_center


@dataclasses.dataclass
class Datum:
    impath: str
    label: int
    classname: str
    domain: str


def read_image(path: str, retries: int = 3, backoff: float = 0.1) -> Image.Image:
    """PIL read with bounded retry on transient IO errors."""
    if not os.path.exists(path):
        raise IOError(f"No file exists at {path}")
    last_err: Optional[Exception] = None
    for attempt in range(retries):
        try:
            return Image.open(path).convert("RGB")
        except IOError as e:  # pragma: no cover - transient IO
            last_err = e
            time.sleep(backoff * (2**attempt))
    raise IOError(f"Cannot read image from {path}") from last_err


def read_classnames(classes_path: str) -> Dict[str, int]:
    """classes.txt lines '"<Domain>_<name> <label>"' -> name->label map."""
    out: Dict[str, int] = {}
    with open(classes_path) as f:
        for line in f:
            if not line.strip():
                continue
            classname, label = line.strip().split()
            out[classname] = int(label)
    return out


def label_to_classname(classname_to_label: Dict[str, int]) -> Dict[int, str]:
    return {v: k for k, v in classname_to_label.items()}


def read_labeled_split(
    split_path: str,
    image_dir: str = "",
    classname_of: Optional[Callable[[int], str]] = None,
    group_by_class: bool = True,
) -> List[Datum]:
    """'path label' lines; grouped by class to match the reference's
    class-ordered iteration (``ood.py:975-985``)."""
    classname_of = classname_of or (lambda label: "Unknown")
    grouped: Dict[int, List[Datum]] = defaultdict(list)
    flat: List[Datum] = []
    with open(split_path) as f:
        for line in f:
            if not line.strip():
                continue
            path, label = line.strip().split()
            full = os.path.join(image_dir, path) if image_dir else path
            label = int(label)
            d = Datum(full, label, classname_of(label), os.path.basename(os.path.dirname(full)))
            grouped[label].append(d)
            flat.append(d)
    if group_by_class:
        return [d for label in grouped for d in grouped[label]]
    return flat


def read_path_list(split_path: str, image_dir: str = "") -> List[Datum]:
    """Unlabeled path-per-line list (TestSetB_1/2.txt, ``test.py:1589-1597``)."""
    out: List[Datum] = []
    with open(split_path) as f:
        for line in f:
            if not line.strip():
                continue
            path = line.strip().split()[0]
            full = os.path.join(image_dir, path) if image_dir else path
            out.append(Datum(full, -1, "Unknown", os.path.basename(os.path.dirname(full))))
    return out


def walk_test_dir(test_dir: str) -> List[Datum]:
    """Recursive image walk, skipping __MACOSX (``ood.py:1004-1014``)."""
    out: List[Datum] = []
    for root, _, files in sorted(os.walk(test_dir)):
        for fname in sorted(files):
            if not fname.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            full = os.path.join(root, fname)
            if "__MACOSX" in full:
                continue
            out.append(Datum(full, -1, "Unknown", os.path.basename(root)))
    return out


def generate_fewshot(
    data: List[Datum],
    num_shots: int,
    *,
    strict_shots: bool = False,
    seed: int = 0,
    write_split_to: Optional[str] = None,
) -> List[Datum]:
    """Class-grouped dataset; optionally truly subsample to `num_shots`
    per class (the reference keeps everything, ``ood.py:1021-1032``)."""
    by_class: Dict[int, List[Datum]] = defaultdict(list)
    for d in data:
        by_class[d.label].append(d)
    rng = np.random.default_rng(seed)
    out: List[Datum] = []
    for label in by_class:
        datums = by_class[label]
        if strict_shots and len(datums) > num_shots:
            idx = rng.choice(len(datums), size=num_shots, replace=False)
            datums = [datums[i] for i in sorted(idx)]
        out.extend(datums)
    if write_split_to:
        with open(write_split_to, "w") as f:
            for d in out:
                f.write(f"{d.impath} {d.label}\n")
    return out


class TrainDataset:
    """(image [3,224,224], label, index) samples with a per-sample seeded
    RandomResizedCrop+flip transform."""

    def __init__(
        self,
        data: List[Datum],
        transform: Callable[[Image.Image, np.random.Generator], np.ndarray],
        seed: int = 0,
    ):
        self.data = data
        self.transform = transform
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int):
        d = self.data[index]
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch, index]))
        img = read_image(d.impath)
        return self.transform(img, rng), d.label, index


class TTADataset:
    """(center [1,3,224,224], crops [N,3,224,224], label, impath, index) —
    the reference test-mode __getitem__ (``ood.py:946-958``) with a
    configurable crop count (512 in the reference; BASELINE measures 8)."""

    def __init__(
        self,
        data: List[Datum],
        crop_sampler: TTACropSampler,
        center_normalize: bool = True,
    ):
        self.data = data
        self.crop_sampler = crop_sampler
        self.center_normalize = center_normalize

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int):
        d = self.data[index]
        img = read_image(d.impath)
        center = preprocess_center(img, apply_normalize=self.center_normalize)
        crops = self.crop_sampler(img, index)
        return center[None], crops, d.label, d.impath, index
