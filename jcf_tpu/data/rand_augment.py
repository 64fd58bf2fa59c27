"""RandAugment (FixMatch-style PIL op pools) — capability parity with the
reference's ``rand_augments.py`` (220 LoC, defined but not wired into the
live pipeline; SURVEY.md §2.6). Seeded via explicit numpy Generators like
every other transform in this framework.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

PARAMETER_MAX = 10


def _scale(level: int, max_value: float) -> float:
    return level * max_value / PARAMETER_MAX


def _scale_int(level: int, max_value: int) -> int:
    return int(level * max_value / PARAMETER_MAX)


def autocontrast(img, _level, _rng):
    return ImageOps.autocontrast(img)


def brightness(img, level, _rng):
    return ImageEnhance.Brightness(img).enhance(0.1 + _scale(level, 1.8))


def color(img, level, _rng):
    return ImageEnhance.Color(img).enhance(0.1 + _scale(level, 1.8))


def contrast(img, level, _rng):
    return ImageEnhance.Contrast(img).enhance(0.1 + _scale(level, 1.8))


def equalize(img, _level, _rng):
    return ImageOps.equalize(img)


def identity(img, _level, _rng):
    return img


def posterize(img, level, _rng):
    return ImageOps.posterize(img, 8 - _scale_int(level, 4))


def rotate(img, level, rng):
    degrees = _scale(level, 30)
    if rng.random() < 0.5:
        degrees = -degrees
    return img.rotate(degrees)


def sharpness(img, level, _rng):
    return ImageEnhance.Sharpness(img).enhance(0.1 + _scale(level, 1.8))


def shear_x(img, level, rng):
    v = _scale(level, 0.3)
    if rng.random() < 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0))


def shear_y(img, level, rng):
    v = _scale(level, 0.3)
    if rng.random() < 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0))


def solarize(img, level, _rng):
    return ImageOps.solarize(img, 256 - _scale_int(level, 256))


def translate_x(img, level, rng):
    v = _scale(level, 0.3) * img.size[0]
    if rng.random() < 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0))


def translate_y(img, level, rng):
    v = _scale(level, 0.3) * img.size[1]
    if rng.random() < 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v))


# FixMatch augmentation pool
FIXMATCH_POOL: List[Callable] = [
    autocontrast, brightness, color, contrast, equalize, identity,
    posterize, rotate, sharpness, shear_x, shear_y, solarize,
    translate_x, translate_y,
]


class RandAugment:
    """Apply `n` ops drawn from the pool at magnitude <= `m`."""

    def __init__(self, n: int = 2, m: int = 10, pool: Optional[List[Callable]] = None):
        self.n = n
        self.m = m
        self.pool = pool or FIXMATCH_POOL

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        ops = rng.choice(len(self.pool), size=self.n, replace=False)
        for idx in ops:
            level = int(rng.integers(1, self.m + 1))
            img = self.pool[idx](img, level, rng)
        return img


class CutoutAbs:
    """Square cutout of absolute size (gray fill), as in FixMatch."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        w, h = img.size
        x = int(rng.uniform(0, w))
        y = int(rng.uniform(0, h))
        x0, y0 = max(0, x - self.size // 2), max(0, y - self.size // 2)
        x1, y1 = min(w, x0 + self.size), min(h, y0 + self.size)
        img = img.copy()
        img.paste((127, 127, 127), (x0, y0, x1, y1))
        return img
