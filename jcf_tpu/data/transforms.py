"""Host-side image preprocessing, PIL-faithful where parity demands it.

The reference pipeline (``/root/reference/jclip/clip.py:102-163`` and the
per-script transform stacks): bicubic short-side resize to 256, center crop
224, scale to [0,1], CLIP mean/std normalization; training/TTA uses
torchvision-semantics RandomResizedCrop + horizontal flip. PIL resampling
cannot be bit-matched by XLA resize, so these stay on host (SURVEY.md
§7.1); the TPU pipeline consumes the resulting float arrays.

All randomness flows through explicit ``numpy.random.Generator`` instances
— crop sets are reproducible from a seed, which is how cross-framework
ranking parity is defined (SURVEY.md §7.3).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
MOCO_MEAN = (0.485, 0.456, 0.406)  # slow_pace.py:1274
MOCO_STD = (0.229, 0.224, 0.225)


def resize_short_side(img: Image.Image, size: int, mode=Image.BICUBIC) -> Image.Image:
    """Resize so the short side equals `size` (``jclip/clip.py:102-127``)."""
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    if short == size:
        return img
    new_short, new_long = size, int(size * long / short)
    new_w, new_h = (new_short, new_long) if w <= h else (new_long, new_short)
    return img.resize((new_w, new_h), mode)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def to_chw_array(img: Image.Image) -> np.ndarray:
    """PIL -> float32 [3, H, W] in [0, 1]."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr.transpose(2, 0, 1)


def normalize(arr: np.ndarray, mean=CLIP_MEAN, std=CLIP_STD) -> np.ndarray:
    mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
    std = np.asarray(std, np.float32).reshape(3, 1, 1)
    return (arr - mean) / std


def preprocess_center(
    img: Image.Image,
    size: int = 224,
    resize_to: int = 256,
    apply_normalize: bool = True,
) -> np.ndarray:
    """The reference `_transform2` (resize 256 bicubic -> center crop 224 ->
    [0,1] -> CLIP normalize); `_transform1` with apply_normalize=False."""
    img = center_crop(resize_short_side(img, resize_to, Image.BICUBIC), size)
    arr = to_chw_array(img)
    return normalize(arr) if apply_normalize else arr


class RandomResizedCrop:
    """torchvision-semantics RandomResizedCrop (the contract of jittor's
    ``transform.RandomResizedCrop`` used for TTA crops, ``ood.py:1084-1089``):
    uniform area in `scale`, log-uniform aspect in `ratio`, 10 attempts,
    fallback to the best central fit; bilinear resize to `size`."""

    def __init__(
        self,
        size: int = 224,
        scale: Tuple[float, float] = (0.5, 1.0),
        ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
        interpolation=Image.BILINEAR,
    ):
        self.size = size
        self.scale = scale
        self.ratio = ratio
        self.interpolation = interpolation

    def sample_params(self, width: int, height: int, rng: np.random.Generator):
        """(top, left, h, w) crop box."""
        area = width * height
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        for _ in range(10):
            target_area = area * rng.uniform(self.scale[0], self.scale[1])
            aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
            w = int(round(math.sqrt(target_area * aspect)))
            h = int(round(math.sqrt(target_area / aspect)))
            if 0 < w <= width and 0 < h <= height:
                top = int(rng.integers(0, height - h + 1))
                left = int(rng.integers(0, width - w + 1))
                return top, left, h, w
        # fallback: center crop at the closest valid ratio
        in_ratio = width / height
        if in_ratio < self.ratio[0]:
            w = width
            h = int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            h = height
            w = int(round(h * self.ratio[1]))
        else:
            w, h = width, height
        top = (height - h) // 2
        left = (width - w) // 2
        return top, left, h, w

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        top, left, h, w = self.sample_params(*img.size, rng)
        crop = img.crop((left, top, left + w, top + h))
        return crop.resize((self.size, self.size), self.interpolation)


class TTACropSampler:
    """Seeded sampler of the reference's TTA view set: N RandomResizedCrop
    views with 50% horizontal flips (``ood.py:1084-1089,946-958``),
    optionally normalized.

    Yields a [N, 3, size, size] float32 array per image; the whole stack is
    one device upload and one XLA program downstream.
    """

    def __init__(
        self,
        n_views: int = 512,
        size: int = 224,
        scale: Tuple[float, float] = (0.5, 1.0),
        flip_p: float = 0.5,
        apply_normalize: bool = True,
        seed: int = 0,
    ):
        self.n_views = n_views
        self.crop = RandomResizedCrop(size=size, scale=scale)
        self.flip_p = flip_p
        self.apply_normalize = apply_normalize
        self.seed = seed

    def __call__(self, img: Image.Image, image_index: int = 0) -> np.ndarray:
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, image_index]))
        views = np.empty((self.n_views, 3, self.crop.size, self.crop.size), np.float32)
        for i in range(self.n_views):
            view = self.crop(img, rng)
            if rng.random() < self.flip_p:
                view = view.transpose(Image.FLIP_LEFT_RIGHT)
            arr = to_chw_array(view)
            views[i] = normalize(arr) if self.apply_normalize else arr
        return views
