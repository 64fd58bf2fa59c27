"""Native C++ image pipeline tests: build, decode parity vs PIL, thread
pool, fallback path."""

import time

import numpy as np
import pytest
from PIL import Image

from jcf_tpu.native import decode_batch, native_available


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(300, 400), (500, 350), (256, 256), (123, 456)]):
        # smooth-ish content so JPEG loss stays small
        base = rng.integers(0, 255, (h // 8 + 1, w // 8 + 1, 3), dtype=np.uint8)
        arr = np.asarray(
            Image.fromarray(base).resize((w, h), Image.BILINEAR), np.uint8
        )
        p = root / f"img_{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_native_builds():
    assert native_available(), "native pipeline failed to build (g++ + libjpeg expected)"


def test_decode_matches_pil(jpegs):
    out = decode_batch(jpegs, resize_to=256, out_size=256)
    assert out.shape == (len(jpegs), 3, 256, 256)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0

    from jcf_tpu.data.transforms import center_crop, resize_short_side

    for i, p in enumerate(jpegs):
        img = Image.open(p).convert("RGB")
        ref = center_crop(resize_short_side(img, 256, Image.BILINEAR), 256)
        ref_arr = np.asarray(ref, np.float32).transpose(2, 0, 1) / 255.0
        diff = np.abs(out[i] - ref_arr)
        # different (but equivalent-class) filters: require close agreement
        assert diff.mean() < 0.02, (i, diff.mean())


def test_fallback_for_non_jpeg(tmp_path, jpegs):
    png = tmp_path / "x.png"
    Image.fromarray(np.zeros((100, 120, 3), np.uint8) + 37).save(png)
    out = decode_batch([str(png), jpegs[0]], resize_to=64, out_size=64)
    assert out.shape == (2, 3, 64, 64)
    np.testing.assert_allclose(out[0], 37.0 / 255.0, atol=1e-3)


def test_batch_threads_consistent(jpegs):
    a = decode_batch(jpegs, n_threads=1)
    b = decode_batch(jpegs, n_threads=4)
    np.testing.assert_array_equal(a, b)
