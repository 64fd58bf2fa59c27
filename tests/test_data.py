"""Data layer tests: transforms vs torch semantics, split readers on a tiny
synthetic dataset tree, loader determinism."""

import os

import numpy as np
import pytest
from PIL import Image

from jcf_tpu.data import (
    CLIP_MEAN,
    CLIP_STD,
    DataLoader,
    RandomResizedCrop,
    TTACropSampler,
    TTADataset,
    TrainDataset,
    center_crop,
    generate_fewshot,
    load_class_templates,
    load_template_file,
    normalize,
    preprocess_center,
    read_classnames,
    read_labeled_split,
    read_path_list,
    resize_short_side,
    synthesize_templates,
    to_chw_array,
    walk_test_dir,
)
from jcf_tpu.data.datasets import label_to_classname


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataset")
    rng = np.random.default_rng(0)
    img_dir = root / "TrainSet" / "Animal"
    img_dir.mkdir(parents=True)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        p = img_dir / f"img_{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    (root / "classes.txt").write_text(
        "Animal_cat 0\nAnimal_dog 1\nCar_bmw 2\n"
    )
    with open(root / "train.txt", "w") as f:
        for i, p in enumerate(paths):
            f.write(f"{p} {i % 3}\n")
    # test dir walk incl. __MACOSX poison
    test_dir = root / "TestSetB"
    test_dir.mkdir()
    macosx = root / "TestSetB" / "__MACOSX"
    macosx.mkdir()
    for i in range(3):
        arr = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        Image.fromarray(arr).save(test_dir / f"t_{i}.jpg")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(macosx / "junk.jpg")
    (test_dir / "notes.txt").write_text("not an image")
    return root, paths


def test_resize_center_crop_match_reference_semantics():
    img = Image.fromarray(np.arange(40 * 50 * 3, dtype=np.uint8).reshape(40, 50, 3) % 255)
    r = resize_short_side(img, 256)
    assert min(r.size) == 256
    assert r.size == (320, 256)  # aspect preserved
    c = center_crop(r, 224)
    assert c.size == (224, 224)
    arr = preprocess_center(img)
    assert arr.shape == (3, 224, 224)
    un = preprocess_center(img, apply_normalize=False)
    np.testing.assert_allclose(
        arr,
        normalize(un, CLIP_MEAN, CLIP_STD),
        atol=1e-6,
    )
    assert un.min() >= 0.0 and un.max() <= 1.0


def test_random_resized_crop_seeded_and_in_bounds():
    img = Image.fromarray(np.random.default_rng(1).integers(0, 255, (60, 80, 3), dtype=np.uint8))
    rrc = RandomResizedCrop(size=32, scale=(0.5, 1.0))
    a = rrc(img, np.random.default_rng(42))
    b = rrc(img, np.random.default_rng(42))
    c = rrc(img, np.random.default_rng(43))
    assert a.size == (32, 32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.any(np.asarray(a) != np.asarray(c))
    # crop params always inside the image
    rng = np.random.default_rng(5)
    for _ in range(50):
        top, left, h, w = rrc.sample_params(80, 60, rng)
        assert 0 <= top <= 60 - h and 0 <= left <= 80 - w


def test_tta_sampler_shapes_and_determinism():
    img = Image.fromarray(np.random.default_rng(2).integers(0, 255, (60, 80, 3), dtype=np.uint8))
    sampler = TTACropSampler(n_views=4, size=32, seed=9)
    v1 = sampler(img, image_index=0)
    v2 = sampler(img, image_index=0)
    v3 = sampler(img, image_index=1)
    assert v1.shape == (4, 3, 32, 32)
    np.testing.assert_array_equal(v1, v2)
    assert np.any(v1 != v3)


def test_split_readers(tiny_tree):
    root, paths = tiny_tree
    c2l = read_classnames(str(root / "classes.txt"))
    assert c2l == {"Animal_cat": 0, "Animal_dog": 1, "Car_bmw": 2}
    l2c = label_to_classname(c2l)

    data = read_labeled_split(str(root / "train.txt"), classname_of=l2c.get)
    assert len(data) == 6
    # grouped by class: first two entries are label 0
    assert [d.label for d in data[:2]] == [0, 0]
    assert data[0].classname == "Animal_cat"
    assert data[0].domain == "Animal"

    test_data = walk_test_dir(str(root / "TestSetB"))
    assert len(test_data) == 3  # __MACOSX and notes.txt skipped
    assert all(d.label == -1 for d in test_data)

    with open(root / "paths.txt", "w") as f:
        for d in test_data:
            f.write(d.impath + "\n")
    listed = read_path_list(str(root / "paths.txt"))
    assert [d.impath for d in listed] == [d.impath for d in test_data]


def test_fewshot(tiny_tree):
    root, _ = tiny_tree
    data = read_labeled_split(str(root / "train.txt"))
    all_kept = generate_fewshot(data, num_shots=1)
    assert len(all_kept) == 6  # reference semantics: no truncation
    strict = generate_fewshot(data, num_shots=1, strict_shots=True)
    assert len(strict) == 3
    out = root / "train1.txt"
    generate_fewshot(data, 4, write_split_to=str(out))
    assert out.exists() and len(out.read_text().splitlines()) == 6


def test_train_dataset_and_loader(tiny_tree):
    root, _ = tiny_tree
    data = read_labeled_split(str(root / "train.txt"))
    rrc = RandomResizedCrop(size=32, scale=(0.05, 1.0))

    def tf(img, rng):
        return normalize(to_chw_array(rrc(img, rng)))

    ds = TrainDataset(data, tf, seed=3)
    img, label, idx = ds[0]
    assert img.shape == (3, 32, 32) and idx == 0
    img2, _, _ = ds[0]
    np.testing.assert_array_equal(img, img2)  # same epoch -> same crop
    ds.set_epoch(1)
    img3, _, _ = ds[0]
    assert np.any(img3 != img)  # new epoch -> new crop

    ds.set_epoch(0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    images, labels, idxs = batches[0]
    assert images.shape == (4, 3, 32, 32)
    assert labels.dtype == np.int32
    # deterministic across iterations
    batches2 = list(loader)
    np.testing.assert_array_equal(batches[0][0], batches2[0][0])


def test_tta_dataset(tiny_tree):
    root, _ = tiny_tree
    data = walk_test_dir(str(root / "TestSetB"))
    ds = TTADataset(data, TTACropSampler(n_views=3, size=32, seed=1))
    center, crops, label, impath, idx = ds[0]
    assert center.shape == (1, 3, 224, 224)
    assert crops.shape == (3, 3, 32, 32)
    assert label == -1 and idx == 0
    loader = DataLoader(ds, batch_size=2, num_workers=2)
    center_b, crops_b, labels_b, paths_b, idx_b = next(iter(loader))
    assert center_b.shape == (2, 1, 3, 224, 224)
    assert crops_b.shape == (2, 3, 3, 32, 32)
    assert isinstance(paths_b, list) and len(paths_b) == 2


def test_templates_roundtrip(tiny_tree, tmp_path):
    root, _ = tiny_tree
    out = tmp_path / "text_template"
    synthesize_templates(str(root / "classes.txt"), str(out))
    files = sorted(os.listdir(out))
    assert files == [f"text_template{i}.txt" for i in range(1, 9)]
    templates = load_class_templates(str(out))
    assert len(templates) == 3
    assert len(templates[0]) == 8
    assert "cat" in templates[0][0]
    bank = load_template_file(str(out), 2)
    assert len(bank) == 3 and len(bank[0]) == 1
