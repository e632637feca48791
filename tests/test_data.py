"""Data pipeline tests: ImageDataset transforms, loader, grid utilities."""

import numpy as np
import pytest
from PIL import Image

from muse_maskgit_pytorch_tpu.training.data import (
    DataLoader,
    ImageDataset,
    cycle,
    make_grid,
    save_image,
    split_dataset,
    to_pil_images,
)


@pytest.fixture
def image_folder(tmp_path):
    rng = np.random.default_rng(0)
    for i, (w, h) in enumerate([(40, 30), (64, 64), (30, 50), (100, 20)]):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img{i}.png")
    (tmp_path / "sub").mkdir()
    Image.fromarray(rng.integers(0, 255, (25, 25, 3), dtype=np.uint8)).save(
        tmp_path / "sub" / "nested.jpg"
    )
    # grayscale image: must be RGB-converted
    Image.fromarray(rng.integers(0, 255, (30, 30), dtype=np.uint8), mode="L").save(
        tmp_path / "gray.jpeg"
    )
    return tmp_path


def test_dataset_glob_and_shapes(image_folder):
    ds = ImageDataset(image_folder, image_size=16)
    assert len(ds) == 6  # recursive, all three extensions
    for i in range(len(ds)):
        img = ds[i]
        assert img.shape == (16, 16, 3)
        assert img.dtype == np.float32
        assert 0 <= img.min() and img.max() <= 1


def test_dataloader_batches(image_folder):
    ds = ImageDataset(image_folder, image_size=16)
    dl = DataLoader(ds, batch_size=2, shuffle=True)
    batches = list(dl)
    assert len(batches) == 3
    assert all(b.shape == (2, 16, 16, 3) for b in batches)


def test_cycle_infinite(image_folder):
    ds = ImageDataset(image_folder, image_size=8)
    it = cycle(DataLoader(ds, batch_size=3, shuffle=False))
    for _ in range(5):
        assert next(it).shape == (3, 8, 8, 3)


def test_split_dataset(image_folder):
    ds = ImageDataset(image_folder, image_size=8)
    train, valid = split_dataset(ds, valid_frac=0.34, seed=42)
    assert len(train) + len(valid) == len(ds)
    assert len(valid) == 2
    # deterministic under the same seed (reference seed=42 split)
    train2, valid2 = split_dataset(ds, valid_frac=0.34, seed=42)
    assert valid.indices == valid2.indices


def test_make_grid_layout():
    imgs = np.random.default_rng(0).uniform(size=(4, 8, 8, 3)).astype(np.float32)
    grid = make_grid(imgs, nrow=2, padding=2)
    assert grid.shape == (2 * 10 + 2, 2 * 10 + 2, 3)


def test_save_image_and_pil(tmp_path):
    imgs = np.random.default_rng(0).uniform(size=(2, 8, 8, 3)).astype(np.float32)
    save_image(imgs[0], tmp_path / "x.png")
    loaded = np.asarray(Image.open(tmp_path / "x.png"))
    assert loaded.shape == (8, 8, 3)

    pils = to_pil_images(imgs)
    assert len(pils) == 2 and pils[0].size == (8, 8)


def test_prefetch_iterator_order_and_exhaustion():
    from muse_maskgit_pytorch_tpu.training.data import prefetch_iterator

    out = list(prefetch_iterator(iter(range(20)), size=3))
    assert out == list(range(20))
    # size=0 falls back to the plain iterator
    assert list(prefetch_iterator(iter(range(5)), size=0)) == list(range(5))


def test_prefetch_iterator_propagates_exceptions():
    from muse_maskgit_pytorch_tpu.training.data import prefetch_iterator

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch_iterator(boom(), size=2)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="producer failed"):
        next(it)


def test_prefetch_iterator_abandonment_stops_producer():
    import itertools
    import time

    from muse_maskgit_pytorch_tpu.training.data import prefetch_iterator

    produced = []

    def infinite():
        for i in itertools.count():
            produced.append(i)
            yield i

    it = prefetch_iterator(infinite(), size=2)
    assert next(it) == 0
    it.close()  # consumer walks away; bounded-timeout puts observe the stop flag
    time.sleep(1.2)
    n = len(produced)
    time.sleep(0.8)
    assert len(produced) == n  # producer made no further progress
