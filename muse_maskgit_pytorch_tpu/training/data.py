"""Image dataset + loader + grid utilities.

Replaces the reference's torchvision data stack (`/root/reference/
muse_maskgit_pytorch/trainers.py:85-113` ImageDataset;
`torchvision.utils.make_grid/save_image` at trainers.py:16,383-387) with a
PIL/numpy pipeline feeding NHWC device arrays. A threaded prefetching loader
stands in for torch's worker-process DataLoader; for token-shard datasets at
scale see the native C++ loader in `native/` (muse_maskgit_pytorch_tpu.
training.shard_loader).
"""

from __future__ import annotations

import random as _random
import threading
import queue
import warnings
from pathlib import Path
from typing import Iterator, List, Sequence

import numpy as np

from PIL import Image, ImageFile

# tolerate truncated files (reference trainers.py:26-27)
ImageFile.LOAD_TRUNCATED_IMAGES = True


class ImageDataset:
    """Recursive glob of jpg/jpeg/png; transform = RGB -> resize (short side)
    -> random horizontal flip -> center crop -> float32 [0,1] NHWC.
    (reference trainers.py:85-113)

    `image_size` may be an int (square, the reference contract) or an
    (H, W) tuple: the image is cover-resized (scaled so both target sides
    are reached) then center-cropped to exactly HxW — the rectangular data
    path for aspect-bucketed training."""

    def __init__(
        self,
        folder,
        image_size,
        exts: Sequence[str] = ("jpg", "jpeg", "png"),
        random_flip: bool = True,
        seed: int = 0,
    ):
        self.folder = folder
        self.image_size = image_size
        self.paths = [p for ext in exts for p in Path(folder).glob(f"**/*.{ext}")]
        self.random_flip = random_flip
        self._rng = _random.Random(seed)
        print(f"{len(self.paths)} training samples found at {folder}")

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> np.ndarray:
        img = Image.open(self.paths[index])
        if img.mode != "RGB":
            img = img.convert("RGB")
        s = self.image_size
        th, tw = (s, s) if isinstance(s, int) else (int(s[0]), int(s[1]))
        # cover-resize: smallest scale that reaches BOTH target sides
        # (square case == torchvision T.Resize(int) short-side semantics)
        w, h = img.size
        scale = max(th / h, tw / w)
        img = img.resize((max(tw, round(w * scale)), max(th, round(h * scale))), Image.BILINEAR)
        if self.random_flip and self._rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        # center crop to (th, tw)
        w, h = img.size
        left, top = (w - tw) // 2, (h - th) // 2
        img = img.crop((left, top, left + tw, top + th))
        return np.asarray(img, np.float32) / 255.0  # (h, w, 3)


class DataLoader:
    """Shuffling batch loader with threaded decode + background prefetch.

    PIL releases the GIL during JPEG/PNG decode, so a thread pool gives real
    decode parallelism (the role of torch DataLoader's worker processes for
    the reference, trainers.py:204-214) without pickling overhead.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        num_workers: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers)

    def __iter__(self) -> Iterator[np.ndarray]:
        from concurrent.futures import ThreadPoolExecutor

        order = list(range(len(self.dataset)))
        rng = _random.Random(self.seed)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def assemble():
            if self.shuffle:
                rng.shuffle(order)
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                # drop_last=False semantics (matches torch DataLoader default,
                # reference trainers.py:202-213): the final partial batch is
                # yielded, so a dataset smaller than batch_size still produces
                # batches instead of hanging cycle() forever.
                for start in range(0, len(order), self.batch_size):
                    chunk = order[start : start + self.batch_size]
                    items = list(pool.map(self.dataset.__getitem__, chunk))
                    q.put(np.stack(items))
            q.put(stop)

        t = threading.Thread(target=assemble, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item


def cycle(dl) -> Iterator:
    """Infinite loader (reference trainers.py:57-60)."""
    while True:
        yield from dl


def prefetch_iterator(it: Iterator, size: int = 2) -> Iterator:
    """Run `it` in a background thread with a bounded queue, so producing the
    next item (host IO, tokenization, frozen-T5 text encoding) overlaps the
    consumer's device step. Exceptions re-raise at the consumer; the producer
    thread stops when the consumer abandons the iterator (bounded-timeout
    puts against a stop flag — no leaked thread pinned on a full queue)."""
    if size <= 0:
        yield from it
        return

    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()
    sentinel = object()

    def put_bounded(x) -> bool:
        """Put with stop-flag checks; False once the consumer walked away."""
        while not stop.is_set():
            try:
                q.put(x, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def run():
        try:
            for x in it:
                if not put_bounded(x):
                    return
            put_bounded(sentinel)
        except BaseException as e:  # surfaced to the consumer
            put_bounded(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            x = q.get()
            if x is sentinel:
                return
            if isinstance(x, BaseException):
                raise x
            yield x
    finally:
        stop.set()
        # join so `close()` on this generator GUARANTEES the producer is no
        # longer touching `it`'s underlying resources (e.g. the native shard
        # loader handle, which the caller frees right after — a timed-out
        # join here would let loader.close() race a live producer into a
        # segfault). put_bounded's 0.5 s put timeout bounds how long the
        # producer needs to observe stop once its current item is produced;
        # the only unbounded wait is `it` itself mid-item (host compute that
        # terminates), so wait for it — loudly if it's slow.
        waited = 0.0
        while True:
            t.join(timeout=15.0)
            if not t.is_alive():
                break
            waited += 15.0
            warnings.warn(
                f"prefetch producer still finishing its current item after "
                f"{waited:.0f}s; waiting (resources it uses stay open until "
                "it exits)",
                stacklevel=2,
            )


def split_dataset(dataset: ImageDataset, valid_frac: float, seed: int = 42):
    """Random train/valid split (reference trainers.py:193-200)."""
    if valid_frac <= 0:
        return dataset, dataset
    idx = list(range(len(dataset)))
    _random.Random(seed).shuffle(idx)
    n_valid = int(len(idx) * valid_frac)
    valid_idx, train_idx = idx[:n_valid], idx[n_valid:]

    class _Subset:
        def __init__(self, ds, indices):
            self.ds, self.indices = ds, indices

        def __len__(self):
            return len(self.indices)

        def __getitem__(self, i):
            return self.ds[self.indices[i]]

    return _Subset(dataset, train_idx), _Subset(dataset, valid_idx)


# ---------------------------------------------------------------------------
# grids / PIL conversion (reference torchvision make_grid/save_image usage)
# ---------------------------------------------------------------------------


def to_pil_images(images) -> List[Image.Image]:
    """(b, h, w, c) float [0,1] -> list of PIL images."""
    arr = np.clip(np.asarray(images, np.float32), 0.0, 1.0)
    arr = (arr * 255).round().astype(np.uint8)
    return [Image.fromarray(a.squeeze()) for a in arr]


def make_grid(images, nrow: int = 2, padding: int = 2, pad_value: float = 0.0) -> np.ndarray:
    """(n, h, w, c) -> single (H, W, c) grid, torchvision layout."""
    arr = np.asarray(images, np.float32)
    n, h, w, c = arr.shape
    ncol = nrow
    nrows = -(-n // ncol)
    H = nrows * (h + padding) + padding
    W = ncol * (w + padding) + padding
    grid = np.full((H, W, c), pad_value, np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = padding + r * (h + padding), padding + col * (w + padding)
        grid[y : y + h, x : x + w] = arr[i]
    return grid


def save_image(image: np.ndarray, path) -> None:
    arr = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
    arr = (arr * 255).round().astype(np.uint8)
    Image.fromarray(arr.squeeze()).save(str(path))
