"""Datasets + a thread-pool host loader producing NHWC float batches.

Reference behavior: src/dataset/utils.py (ImageFolder with train/valid
splits under root/{split}/data, capped at num_images, RandomCrop(256);
TestKodakDataset over a flat dir of PNGs) and the torch DataLoader workers
(train.py:60-76). Here the loader is a plain thread pool feeding numpy
NHWC batches — the TPU gets one host transfer per batch.
"""

from __future__ import annotations

import os
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional

import numpy as np

_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")


def _list_images(root: str) -> List[str]:
    out = [os.path.join(root, f) for f in sorted(os.listdir(root))
           if f.lower().endswith(_EXTS)]
    if not out:
        raise FileNotFoundError(f"no images under {root}")
    return out


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def _random_crop(img: np.ndarray, size: int, rng: random.Random):
    h, w = img.shape[:2]
    if h < size or w < size:  # upscale-pad tiny images by reflection
        ph, pw = max(size - h, 0), max(size - w, 0)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = img.shape[:2]
    top = rng.randint(0, h - size)
    left = rng.randint(0, w - size)
    return img[top:top + size, left:left + size]


class ImageFolder:
    """root/{split}/data/*.png with random 256-crops for training
    (reference: dataset/utils.py:11-53)."""

    def __init__(self, root: str, split: str = "train",
                 patch_size: int = 256, num_images: Optional[int] = None):
        base = os.path.join(root, split, "data")
        if not os.path.isdir(base):
            base = os.path.join(root, split)
        if not os.path.isdir(base):
            base = root
        self.paths = _list_images(base)
        if num_images:
            self.paths = self.paths[:num_images]
        self.patch_size = patch_size

    def __len__(self):
        return len(self.paths)

    def get(self, index: int, rng: random.Random) -> np.ndarray:
        img = _load_image(self.paths[index % len(self.paths)])
        return _random_crop(img, self.patch_size, rng)


class TestImageDataset:
    """Flat directory of test images (reference TestKodakDataset,
    dataset/utils.py:58-74)."""

    def __init__(self, data_dir: str, num_images: Optional[int] = None):
        self.paths = _list_images(data_dir)
        if num_images:
            self.paths = self.paths[:num_images]

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        for p in self.paths:
            yield _load_image(p), p


def data_loader(dataset: ImageFolder, batch_size: int, seed: int = 0,
                steps: Optional[int] = None, num_workers: int = 8
                ) -> Iterator[np.ndarray]:
    """Yields [B, P, P, 3] float32 batches, images loaded in parallel."""
    rng = random.Random(seed)
    pool = ThreadPoolExecutor(max_workers=num_workers)
    order = list(range(len(dataset)))
    rng.shuffle(order)
    pos = 0
    produced = 0
    while steps is None or produced < steps:
        idxs = []
        for _ in range(batch_size):
            if pos >= len(order):
                rng.shuffle(order)
                pos = 0
            idxs.append(order[pos])
            pos += 1
        # draw per-image crop seeds BEFORE dispatching to the pool so batch
        # content is deterministic for a given seed regardless of thread
        # scheduling
        seeds = [rng.random() for _ in idxs]
        crops = list(pool.map(
            lambda args: dataset.get(args[0], random.Random(args[1])),
            zip(idxs, seeds)))
        yield np.stack(crops)
        produced += 1
