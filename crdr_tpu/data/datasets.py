"""Image datasets (reference src/dataset/*): NHWC float32 [-1,1] batches.

Train transform parity (data_transform.py:19-73): optional scale jitter
(PilRandomResize), random crop (reflect pad if needed), horizontal flip,
normalize to [-1, 1].  Eval: normalize only.

A ``SyntheticImageDataset`` (not in the reference) provides deterministic
procedural images for tests and benchmarks without external data.
"""

from __future__ import annotations

import os
import threading
from glob import glob
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.img_utils import imread, uint8_to_tensor
from ..utils.registry import DATASET_REGISTRY


class BaseImageDataset:
    def __init__(self, img_path_list: List[str], is_train: bool = True,
                 image_size: int = 256,
                 resize_range: Optional[Tuple[float, float]] = None,
                 interpolation: str = "bicubic", seed: Optional[int] = None,
                 uint8_io: bool = False, repeat: int = 1):
        self.img_path_list = img_path_list
        self.is_train = is_train
        self.image_size = image_size
        self.resize_range = resize_range
        self.interpolation = interpolation
        # repeat: virtually oversample a small source set so epochs stay
        # larger than the batch size (each virtual index draws its own rng,
        # so crops/flips differ across repeats)
        self.repeat = max(int(repeat), 1)
        # uint8_io: keep samples as uint8 pixels end to end (crop/flip are
        # exact in uint8 — this matches the reference's PIL pipeline, which
        # transforms uint8 images and converts to tensor last) and let the
        # trainer convert ON DEVICE.  Quarters the per-step host->device
        # upload, which also bounds a host-memory leak in remote-attached
        # TPU transports that retain h2d staging buffers.
        self.uint8_io = uint8_io
        self._seed = seed
        self._lock = threading.Lock()
        self._draws: Dict[int, int] = {}

    def _sample_rng(self, index: int) -> np.random.Generator:
        """Per-sample rng: the multi-worker DataLoader calls __getitem__ from
        a thread pool, and a shared Generator is neither thread-safe nor
        deterministic under scheduling.  Seeding from (dataset seed, index,
        per-index draw count) makes every crop/flip reproducible regardless
        of worker count or thread interleaving, while still varying across
        epochs (the draw count is the epoch number for a sampled-once-per-
        epoch index)."""
        if self._seed is None:
            return np.random.default_rng()
        with self._lock:
            k = self._draws.get(index, 0)
            self._draws[index] = k + 1
        return np.random.default_rng([self._seed, index, k])

    def __len__(self) -> int:
        return len(self.img_path_list) * self.repeat

    def _load(self, index: int) -> np.ndarray:
        path = self.img_path_list[index % len(self.img_path_list)]
        if self.uint8_io:
            import cv2

            bgr = cv2.imread(path, cv2.IMREAD_COLOR)
            if bgr is None:
                raise FileNotFoundError(path)
            return np.ascontiguousarray(bgr[..., ::-1])  # uint8 RGB
        return imread(path)  # [-1,1] HWC

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img = self._load(index)
        if self.is_train:
            img = self._train_transform(img, self._sample_rng(index))
        return {"real_images": img}

    def _train_transform(self, img: np.ndarray,
                         rng: np.random.Generator) -> np.ndarray:
        import cv2

        size = self.image_size
        h, w = img.shape[:2]
        if self.resize_range is not None:
            fmin, fmax = self.resize_range
            min_scale = size / min(h, w)
            lo = max(min_scale, fmin)
            hi = max(lo, fmax)
            scale = rng.uniform(lo, hi)
            interp = cv2.INTER_CUBIC if self.interpolation == "bicubic" \
                else cv2.INTER_LINEAR
            img = cv2.resize(img, (int(w * scale), int(h * scale)),
                             interpolation=interp)
            h, w = img.shape[:2]
        # reflect pad if needed, then random crop
        pad_h = max(size - h, 0)
        pad_w = max(size - w, 0)
        if pad_h or pad_w:
            img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            h, w = img.shape[:2]
        top = int(rng.integers(0, h - size + 1))
        left = int(rng.integers(0, w - size + 1))
        img = img[top:top + size, left:left + size]
        if rng.random() < 0.5:
            img = img[:, ::-1]
        if img.dtype == np.uint8:
            return np.ascontiguousarray(img)
        return np.ascontiguousarray(img, np.float32)


@DATASET_REGISTRY.register()
class OpenImageImageDataset(BaseImageDataset):
    """train: {root}/train_{i}/*.jpg over subset_list; eval: validation/*.jpg
    (reference openimage_dataset.py:20-30)."""

    def __init__(self, root_dir: str, subset_list: List[int] = (),
                 is_train: bool = False, image_size: int = 256, **kwargs):
        if is_train:
            paths = []
            for sid in subset_list:
                subset_dir = os.path.join(root_dir, f"train_{sid}")
                assert os.path.exists(subset_dir), \
                    f'openimage subset "train_{sid}" does not exist'
                paths.extend(glob(os.path.join(subset_dir, "*.jpg")))
        else:
            paths = glob(os.path.join(root_dir, "validation", "*.jpg"))
        paths.sort()
        kwargs.pop("name", None)
        super().__init__(paths, is_train, image_size, **kwargs)


@DATASET_REGISTRY.register()
class KodakImageDataset(BaseImageDataset):
    def __init__(self, root_dir: str, is_train: bool = False,
                 image_size: int = 256, **kwargs):
        assert not is_train, "Kodak is eval-only"
        paths = sorted(glob(os.path.join(root_dir, "*.png")))
        super().__init__(paths, is_train, image_size)


@DATASET_REGISTRY.register()
class FolderImageDataset(BaseImageDataset):
    """Generic folder of images (png/jpg), train or eval."""

    def __init__(self, root_dir: str, is_train: bool = False,
                 image_size: int = 256, **kwargs):
        paths = []
        for ext in ("*.png", "*.jpg", "*.jpeg", "*.bmp"):
            paths.extend(glob(os.path.join(root_dir, ext)))
        paths.sort()
        kwargs.pop("name", None)
        super().__init__(paths, is_train, image_size, **kwargs)


@DATASET_REGISTRY.register()
class SyntheticImageDataset(BaseImageDataset):
    """Deterministic procedural images — smooth gradients + texture, so they
    are compressible and exercise the full pipeline without external data."""

    def __init__(self, num_images: int = 32, is_train: bool = True,
                 image_size: int = 256, base_size: int = 320, **kwargs):
        super().__init__([str(i) for i in range(num_images)], is_train,
                         image_size, seed=kwargs.get("seed", 0),
                         uint8_io=kwargs.get("uint8_io", False))
        self.base_size = base_size

    def _load(self, index: int) -> np.ndarray:
        s = self.base_size
        rng = np.random.default_rng(index)
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        img = np.stack([
            np.sin(2 * np.pi * (yy * rng.uniform(0.5, 3) + rng.random())),
            np.cos(2 * np.pi * (xx * rng.uniform(0.5, 3) + rng.random())),
            np.sin(2 * np.pi * ((xx + yy) * rng.uniform(0.5, 2))),
        ], axis=-1)
        img = 0.7 * img + 0.3 * rng.standard_normal((s, s, 3)).astype(np.float32)
        u8 = np.clip((img * 0.25 + 0.5) * 255, 0, 255).astype(np.uint8)
        return u8 if self.uint8_io else uint8_to_tensor(u8)
