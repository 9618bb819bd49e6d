"""Multi-worker DataLoader: ordering, determinism, and concurrency."""

import numpy as np
import pytest

from crdr_tpu.data import DataLoader, build_dataset
from crdr_tpu.utils.config import ConfigDict


def _ds(n=16, train=False):
    return build_dataset(ConfigDict({
        "name": "", "type": "SyntheticImageDataset", "num_images": n,
        "image_size": 64, "base_size": 64}), is_train=train)


def test_multiworker_matches_single_worker_order():
    """Eval samples are index-deterministic; worker count must not change
    batch order or contents."""
    ds = _ds()
    b1 = list(DataLoader(ds, batch_size=4, num_workers=1))
    b8 = list(DataLoader(ds, batch_size=4, num_workers=8))
    assert len(b1) == len(b8) == 4
    for x, y in zip(b1, b8):
        np.testing.assert_array_equal(x["real_images"], y["real_images"])


def test_multiworker_shuffle_deterministic_by_seed():
    ds = _ds()
    a = list(DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                        num_workers=8))
    b = list(DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                        num_workers=8))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["real_images"], y["real_images"])


def test_train_transforms_threadsafe():
    """Random-crop transforms under concurrent decode: every sample has the
    right shape/dtype/range (per-sample rng, no crashes or races)."""
    ds = _ds(n=32, train=True)
    batches = list(DataLoader(ds, batch_size=8, shuffle=True, seed=0,
                              num_workers=8, drop_last=True))
    assert len(batches) == 4
    for b in batches:
        x = b["real_images"]
        assert x.shape == (8, 64, 64, 3) and x.dtype == np.float32
        assert x.min() >= -1.0 and x.max() <= 1.0


def test_train_crops_deterministic_across_worker_counts():
    """Crop/flip randomness derives from (seed, index, draw) — the batches a
    trainer sees must not depend on the worker count or thread scheduling
    (this is what makes DP-vs-single trajectory comparisons exact)."""
    def run(workers):
        from crdr_tpu.utils.config import ConfigDict
        from crdr_tpu.data import build_dataset

        ds = build_dataset(ConfigDict({
            "name": "", "type": "SyntheticImageDataset", "num_images": 16,
            "image_size": 48, "base_size": 64, "seed": 5}), is_train=True)
        return [b["real_images"] for b in
                DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                           num_workers=workers, drop_last=True)]

    for a, b in zip(run(1), run(8)):
        np.testing.assert_array_equal(a, b)


def test_prefetch_bounded():
    """The loader keeps at most `prefetch` assembled batches queued (no
    unbounded memory growth on a slow consumer)."""
    ds = _ds(n=32)
    loader = DataLoader(ds, batch_size=4, num_workers=4, prefetch=2)
    it = iter(loader)
    first = next(it)
    assert first["real_images"].shape[0] == 4
    # drain the rest; generator cleanup must not deadlock
    rest = list(it)
    assert len(rest) == 7


def test_uint8_io_matches_float_pipeline():
    """uint8_io ships uint8 crops; converting with the uint8_to_tensor
    formula must reproduce the float pipeline exactly."""
    from crdr_tpu.utils.config import ConfigDict
    from crdr_tpu.utils.img_utils import uint8_to_tensor

    common = {"name": "", "type": "SyntheticImageDataset", "num_images": 6,
              "image_size": 48, "base_size": 64, "seed": 4}
    ds_f = build_dataset(ConfigDict(common), is_train=True)
    ds_u = build_dataset(ConfigDict({**common, "uint8_io": True}),
                         is_train=True)
    for i in range(len(ds_f)):
        a = ds_f[i]["real_images"]
        b = ds_u[i]["real_images"]
        assert b.dtype == np.uint8
        np.testing.assert_array_equal(uint8_to_tensor(b), a)


def test_dataset_repeat_oversampling(tmp_path):
    """`repeat` virtually oversamples a tiny source set (3 images < batch 8)
    with distinct per-virtual-index crops; an un-repeated tiny dataset makes
    the loader fail loudly instead of raising inside cycle()."""
    import cv2

    from crdr_tpu.data.datasets import FolderImageDataset
    from crdr_tpu.data.loader import DataLoader

    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"im{i}.png"),
                    rng.integers(0, 256, (80, 96, 3), np.uint8))

    ds = FolderImageDataset(str(tmp_path), is_train=True, image_size=32,
                            seed=0, repeat=16)
    assert len(ds) == 48
    a = ds[0]["real_images"]
    b = ds[3]["real_images"]  # same source image (3 % 3 == 0), new rng draw
    assert a.shape == (32, 32, 3)
    assert not np.array_equal(a, b)

    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=2, seed=0)
    batch = next(iter(loader))
    assert batch["real_images"].shape == (8, 32, 32, 3)

    tiny = FolderImageDataset(str(tmp_path), is_train=True, image_size=32)
    empty = DataLoader(tiny, batch_size=8, drop_last=True)
    with pytest.raises(ValueError, match="empty loader"):
        next(iter(empty))
