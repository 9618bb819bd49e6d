"""Metric tests: MS-SSIM sanity vs known properties, FID patch protocol and
Frechet distance math, LPIPS architecture shape checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from crdr_tpu.metrics.fid import (compute_fid, crop_hific_fid_patches,
                                  fid_from_image_lists, frechet_distance,
                                  mean_pool_extractor)
from crdr_tpu.utils.img_utils import calc_ms_ssim, ms_ssim


def test_ms_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 180, 200, 3)).astype(np.float32)
    val = float(ms_ssim(jnp.asarray(x), jnp.asarray(x)).mean())
    assert val == pytest.approx(1.0, abs=1e-4)


def test_ms_ssim_orders_degradations():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 180, 200, 3)).astype(np.float32)
    small = np.clip(x + rng.normal(0, 0.01, x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    v_small = float(ms_ssim(jnp.asarray(x), jnp.asarray(small)).mean())
    v_big = float(ms_ssim(jnp.asarray(x), jnp.asarray(big)).mean())
    assert 1.0 > v_small > v_big


def test_calc_ms_ssim_range_conversion():
    x = np.zeros((170, 190, 3), np.float32)  # [-1,1] domain
    assert calc_ms_ssim(x, x) == pytest.approx(1.0, abs=1e-4)


def test_hific_patch_crop_counts():
    img = np.zeros((512, 768, 3), np.uint8)
    patches = crop_hific_fid_patches(img, 256)
    # grid: 2x3 = 6; shifted (384x640): 1x2 = 2
    assert patches.shape == (8, 256, 256, 3)
    # small image: only shifted grid may vanish
    img2 = np.zeros((256, 256, 3), np.uint8)
    assert crop_hific_fid_patches(img2, 256).shape[0] == 1


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(2)
    f = rng.standard_normal((500, 16))
    mu, s = f.mean(0), np.cov(f, rowvar=False)
    assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-6)


def test_fid_separates_distributions():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((400, 8))
    b = rng.standard_normal((400, 8)) + 2.0
    near = rng.standard_normal((400, 8)) * 1.01
    assert compute_fid(a, b) > compute_fid(a, near)


def test_fid_from_image_lists_pipeline():
    rng = np.random.default_rng(4)
    reals = [rng.integers(0, 255, (300, 300, 3), dtype=np.uint8)
             for _ in range(4)]
    fakes = [np.clip(r.astype(int) + rng.integers(-20, 20, r.shape), 0, 255)
             .astype(np.uint8) for r in reals]
    val_noisy = fid_from_image_lists(reals, fakes, mean_pool_extractor,
                                     patch_size=128, batch_size=16)
    val_same = fid_from_image_lists(reals, reals, mean_pool_extractor,
                                    patch_size=128, batch_size=16)
    assert val_same == pytest.approx(0.0, abs=1e-6)
    assert val_noisy > val_same


def test_lpips_shapes():
    from crdr_tpu.metrics.lpips import LPIPSAlex, init_lpips

    mod = LPIPSAlex()
    variables = init_lpips()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    y = jnp.ones((2, 64, 64, 3), jnp.float32) * 0.5
    d = mod.apply(variables, x, y)
    assert d.shape == (2,)
    d0 = mod.apply(variables, x, x)
    np.testing.assert_allclose(np.asarray(d0), 0.0, atol=1e-6)


def test_ms_ssim_never_exceeds_one():
    """Per-pixel SSIM/CS terms are mathematically <= 1 for ANY real inputs
    (2ab+c <= a^2+b^2+c), so MS-SSIM must stay <= 1 up to float noise.
    Guards the blur-precision pin in _gaussian_blur (bf16 TPU convs made
    full-res pairs report 1.02+)."""
    import numpy as np

    from crdr_tpu.utils.img_utils import calc_ms_ssim

    rng = np.random.default_rng(0)
    for _ in range(4):
        r = rng.uniform(-1, 1, (180, 260, 3)).astype(np.float32)
        f = np.clip(r + rng.normal(0, rng.uniform(0.001, 0.2), r.shape)
                    .astype(np.float32), -1, 1)
        v = calc_ms_ssim(r, f)
        assert v <= 1.0 + 1e-5, v
        assert 0.0 <= v
