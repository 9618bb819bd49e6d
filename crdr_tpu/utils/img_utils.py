"""Image helpers: range conversion, PSNR (uint8-rounded), MS-SSIM, pad/crop, I/O.

Numeric contracts follow the reference (src/utils/img_utils.py): images flow through
the models in [-1, 1]; PSNR is computed on uint8-rounded [0, 255] values
(img_utils.py:102-132); MS-SSIM on [0, 1] with the standard 5-scale weights.
Arrays here are NHWC (TPU-native), unlike the reference's NCHW.
"""

from __future__ import annotations

import os
from typing import Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# range conversion / IO
# ---------------------------------------------------------------------------

def tensor_to_uint8(img) -> np.ndarray:
    """[-1,1] float NHWC/HWC -> uint8 [0,255] with round-half-away like the reference.

    Reference uses ``(img + 1) / 2 * 255`` then round (img_utils.py:102-132).
    """
    arr = np.asarray(img, dtype=np.float64)
    arr = (arr + 1.0) / 2.0 * 255.0
    return np.clip(np.round(arr), 0, 255).astype(np.uint8)


def uint8_to_tensor(arr: np.ndarray) -> np.ndarray:
    """uint8 [0,255] HWC -> float32 [-1,1] (ToTensor + Normalize(0.5, 0.5))."""
    return (arr.astype(np.float32) / 255.0 - 0.5) * 2.0


def imwrite(path: str, img) -> None:
    """Write a [-1,1] float image (HWC or 1HWC) as PNG/JPG via cv2 (BGR)."""
    import cv2

    arr = np.asarray(img)
    if arr.ndim == 4:
        arr = arr[0]
    u8 = tensor_to_uint8(arr)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cv2.imwrite(path, u8[..., ::-1])  # RGB -> BGR


def imread(path: str) -> np.ndarray:
    """Read an image file to [-1,1] float32 HWC (RGB)."""
    import cv2

    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(path)
    return uint8_to_tensor(bgr[..., ::-1])


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def calc_psnr(real, fake, max_val: float = 255.0) -> float:
    """PSNR over uint8-rounded pixels, matching reference semantics."""
    r = tensor_to_uint8(real).astype(np.float64)
    f = tensor_to_uint8(fake).astype(np.float64)
    mse = np.mean((r - f) ** 2)
    if mse == 0:
        return float("inf")
    return float(20 * np.log10(max_val) - 10 * np.log10(mse))


def _fspecial_gauss_1d(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _gaussian_blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian filter on NHWC.

    Precision is pinned to HIGHEST: on TPU the default conv precision is
    bf16, whose ~1e-2 relative error in the blurred moments makes the
    variance estimates inconsistent enough that SSIM/CS terms (mathematically
    <= 1 for any real inputs) overshoot 1 by up to a few percent — observed
    as MS-SSIM "1.0238" on full-resolution Kodak pairs."""
    c = x.shape[-1]
    kh = win.reshape(-1, 1, 1, 1) * jnp.ones((1, 1, 1, c))
    kw = win.reshape(1, -1, 1, 1) * jnp.ones((1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


def _ssim_per_channel(x: jnp.ndarray, y: jnp.ndarray, win: jnp.ndarray,
                      data_range: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _gaussian_blur(x, win)
    mu_y = _gaussian_blur(y, win)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _gaussian_blur(x * x, win) - mu_xx
    sigma_y = _gaussian_blur(y * y, win) - mu_yy
    sigma_xy = _gaussian_blur(x * y, win) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim.mean(axis=(1, 2)), cs.mean(axis=(1, 2))


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
            win_size: int = 11, win_sigma: float = 1.5) -> jnp.ndarray:
    """MS-SSIM on NHWC images in [0, data_range]; 5 scales, standard weights.

    Images too small for 5 scales (min side <= (win_size-1) * 2^4, the same
    bound pytorch_msssim asserts on) use as many scales as fit, with the
    weights renormalized.
    """
    full_weights = jnp.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333],
                             dtype=jnp.float32)
    min_side = min(x.shape[1], x.shape[2])
    feasible = 1
    while feasible < 5 and (min_side // (2 ** feasible)) >= win_size:
        feasible += 1
    weights = full_weights[:feasible]
    weights = weights / jnp.sum(weights)
    win = _fspecial_gauss_1d(win_size, win_sigma)
    levels = feasible
    mcs = []
    ssim_val = None
    for i in range(levels):
        ssim_val, cs = _ssim_per_channel(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            pad_h = x.shape[1] % 2
            pad_w = x.shape[2] % 2
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
                y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                      "VALID") / 4.0
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                      "VALID") / 4.0
    ssim_val = jnp.maximum(ssim_val, 0.0)
    stack = jnp.stack(mcs + [ssim_val], axis=0)  # [levels, N, C]
    out = jnp.prod(stack ** weights[:, None, None], axis=0)
    return out.mean(axis=-1)  # [N]


def calc_ms_ssim(real, fake) -> float:
    """MS-SSIM on [-1,1] inputs converted to [0,1] (reference img_utils.py:135-162)."""
    r = (jnp.asarray(real) + 1.0) / 2.0
    f = (jnp.asarray(fake) + 1.0) / 2.0
    if r.ndim == 3:
        r, f = r[None], f[None]
    return float(ms_ssim(r, f).mean())


# ---------------------------------------------------------------------------
# pad / crop to stride multiples (reference base_model.py:137-167)
# ---------------------------------------------------------------------------

def pad_image(x: np.ndarray, stride: int) -> np.ndarray:
    """Reflect-pad NHWC (or HWC) on bottom/right to multiples of ``stride``."""
    h_axis = x.ndim - 3
    H, W = x.shape[h_axis], x.shape[h_axis + 1]
    pad_h = (-H) % stride
    pad_w = (-W) % stride
    if pad_h == 0 and pad_w == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[h_axis] = (0, pad_h)
    pads[h_axis + 1] = (0, pad_w)
    return np.pad(x, pads, mode="reflect")


def crop_image(x, H: int, W: int):
    """Crop NHWC (or HWC) back to (H, W)."""
    if x.ndim == 4:
        return x[:, :H, :W, :]
    return x[:H, :W, :]
