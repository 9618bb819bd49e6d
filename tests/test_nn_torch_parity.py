"""Parity tests of our NHWC conv primitives against torch (CPU) semantics.

These pin the exact numeric contract needed for reference weight import:
identical geometry and values for Conv2d, ConvTranspose2d (incl. output_padding),
and PixelShuffle channel ordering.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from crdr_tpu.nn import Conv2d, ConvTranspose2d, Dense, pixel_shuffle


def _to_jax_conv_w(tw: "torch.Tensor") -> np.ndarray:
    # torch OIHW -> HWIO
    return tw.detach().numpy().transpose(2, 3, 1, 0)


def _to_jax_convT_w(tw: "torch.Tensor") -> np.ndarray:
    # torch (in, out, kH, kW) -> HWIO, spatially flipped
    w = tw.detach().numpy().transpose(2, 3, 0, 1)
    return w[::-1, ::-1].copy()


@pytest.mark.parametrize("k,s,p", [(5, 2, 2), (3, 1, 1), (1, 1, 0)])
def test_conv2d_matches_torch(k, s, p):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 12, 7)).astype(np.float32)
    tconv = torch.nn.Conv2d(7, 9, k, stride=s, padding=p)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    mod = Conv2d(9, k, s, p)
    params = {"params": {"weight": jnp.asarray(_to_jax_conv_w(tconv.weight)),
                         "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    jy = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,s,p,op,hw", [
    (5, 2, 2, 1, (8, 6)),   # ELIC up_conv
    (5, 2, 2, 1, (7, 5)),   # odd input
    (3, 1, 1, 0, (8, 8)),   # hyperdecoder final conv
])
def test_conv_transpose2d_matches_torch(k, s, p, op, hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *hw, 6)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(6, 5, k, stride=s, padding=p, output_padding=op)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    mod = ConvTranspose2d(5, k, s, p, op)
    params = {"params": {"weight": jnp.asarray(_to_jax_convT_w(tconv.weight)),
                         "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    jy = mod.apply(params, jnp.asarray(x))
    assert jy.shape[1] == (hw[0] - 1) * s - 2 * p + k + op
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-4, atol=1e-5)


def test_dense_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 20)).astype(np.float32)
    tl = torch.nn.Linear(20, 11)
    with torch.no_grad():
        ty = tl(torch.from_numpy(x)).numpy()
    params = {"params": {"weight": jnp.asarray(tl.weight.detach().numpy().T),
                         "bias": jnp.asarray(tl.bias.detach().numpy())}}
    jy = Dense(11).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-5, atol=1e-6)


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 5, 12)).astype(np.float32)
    ty = torch.nn.PixelShuffle(2)(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    jy = pixel_shuffle(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-6, atol=1e-6)
