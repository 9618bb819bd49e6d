"""Checkerboard space-channel context model: training forward and full codec
round-trip (anchors-then-non-anchors stream ordering)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crdr_tpu.models import build_comp_model
from crdr_tpu.subnet.context_model.checkerboard import (anchor_mask,
                                                        merge_checkerboard,
                                                        split_checkerboard)
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def cb_opt():
    opt = tiny_opt()
    opt.subnet.context_model = {
        "type": "ElicCheckerboardCharmContextModel",
        "num_slices": 4, "hyper_out_ch": 64, "bottleneck_y": 32,
        "max_support_slices": 2,
    }
    return opt


def test_checkerboard_split_merge_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 6, 8, 4)),
                    jnp.float32)
    a1, a2, na1, na2 = split_checkerboard(x)
    back = merge_checkerboard(a1, a2, na1, na2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    m = np.asarray(anchor_mask(6, 8))
    assert m[0, 0] == 1 and m[0, 1] == 0 and m[1, 0] == 0 and m[1, 1] == 1
    assert m.sum() == 24


@pytest.fixture(scope="module")
def cb_model():
    model = build_comp_model(cb_opt())
    model.init_params(input_size=64)
    model.codec_setup()
    return model


def test_checkerboard_forward(cb_model):
    x = np.random.default_rng(1).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    out = cb_model.run_model(x, is_train=True)
    assert out["fake_images"].shape == x.shape
    assert np.all(np.isfinite(out["bpp"]))


def test_checkerboard_codec_roundtrip(cb_model):
    x = np.random.default_rng(2).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = cb_model.compress(x, rate_ind=1.0)
    fake, z_hat, y_hat = cb_model.decompress(enc["string_list"], beta=0.5)
    np.testing.assert_allclose(z_hat, enc["z_hat"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_hat, enc["y_hat"], rtol=1e-4, atol=1e-4)
    assert fake.shape == (1, 64, 64, 3)
    real_bits = len(enc["string_list"][2]) * 8
    assert real_bits < enc["pred_y_bit"] * 1.2 + 300


def test_checkerboard_low_precision_chain_roundtrips():
    """With the cb encode replaying the decoder's phase executables, a
    low-precision codec chain is bitstream-safe for the checkerboard family
    too (the former `highest`-only guard is gone): compress/decompress must
    reproduce the encoder latents bit-exactly."""
    opt = cb_opt()
    opt["codec_precision"] = "default"
    model = build_comp_model(opt)
    model.init_params(input_size=64)
    model.codec_setup()
    x = np.random.default_rng(31).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = model.compress(x, rate_ind=1.0)
    fake, _, y_hat = model.decompress(enc["string_list"], beta=0.5)
    np.testing.assert_array_equal(np.asarray(y_hat),
                                  np.asarray(enc["y_hat"]))
    assert np.all(np.isfinite(fake))
