"""Loss unit tests: HiFiC dynamic lambda switching, per-rate lists, GAN loss
shapes, distortion scaling."""

import numpy as np
import pytest

import jax.numpy as jnp

from crdr_tpu.losses import build_loss


def test_hific_rate_loss_switches_on_qbpp():
    loss = build_loss({"type": "HificRateLoss", "lambda_A": 0.05,
                       "lambda_B": 0.015625, "target_rate": 1.5})
    bpp = jnp.asarray([1.0])
    above = float(loss(bpp, qbpp=jnp.asarray([2.0])))
    below = float(loss(bpp, qbpp=jnp.asarray([1.0])))
    assert above == pytest.approx(0.05)
    assert below == pytest.approx(0.015625)


def test_hific_rate_loss_validates_lambdas():
    with pytest.raises(AssertionError):
        build_loss({"type": "HificRateLoss", "lambda_A": 0.01,
                    "lambda_B": 0.05, "target_rate": 1.0})


def test_hific_variable_rate_loss_indexes_by_rate():
    loss = build_loss({
        "type": "HificVariableRateLoss",
        "lambda_A": [3.4, 1.3, 0.4], "lambda_B": 0.015625,
        "target_rate": [0.0, 0.0, 0.0],
    })
    bpp = jnp.asarray([1.0])
    qbpp = jnp.asarray([0.5])  # above all targets -> lambda_A
    for i, expect in enumerate([3.4, 1.3, 0.4]):
        v = float(loss(bpp, qbpp, rate_ind=jnp.asarray([float(i)])))
        assert v == pytest.approx(expect)


def test_variable_rate_loss_checks_monotonic():
    with pytest.raises(AssertionError):
        build_loss({"type": "HificVariableRateLoss",
                    "lambda_A": [1.0, 2.0, 3.0],  # must be descending
                    "lambda_B": 0.01, "target_rate": [0.1, 0.2, 0.3]})


def test_schedule_mults():
    loss = build_loss({
        "type": "HificRateLoss", "lambda_A": 0.05, "lambda_B": 0.01,
        "target_rate": 1.5,
        "lambda_schedule": {"vals": [2.0, 1.0], "steps": [500]},
    })
    assert loss.schedule_mults(100) == (2.0, 1.0)
    assert loss.schedule_mults(600) == (1.0, 1.0)


def test_mse_loss_scaling():
    loss = build_loss({"type": "MSELoss", "loss_weight": 150})
    real = jnp.zeros((1, 4, 4, 3))
    fake = jnp.full((1, 4, 4, 3), 2.0 / 255 * 2)  # ~2 uint8 steps apart
    # [-1,1] -> [0,1]: diff halves
    expect = 150 * (2.0 / 255) ** 2
    assert float(loss(real, fake)) == pytest.approx(expect, rel=1e-5)


def test_vanilla_gan_loss_modes():
    loss = build_loss({"type": "VanillaGANLoss", "loss_weight": 0.001})
    x = jnp.asarray([0.0, 2.0, -2.0])
    # D-side is unweighted, G-side weighted
    d = float(loss(x, is_real=True, is_disc=True))
    g = float(loss(x, is_real=True, is_disc=False))
    assert g == pytest.approx(d * 0.001, rel=1e-6)
    # bce(0, 1) = log(2)
    z = float(loss(jnp.asarray([0.0]), is_real=True, is_disc=True))
    assert z == pytest.approx(np.log(2), rel=1e-5)


def test_hinge_gan_loss():
    loss = build_loss({"type": "HingeGANLoss", "loss_weight": 1.0})
    x = jnp.asarray([0.5])
    assert float(loss(x, is_real=True, is_disc=True)) == pytest.approx(0.5)
    assert float(loss(x, is_real=False, is_disc=True)) == pytest.approx(1.5)
    assert float(loss(x, is_real=True, is_disc=False)) == pytest.approx(-0.5)


def test_msssim_loss_zero_for_identical():
    loss = build_loss({"type": "MSSSIMLoss", "loss_weight": 1.0})
    img = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 170, 170, 3))
                      .astype(np.float32))
    assert float(loss(img, img)) == pytest.approx(0.0, abs=1e-4)
