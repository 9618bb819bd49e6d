"""Unit tests for ELIC/CRDR layers: closed-form semantics of InterpCA, Fourier
embedding, residual blocks, and NLAM attention gating."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crdr_tpu.nn import (ChengNLAM, InterpChAtt, ResidualBottleneckBlocks,
                         UpConv, fourier_embed)


def test_interp_ca_initial_identity_softplus():
    """softplus(log(e-1)) == 1 so a fresh InterpCA is an identity map."""
    mod = InterpChAtt(ch=8, rate_level=5, actv="softplus", use_interp=True,
                      use_bias=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 8)),
                    jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, 0.0)
    y = mod.apply(params, x, 1.5)
    # float32 softplus(log(e-1)) deviates from 1.0 by ~3e-5 (same in torch)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4, atol=1e-4)


def test_interp_ca_interpolation():
    mod = InterpChAtt(ch=4, rate_level=3, actv="identity", use_interp=True,
                      use_bias=True)
    x = jnp.ones((1, 2, 2, 4), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, 0.0)
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.full((3, 4), 0.0, np.float32)
    b[2] = 10.0
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    # integer index picks the row exactly
    y0 = mod.apply(params, x, 1.0)
    np.testing.assert_allclose(np.asarray(y0)[0, 0, 0], w[1], rtol=1e-6)
    # fractional index: alpha = r - ind = 0.25 at ind 1.75
    y1 = mod.apply(params, x, 1.75)
    expect = w[1] * 0.25 + w[2] * 0.75 + b[2] * 0.75
    np.testing.assert_allclose(np.asarray(y1)[0, 0, 0], expect, rtol=1e-6)
    # top index: r is clamped to L-1
    y2 = mod.apply(params, x, 2.0)
    np.testing.assert_allclose(np.asarray(y2)[0, 0, 0], w[2] + 10.0, rtol=1e-6)


def test_interp_ca_rejects_unknown_actv():
    mod = InterpChAtt(ch=2, rate_level=2, actv="nope")
    with pytest.raises(KeyError):
        mod.init(jax.random.PRNGKey(0), jnp.ones((1, 1, 1, 2)), 0.0)


def test_fourier_embed_values():
    # CRDR config: L=10, max_beta=5.12, use_pi=False
    out = fourier_embed(2.56, L=10, max_beta=5.12, use_pi=False)
    assert out.shape == (1, 20)
    # beta = max/2 -> norm = 0 -> sin 0, cos 1
    np.testing.assert_allclose(np.asarray(out)[0, :10], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[0, 10:], 1.0, atol=1e-6)
    out0 = np.asarray(fourier_embed(0.0, L=2, max_beta=5.12, use_pi=False))[0]
    np.testing.assert_allclose(out0, [math.sin(-1), math.sin(-2),
                                      math.cos(-1), math.cos(-2)], rtol=1e-5)


def test_fourier_embed_include_x_and_pi():
    out = np.asarray(fourier_embed(5.12, L=3, max_beta=5.12, use_pi=True,
                                   include_x=True))[0]
    assert out.shape == (7,)
    assert out[0] == 1.0  # norm beta
    np.testing.assert_allclose(out[1:4], [math.sin(math.pi), math.sin(2 * math.pi),
                                          math.sin(4 * math.pi)], atol=1e-5)


def test_residual_blocks_shapes_and_residual():
    mod = ResidualBottleneckBlocks(ch=16, mid_ch=8, num_blocks=3)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 8, 16)),
                    jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(params, x)
    assert y.shape == x.shape
    # zeroed weights -> identity (residual path)
    zeros = jax.tree.map(jnp.zeros_like, params)
    np.testing.assert_allclose(np.asarray(mod.apply(zeros, x)), np.asarray(x))


def test_nlam_zero_weights_identity():
    mod = ChengNLAM(ch=8)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, 4, 8)),
                    jnp.float32)
    params = mod.init(jax.random.PRNGKey(2), x)
    zeros = jax.tree.map(jnp.zeros_like, params)
    # trunk(x)=x (residual blocks with zero weights), gate=sigmoid(0)=0.5
    y = mod.apply(zeros, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 1.5, rtol=1e-6)


@pytest.mark.parametrize("ps", [False, True])
def test_up_conv_doubles_resolution(ps):
    mod = UpConv(out_ch=6, use_pixel_shuffle=ps)
    x = jnp.ones((1, 5, 7, 4), jnp.float32)
    params = mod.init(jax.random.PRNGKey(3), x)
    y = mod.apply(params, x)
    assert y.shape == (1, 10, 14, 6)
