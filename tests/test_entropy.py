"""Entropy model tests: likelihood math, STE gradients, CDF tables, and full
compress/decompress round-trips through the C++ rANS coder."""

import numpy as np
import pytest
from scipy.stats import norm

import jax
import jax.numpy as jnp

from crdr_tpu.entropy import (EntropyBottleneck, EntropyBottleneckCodec,
                              GaussianConditionalCodec,
                              GaussianMeanScaleConditional, SteEntropyBottleneck,
                              SteGaussianMeanScaleConditional, build_indexes,
                              gaussian_likelihood, get_scale_table, lower_bound,
                              ste_round)


def test_ste_round_value_and_grad():
    x = jnp.array([0.4, 0.6, -1.2, 2.5])
    np.testing.assert_array_equal(np.asarray(ste_round(x)),
                                  np.asarray(jnp.round(x)))
    g = jax.grad(lambda v: jnp.sum(ste_round(v) ** 2))(x)
    # STE: d/dx round(x) == 1, so grad = 2 * round(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(jnp.round(x)))


def test_lower_bound_grad_rule():
    f = lambda x: jnp.sum(lower_bound(x, 1.0))
    g = jax.grad(f)(jnp.array([0.5, 2.0]))
    np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0])
    # negative incoming grad (pushes x up) passes even below the bound
    g2 = jax.grad(lambda x: -jnp.sum(lower_bound(x, 1.0)))(jnp.array([0.5]))
    np.testing.assert_array_equal(np.asarray(g2), [-1.0])


def test_gaussian_likelihood_matches_closed_form():
    y = jnp.array([0.0, 0.3, -1.7, 4.0])
    mu = jnp.array([0.1, 0.0, -1.0, 0.0])
    sigma = np.array([0.5, 1.0, 2.0, 0.05])
    lik = np.asarray(gaussian_likelihood(y - mu, jnp.asarray(sigma), 0.11))
    s = np.maximum(sigma, 0.11)
    v = np.abs(np.asarray(y) - np.asarray(mu))
    expect = norm.cdf((0.5 - v) / s) - norm.cdf((-0.5 - v) / s)
    # the model floors likelihoods at 1e-9 (f32 underflow territory)
    expect = np.maximum(expect, 1e-9)
    np.testing.assert_allclose(lik, expect, rtol=1e-4, atol=1e-9)


def test_gaussian_conditional_forward_modes():
    mod = SteGaussianMeanScaleConditional(scale_bound=0.11)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
    params = jnp.concatenate([0.3 * jnp.ones_like(y), jnp.ones_like(y)], axis=-1)
    vars_ = mod.init(jax.random.PRNGKey(0), y, params, False)

    # eval: hard rounding around the mean
    y_hat, lik = mod.apply(vars_, y, params, False)
    np.testing.assert_allclose(np.asarray(y_hat),
                               np.round(np.asarray(y) - 0.3) + 0.3, rtol=1e-5)
    assert np.all(np.asarray(lik) > 0)

    # train: STE output, noisy likelihood
    y_hat_t, lik_t = mod.apply(vars_, y, params, True,
                               rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(y_hat_t), np.asarray(y_hat), rtol=1e-5)
    assert not np.allclose(np.asarray(lik_t), np.asarray(lik))


def test_build_indexes_matches_reference_rule():
    table = jnp.asarray(get_scale_table(), jnp.float32)
    scales = jnp.asarray([0.01, 0.11, 0.111, 1.0, 255.0, 256.0, 300.0])
    idx = np.asarray(build_indexes(scales, table, 0.11))
    tab = np.asarray(table)
    # smallest index with table[idx] >= scale (after lower bound); scales above
    # the table max clamp to the last entry
    for s, i in zip(np.maximum(np.asarray(scales), 0.11), idx):
        if s <= tab[-1]:
            assert tab[i] >= s - 1e-6
        if i > 0:
            assert tab[i - 1] < s + 1e-6
    assert idx[-1] == len(tab) - 1  # clamped into the table


def _init_eb(channels=8, ste=False, seed=0):
    cls = SteEntropyBottleneck if ste else EntropyBottleneck
    mod = cls(channels=channels)
    x = jnp.zeros((1, 4, 4, channels), jnp.float32)
    vars_ = mod.init({"params": jax.random.PRNGKey(seed)}, x, False)
    return mod, vars_


def test_entropy_bottleneck_likelihood_sums_to_one():
    """Integer likelihoods over a wide support must sum to ~1 per channel.

    At init the density is logistic-like with scale ~init_scale (10), so the
    support must be much wider than +-30 to capture the mass."""
    mod, vars_ = _init_eb(channels=4)
    xs = jnp.arange(-150, 151, dtype=jnp.float32)
    grid = jnp.tile(xs[None, None, :], (4, 1, 1))
    lik = mod.apply(vars_, grid, method=lambda m, g: m.likelihood(g))
    total = np.asarray(lik).sum(axis=-1)
    np.testing.assert_allclose(total, 1.0, atol=1e-3)


def test_entropy_bottleneck_forward_and_aux_loss():
    mod, vars_ = _init_eb(channels=8, ste=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 4, 8)) * 3,
                    jnp.float32)
    x_hat, lik = mod.apply(vars_, x, True, rng=jax.random.PRNGKey(2))
    assert x_hat.shape == x.shape and lik.shape == x.shape
    # STE output == rounded around median
    med = np.asarray(vars_["params"]["quantiles"])[:, 0, 1]
    np.testing.assert_allclose(np.asarray(x_hat),
                               np.round(np.asarray(x) - med) + med, rtol=1e-4,
                               atol=1e-5)
    aux = mod.apply(vars_, method=lambda m: m.loss())
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_entropy_bottleneck_codec_roundtrip():
    mod, vars_ = _init_eb(channels=8, ste=True)
    codec = EntropyBottleneckCodec(vars_["params"])
    assert codec.update(force=True)
    rng = np.random.default_rng(3)
    z = rng.standard_normal((2, 6, 5, 8)).astype(np.float32) * 4
    strings = codec.compress(z)
    assert len(strings) == 2
    symbols = codec.decompress(strings, (6, 5))
    z_hat = codec.dequantize(symbols)
    med = codec.medians()
    np.testing.assert_allclose(z_hat, np.round(z - med) + med, rtol=1e-5,
                               atol=1e-5)


def test_gaussian_codec_roundtrip_and_bpp_consistency():
    codec = GaussianConditionalCodec(scale_bound=0.11)
    codec.update_scale_table(get_scale_table(), force=True)
    rng = np.random.default_rng(4)
    shape = (1, 16, 16, 32)
    scales = np.exp(rng.uniform(np.log(0.12), np.log(8.0), shape)) \
        .astype(np.float32)
    means = rng.standard_normal(shape).astype(np.float32)
    y = means + rng.normal(0, scales).astype(np.float32)

    indexes = codec.build_indexes(scales)
    strings = codec.compress(y, indexes, means=means)
    y_hat = codec.decompress(strings, indexes, means=means)
    np.testing.assert_allclose(y_hat, np.round(y - means) + means, rtol=1e-4,
                               atol=1e-4)

    # real bits should be close to (and >= slightly below) predicted bits
    lik = np.asarray(gaussian_likelihood(
        jnp.asarray(np.round(y - means)), jnp.asarray(scales), 0.11))
    pred_bits = -np.log2(lik).sum()
    real_bits = len(strings[0]) * 8
    assert real_bits < pred_bits * 1.05 + 200
    assert real_bits > pred_bits * 0.93 - 100


def test_eb_codec_table_load_roundtrip():
    mod, vars_ = _init_eb(channels=4, ste=True)
    codec = EntropyBottleneckCodec(vars_["params"])
    codec.update(force=True)
    codec2 = EntropyBottleneckCodec(vars_["params"])
    codec2.load_tables(codec.quantized_cdf, codec.cdf_length, codec.offset)
    z = np.random.default_rng(5).standard_normal((1, 4, 4, 4)).astype(np.float32)
    assert codec.compress(z)[0] == codec2.compress(z)[0]


def test_likelihood_floor_passes_upward_gradient():
    """CompressAI LowerBound rule at the likelihood floor: when every
    likelihood is floored (collapsed entropy model), the rate gradient
    w.r.t. the scales must be NONZERO so training can recover — a plain
    max() clamp would zero it (absorbing state; seen as the checkerboard
    bpp-38 divergence)."""
    import jax

    from crdr_tpu.entropy.gaussian import gaussian_likelihood

    def rate(log_scales):
        scales = jnp.exp(log_scales)
        # symbols outside the support: raw likelihood ~5e-13, well
        # under the 1e-9 floor but inside f32 erfc's representable range
        values = jnp.full((8,), 3.0)
        lik = gaussian_likelihood(values, scales, 0.11)
        return -jnp.sum(jnp.log2(lik))

    log_scales = jnp.full((8,), jnp.log(0.35))
    g = jax.grad(rate)(log_scales)
    assert float(jnp.abs(g).sum()) > 0.0, (
        "rate gradient vanished at the likelihood floor")


def test_likelihood_floor_blocks_downward_gradient():
    """...but gradients that would push a floored likelihood further DOWN
    are blocked (the other half of the LowerBound rule)."""
    import jax

    from crdr_tpu.entropy.gaussian import gaussian_likelihood

    def neg_rate(log_scales):
        scales = jnp.exp(log_scales)
        values = jnp.full((8,), 3.0)
        lik = gaussian_likelihood(values, scales, 0.11)
        return jnp.sum(jnp.log2(lik))  # maximizing rate = pushing lik down

    g = jax.grad(neg_rate)(jnp.full((8,), jnp.log(0.35)))
    assert float(jnp.abs(g).sum()) == 0.0
