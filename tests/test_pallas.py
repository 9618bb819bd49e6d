"""Pallas kernel tests (interpret mode on CPU): fused GDN vs reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crdr_tpu.ops.pallas_gdn import gdn_reference, pallas_gdn


@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_gdn_matches_reference(inverse):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.5, 2.0, (128,)), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.0, 0.1, (128, 128)), jnp.float32)
    ref = gdn_reference(x, beta, gamma, inverse)
    out = pallas_gdn(x, beta, gamma, inverse, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_pallas_gdn_row_padding():
    """Non-multiple-of-tile row counts are padded and cropped correctly."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 3, 7, 128)), jnp.float32)  # 21 rows
    beta = jnp.ones((128,), jnp.float32)
    gamma = 0.05 * jnp.eye(128, dtype=jnp.float32)
    ref = gdn_reference(x, beta, gamma)
    out = pallas_gdn(x, beta, gamma, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
