"""Equivalence of the TPU-shaped Charm programs against the reference-shaped
flax module: the zero-padded/packed scan encode and the uniform decode step
must reproduce forward_compress exactly (same math, different shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crdr_tpu.entropy import SteGaussianMeanScaleConditional
from crdr_tpu.ops.charm_uniform import pack_charm_weights, uniform_encode_scan
from crdr_tpu.subnet.context_model.charm import Minnen20CharmContextModel

pytestmark = pytest.mark.slow

NS, SC, HY, MS = 4, 8, 32, 2  # slices, slice_ch, hyper half-ch, max support


@pytest.fixture(scope="module")
def charm_setup():
    cm = Minnen20CharmContextModel(num_slices=NS, bottleneck_y=NS * SC,
                                   hyper_out_ch=2 * HY, max_support_slices=MS)
    em = SteGaussianMeanScaleConditional(scale_bound=0.11)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((1, 6, 8, NS * SC)) * 2, jnp.float32)
    hyper = jnp.asarray(rng.standard_normal((1, 6, 8, 2 * HY)), jnp.float32)

    import flax.linen as nn

    class Wrap(nn.Module):
        def setup(self):
            self.cm = cm
            self.em = em

        def __call__(self, y, hyper):
            return self.cm.forward_compress(y, hyper, self.em)

    wrap = Wrap()
    variables = wrap.init(jax.random.PRNGKey(0), y, hyper)
    return wrap, variables, y, hyper


def test_scan_encode_matches_flax_forward_compress(charm_setup):
    wrap, variables, y, hyper = charm_setup
    mu_ref, sigma_ref, y_hat_ref, _ = wrap.apply(variables, y, hyper)

    packed = {k: jnp.asarray(v) for k, v in pack_charm_weights(
        variables["params"]["cm"], NS, SC, HY, MS).items()}
    hm, hs = jnp.split(hyper, 2, axis=-1)
    mu, sigma, y_hat = uniform_encode_scan(packed, y, hm, hs, NS, SC, MS)

    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(y_hat_ref),
                               rtol=1e-5, atol=1e-5)
