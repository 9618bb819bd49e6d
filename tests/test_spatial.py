"""Spatial (height) sharding: SPMD conv halo exchange must reproduce the
single-device forward exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crdr_tpu.models import build_comp_model
from crdr_tpu.parallel.mesh import make_mesh
from crdr_tpu.parallel.spatial import spatial_sharded, spatial_shardings
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def test_spatial_sharded_encoder_matches():
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    net, params = model.net, model.params
    ri = jnp.asarray([1.0], jnp.float32)

    def encode(p, x):
        y, z = net.apply({"params": p}, x,
                         method=lambda n, xx: n.encode_latents(xx, ri))
        return y

    x = np.random.default_rng(0).uniform(-1, 1, (1, 128, 64, 3)) \
        .astype(np.float32)
    y_single = jax.jit(encode)(params, jnp.asarray(x))

    mesh = make_mesh(8, axis_name="sp")
    fwd = spatial_sharded(encode, mesh)
    rep, act = spatial_shardings(mesh)
    y_sp = fwd(jax.device_put(params, rep),
               jax.device_put(jnp.asarray(x), act))
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_single),
                               rtol=2e-4, atol=2e-4)


def test_spatial_sharded_decoder_matches():
    """Up-convs (phase-decomposed transposed convs) under H sharding."""
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    net, params = model.net, model.params
    ri = jnp.asarray([1.0], jnp.float32)
    bt = jnp.asarray([2.56], jnp.float32)

    def decode(p, y):
        return net.apply({"params": p}, y, ri, bt,
                         method=lambda n, yy, r, b: n.decode(yy, r, b))

    y = np.random.default_rng(1).standard_normal((1, 16, 8, 32)) \
        .astype(np.float32)
    out_single = jax.jit(decode)(params, jnp.asarray(y))

    mesh = make_mesh(8, axis_name="sp")
    fwd = spatial_sharded(decode, mesh)
    rep, act = spatial_shardings(mesh)
    out_sp = fwd(jax.device_put(params, rep),
                 jax.device_put(jnp.asarray(y), act))
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_single),
                               rtol=2e-4, atol=2e-4)
