"""Multi-device (virtual 8-CPU mesh) tests: data-parallel training step with
batch sharding + replicated params, and sharded-batch forward equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from crdr_tpu.models import build_comp_model
from crdr_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_forward_matches_single_device():
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    net, params = model.net, model.params
    x = np.random.default_rng(0).uniform(-1, 1, (8, 64, 64, 3)) \
        .astype(np.float32)
    ri = jnp.asarray([1.0], jnp.float32)
    bt = jnp.asarray([2.56], jnp.float32)

    def fwd(p, xx):
        out = net.apply({"params": p}, xx, rate_ind=ri, beta=bt,
                        is_train=False)
        return out["fake_images"]

    y_single = jax.jit(fwd)(params, jnp.asarray(x))

    mesh = make_mesh(8)
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    y_sharded = jax.jit(fwd, in_shardings=(rep, dp), out_shardings=dp)(
        replicate_tree(params, mesh),
        jax.device_put(jnp.asarray(x), dp))
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_single),
                               rtol=2e-4, atol=2e-4)


def test_dp_gradient_allreduce():
    """Gradients from an 8-way sharded batch equal single-device gradients."""
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    net, params = model.net, model.params
    x = np.random.default_rng(1).uniform(-1, 1, (8, 64, 64, 3)) \
        .astype(np.float32)
    ri = jnp.asarray([0.0], jnp.float32)
    bt = jnp.asarray([0.0], jnp.float32)
    rng = jax.random.PRNGKey(0)

    def loss_fn(p, xx):
        out = net.apply({"params": p}, xx, rate_ind=ri, beta=bt,
                        is_train=True, rng=rng)
        return jnp.mean((out["fake_images"] - xx) ** 2)

    g_single = jax.jit(jax.grad(loss_fn))(params, jnp.asarray(x))

    mesh = make_mesh(8)
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    g_shard = jax.jit(jax.grad(loss_fn), in_shardings=(rep, dp),
                      out_shardings=rep)(
        replicate_tree(params, mesh), jax.device_put(jnp.asarray(x), dp))

    flat_s = jax.tree.leaves(g_single)
    flat_m = jax.tree.leaves(g_shard)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-5)
