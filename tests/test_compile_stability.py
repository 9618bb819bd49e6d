"""Compile-stability guarantees: one compiled program must serve every
(rate_ind, beta) control point — a retrace per quality level would multiply
compile latency by the 34-point RD-sweep protocol."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crdr_tpu.models import build_comp_model
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def test_forward_no_retrace_across_control_grid():
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    fn = model._forward_fn(is_train=False)
    for q, b in [(0.0, 0.0), (1.5, 2.56), (2.0, 5.12), (0.25, 3.84)]:
        fn(model.params, jnp.asarray(x), jnp.asarray([q], jnp.float32),
           jnp.asarray([b], jnp.float32), jax.random.PRNGKey(0),
           jnp.asarray(64 * 64, jnp.float32))
    assert fn._cache_size() == 1, \
        "rate_ind/beta must be traced scalars, not compile-time constants"


def test_codec_no_retrace_across_qualities():
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    model.codec_setup()
    x = np.random.default_rng(1).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    for q in (0.0, 1.0, 2.0):
        model.compress(x, rate_ind=q)
    enc = model.compress(x, rate_ind=1.5)
    for b in (0.0, 2.56):
        model.decompress(enc["string_list"], beta=b)
    assert model._jit_cache["encode_head"]._cache_size() == 1
    assert model._jit_cache["quantize_slice"]._cache_size() == 1
    assert model._jit_cache["replay_pack"]._cache_size() == 1
    assert model._jit_cache["decode_begin"]._cache_size() == 1
    assert model._jit_cache["decode_final"]._cache_size() == 1
    # ONE step program serves all slices of BOTH the encoder's replay chain
    # and the decoder (executable-replay contract)
    assert model._jit_cache["charm_uniform"]._cache_size() == 1
