"""Fused SliceTransform Pallas kernel vs composed-conv oracle (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from crdr_tpu.ops.pallas_slice_transform import (fits_fused,
                                                 pallas_slice_transform,
                                                 slice_transform_reference)


def _make(rng, h, w, cin, c0, c1, cout):
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((5, 5, cin, c0)) * 0.05, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal(c0) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((5, 5, c0, c1)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c1) * 0.1, jnp.float32)
    w4 = jnp.asarray(rng.standard_normal((3, 3, c1, cout)) * 0.05, jnp.float32)
    b4 = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    return x, w0, b0, w2, b2, w4, b4


@pytest.mark.parametrize(
    "h,w", [(4, 6),
            pytest.param(8, 8, marks=pytest.mark.slow)])  # ~21s each in the
def test_fused_matches_composed(h, w):  # CPU Pallas interpreter; one small
    # case stays in the fast tier (r5 triage)
    rng = np.random.default_rng(0)
    args = _make(rng, h, w, cin=16, c0=24, c1=16, cout=8)
    ref = slice_transform_reference(*args)
    out = pallas_slice_transform(*args, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.05,
                               atol=0.05)
    # values must be nontrivial (not all zeros)
    assert float(jnp.abs(out).mean()) > 1e-3


def test_fits_fused_bound():
    assert fits_fused(32, 48)       # Kodak latent
    assert fits_fused(64, 96)       # 1024x1536 image
    assert not fits_fused(128, 128)  # 2K-class: use the XLA path


@pytest.mark.slow  # ~23s in the CPU Pallas interpreter (r5 triage)
def test_fused_batched_matches_composed():
    rng = np.random.default_rng(1)
    h, w = 6, 8
    args = _make(rng, h, w, cin=16, c0=24, c1=16, cout=8)
    x1 = jnp.asarray(rng.standard_normal((4, h, w, 16)), jnp.float32)
    args = (x1,) + args[1:]
    ref = slice_transform_reference(*args)
    out = pallas_slice_transform(*args, interpret=True)
    assert out.shape == (4, h, w, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.05,
                               atol=0.05)
    # per-image independence: batch result equals per-image kernel calls
    for i in range(4):
        one = pallas_slice_transform(x1[i:i + 1], *args[1:], interpret=True)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(one[0]),
                                   rtol=1e-6, atol=1e-6)


def test_fused_mode_config_and_env_precedence(monkeypatch):
    import jax.numpy as jnp
    from crdr_tpu.ops import charm_uniform as cu

    x = jnp.zeros((1, 8, 8, 4))
    monkeypatch.delenv("CRDR_PALLAS", raising=False)
    cu.set_fused_default(None)
    assert cu._fused_mode(x) is None
    cu.set_fused_default("interp")
    assert cu._fused_mode(x) == "interp"
    cu.set_fused_default(True)          # compiled mode needs a non-CPU device
    assert cu._fused_mode(x) in (None, "1")
    # env always wins over the config default
    monkeypatch.setenv("CRDR_PALLAS", "0")
    assert cu._fused_mode(x) is None
    monkeypatch.setenv("CRDR_PALLAS", "interp")
    cu.set_fused_default(False)
    assert cu._fused_mode(x) == "interp"
    cu.set_fused_default(None)
