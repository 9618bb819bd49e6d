"""Fused whole-loop device-wire decode (ops/charm_uniform.uniform_decode_loop).

Contract under test: with the fused SliceTransform kernel active (interp mode
on CPU — the same arithmetic path CI uses for the per-step executables), the
ONE-program scan decode must reproduce the per-step dispatch chain exactly —
identical symbols, identical y_hat, identical reconstruction — because the
ENCODER replays the per-step executables and any divergence is a stream
desync in production (codec_devicewire._use_fused_loop docstring).
"""

import numpy as np
import pytest

from crdr_tpu.models import build_comp_model
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


_CACHE = {}


def _build(fused_loop: bool, fused_enc: bool = False, wire: str = "device"):
    # one model per config, shared across tests: the fused/env gates are
    # consulted at compress/decompress time, so reuse is safe and saves a
    # full build+compile per test
    key = (fused_loop, fused_enc, wire)
    if key in _CACHE:
        return _CACHE[key]
    opt = tiny_opt()
    opt["wire_format"] = wire
    opt["device_wire_lanes"] = 8
    opt["fused_decode_loop"] = fused_loop
    opt["fused_encode_loop"] = fused_enc
    model = build_comp_model(opt)
    model.init_params(input_size=64)  # deterministic seed -> same params
    model.codec_setup()
    _CACHE[key] = model
    return model


@pytest.fixture(scope="module")
def x():
    return np.random.default_rng(7).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)


@pytest.fixture(scope="module")
def x2():
    return np.random.default_rng(9).uniform(-1, 1, (2, 64, 64, 3)) \
        .astype(np.float32)


def test_fused_loop_gated_off_without_kernel(x, monkeypatch):
    """Plain-XLA convs (CRDR_PALLAS unset/0 on CPU) must keep the per-step
    path even when the config asks for the fused loop: cross-program conv
    compilations are not byte-stable, so dispatching it would be a latent
    stream-desync risk."""
    monkeypatch.delenv("CRDR_PALLAS", raising=False)
    monkeypatch.delenv("CRDR_FUSED_LOOP", raising=False)
    model = _build(fused_loop=True)
    import jax

    hm_like = jax.ShapeDtypeStruct((1, 4, 4, 8), np.float32)
    assert model._use_fused_loop(hm_like) is False
    monkeypatch.setenv("CRDR_PALLAS", "interp")
    assert model._use_fused_loop(hm_like) is True
    monkeypatch.setenv("CRDR_FUSED_LOOP", "0")  # env escape hatch wins
    assert model._use_fused_loop(hm_like) is False


def test_fused_loop_matches_per_step_chain(x, monkeypatch):
    """Same weights, same streams: fused-loop decode == per-step decode,
    bit for bit (y_hat and the reconstructed image)."""
    monkeypatch.setenv("CRDR_PALLAS", "interp")
    step_model = _build(fused_loop=False)
    fused_model = _build(fused_loop=True)

    enc = step_model.compress(x, rate_ind=2.0)
    f_step, z_step, yh_step = step_model.decompress(
        enc["string_list"], beta=1.28)
    f_fused, z_fused, yh_fused = fused_model.decompress(
        enc["string_list"], beta=1.28)
    np.testing.assert_array_equal(np.asarray(yh_step), np.asarray(yh_fused))
    np.testing.assert_array_equal(np.asarray(z_step), np.asarray(z_fused))
    np.testing.assert_array_equal(f_step, f_fused)


def test_fused_loop_roundtrip_bit_exact(x, monkeypatch):
    """Encode (per-step replay) -> fused-loop decode reproduces the
    encoder's quantized latents exactly — the production contract."""
    monkeypatch.setenv("CRDR_PALLAS", "interp")
    model = _build(fused_loop=True)
    enc = model.compress(x, rate_ind=1.0)
    fake, z_hat, y_hat = model.decompress(enc["string_list"], beta=0.64)
    np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(enc["y_hat"]))
    np.testing.assert_allclose(np.asarray(z_hat), np.asarray(enc["z_hat"]),
                               rtol=1e-5, atol=1e-5)
    assert fake.shape == x.shape and np.all(np.isfinite(fake))


@pytest.mark.parametrize("wire", ["device", "compressai"])
def test_fused_encode_loop_byte_identical_wire(x, monkeypatch, wire):
    """The fused encode scan must emit EXACTLY the bytes of the per-step
    replay chain — symbols, indexes, predicted bits, containers — on both
    wire formats.  Byte equality is the whole promotion criterion: any
    drift here is a silent RD change or a stream desync."""
    monkeypatch.setenv("CRDR_PALLAS", "interp")
    ref = _build(fused_loop=False, fused_enc=False, wire=wire)
    fus = _build(fused_loop=False, fused_enc=True, wire=wire)
    enc_ref = ref.compress(x, rate_ind=2.0)
    enc_fus = fus.compress(x, rate_ind=2.0)
    assert enc_ref["string_list"] == enc_fus["string_list"]
    np.testing.assert_array_equal(np.asarray(enc_ref["y_hat"]),
                                  np.asarray(enc_fus["y_hat"]))
    # cross-decode: per-step decoder consumes the fused encoder's stream
    fake, _, y_hat = ref.decompress(enc_fus["string_list"], beta=0.64)
    np.testing.assert_array_equal(np.asarray(y_hat),
                                  np.asarray(enc_fus["y_hat"]))
    assert np.all(np.isfinite(fake))


def test_fused_both_sides_roundtrip(x, monkeypatch):
    """Fused encode -> fused decode, the full 4-dispatch codec."""
    monkeypatch.setenv("CRDR_PALLAS", "interp")
    model = _build(fused_loop=True, fused_enc=True)
    enc = model.compress(x, rate_ind=1.5)
    fake, _, y_hat = model.decompress(enc["string_list"], beta=1.28)
    np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(enc["y_hat"]))
    assert np.all(np.isfinite(fake))


def test_fused_loop_batch_decompress(x2, monkeypatch):
    """decompress_batch rides the same _decompress_charm_device path; the
    fused loop must hold for batched mixed-beta serving too."""
    monkeypatch.setenv("CRDR_PALLAS", "interp")
    model = _build(fused_loop=True)
    encs = model.compress_batch(x2, rate_ind=np.array([0.5, 2.5]))
    lists = [e["string_list"] for e in encs]
    fake, _, y_hat = model.decompress_batch(lists, beta=np.array([0.0, 1.28]))
    ref = _build(fused_loop=False)
    fake_ref, _, yh_ref = ref.decompress_batch(lists,
                                               beta=np.array([0.0, 1.28]))
    np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(yh_ref))
    np.testing.assert_array_equal(fake, fake_ref)
