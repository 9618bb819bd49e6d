"""Device-wire (on-device entropy decode) end-to-end codec tests.

The lane-interleaved wire must reproduce EXACTLY the latents the encoder
quantized — same contract as the CompressAI-format path — while the decode
runs as one uninterrupted device dispatch chain (no per-slice host rANS).
"""

import numpy as np
import pytest

from tests.test_comp_model import tiny_opt
from crdr_tpu.models import build_comp_model

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def device_wire_model():
    opt = tiny_opt()
    opt["wire_format"] = "device"
    opt["device_wire_lanes"] = 16
    model = build_comp_model(opt)
    model.init_params(input_size=64)
    model.codec_setup()
    return model


def test_device_wire_roundtrip(device_wire_model):
    model = device_wire_model
    x = np.random.default_rng(2).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = model.compress(x, rate_ind=2.0)
    fake, z_hat, y_hat = model.decompress(enc["string_list"], beta=1.28)
    np.testing.assert_allclose(np.asarray(z_hat), np.asarray(enc["z_hat"]),
                               rtol=1e-5, atol=1e-5)
    # bit-exact latent reproduction: the decode chain replays the very same
    # step executables the encoder's scan agreed with
    np.testing.assert_array_equal(np.asarray(y_hat),
                                  np.asarray(enc["y_hat"]))
    assert fake.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(fake))


def test_device_wire_matches_compressai_wire():
    """Same tiny weights, both wire formats: identical reconstruction."""
    opt = tiny_opt()
    ref = build_comp_model(opt)
    ref.init_params(input_size=64)
    ref.codec_setup()

    opt2 = tiny_opt()
    opt2["wire_format"] = "device"
    opt2["device_wire_lanes"] = 8
    dev = build_comp_model(opt2)
    dev.init_params(input_size=64)  # same seed -> same params
    dev.codec_setup()

    x = np.random.default_rng(5).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc_ref = ref.compress(x, rate_ind=1.0)
    enc_dev = dev.compress(x, rate_ind=1.0)
    # encode side is identical up to serialization
    np.testing.assert_array_equal(np.asarray(enc_ref["y_hat"]),
                                  np.asarray(enc_dev["y_hat"]))

    fake_ref, _, yh_ref = ref.decompress(enc_ref["string_list"], beta=0.64)
    fake_dev, _, yh_dev = dev.decompress(enc_dev["string_list"], beta=0.64)
    np.testing.assert_array_equal(np.asarray(yh_ref), np.asarray(yh_dev))
    np.testing.assert_array_equal(fake_ref, fake_dev)


def test_device_wire_legacy_compressai_z(device_wire_model):
    """Device-wire .bins written before z rode the lane format carry a
    CompressAI z stream; `_z_device` auto-detects (no CRDW magic) and falls
    back to host z decode.  Reconstruction must be bit-identical."""
    model = device_wire_model
    x = np.random.default_rng(15).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = model.compress(x, rate_ind=1.0)
    header, z_lane, y_str = enc["string_list"]
    z_sym = np.round(np.asarray(enc["z_hat"])
                     - model.codec_z.medians()[None, None, None, :]) \
        .astype(np.int32)
    legacy_z = model.codec_z.compress_symbols(z_sym)[0]
    assert legacy_z != z_lane
    fake_new, _, yh_new = model.decompress([header, z_lane, y_str], beta=0.5)
    fake_old, _, yh_old = model.decompress([header, legacy_z, y_str],
                                           beta=0.5)
    np.testing.assert_array_equal(np.asarray(yh_new), np.asarray(yh_old))
    np.testing.assert_array_equal(fake_new, fake_old)


def test_wire_mismatch_raises(device_wire_model):
    """A device-wire bitstream fed to a compressai-configured decode (and
    vice versa) must fail loudly, not desync into garbage."""
    model = device_wire_model
    x = np.random.default_rng(11).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = model.compress(x, rate_ind=2.0)
    try:
        model.wire_format = "compressai"
        with pytest.raises(ValueError, match="device wire"):
            model.decompress(enc["string_list"], beta=0.0)
        with pytest.raises(ValueError, match="device wire"):
            model.decompress_batch([enc["string_list"]], beta=0.0)
        enc_cai = model.compress(x, rate_ind=2.0)
    finally:
        model.wire_format = "device"
    with pytest.raises(ValueError, match="compressai"):
        model.decompress(enc_cai["string_list"], beta=0.0)


def test_device_wire_batch(device_wire_model):
    model = device_wire_model
    x = np.random.default_rng(7).uniform(-1, 1, (3, 64, 64, 3)) \
        .astype(np.float32)
    encs = model.compress_batch(x, rate_ind=0.0)
    assert len(encs) == 3
    fake, z_hat, y_hat = model.decompress_batch(
        [e["string_list"] for e in encs], beta=0.0)
    assert fake.shape == (3, 64, 64, 3)
    for i, e in enumerate(encs):
        np.testing.assert_array_equal(np.asarray(y_hat)[i],
                                      np.asarray(e["y_hat"])[0])


def test_device_wire_generic_roundtrip():
    """Non-Charm family through the device wire: one lane round over the
    whole latent, decode via the shared generic_params executable."""
    opt = tiny_opt("HyperpriorModel", charm=False, rate=False, beta=False)
    opt["wire_format"] = "device"
    model = build_comp_model(opt)
    model.init_params(input_size=64)
    model.codec_setup()
    x = np.random.default_rng(11).uniform(-1, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    encs = model.compress_batch(x)
    fake, z_hat, y_hat = model.decompress_batch(
        [e["string_list"] for e in encs])
    for i, e in enumerate(encs):
        np.testing.assert_array_equal(np.asarray(y_hat)[i],
                                      np.asarray(e["y_hat"])[0])
        np.testing.assert_allclose(np.asarray(z_hat)[i],
                                   np.asarray(e["z_hat"])[0],
                                   rtol=1e-5, atol=1e-5)
    assert fake.shape == (2, 64, 64, 3)
    assert np.all(np.isfinite(fake))


def test_device_wire_generic_matches_compressai():
    """Generic family: both wires reconstruct identically."""
    opt = tiny_opt("HyperpriorModel", charm=False, rate=False, beta=False)
    ref = build_comp_model(opt)
    ref.init_params(input_size=64)
    ref.codec_setup()
    opt2 = tiny_opt("HyperpriorModel", charm=False, rate=False, beta=False)
    opt2["wire_format"] = "device"
    dev = build_comp_model(opt2)
    dev.init_params(input_size=64)
    dev.codec_setup()
    x = np.random.default_rng(13).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    e_ref = ref.compress(x)
    e_dev = dev.compress(x)
    np.testing.assert_array_equal(np.asarray(e_ref["y_hat"]),
                                  np.asarray(e_dev["y_hat"]))
    f_ref, _, yh_ref = ref.decompress(e_ref["string_list"])
    f_dev, _, yh_dev = dev.decompress(e_dev["string_list"])
    np.testing.assert_array_equal(np.asarray(yh_ref), np.asarray(yh_dev))
    np.testing.assert_array_equal(f_ref, f_dev)


def _cb_opt():
    opt = tiny_opt()
    opt.subnet.context_model = {
        "type": "ElicCheckerboardCharmContextModel", "num_slices": 4,
        "hyper_out_ch": 64, "bottleneck_y": 32, "max_support_slices": 2,
    }
    return opt


def test_device_wire_checkerboard_roundtrip():
    """Checkerboard family through the device wire: 2*num_slices lane
    rounds chained between the phase executables, zero host round trips."""
    opt = _cb_opt()
    opt["wire_format"] = "device"
    model = build_comp_model(opt)
    model.init_params(input_size=64)
    model.codec_setup()
    x = np.random.default_rng(17).uniform(-1, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    encs = model.compress_batch(x, rate_ind=1.0)
    fake, z_hat, y_hat = model.decompress_batch(
        [e["string_list"] for e in encs], beta=1.28)
    for i, e in enumerate(encs):
        np.testing.assert_array_equal(np.asarray(y_hat)[i],
                                      np.asarray(e["y_hat"])[0])
        np.testing.assert_allclose(np.asarray(z_hat)[i],
                                   np.asarray(e["z_hat"])[0],
                                   rtol=1e-5, atol=1e-5)
    assert fake.shape == (2, 64, 64, 3)
    assert np.all(np.isfinite(fake))


def test_device_wire_checkerboard_matches_compressai():
    """Checkerboard: both wires reconstruct identically."""
    ref = build_comp_model(_cb_opt())
    ref.init_params(input_size=64)
    ref.codec_setup()
    opt2 = _cb_opt()
    opt2["wire_format"] = "device"
    dev = build_comp_model(opt2)
    dev.init_params(input_size=64)  # same seed -> same params
    dev.codec_setup()
    x = np.random.default_rng(19).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    e_ref = ref.compress(x, rate_ind=2.0)
    e_dev = dev.compress(x, rate_ind=2.0)
    np.testing.assert_array_equal(np.asarray(e_ref["y_hat"]),
                                  np.asarray(e_dev["y_hat"]))
    f_ref, _, yh_ref = ref.decompress(e_ref["string_list"], beta=0.64)
    f_dev, _, yh_dev = dev.decompress(e_dev["string_list"], beta=0.64)
    np.testing.assert_array_equal(np.asarray(yh_ref), np.asarray(yh_dev))
    np.testing.assert_array_equal(f_ref, f_dev)


def _ab_opt(family):
    if family == "charm":
        opt = tiny_opt()
    elif family == "cb":
        opt = _cb_opt()
    else:
        opt = tiny_opt("HyperpriorModel", charm=False, rate=False, beta=False)
    opt["wire_format"] = "device"
    opt["device_wire_lanes"] = 16
    return opt


@pytest.mark.parametrize("family", ["charm", "generic", "cb"])
def test_device_encoder_matches_host_encoder(family):
    """The on-device lane encoder (device_wire_encoder: device, the
    default) must emit byte-identical containers to the threaded C++ host
    coder — the placement is a pure perf knob, never a format one."""
    rate = None if family == "generic" else 1.0
    encs = {}
    for enc_kind in ("device", "host"):
        opt = _ab_opt(family)
        opt["device_wire_encoder"] = enc_kind
        model = build_comp_model(opt)
        model.init_params(input_size=64)  # same seed -> same params
        model.codec_setup()
        assert model.device_wire_encoder == enc_kind
        x = np.random.default_rng(23).uniform(-1, 1, (2, 64, 64, 3)) \
            .astype(np.float32)
        encs[enc_kind] = model.compress_batch(x, rate_ind=rate)
    for e_dev, e_host in zip(encs["device"], encs["host"]):
        assert e_dev["string_list"] == e_host["string_list"]
        assert e_dev["pred_y_bit"] == pytest.approx(e_host["pred_y_bit"])


def test_device_encoder_overflow_falls_back_to_host(monkeypatch):
    """When the device encoder reports more escapes than the fixed fixup
    capacity (returns None), compress transparently re-encodes on the host
    — same bytes, no error."""
    opt = _ab_opt("charm")
    model = build_comp_model(opt)
    model.init_params(input_size=64)
    model.codec_setup()
    x = np.random.default_rng(29).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc_dev = model.compress(x, rate_ind=1.0)
    calls = {"n": 0}

    def overflowing(*a, **kw):
        calls["n"] += 1
        return None  # what _lane_wire_dev returns on fixup overflow

    monkeypatch.setattr(model, "_lane_wire_dev", overflowing)
    enc_host = model.compress(x, rate_ind=1.0)
    assert calls["n"] == 1
    assert enc_host["string_list"] == enc_dev["string_list"]


def test_device_wire_stream_size_tracks_prediction(device_wire_model):
    """Lane overhead (per-lane state flush + lens) is bounded: real bits
    within ~25% + fixed slack of predicted on the tiny model."""
    model = device_wire_model
    x = np.random.default_rng(9).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = model.compress(x, rate_ind=2.0)
    real_y_bits = len(enc["string_list"][2]) * 8
    # 16 lanes x (2 state words + u16 len) = 96 B fixed overhead
    assert real_y_bits < enc["pred_y_bit"] * 1.25 + 8 * 200
