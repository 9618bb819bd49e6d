"""Bitstream determinism / format-regression guard.

Encodes a fixed input with a fixed-seed tiny flagship and checks the exact
stream bytes against a committed digest.  Any change to conv numerics, CDF
quantization, symbol serialization order, or the rANS wire format flips the
digest — if a future change is INTENDED to alter the format, update the digest
here and say so in the commit message.

(CPU backend, f32-highest matmuls: deterministic across runs/machines.)
"""

import hashlib
import json
import os

import numpy as np
import pytest

from crdr_tpu.models import build_comp_model
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow

GOLDEN_FILE = os.path.join(os.path.dirname(__file__),
                           "golden_bitstream.json")


def _encode():
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)  # seed fixed in tiny_opt (seed=7)
    model.codec_setup()
    rng = np.random.default_rng(1234)
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    enc = model.compress(x, rate_ind=1.0)
    return enc, model, x


def test_bitstream_matches_golden_digest():
    enc, model, x = _encode()
    digests = {
        "header": hashlib.sha256(enc["string_list"][0]).hexdigest(),
        "z": hashlib.sha256(enc["string_list"][1]).hexdigest(),
        "y": hashlib.sha256(enc["string_list"][2]).hexdigest(),
        "z_len": len(enc["string_list"][1]),
        "y_len": len(enc["string_list"][2]),
    }
    if not os.path.exists(GOLDEN_FILE):
        with open(GOLDEN_FILE, "w") as f:
            json.dump(digests, f, indent=2)
        pytest.skip("golden digest created; rerun to verify")
    with open(GOLDEN_FILE) as f:
        golden = json.load(f)
    assert digests == golden, (
        "bitstream format changed! If intentional, delete "
        "tests/golden_bitstream.json, regenerate, and document the change.")
    # and the stream must still decode to the encoder-side latents
    fake, z_hat, y_hat = model.decompress(enc["string_list"], beta=1.0)
    np.testing.assert_allclose(y_hat, enc["y_hat"], rtol=1e-4, atol=1e-4)


DEVICE_GOLDEN_FILE = os.path.join(os.path.dirname(__file__),
                                  "golden_bitstream_device.json")


def test_device_wire_matches_golden_digest():
    """Same guard for OUR wire: the lane-container layout (CRDW magic,
    lane count/length tables, fixup channel, rans32 stream bytes) is a
    persistence format too — committed .bin files must stay decodable."""
    opt = tiny_opt()
    opt["wire_format"] = "device"
    opt["device_wire_lanes"] = 16
    model = build_comp_model(opt)
    model.init_params(input_size=64)
    model.codec_setup()
    rng = np.random.default_rng(1234)
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    enc = model.compress(x, rate_ind=1.0)
    digests = {
        "z": hashlib.sha256(enc["string_list"][1]).hexdigest(),
        "z_len": len(enc["string_list"][1]),
        "y": hashlib.sha256(enc["string_list"][2]).hexdigest(),
        "y_len": len(enc["string_list"][2]),
    }
    if not os.path.exists(DEVICE_GOLDEN_FILE):
        with open(DEVICE_GOLDEN_FILE, "w") as f:
            json.dump(digests, f, indent=2)
        pytest.skip("device-wire golden digest created; rerun to verify")
    with open(DEVICE_GOLDEN_FILE) as f:
        golden = json.load(f)
    assert digests == golden, (
        "device wire format changed! If intentional, delete "
        "tests/golden_bitstream_device.json, regenerate, and document it.")
    _, _, y_hat = model.decompress(enc["string_list"], beta=1.0)
    np.testing.assert_array_equal(np.asarray(y_hat),
                                  np.asarray(enc["y_hat"]))
