"""Fused whole-loop codec programs under the serving mesh.

`serving_devices: N` shards every batched codec dispatch along the batch
axis; the fused `charm_loop`/`charm_encode_loop` scan programs must
partition the same way (scan carries inherit the batch sharding; zero
collectives) and keep the single-device byte/bit contract: wires identical,
decoded latents identical.
"""

import numpy as np
import pytest

from tests.test_comp_model import tiny_opt
from crdr_tpu.models import build_comp_model

pytestmark = pytest.mark.slow


def _build(serve=1):
    opt = tiny_opt()
    opt["serving_devices"] = serve
    opt["wire_format"] = "device"
    opt["device_wire_lanes"] = 8
    opt["fused_decode_loop"] = True
    opt["fused_encode_loop"] = True
    model = build_comp_model(opt)
    model.init_params(input_size=64)  # fixed seed -> identical params
    model.codec_setup()
    return model


def test_fused_loops_on_serving_mesh(monkeypatch):
    monkeypatch.setenv("CRDR_PALLAS", "interp")
    single = _build(serve=1)
    meshed = _build(serve=4)
    x = np.random.default_rng(21).uniform(-1, 1, (4, 64, 64, 3)) \
        .astype(np.float32)
    enc_s = single.compress_batch(x, rate_ind=1.5)
    enc_m = meshed.compress_batch(x, rate_ind=1.5)
    for a, b in zip(enc_s, enc_m):
        assert a["string_list"] == b["string_list"]  # byte-equal wires
    lists = [e["string_list"] for e in enc_s]
    _, _, yh_s = single.decompress_batch(lists, beta=0.64)
    _, _, yh_m = meshed.decompress_batch(lists, beta=0.64)
    # same tolerance contract as test_serving_mesh: GSPMD partitioning may
    # reorder fusions at float-ulp level; the wire bytes above are exact
    np.testing.assert_allclose(np.asarray(yh_s), np.asarray(yh_m),
                               rtol=0, atol=1e-5)
