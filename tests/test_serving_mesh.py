"""Multi-device batch serving (``serving_devices: N``).

The codec's batched dispatches shard over an N-device mesh along the batch
axis (GSPMD, zero collectives — batch items are independent).  Contract:
bitstreams are BYTE-IDENTICAL to single-device serving, and each config's
encode<->decode agreement stays structural (executable replay).  The final
f32 reconstruction may differ from the unpartitioned program at float-ulp
level (GSPMD partitioning reorders fusions), which is below any metric.  The reference
serves one image on one GPU (scripts/compress.py loops host-side); this is
a capability extension.
"""

import numpy as np
import pytest

from tests.test_comp_model import tiny_opt
from crdr_tpu.models import build_comp_model

pytestmark = pytest.mark.slow


def _build(serve=1, wire="compressai"):
    opt = tiny_opt()
    opt["serving_devices"] = serve
    opt["wire_format"] = wire
    opt["device_wire_lanes"] = 8
    model = build_comp_model(opt)
    model.init_params(input_size=64)  # fixed seed -> identical params
    model.codec_setup()
    return model


@pytest.fixture(scope="module")
def pair():
    return _build(serve=1), _build(serve=4)


def test_mesh_placement_is_sharded(pair):
    _, meshed = pair
    assert meshed._serve_mesh is not None and meshed._serve_mesh.size == 4
    arr = meshed._place_batch(np.zeros((8, 6), np.float32))
    # batch axis actually split over the 4 devices, 2 rows each
    shards = arr.addressable_shards
    assert len({s.device for s in shards}) == 4
    assert all(s.data.shape == (2, 6) for s in shards)
    # non-divisible batch falls back to replicated placement
    arr3 = meshed._place_batch(np.zeros((3, 6), np.float32))
    assert all(s.data.shape == (3, 6) for s in arr3.addressable_shards)


def test_mesh_serving_bitstreams_identical(pair):
    single, meshed = pair
    x = np.random.default_rng(3).uniform(-1, 1, (4, 64, 64, 3)) \
        .astype(np.float32)
    enc_s = single.compress_batch(x, rate_ind=1.5)
    enc_m = meshed.compress_batch(x, rate_ind=1.5)
    for a, b in zip(enc_s, enc_m):
        assert a["string_list"] == b["string_list"]  # byte-equal wires
    fake_s, _, yh_s = single.decompress_batch(
        [e["string_list"] for e in enc_s], beta=0.64)
    fake_m, _, yh_m = meshed.decompress_batch(
        [e["string_list"] for e in enc_m], beta=0.64)
    np.testing.assert_allclose(np.asarray(yh_s), np.asarray(yh_m),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fake_s), np.asarray(fake_m),
                               rtol=0, atol=1e-6)


def test_mesh_serving_device_wire(pair):
    """The device wire's single-dispatch decode chain shards over the mesh
    too (lane scan batch dim is the sharded axis)."""
    del pair  # module fixture kept alive for cache reuse ordering only
    single = _build(serve=1, wire="device")
    meshed = _build(serve=4, wire="device")
    x = np.random.default_rng(9).uniform(-1, 1, (4, 64, 64, 3)) \
        .astype(np.float32)
    enc_s = single.compress_batch(x, rate_ind=0.5)
    enc_m = meshed.compress_batch(x, rate_ind=0.5)
    for a, b in zip(enc_s, enc_m):
        assert a["string_list"] == b["string_list"]
    fake_s, _, yh_s = single.decompress_batch(
        [e["string_list"] for e in enc_s], beta=0.0)
    fake_m, _, yh_m = meshed.decompress_batch(
        [e["string_list"] for e in enc_m], beta=0.0)
    np.testing.assert_allclose(np.asarray(yh_s), np.asarray(yh_m),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fake_s), np.asarray(fake_m),
                               rtol=0, atol=1e-6)


def test_spatial_serving_single_image(pair):
    """serving_partition: spatial — ONE image sharded along H across the
    mesh (the huge-still latency axis; conv halos inserted by GSPMD).
    Bitstream bytes must match single-device serving."""
    single, _ = pair
    opt = tiny_opt()
    opt["serving_devices"] = 4
    opt["serving_partition"] = "spatial"
    sp = build_comp_model(opt)
    sp.init_params(input_size=64)
    sp.codec_setup()
    # sanity: H axis (dim 1) is what shards now
    arr = sp._place_batch(np.zeros((1, 8, 6), np.float32))
    assert all(s.data.shape == (1, 2, 6) for s in arr.addressable_shards)

    x = np.random.default_rng(12).uniform(-1, 1, (1, 256, 256, 3)) \
        .astype(np.float32)
    enc_s = single.compress(x, rate_ind=1.0)
    enc_p = sp.compress(x, rate_ind=1.0)
    assert enc_s["string_list"] == enc_p["string_list"]
    fake_s, _, yh_s = single.decompress(enc_s["string_list"], beta=0.64)
    fake_p, _, yh_p = sp.decompress(enc_p["string_list"], beta=0.64)
    np.testing.assert_allclose(np.asarray(yh_s), np.asarray(yh_p),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fake_s), np.asarray(fake_p),
                               rtol=0, atol=1e-6)


def test_mesh_serving_odd_batch(pair):
    """Batch not divisible by the mesh: replicated fallback, same bytes."""
    single, meshed = pair
    x = np.random.default_rng(4).uniform(-1, 1, (3, 64, 64, 3)) \
        .astype(np.float32)
    enc_s = single.compress_batch(x, rate_ind=2.0)
    enc_m = meshed.compress_batch(x, rate_ind=2.0)
    for a, b in zip(enc_s, enc_m):
        assert a["string_list"] == b["string_list"]
