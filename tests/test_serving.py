"""Serving stack: micro-batcher coalescing logic (fast, fake model),
container pack/unpack, HTTP layer routing (fast, fake model), and a slow
end-to-end HTTP roundtrip on the tiny real codec."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from crdr_tpu.serving.batcher import MicroBatcher
from crdr_tpu.utils.codec_utils import pack_byte_strings, unpack_byte_strings


# ---------------------------------------------------------------- fake model

class FakeHeaderHandler:
    def decode(self, header: bytes):
        return json.loads(header.decode())


class FakeModel:
    """Mimics the CompModel serving surface: batched codec entry points,
    conditioning flags, header handler.  Records every dispatch."""

    use_rate = True
    use_beta = True
    wire_format = "compressai"

    def __init__(self, dispatch_sleep=0.0, fail=False):
        self.header_handler = FakeHeaderHandler()
        self.calls = []
        self.dispatch_sleep = dispatch_sleep
        self.fail = fail

    def compress_batch(self, imgs, rate_ind=None):
        time.sleep(self.dispatch_sleep)
        self.calls.append(("c", np.asarray(imgs).shape, rate_ind))
        if self.fail:
            raise RuntimeError("device on fire")
        out = []
        for i in range(imgs.shape[0]):
            head = json.dumps(
                {"img_size": list(imgs.shape[1:3])}).encode()
            out.append({"string_list": [head, b"z", b"y%d" % i]})
        return out

    def decompress_batch(self, string_lists, beta=None):
        time.sleep(self.dispatch_sleep)
        self.calls.append(("d", len(string_lists), beta))
        h, w = self.header_handler.decode(string_lists[0][0])["img_size"]
        n = len(string_lists)
        fake = np.zeros((n, h, w, 3), np.float32)  # [-1,1] convention
        return fake, None, None


def _container(h=8, w=8):
    head = json.dumps({"img_size": [h, w]}).encode()
    return [head, b"z", b"y"]


# ------------------------------------------------------------------- batcher

def test_batcher_coalesces_concurrent_compat_requests():
    model = FakeModel()
    b = MicroBatcher(model, max_batch=4, max_wait_s=0.25)
    img = np.zeros((8, 8, 3), np.uint8)
    futs = [b.submit_compress(img, rate_ind=1.0) for _ in range(4)]
    outs = [f.result(timeout=10) for f in futs]
    b.close()
    assert [o["string_list"][2] for o in outs] == [b"y0", b"y1", b"y2", b"y3"]
    st = b.stats()
    assert st["batches"] == 1 and st["batch_hist"] == {4: 1}
    # uniform conditioning collapses to a scalar
    assert model.calls == [("c", (4, 8, 8, 3), 1.0)]


def test_batcher_window_closes_on_lone_request():
    b = MicroBatcher(FakeModel(), max_batch=8, max_wait_s=0.05)
    t0 = time.perf_counter()
    b.compress(np.zeros((8, 8, 3), np.uint8), rate_ind=0.0)
    assert time.perf_counter() - t0 < 5.0
    b.close()
    assert b.stats()["batch_hist"] == {1: 1}


def test_batcher_groups_by_shape_and_kind():
    model = FakeModel()
    b = MicroBatcher(model, max_batch=8, max_wait_s=0.2)
    futs = [
        b.submit_compress(np.zeros((8, 8, 3), np.uint8), 0.0),
        b.submit_compress(np.zeros((16, 8, 3), np.uint8), 0.0),  # other size
        b.submit_compress(np.zeros((8, 8, 3), np.uint8), 2.0),   # same size
        b.submit_decompress(_container(), beta=1.0),             # other kind
    ]
    for f in futs:
        f.result(timeout=10)
    b.close()
    kinds = [c[0] for c in model.calls]
    assert sorted(kinds) == ["c", "c", "d"]
    # the two 8x8 compresses shared one dispatch, with a mixed-rate vector
    mixed = [c for c in model.calls if c[0] == "c" and c[1][0] == 2]
    assert len(mixed) == 1
    np.testing.assert_array_equal(mixed[0][2], np.asarray([0.0, 2.0],
                                                          np.float32))


def test_batcher_mixed_beta_vector_on_decompress():
    model = FakeModel()
    b = MicroBatcher(model, max_batch=4, max_wait_s=0.25)
    futs = [b.submit_decompress(_container(), beta=v) for v in (0.0, 2.56)]
    imgs = [f.result(timeout=10) for f in futs]
    b.close()
    assert all(i.dtype == np.uint8 and i.shape == (8, 8, 3) for i in imgs)
    d = [c for c in model.calls if c[0] == "d"]
    assert len(d) == 1 and d[0][1] == 2
    np.testing.assert_array_equal(d[0][2], np.asarray([0.0, 2.56],
                                                      np.float32))


def test_batcher_propagates_dispatch_errors_to_all_waiters():
    b = MicroBatcher(FakeModel(fail=True), max_batch=4, max_wait_s=0.2)
    img = np.zeros((8, 8, 3), np.uint8)
    futs = [b.submit_compress(img, 0.0) for _ in range(3)]
    for f in futs:
        with pytest.raises(RuntimeError, match="device on fire"):
            f.result(timeout=10)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit_compress(img, 0.0)


def test_batcher_quantizes_group_sizes_to_buckets():
    """Free-form group sizes would each compile a fresh XLA program set;
    groups must land on the bucket grid (powers of two by default)."""
    model = FakeModel()
    b = MicroBatcher(model, max_batch=8, max_wait_s=0.25)
    assert b.batch_buckets == [1, 2, 4, 8]
    img = np.zeros((8, 8, 3), np.uint8)
    futs = [b.submit_compress(img, 0.0) for _ in range(6)]
    for f in futs:
        f.result(timeout=10)
    b.close()
    sizes = sorted(c[1][0] for c in model.calls)
    assert sizes == [2, 4], sizes
    # non-power-of-two max_batch keeps itself as a bucket
    b2 = MicroBatcher(FakeModel(), max_batch=6, max_wait_s=0.01)
    assert b2.batch_buckets == [1, 2, 4, 6]
    b2.close()


def test_batcher_respects_max_batch():
    model = FakeModel(dispatch_sleep=0.05)
    b = MicroBatcher(model, max_batch=2, max_wait_s=0.2)
    img = np.zeros((8, 8, 3), np.uint8)
    futs = [b.submit_compress(img, 0.0) for _ in range(5)]
    for f in futs:
        f.result(timeout=10)
    b.close()
    sizes = [c[1][0] for c in model.calls]
    assert max(sizes) <= 2 and sum(sizes) == 5


def test_batcher_unset_cond_is_fixed_default():
    """A request that leaves q/beta unset must get 0.0 — the SAME value
    whether it dispatches alone or coalesces with other requests."""
    model = FakeModel()
    b = MicroBatcher(model, max_batch=4, max_wait_s=0.2)
    img = np.zeros((8, 8, 3), np.uint8)
    # alone: explicit scalar 0.0 reaches the model (never None/NaN)
    b.compress(img)
    assert model.calls[-1] == ("c", (1, 8, 8, 3), 0.0)
    # coalesced with q=2.0: the unset request stays 0.0 in the vector
    futs = [b.submit_compress(img, 2.0), b.submit_compress(img, None)]
    for f in futs:
        f.result(timeout=10)
    b.close()
    mixed = model.calls[-1]
    np.testing.assert_array_equal(mixed[2], np.asarray([2.0, 0.0],
                                                       np.float32))


def test_batcher_cancelled_future_does_not_poison_group():
    model = FakeModel(dispatch_sleep=0.1)
    b = MicroBatcher(model, max_batch=4, max_wait_s=0.2)
    img = np.zeros((8, 8, 3), np.uint8)
    futs = [b.submit_compress(img, 0.0) for _ in range(3)]
    futs[0].cancel()  # pending future: cancel always wins the race here
    # the co-batched neighbours must still receive their results
    assert futs[1].result(timeout=10)["string_list"][2] in (b"y0", b"y1")
    assert futs[2].result(timeout=10)
    b.close()


# ----------------------------------------------------------------- container

def test_pack_unpack_roundtrip_and_truncation():
    strings = [b"", b"abc", bytes(range(256))]
    blob = pack_byte_strings(strings)
    assert unpack_byte_strings(blob) == strings
    with pytest.raises(ValueError, match="truncated"):
        unpack_byte_strings(blob[:-1])
    with pytest.raises(ValueError, match="truncated"):
        unpack_byte_strings(b"\x01\x02")


# ---------------------------------------------------------------------- http

def _start_server(model, **kw):
    from crdr_tpu.serving.http_server import make_server

    srv = make_server(model, port=0, **kw)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _png_bytes(img_uint8):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_uint8, "RGB").save(buf, format="PNG")
    return buf.getvalue()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, dict(r.headers), r.read()


def test_http_routes_with_fake_model():
    srv, base = _start_server(FakeModel(), max_wait_s=0.01)
    try:
        img = np.random.default_rng(0).integers(
            0, 255, (8, 8, 3), dtype=np.uint8)
        status, headers, blob = _post(base + "/compress?q=1.0",
                                      _png_bytes(img))
        assert status == 200
        assert headers["X-CRDR-Wire"] == "compressai"
        assert unpack_byte_strings(blob)[2] == b"y0"

        status, headers, png = _post(base + "/decompress?beta=2.56", blob)
        assert status == 200 and headers["Content-Type"] == "image/png"
        from PIL import Image

        out = np.asarray(Image.open(io.BytesIO(png)))
        assert out.shape == (8, 8, 3)

        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            info = json.loads(r.read())
        assert info["status"] == "ok"
        assert info["batcher"]["requests"] == 2

        # malformed body -> 400, server stays alive
        try:
            _post(base + "/decompress", b"\x01\x02")
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        srv.shutdown()


def test_http_keepalive_survives_404_with_body():
    """A POST body to an unknown route must be drained, or the next request
    on the same keep-alive connection desyncs."""
    import http.client

    srv, base = _start_server(FakeModel(), max_wait_s=0.01)
    try:
        host, port = srv.server_address
        conn = http.client.HTTPConnection(host, port, timeout=10)
        body = b"X" * 4096
        conn.request("POST", "/no_such_route", body=body)
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        # same connection: must parse cleanly as a fresh request
        conn.request("GET", "/healthz")
        r2 = conn.getresponse()
        assert r2.status == 200
        assert json.loads(r2.read())["status"] == "ok"
        conn.close()
    finally:
        srv.shutdown()


# ------------------------------------------------------------ real-model e2e

@pytest.mark.slow
def test_serve_build_model_from_config(tmp_path):
    """scripts/serve.py build_model must work end-to-end from a config FILE
    (regression: it once called a nonexistent Config.fromfile and every
    serving CLI crashed at startup)."""
    import yaml

    from scripts.serve import build_model, parse_args
    from tests.test_comp_model import tiny_opt

    cfg_path = tmp_path / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(json.loads(json.dumps(tiny_opt())), f)
    args = parse_args([str(cfg_path), "--wire", "device"])
    model = build_model(args)
    assert model.wire_format == "device"
    assert model.codec_y is not None  # codec_setup ran


@pytest.mark.slow
def test_http_end_to_end_tiny_model():
    """Full serving path on the tiny real codec: PNG -> /compress -> .bin ->
    /decompress -> PNG, with concurrent mixed-rate requests coalescing into
    one batched dispatch."""
    from crdr_tpu.models import build_comp_model
    from tests.test_comp_model import tiny_opt

    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    model.codec_setup()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)

    srv, base = _start_server(model, max_batch=4, max_wait_s=1.0,
                              default_beta=0.0)
    try:
        # warm the executables so the coalesce window isn't eaten by compile
        model.compress_batch(np.zeros((1, 64, 64, 3), np.uint8), rate_ind=0.0)

        results = [None] * 3
        def _one(i, q):
            results[i] = _post(base + f"/compress?q={q}",
                               _png_bytes(imgs[i]))
        threads = [threading.Thread(target=_one, args=(i, q))
                   for i, q in enumerate((0.0, 1.0, 2.0))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        bins = []
        for status, headers, blob in results:
            assert status == 200
            assert float(headers["X-CRDR-BPP"]) > 0
            bins.append(blob)

        # decode each through the server and against the model directly
        for i, blob in enumerate(bins):
            _, _, png = _post(base + "/decompress?beta=0.0", blob)
            from PIL import Image

            served = np.asarray(Image.open(io.BytesIO(png)))
            fake, _, _ = model.decompress(unpack_byte_strings(blob),
                                          beta=0.0)
            from crdr_tpu.utils.img_utils import tensor_to_uint8

            direct = np.asarray(fake)
            direct = (direct[0] if direct.dtype == np.uint8
                      else tensor_to_uint8(direct[0]))
            np.testing.assert_array_equal(served, direct)

        hist = srv.batcher.stats()["batch_hist"]
        assert max(hist) >= 2, f"no coalescing happened: {hist}"
    finally:
        srv.shutdown()
