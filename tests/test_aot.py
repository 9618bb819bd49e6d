"""AOT serving packages: record -> export -> load in a fresh model ->
byte-identical streams served from the exported programs (no live trace),
with transparent live fallback for unseen shapes."""

import numpy as np
import pytest

from crdr_tpu.models import build_comp_model
from crdr_tpu.runtime.aot import (export_package, load_package,
                                  record_serving_roundtrip)
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def _aot_hit_count(model):
    return sum(getattr(f, "aot_hits", 0) for f in model._jit_cache.values())


def _fresh_pair():
    m1 = build_comp_model(tiny_opt())
    m1.init_params(input_size=64)
    m1.codec_setup()
    m2 = build_comp_model(tiny_opt())
    m2.init_params(input_size=64)
    m2.load_state_dict(m1.state_dict())
    m2.codec_setup()
    return m1, m2


def test_aot_roundtrip_byte_identical(tmp_path):
    m1, m2 = _fresh_pair()
    record_serving_roundtrip(m1, 2, 64, 64, rate_ind=1.0, beta=0.0)
    manifest = export_package(m1, str(tmp_path / "pkg"), platforms=("cpu",))
    assert manifest["entries"], f"nothing exported: {manifest}"
    # every recorded program should export on its own platform
    assert not manifest["skipped"], manifest["skipped"]

    load_package(m2, str(tmp_path / "pkg"))
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    kw = {"rate_ind": 1.0} if m1.use_rate else {}
    e_live = m1.compress_batch(imgs, **kw)
    e_aot = m2.compress_batch(imgs, **kw)
    assert _aot_hit_count(m2) > 0, "no dispatch used the exported programs"
    for a, b in zip(e_live, e_aot):
        assert a["string_list"] == b["string_list"]

    dkw = {"beta": 0.0} if m1.use_beta else {}
    f_live, _, y_live = m1.decompress_batch(
        [e["string_list"] for e in e_live], **dkw)
    hits_before = _aot_hit_count(m2)
    f_aot, _, y_aot = m2.decompress_batch(
        [e["string_list"] for e in e_aot], **dkw)
    assert _aot_hit_count(m2) > hits_before
    np.testing.assert_array_equal(np.asarray(y_live), np.asarray(y_aot))
    np.testing.assert_allclose(np.asarray(f_live), np.asarray(f_aot),
                               rtol=1e-6, atol=1e-6)


def test_aot_unseen_shape_falls_back_live(tmp_path):
    m1, m2 = _fresh_pair()
    record_serving_roundtrip(m1, 1, 64, 64, rate_ind=0.0, beta=0.0)
    export_package(m1, str(tmp_path / "pkg"), platforms=("cpu",))
    load_package(m2, str(tmp_path / "pkg"))
    rng = np.random.default_rng(1)
    # a 128px image was never recorded: must still serve, via live trace
    img = rng.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)
    kw = {"rate_ind": 0.0} if m2.use_rate else {}
    encs = m2.compress_batch(img, **kw)
    dkw = {"beta": 0.0} if m2.use_beta else {}
    fake, _, _ = m2.decompress_batch([encs[0]["string_list"]], **dkw)
    assert np.asarray(fake).shape[1] == 128


def test_aot_recorder_is_shape_keyed():
    m1 = build_comp_model(tiny_opt())
    m1.init_params(input_size=64)
    m1.codec_setup()
    rec = record_serving_roundtrip(m1, 1, 64, 64)
    n1 = len(rec.entries)
    record_serving_roundtrip(m1, 1, 64, 64)   # same shape: no new entries
    assert len(rec.entries) == n1
    record_serving_roundtrip(m1, 2, 64, 64)   # new batch: new signatures
    assert len(rec.entries) > n1
