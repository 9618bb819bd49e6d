"""Batched encode: per-image results must match single-image compression
exactly (streams, predicted bits), while the device pass runs once."""

import numpy as np
import pytest

from crdr_tpu.models import build_comp_model
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def test_compress_batch_matches_single():
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    model.codec_setup()
    rng = np.random.default_rng(0)
    batch = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)

    batched = model.compress_batch(batch, rate_ind=1.0)
    assert len(batched) == 3
    for i in range(3):
        single = model.compress(batch[i:i + 1], rate_ind=1.0)
        assert batched[i]["string_list"][1] == single["string_list"][1]  # z
        assert batched[i]["string_list"][2] == single["string_list"][2]  # y
        assert batched[i]["pred_y_bit"] == pytest.approx(
            single["pred_y_bit"], rel=1e-5)
        # each batched stream decodes standalone
        fake, _, y_hat = model.decompress(batched[i]["string_list"], beta=0.0)
        np.testing.assert_allclose(y_hat, batched[i]["y_hat"], rtol=1e-4,
                                   atol=1e-4)


def test_decompress_batch_matches_single():
    """Batched decode (one dispatch set for N streams) must reproduce the
    per-image decompress outputs exactly."""
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    model.codec_setup()
    rng = np.random.default_rng(1)
    batch = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)

    encs = model.compress_batch(batch, rate_ind=1.0)
    string_lists = [e["string_list"] for e in encs]
    fake_b, z_b, y_b = model.decompress_batch(string_lists, beta=2.56)
    assert np.asarray(fake_b).shape[0] == 3
    for i in range(3):
        fake_s, z_s, y_s = model.decompress(string_lists[i], beta=2.56)
        np.testing.assert_allclose(np.asarray(y_b)[i], np.asarray(y_s)[0],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fake_b)[i],
                                   np.asarray(fake_s)[0],
                                   rtol=1e-4, atol=1e-4)


def test_decompress_batch_mixed_rate_matches_single():
    """Mixed operating points per batch (round-3 capability: rate indexes
    ride each header and InterpCA broadcasts a per-image [N] rate vector)
    must reproduce the per-image decompress outputs exactly."""
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    model.codec_setup()
    rng = np.random.default_rng(2)
    batch = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    e0 = model.compress(batch[0:1], rate_ind=0.0)
    e1 = model.compress(batch[1:2], rate_ind=2.0)
    lists = [e0["string_list"], e1["string_list"]]
    fake_b, _, y_b = model.decompress_batch(lists)
    for i, enc in enumerate(lists):
        fake_s, _, y_s = model.decompress(enc)
        np.testing.assert_allclose(np.asarray(y_b)[i], np.asarray(y_s)[0],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fake_b)[i],
                                   np.asarray(fake_s)[0],
                                   rtol=1e-4, atol=1e-4)
