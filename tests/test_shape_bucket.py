"""Shape bucketing: one compiled program serves all images in a bucket, and
the codec round-trip stays exact with bucketed padding."""

import numpy as np
import pytest

from crdr_tpu.models import build_comp_model
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def test_bucketed_roundtrip_and_single_compile():
    opt = tiny_opt()
    opt["shape_bucket"] = 128
    model = build_comp_model(opt)
    model.init_params(input_size=64)
    model.codec_setup()

    rng = np.random.default_rng(0)
    for shape in ((1, 70, 90, 3), (1, 128, 100, 3), (1, 33, 121, 3)):
        x = rng.uniform(-1, 1, shape).astype(np.float32)
        enc = model.compress(x, rate_ind=1.0)
        fake, _, y_hat = model.decompress(enc["string_list"], beta=0.0)
        assert fake.shape == shape
        np.testing.assert_allclose(y_hat, enc["y_hat"], rtol=1e-4, atol=1e-4)
    # every input above lands in the same 128x128 bucket -> one program each
    assert model._jit_cache["encode_head"]._cache_size() == 1
    assert model._jit_cache["quantize_slice"]._cache_size() == 1
    assert model._jit_cache["replay_pack"]._cache_size() == 1
    assert model._jit_cache["decode_final"]._cache_size() == 1


def test_invalid_bucket_rejected():
    opt = tiny_opt()
    opt["shape_bucket"] = 96  # not a multiple of 64
    with pytest.raises(AssertionError):
        build_comp_model(opt)
