"""Full codec roundtrip THROUGH the Pallas fused SliceTransform.

The bf16 kernel changes mu/sigma slightly vs the f32 XLA path, so the
bitstream is only correct if encoder and decoder run the kernel's EXACT
arithmetic on bit-identical inputs.  Round 3 restructured the encode into a
full replay of the decoder's own executables (encode_head -> decode_begin ->
per-slice quantize+step -> replay_pack) precisely to
guarantee that; this test drives compress+decompress end-to-end with the
kernel active (interpret mode, so it runs in CPU CI) and asserts the
invariants that a stream desync would break loudly:

* decoded y_hat is bit-identical to the encoder's y_hat;
* real bpp is within a few percent of the device-predicted bpp;
* the reconstruction equals decode_image(y_hat_enc) bit-exactly.

Reference contract: /root/reference/scripts/compress.py:120-127 (commented
allclose of decompressed vs encoder latents).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from crdr_tpu.models import build_comp_model

from test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def test_pallas_interpret_codec_roundtrip(monkeypatch):
    monkeypatch.setenv("CRDR_PALLAS", "interp")
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    model.codec_setup()

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    enc = model.compress(x, rate_ind=1.0)
    fake, z_hat, y_hat = model.decompress(enc["string_list"], beta=1.28)

    # bit-exact latent roundtrip: any encoder/decoder divergence inside the
    # kernel-driven context chain desynchronizes the rANS stream and lands
    # here as a mismatch
    np.testing.assert_array_equal(np.asarray(y_hat),
                                  np.asarray(enc["y_hat"]))

    nbytes = sum(len(s) for s in enc["string_list"][1:])
    real_bpp = nbytes * 8 / (64 * 64)
    pred_bpp = enc["pred_y_bpp"] + enc["pred_z_bpp"]
    assert real_bpp == pytest.approx(pred_bpp, rel=0.08, abs=0.05)

    # reconstruction must equal the direct synthesis of the encoder's y_hat
    ri = jnp.asarray([1.0], jnp.float32)
    bt = jnp.asarray([1.28], jnp.float32)
    direct = model._codec_fn("decode_image")(
        model.params, jnp.asarray(enc["y_hat"]), ri, bt)
    direct = model.data_postprocess(direct, size=(64, 64), is_train=False)
    np.testing.assert_array_equal(np.asarray(fake), np.asarray(direct))
    assert np.isfinite(np.asarray(fake)).all()
