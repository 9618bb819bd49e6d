"""Parity against the ACTUAL reference source (/root/reference/src).

VERDICT r3 item 1: the strongest parity statement achievable without the
released checkpoint.  The reference's own torch modules (no hand-written
mirror anywhere in the loop) are instantiated at random init through shimmed
compressai imports (tests/ref_shims), their state_dict flows through our
strict weight importer, and we assert

* layerwise activation parity (encoder / hyper pair / charm loop / decoder)
  against src/models/comp_model/beta_cond_interpca_hyperprior_charm_model.py:14
  at FULL flagship dimensions,
* identical CDF tables (entropy_model_z.update / update_scale_table vs our
  host codecs),
* identical quantized symbols, and
* byte-identical [header, z_str, y_str] bitstreams end-to-end
  (compress: beta_cond_interpca_hyperprior_charm_model.py:85-118;
  charm loop: minnen20_charm_context_model.py:88-141), plus a cross-decode of
  our stream by the reference's forward_decompress (:192-240).

Marked slow: builds the 127M-param flagship in both frameworks.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

REF_CFG = "/root/reference/config/crdr.yaml"
Q = 1.5          # fractional -> exercises InterpCA interpolation
BETA = 2.56
SIZE = 64        # one stride tile; latent 4x4, z 1x1


@pytest.fixture(scope="module")
def pair():
    """(reference torch model, our model with imported weights, test image)."""
    from tests.ref_shims import AddictDict, install_shims

    install_shims()
    torch.manual_seed(0)
    np.random.seed(0)

    from src.models import build_comp_model as ref_build  # noqa: E402
    from src.utils.options import BaseConfig  # noqa: E402

    cfg_dict, _, _ = BaseConfig._file2dict_yaml(REF_CFG)
    ropt = AddictDict(cfg_dict)
    ropt.device = "cpu"
    ref = ref_build(ropt)
    ref.eval()

    from crdr_tpu.importers.torch_import import import_state_dict
    from crdr_tpu.models import build_comp_model
    from crdr_tpu.utils.config import Config

    cfg = Config.from_file("config/crdr.yaml")
    cfg["is_train"] = False
    cfg["codec_uint8_io"] = False  # feed the same float tensor on both sides
    ours = build_comp_model(cfg)
    ours.init_params(input_size=SIZE)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()
             if v.numel() > 0}
    ours.params = import_state_dict(state, ours.params, use_rate=True,
                                    use_beta=True, strict=True)

    rng = np.random.default_rng(42)
    img = (rng.random((1, SIZE, SIZE, 3), np.float32) * 2.0 - 1.0)
    return ref, ours, img


def _t(img_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(img_nhwc.transpose(0, 3, 1, 2).copy())


def _n(t: "torch.Tensor") -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _apply(ours, method, *args):
    import jax.numpy as jnp

    args = tuple(jnp.asarray(a) if isinstance(a, np.ndarray) else a
                 for a in args)
    return ours.net.apply({"params": ours.params}, *args, method=method)


def test_layerwise_activation_parity(pair):
    ref, ours, img = pair
    from crdr_tpu.models.net import CompNet

    x_t = _t(img)
    with torch.no_grad():
        y_t = ref.encoder(x_t, Q)
        z_t = ref.hyperencoder(y_t)
        z_hat_t, z_lik_t = ref.entropy_model_z(z_t, is_train=False)
        hyper_t = ref.hyperdecoder(z_hat_t)
        y_hat_t, y_lik_t = ref.context_model(
            y_t, hyper_t, ref.entropy_model_y, is_train=False,
            calc_q_likelihood=False)
        fake_t = ref.decoder(y_hat_t, Q, beta=BETA)

    import jax.numpy as jnp

    ri = jnp.asarray([Q], jnp.float32)
    bt = jnp.asarray([BETA], jnp.float32)
    y_j = _apply(ours, CompNet.encode, img, ri)
    np.testing.assert_allclose(np.asarray(y_j), _n(y_t),
                               rtol=1e-4, atol=2e-4)

    z_j = _apply(ours, CompNet.hyper_encode, y_j)
    np.testing.assert_allclose(np.asarray(z_j), _n(z_t),
                               rtol=1e-4, atol=5e-4)

    out = _apply(ours, lambda n, xx, r, b: n(xx, r, b, is_train=False),
                 img, ri, bt)
    np.testing.assert_allclose(np.asarray(out["quantized_code"]["z"]),
                               _n(z_hat_t), rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["quantized_code"]["y"]),
                               _n(y_hat_t), rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["fake_images"]),
                               np.clip(_n(fake_t), -1.0, 1.0),
                               rtol=1e-3, atol=2e-3)
    # likelihood parity -> rate parity (bits within 0.01%)
    for ours_lik, ref_lik in ((out["likelihoods"]["y"], y_lik_t),
                              (out["likelihoods"]["z"], z_lik_t)):
        bits_j = -np.log2(np.asarray(ours_lik)).sum()
        bits_t = -np.log2(ref_lik.numpy()).sum()
        assert abs(bits_j - bits_t) / max(bits_t, 1.0) < 1e-4, \
            (bits_j, bits_t)


def test_cdf_table_parity(pair):
    ref, ours, _ = pair
    ref.codec_setup()
    ours.codec_setup()

    np.testing.assert_array_equal(ours.codec_z.quantized_cdf,
                                  ref.entropy_model_z._quantized_cdf.numpy())
    np.testing.assert_array_equal(ours.codec_z.cdf_length,
                                  ref.entropy_model_z._cdf_length.numpy())
    np.testing.assert_array_equal(ours.codec_z.offset,
                                  ref.entropy_model_z._offset.numpy())
    np.testing.assert_array_equal(ours.codec_y.quantized_cdf,
                                  ref.entropy_model_y._quantized_cdf.numpy())
    np.testing.assert_array_equal(ours.codec_y.cdf_length,
                                  ref.entropy_model_y._cdf_length.numpy())
    np.testing.assert_array_equal(ours.codec_y.offset,
                                  ref.entropy_model_y._offset.numpy())


def test_bitstream_byte_parity_and_cross_decode(pair):
    ref, ours, img = pair
    ref.codec_setup()
    ours.codec_setup()

    with torch.no_grad():
        ref_out = ref.compress(_t(img), rate_ind=Q)
    our_out = ours.compress(img, rate_ind=Q)

    r_header, r_z, r_y = ref_out["string_list"]
    o_header, o_z, o_y = our_out["string_list"]
    assert bytes(o_header) == bytes(r_header), "header bytes differ"
    assert bytes(o_z) == bytes(r_z), "z stream bytes differ"
    assert bytes(o_y) == bytes(r_y), "y stream bytes differ"

    # identical symbols is implied by byte equality; still check y_hat parity
    np.testing.assert_allclose(np.asarray(our_out["y_hat"]),
                               _n(ref_out["y_hat"]), rtol=1e-4, atol=5e-4)

    # cross-decode: the reference's serial rANS decode loop consumes OUR
    # stream and must reproduce our decoder input exactly
    with torch.no_grad():
        fake_t, z_hat_t, y_hat_t = ref.decompress(
            [bytes(o_header), bytes(o_z), bytes(o_y)], beta=BETA)
    fake_j, z_hat_j, y_hat_j = ours.decompress([o_header, o_z, o_y],
                                               beta=BETA)
    np.testing.assert_allclose(np.asarray(y_hat_j), _n(y_hat_t),
                               rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(fake_j), _n(fake_t),
                               rtol=1e-3, atol=2e-3)


# --- operating-point matrix (VERDICT r4 item 3) -------------------------
#
# Byte parity at one point (Q=1.5, 64x64) can break at the InterpCA integer
# endpoints (interp_channel_attention.py:39-66: floor==ceil path at q=0/4),
# at the reflect-pad/crop boundary (base_model.py:137-167: sizes not a
# multiple of the stride 64), in the MultiRateHeaderHandler rate-ind byte
# (codec_utils.py:81-125), or only at batch>1.  Sweep those axes; every
# point asserts full [header, z, y] byte identity plus a reference
# cross-decode of our stream at the given beta (the beta axis cannot move
# the bitstream — it is decode-side only — so it rides the decode check).
_MATRIX = [
    # (q, beta, (H, W), label)
    (0.0, 0.0, (64, 64), "q-endpoint-low, beta off"),
    (4.0, 5.12, (64, 64), "q-endpoint-high, max beta"),
    (1.5, 2.56, (64, 128), "non-square, no pad"),
    (2.25, 2.56, (100, 96), "reflect-pad path both axes, non-square"),
    (3.0, 1.28, (96, 160), "pad one axis only"),
]


@pytest.mark.parametrize("q,beta,size,label", _MATRIX,
                         ids=[m[3] for m in _MATRIX])
def test_bitstream_parity_matrix(pair, q, beta, size, label):
    ref, ours, _ = pair
    ref.codec_setup()
    ours.codec_setup()
    H, W = size
    rng = np.random.default_rng(int(q * 16) + H + W)
    img = (rng.random((1, H, W, 3), np.float32) * 2.0 - 1.0)

    with torch.no_grad():
        ref_out = ref.compress(_t(img), rate_ind=q)
    our_out = ours.compress(img, rate_ind=q)
    for name, o, r in zip(("header", "z", "y"), our_out["string_list"],
                          ref_out["string_list"]):
        assert bytes(o) == bytes(r), f"{label}: {name} bytes differ"

    with torch.no_grad():
        fake_t, _, y_hat_t = ref.decompress(
            [bytes(s) for s in our_out["string_list"]], beta=beta)
    fake_j, _, y_hat_j = ours.decompress(our_out["string_list"], beta=beta)
    np.testing.assert_allclose(np.asarray(y_hat_j), _n(y_hat_t),
                               rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(fake_j), _n(fake_t),
                               rtol=1e-3, atol=2e-3)
    assert fake_j.shape[1:3] == (H, W), "decode did not crop to source size"


def test_bitstream_parity_batch2(pair):
    """compress_batch streams must equal the reference's one-at-a-time
    encodes (per-image rANS streams are independent; reference compress
    asserts batch 1 — hyperprior_model.py:141 — so it loops)."""
    ref, ours, _ = pair
    ref.codec_setup()
    ours.codec_setup()
    rng = np.random.default_rng(7)
    imgs = (rng.random((2, 64, 64, 3), np.float32) * 2.0 - 1.0)

    our_outs = ours.compress_batch(imgs, rate_ind=1.5)
    for i, our_out in enumerate(our_outs):
        with torch.no_grad():
            ref_out = ref.compress(_t(imgs[i:i + 1]), rate_ind=1.5)
        for name, o, r in zip(("header", "z", "y"), our_out["string_list"],
                              ref_out["string_list"]):
            assert bytes(o) == bytes(r), f"img{i}: {name} bytes differ"
