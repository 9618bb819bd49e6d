"""End-to-end comp-model tests on a shrunken CRDR architecture.

Covers the reference's implied round-trip invariant (compress.py:126-127
commented allclose): decompressed latents must equal the encoder-side
quantized latents, and the reconstruction must match bit-exactly between the
forward eval path and the codec path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crdr_tpu.models import build_comp_model
from crdr_tpu.utils.config import ConfigDict

pytestmark = pytest.mark.slow


def tiny_opt(model_type="BetaCondInterpCaHyperpriorCharmModel", charm=True,
             rate=True, beta=True):
    subnet = {
        "hyperencoder": {"type": "Minnen20HyperEncoder", "bottleneck_y": 32,
                         "bottleneck_z": 16},
        "hyperdecoder": {"type": "Minnen20HyperDecoder", "bottleneck_z": 16,
                         "hyper_out_ch": 64},
        "entropy_model_z": {"type": "SteEntropyBottleneck", "channels": 16},
        "entropy_model_y": {"type": "SteGaussianMeanScaleConditional",
                            "scale_bound": 0.11},
    }
    enc = {"in_ch": 3, "out_ch": 32, "main_ch": 16, "block_mid_ch": 8}
    dec = {"in_ch": 32, "out_ch": 3, "main_ch": 16, "block_mid_ch": 8,
           "pixel_shuffle": False, "use_tanh": False}
    ca = {"actv": "softplus", "use_interp": True, "use_bias": True}
    if rate:
        enc.update({"type": "ElicInterpCaEncoder", "rate_level": 3,
                    "ca_kwargs": ca})
        if beta:
            dec.update({"type": "ElicInterpCaBetaCondDecoder", "rate_level": 3,
                        "ca_kwargs": ca, "L": 4, "max_beta": 5.12,
                        "cond_ch": 16, "use_pi": False, "weight_init": True})
        else:
            dec.update({"type": "ElicInterpCaDecoder", "rate_level": 3,
                        "ca_kwargs": ca})
    else:
        enc["type"] = "ElicEncoder"
        dec["type"] = "ElicDecoder"
    subnet["encoder"] = enc
    subnet["decoder"] = dec
    if charm:
        subnet["context_model"] = {
            "type": "Minnen20CharmContextModel", "num_slices": 4,
            "hyper_out_ch": 64, "bottleneck_y": 32, "max_support_slices": 2,
        }
    return ConfigDict({"model_type": model_type, "subnet": subnet, "seed": 7})


@pytest.fixture(scope="module")
def flagship():
    model = build_comp_model(tiny_opt())
    model.init_params(input_size=64)
    model.codec_setup()
    return model


def test_forward_shapes_and_bpp(flagship):
    model = flagship
    x = np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    out = model.run_model(x, is_train=True)
    assert out["fake_images"].shape == x.shape
    assert out["bpp"].shape == (2,)
    assert np.all(out["bpp"] > 0) and np.all(np.isfinite(out["bpp"]))
    assert np.all(out["qbpp"] > 0)
    assert 0 <= out["rate_ind"] < 3
    assert 0 <= out["beta"] <= 5.12


def test_eval_forward_pads_and_crops(flagship):
    model = flagship
    x = np.random.default_rng(1).uniform(-1, 1, (1, 50, 70, 3)) \
        .astype(np.float32)
    out = model.run_model(x, rate_ind=1.0, beta=2.56, is_train=False)
    assert out["fake_images"].shape == (1, 50, 70, 3)
    assert out["fake_images"].min() >= -1.0 and out["fake_images"].max() <= 1.0


def test_eval_bpp_uses_original_pixel_count(flagship):
    """Reference contract: bpp divides by the ORIGINAL HxW, not the padded
    one (hyperprior_model.py:40-41) — the padded image is 64x128 here."""
    model = flagship
    x = np.random.default_rng(6).uniform(-1, 1, (1, 50, 70, 3)) \
        .astype(np.float32)
    padded = model.data_preprocess(x, is_train=False)
    assert padded.shape[1:3] == (64, 128)
    _, s_orig = model.forward(padded, 1.0, 2.56, is_train=False,
                              num_pixel=50 * 70)
    _, s_pad = model.forward(padded, 1.0, 2.56, is_train=False,
                             num_pixel=64 * 128)
    ratio = float(np.asarray(s_orig["bpp"])[0] / np.asarray(s_pad["bpp"])[0])
    assert ratio == pytest.approx((64 * 128) / (50 * 70), rel=1e-5)
    out = model.run_model(x, rate_ind=1.0, beta=2.56, is_train=False)
    np.testing.assert_allclose(np.asarray(out["bpp"]),
                               np.asarray(s_orig["bpp"]), rtol=1e-5)


def test_compress_decompress_roundtrip(flagship):
    """The fundamental codec invariant: decode(encode(x)) reproduces the
    encoder-side y_hat/z_hat exactly, and bitstream sizes track predictions."""
    model = flagship
    x = np.random.default_rng(2).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = model.compress(x, rate_ind=2.0)
    assert len(enc["string_list"]) == 3

    fake, z_hat, y_hat = model.decompress(enc["string_list"], beta=1.28)
    np.testing.assert_allclose(z_hat, enc["z_hat"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_hat, enc["y_hat"], rtol=1e-4, atol=1e-4)
    assert fake.shape == (1, 64, 64, 3)

    # real vs predicted size: real includes rANS overhead but must be close
    real_y_bits = len(enc["string_list"][2]) * 8
    assert real_y_bits < enc["pred_y_bit"] * 1.2 + 300
    real_z_bits = len(enc["string_list"][1]) * 8
    assert real_z_bits < enc["pred_z_bit"] * 1.3 + 300


def test_compress_matches_eval_forward(flagship):
    """Codec-path y_hat equals eval-forward y_hat (same quantization)."""
    model = flagship
    x = np.random.default_rng(3).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = model.compress(x, rate_ind=0.0)
    out, _ = model.forward(x, rate_ind=0.0, beta=0.0, is_train=False)
    np.testing.assert_allclose(enc["y_hat"],
                               np.asarray(out["quantized_code"]["y"]),
                               rtol=1e-4, atol=1e-4)


def test_fractional_rate_and_beta(flagship):
    model = flagship
    x = np.random.default_rng(4).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc_lo = model.compress(x, rate_ind=0.0)
    enc_mid = model.compress(x, rate_ind=1.5)
    # fractional rate index round-trips through the uint8 header (q*16)
    fake, _, _ = model.decompress(enc_mid["string_list"], beta=0.64)
    assert fake.shape == (1, 64, 64, 3)


def test_aux_loss_positive(flagship):
    model = flagship
    from crdr_tpu.entropy.bottleneck import EntropyBottleneck

    eb = EntropyBottleneck(channels=16)
    vars_ = {"params": model.params["entropy_model_z"]}
    aux = eb.apply(vars_, method=lambda m: m.loss())
    assert float(aux) > 0


def test_hyperprior_model_no_charm():
    model = build_comp_model(tiny_opt("HyperpriorModel", charm=False,
                                      rate=False, beta=False))
    model.init_params(input_size=64)
    model.codec_setup()
    x = np.random.default_rng(5).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = model.compress(x)
    fake, z_hat, y_hat = model.decompress(enc["string_list"])
    np.testing.assert_allclose(y_hat, enc["y_hat"], rtol=1e-4, atol=1e-4)
    out = model.run_model(x, is_train=False)
    assert out["fake_images"].shape == x.shape


def test_generic_fused_encode_matches_host_pipeline():
    """The fused single-dispatch generic encode (encode_full_generic) must
    produce byte-identical streams to the step-by-step host pipeline
    (encode_latents -> host z-round -> compress_params -> host
    build_indexes -> codec compress), proving device-side rounding and
    scale-table indexing agree with the host codec."""
    model = build_comp_model(tiny_opt("HyperpriorModel", charm=False,
                                      rate=False, beta=False))
    model.init_params(input_size=64)
    model.codec_setup()
    x = np.random.default_rng(11).uniform(-1, 1, (2, 64, 64, 3)) \
        .astype(np.float32)

    enc = model.compress_batch(x)

    # independent host-side pipeline over the individual device programs
    xp = jnp.asarray(model.data_preprocess(x, is_train=False))
    y, z = model._codec_fn("encode_latents")(model.params, xp, None)
    y_np, z_np = np.asarray(y), np.asarray(z)
    med = model.codec_z.medians()[None, None, None, :]
    z_hat_np = np.round(z_np - med) + med
    z_str = model.codec_z.compress(z_np)
    y_mean, y_scale, y_hat, _ = model._codec_fn("compress_params")(
        model.params, jnp.asarray(y_np), jnp.asarray(z_hat_np))
    indexes = model.codec_y.build_indexes(np.asarray(y_scale))
    y_str = model.codec_y.compress(y_np, indexes, means=np.asarray(y_mean))

    for i in range(2):
        assert enc[i]["string_list"][1] == z_str[i], f"z stream {i} differs"
        assert enc[i]["string_list"][2] == y_str[i], f"y stream {i} differs"
        np.testing.assert_allclose(np.asarray(enc[i]["y_hat"]),
                                   np.asarray(y_hat)[i:i + 1],
                                   rtol=1e-5, atol=1e-5)


def test_transform_dtype_bf16_roundtrip():
    """``transform_dtype: bfloat16`` runs the analysis/synthesis transforms
    in real bf16 while the precision-pinned entropy chain stays f32: the
    stream must still round-trip to the exact encoder-side latents, and the
    reconstruction must stay close to the f32 transform path."""
    opt = tiny_opt()
    opt["transform_dtype"] = "bfloat16"
    model = build_comp_model(opt)
    model.init_params(input_size=64)
    model.codec_setup()
    assert model.transform_dtype == jnp.bfloat16

    x = np.random.default_rng(3).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    enc = model.compress(x, rate_ind=1.0)
    fake, z_hat, y_hat = model.decompress(enc["string_list"], beta=0.0)
    np.testing.assert_allclose(z_hat, enc["z_hat"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_hat, enc["y_hat"], rtol=1e-4, atol=1e-4)
    assert fake.dtype == np.float32 and np.all(np.isfinite(fake))

    # same seed => identical weights; the f32 reference reconstruction of
    # the SAME tiny model must be close (bf16 only perturbs the transforms)
    ref = build_comp_model(tiny_opt())
    ref.init_params(input_size=64)
    ref.codec_setup()
    enc32 = ref.compress(x, rate_ind=1.0)
    fake32, _, _ = ref.decompress(enc32["string_list"], beta=0.0)
    assert np.mean(np.abs(fake - fake32)) < 0.05


def test_mixed_rate_batch(flagship):
    """Per-image rate indexes in ONE serving batch: InterpCA broadcasts an
    [N] rate vector, each header carries its own index, and the batched
    decode reproduces the encoder latents bit-exactly (extension — the
    reference conditions a whole batch on one q)."""
    model = flagship
    x = np.random.default_rng(21).uniform(-1, 1, (4, 64, 64, 3)) \
        .astype(np.float32)
    rates = np.asarray([0.0, 0.5, 1.5, 2.0], np.float32)  # 1/16 multiples
    encs = model.compress_batch(x, rate_ind=rates)
    for e, q in zip(encs, rates):
        hd = model.header_handler.decode(e["string_list"][0])
        assert hd["rate_ind"] == float(q)
    fake, _, y_hat = model.decompress_batch(
        [e["string_list"] for e in encs], beta=1.0)
    np.testing.assert_array_equal(
        np.asarray(y_hat),
        np.concatenate([np.asarray(e["y_hat"]) for e in encs]))
    assert fake.shape == x.shape

    # and the batch must equal per-image encodes at the same rates
    for e, q, xi in zip(encs, rates, x):
        single = model.compress(xi[None], rate_ind=float(q))
        assert single["string_list"][0] == e["string_list"][0]


def test_mixed_beta_batch(flagship):
    """Per-image realism weights in one batched decode: each image's
    reconstruction matches its own single-image decode at that beta."""
    model = flagship
    x = np.random.default_rng(22).uniform(-1, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    encs = model.compress_batch(x, rate_ind=1.0)
    betas = np.asarray([0.0, 5.12], np.float32)
    fake, _, _ = model.decompress_batch(
        [e["string_list"] for e in encs], beta=betas)
    for i, b in enumerate(betas):
        ref, _, _ = model.decompress(encs[i]["string_list"], beta=float(b))
        np.testing.assert_allclose(fake[i:i + 1], ref, rtol=0, atol=1e-5)
