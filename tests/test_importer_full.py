"""Full-model weight import: build a torch state dict with the reference's
EXACT key layout for the flagship BetaCondInterpCaHyperpriorCharmModel (tiny
dims) and verify every key maps (strict) + activation parity for the
beta-conditioned decoder and a Charm slice transform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from crdr_tpu.importers.torch_import import import_state_dict
from crdr_tpu.models import build_comp_model
from tests.test_comp_model import tiny_opt
from tests.test_importer import _TorchElicEncoder, _TorchNLAM


def _conv(i, o, k, s=1, p=0):
    return tnn.Conv2d(i, o, k, stride=s, padding=p)


def _torch_flagship_state(opt):
    """Reference-layout state dict for the tiny flagship (values random)."""
    sd = {}
    enc = opt.subnet.encoder
    dec = opt.subnet.decoder
    cm = opt.subnet.context_model
    g = torch.Generator().manual_seed(0)

    def add(prefix, module):
        for k, v in module.state_dict().items():
            sd[f"{prefix}.{k}"] = v

    # ---- encoder: ElicInterpCaEncoder = ElicEncoder layers + interp_ca_list
    te = _TorchElicEncoder(in_ch=3, out_ch=enc.out_ch, main_ch=enc.main_ch,
                           mid=enc.block_mid_ch)
    add("encoder", te)
    for i, ch in enumerate([enc.main_ch] * 7 + [enc.out_ch] * 2):
        sd[f"encoder.interp_ca_list.{i}.weight"] = \
            torch.randn(enc.rate_level, 1, ch, 1, 1, generator=g)
        sd[f"encoder.interp_ca_list.{i}.bias"] = \
            torch.randn(enc.rate_level, 1, ch, 1, 1, generator=g) * 0.01

    # ---- decoder: ElicInterpCaBetaCondDecoder
    class TBetaBlock(tnn.Module):
        def __init__(self, ch, mid, cond):
            super().__init__()
            self.conv = tnn.Sequential(
                _conv(ch, mid, 1), tnn.ReLU(), _conv(mid, mid, 3, p=1),
                tnn.ReLU(), _conv(mid, ch, 1))
            self.proj_1 = _conv(cond, mid, 1)
            self.proj_2 = _conv(cond, mid, 1)
            self.proj_3 = _conv(cond, ch, 1)

    class TBetaBlocks(tnn.Module):
        def __init__(self, ch, mid, cond):
            super().__init__()
            for i in range(3):
                setattr(self, f"block{i}", TBetaBlock(ch, mid, cond))

    class TDecoder(tnn.Module):
        def __init__(self):
            super().__init__()
            m, mid, cch = dec.main_ch, dec.block_mid_ch, dec.cond_ch
            self.attn1 = _TorchNLAM(dec.in_ch)
            self.conv1 = tnn.ConvTranspose2d(dec.in_ch, m, 5, 2, 2,
                                             output_padding=1)
            self.block1 = TBetaBlocks(m, mid, cch)
            self.conv2 = tnn.ConvTranspose2d(m, m, 5, 2, 2, output_padding=1)
            self.attn2 = _TorchNLAM(m)
            self.block2 = TBetaBlocks(m, mid, cch)
            self.conv3 = tnn.ConvTranspose2d(m, m, 5, 2, 2, output_padding=1)
            self.block3 = TBetaBlocks(m, mid, cch)
            self.conv4 = tnn.ConvTranspose2d(m, dec.out_ch, 5, 2, 2,
                                             output_padding=1)
            self.mlp = tnn.Sequential(tnn.Linear(2 * dec.L, cch), tnn.ReLU(),
                                      tnn.Linear(cch, cch))

    td = TDecoder()
    add("decoder", td)
    for i, ch in enumerate([dec.in_ch] * 2 + [dec.main_ch] * 7):
        sd[f"decoder.interp_ca_list.{i}.weight"] = \
            torch.randn(dec.rate_level, 1, ch, 1, 1, generator=g)
        sd[f"decoder.interp_ca_list.{i}.bias"] = \
            torch.randn(dec.rate_level, 1, ch, 1, 1, generator=g) * 0.01

    # ---- hyper encoder/decoder (Minnen20, tiny dims)
    hz = opt.subnet.hyperencoder.bottleneck_z
    hy = opt.subnet.hyperencoder.bottleneck_y

    class THyperEnc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = _conv(hy, 320, 3, p=1)
            self.conv2 = _conv(320, 256, 5, 2, 2)
            self.conv3 = _conv(256, hz, 5, 2, 2)

    class THDBlock(tnn.Module):
        def __init__(self, out_ch):
            super().__init__()
            self.conv1 = tnn.ConvTranspose2d(hz, 192, 5, 2, 2, output_padding=1)
            self.conv2 = tnn.ConvTranspose2d(192, 256, 5, 2, 2,
                                             output_padding=1)
            self.conv3 = tnn.ConvTranspose2d(256, out_ch, 3, 1, 1)

    class THyperDec(tnn.Module):
        def __init__(self):
            super().__init__()
            half = opt.subnet.hyperdecoder.hyper_out_ch // 2
            self.hd_mu = THDBlock(half)
            self.hd_std = THDBlock(half)

    add("hyperencoder", THyperEnc())
    add("hyperdecoder", THyperDec())

    # ---- charm context model
    sc = cm.bottleneck_y // cm.num_slices
    half = cm.hyper_out_ch // 2

    class TSliceT(tnn.Module):
        def __init__(self, i_ch, o_ch):
            super().__init__()
            self.model = tnn.Sequential(
                _conv(i_ch, 224, 5, p=2), tnn.ReLU(),
                _conv(224, 128, 5, p=2), tnn.ReLU(), _conv(128, o_ch, 3, p=1))

    for kind in ("mean", "scale", "lrp"):
        for i in range(cm.num_slices):
            nsup = min(i, cm.max_support_slices)
            in_ch = half + nsup * sc + (sc if kind == "lrp" else 0)
            add(f"context_model.{kind}_slice_transforms.{i}",
                TSliceT(in_ch, sc))

    # ---- entropy models
    zC = opt.subnet.entropy_model_z.channels
    filters = (1, 3, 3, 3, 3, 1)
    for i in range(5):
        sd[f"entropy_model_z._matrix{i}"] = torch.randn(
            zC, filters[i + 1], filters[i], generator=g) * 0.1
        sd[f"entropy_model_z._bias{i}"] = torch.randn(
            zC, filters[i + 1], 1, generator=g) * 0.1
        if i < 4:
            sd[f"entropy_model_z._factor{i}"] = torch.zeros(
                zC, filters[i + 1], 1)
    sd["entropy_model_z.quantiles"] = torch.randn(zC, 1, 3, generator=g)
    # buffers the importer must skip
    sd["entropy_model_z._quantized_cdf"] = torch.zeros(zC, 10,
                                                       dtype=torch.int32)
    sd["entropy_model_z._offset"] = torch.zeros(zC, dtype=torch.int32)
    sd["entropy_model_z._cdf_length"] = torch.zeros(zC, dtype=torch.int32)
    sd["entropy_model_z.target"] = torch.zeros(3)
    sd["entropy_model_y.scale_table"] = torch.zeros(64)
    return sd, td


@pytest.mark.slow  # 58s on the 1-core CI host (r5 fast-tier triage); the
def test_full_flagship_strict_import_and_decoder_parity():  # small-subnet
    # importer parity tests in test_importer.py keep fast-tier coverage
    opt = tiny_opt()
    model = build_comp_model(opt)
    model.init_params(input_size=64)
    sd, td = _torch_flagship_state(opt)
    state = {k: v.numpy() for k, v in sd.items()}
    params = import_state_dict(state, model.params, use_rate=True,
                               use_beta=True, strict=True)

    # --- decoder activation parity (most intricate mapping) ---------------
    dec_opt = opt.subnet.decoder
    rng = np.random.default_rng(0)
    y = rng.standard_normal((1, dec_opt.in_ch, 4, 4)).astype(np.float32) * 0.5
    beta = 2.56
    # torch forward (mirror of the reference decoder semantics)
    import math

    with torch.no_grad():
        freq = torch.pow(torch.tensor([2.0]), torch.arange(dec_opt.L))
        nb = (torch.tensor([beta]) / dec_opt.max_beta - 0.5) * 2
        emb = torch.cat([torch.sin(nb * freq), torch.cos(nb * freq)])[None]
        cond = td.mlp(emb)[:, :, None, None]
        x = torch.from_numpy(y)
        ca_w = [sd[f"decoder.interp_ca_list.{i}.weight"] for i in range(9)]
        ca_b = [sd[f"decoder.interp_ca_list.{i}.bias"] for i in range(9)]

        def interp_ca(v, i, rate_ind):
            lo = int(np.floor(rate_ind))
            hi = min(lo + 1, dec_opt.rate_level - 1)
            a = hi - rate_ind
            w = ca_w[i][lo] * a + ca_w[i][hi] * (1 - a)
            b = ca_b[i][lo] * a + ca_b[i][hi] * (1 - a)
            return v * torch.nn.functional.softplus(w) + b

        def beta_blocks(blocks, v):
            for j in range(3):
                blk = getattr(blocks, f"block{j}")
                sc_ = v
                v = blk.conv[1](blk.conv[0](v))
                v = v + blk.proj_1(cond)
                v = blk.conv[3](blk.conv[2](v))
                v = v + blk.proj_2(cond)
                v = blk.conv[4](v)
                v = v + blk.proj_3(cond)
                v = v + sc_
            return v

        q = 1.5
        x = td.attn1(interp_ca(x, 0, q))
        x = td.conv1(interp_ca(x, 1, q))
        x = beta_blocks(td.block1, interp_ca(x, 2, q))
        x = td.conv2(interp_ca(x, 3, q))
        x = td.attn2(interp_ca(x, 4, q))
        x = beta_blocks(td.block2, interp_ca(x, 5, q))
        x = td.conv3(interp_ca(x, 6, q))
        x = beta_blocks(td.block3, interp_ca(x, 7, q))
        tx = td.conv4(interp_ca(x, 8, q)).numpy()

    jy = jnp.asarray(y.transpose(0, 2, 3, 1))
    jx = model.net.apply(
        {"params": params}, jy, jnp.asarray([1.5], jnp.float32),
        jnp.asarray([beta], jnp.float32),
        method=lambda n, a, r, b: n.decode(a, r, b))
    np.testing.assert_allclose(np.asarray(jx).transpose(0, 3, 1, 2), tx,
                               rtol=5e-3, atol=5e-4)
