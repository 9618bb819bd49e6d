"""Weight-importer parity tests: build torch modules with the reference's exact
layer names/shapes, import their state dicts into our flax modules, and check
activations match to float tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from crdr_tpu.importers.torch_import import import_state_dict, map_reference_name
from crdr_tpu.subnet.autoencoder.elic import ElicEncoder
from crdr_tpu.subnet.hyperprior.minnen20 import Minnen20HyperDecoder


class _TorchBaseBlock(tnn.Module):
    def __init__(self, ch, mid):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(ch, mid, 1), tnn.ReLU(),
            tnn.Conv2d(mid, mid, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(mid, ch, 1))

    def forward(self, x):
        return x + self.conv(x)


class _TorchBlocks(tnn.Module):
    def __init__(self, ch, mid, n=3):
        super().__init__()
        for i in range(n):
            setattr(self, f"block{i}", _TorchBaseBlock(ch, mid))
        self.n = n

    def forward(self, x):
        for i in range(self.n):
            x = getattr(self, f"block{i}")(x)
        return x


class _TorchNLAMRes(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        mid = ch // 2
        self.c1 = tnn.Conv2d(ch, mid, 1)
        self.c2 = tnn.Conv2d(mid, mid, 3, padding=1)
        self.c3 = tnn.Conv2d(mid, ch, 1)

    def forward(self, x):
        out = torch.relu(self.c1(x))
        out = torch.relu(self.c2(out))
        return self.c3(out) + x


class _TorchNLAM(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.trunk_block = tnn.Sequential(*[_TorchNLAMRes(ch) for _ in range(3)])
        self.attention_block = tnn.Sequential(*[_TorchNLAMRes(ch)
                                                for _ in range(3)])
        self.conv = tnn.Conv2d(ch, ch, 1)

    def forward(self, x):
        trunk = self.trunk_block(x)
        attn = torch.sigmoid(self.conv(self.attention_block(x)))
        return x + trunk * attn


class _TorchElicEncoder(tnn.Module):
    """Mirror of the reference ElicEncoder (elic_autoencoder.py:31-72)."""

    def __init__(self, in_ch=3, out_ch=16, main_ch=8, mid=4):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, main_ch, 5, 2, 2)
        self.block1 = _TorchBlocks(main_ch, mid)
        self.conv2 = tnn.Conv2d(main_ch, main_ch, 5, 2, 2)
        self.block2 = _TorchBlocks(main_ch, mid)
        self.attn2 = _TorchNLAM(main_ch)
        self.conv3 = tnn.Conv2d(main_ch, main_ch, 5, 2, 2)
        self.block3 = _TorchBlocks(main_ch, mid)
        self.conv4 = tnn.Conv2d(main_ch, out_ch, 5, 2, 2)
        self.attn4 = _TorchNLAM(out_ch)

    def forward(self, x):
        x = self.block1(self.conv1(x))
        x = self.attn2(self.block2(self.conv2(x)))
        x = self.block3(self.conv3(x))
        return self.attn4(self.conv4(x))


def test_name_mapping_samples():
    assert map_reference_name("encoder.conv1.weight", False, False) \
        == "encoder.conv1.weight"
    assert map_reference_name("encoder.conv1.weight", True, True) \
        == "encoder.body.conv1.weight"
    assert map_reference_name("encoder.block1.block0.conv.0.weight", True, True) \
        == "encoder.body.block1.block0.conv_0.weight"
    assert map_reference_name("decoder.conv2.weight", True, True) \
        == "decoder.conv2.deconv.weight"
    assert map_reference_name("decoder.conv2.weight", True, False) \
        == "decoder.body.conv2.deconv.weight"
    assert map_reference_name("decoder.interp_ca_list.3.weight", True, True) \
        == "decoder.interp_ca_3.weight"
    assert map_reference_name("entropy_model_z._matrix0", False, False) \
        == "entropy_model_z.matrices_0"
    assert map_reference_name(
        "context_model.mean_slice_transforms.7.model.2.bias", True, True) \
        == "context_model.mean_slice_transforms_7.model_2.bias"
    assert map_reference_name("decoder.mlp.0.weight", True, True) \
        == "decoder.mlp_0.weight"
    assert map_reference_name("decoder.attn1.trunk_block.1.c2.weight", True,
                              True) == "decoder.attn1.trunk_block_1.c2.weight"


def test_elic_encoder_import_parity():
    torch.manual_seed(0)
    tenc = _TorchElicEncoder()
    x = np.random.default_rng(0).standard_normal((1, 3, 32, 32)) \
        .astype(np.float32)
    with torch.no_grad():
        ty = tenc(torch.from_numpy(x)).numpy()

    jenc = ElicEncoder(in_ch=3, out_ch=16, main_ch=8, block_mid_ch=4)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = jenc.init(jax.random.PRNGKey(0), xj)["params"]

    state = {f"encoder.{k}": v.numpy() for k, v in tenc.state_dict().items()}
    params = import_state_dict(state, {"encoder": template}, use_rate=False,
                               use_beta=False, strict=True)
    jy = jenc.apply({"params": params["encoder"]}, xj)
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-4, atol=1e-4)


class _TorchHyperDecoderBlock(tnn.Module):
    def __init__(self, in_ch=8, out_ch=12):
        super().__init__()
        self.conv1 = tnn.ConvTranspose2d(in_ch, 192, 5, 2, 2, output_padding=1)
        self.conv2 = tnn.ConvTranspose2d(192, 256, 5, 2, 2, output_padding=1)
        self.conv3 = tnn.ConvTranspose2d(256, out_ch, 3, 1, 1)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        x = torch.relu(self.conv2(x))
        return self.conv3(x)


class _TorchMinnen20HyperDecoder(tnn.Module):
    def __init__(self, z=8, out=24):
        super().__init__()
        self.hd_mu = _TorchHyperDecoderBlock(z, out // 2)
        self.hd_std = _TorchHyperDecoderBlock(z, out // 2)

    def forward(self, x):
        return torch.cat([self.hd_mu(x), self.hd_std(x)], dim=1)


def test_hyperdecoder_import_parity():
    torch.manual_seed(1)
    thd = _TorchMinnen20HyperDecoder()
    x = np.random.default_rng(1).standard_normal((1, 8, 4, 4)) \
        .astype(np.float32)
    with torch.no_grad():
        ty = thd(torch.from_numpy(x)).numpy()

    jhd = Minnen20HyperDecoder(bottleneck_z=8, hyper_out_ch=24)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = jhd.init(jax.random.PRNGKey(0), xj)["params"]
    state = {f"hyperdecoder.{k}": v.numpy() for k, v in thd.state_dict().items()}
    params = import_state_dict(state, {"hyperdecoder": template},
                               use_rate=False, use_beta=False, strict=True)
    jy = jhd.apply({"params": params["hyperdecoder"]}, xj)
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-4, atol=1e-4)
