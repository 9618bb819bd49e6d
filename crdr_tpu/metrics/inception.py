"""InceptionV3 (FID flavor) in flax/NHWC for the FID metric.

Architecture follows pytorch-fid's FID Inception (torchvision InceptionV3 with
the FID-specific pool-branch tweaks): BasicConv2d = conv (no bias) + BatchNorm
(eps 1e-3, eval-mode running stats); pool3 2048-d features.  Weights must be
imported from a torch state dict via :func:`load_inception_params`
(``CRDR_INCEPTION_WEIGHTS`` -> pickle of the pytorch-fid state dict); there is
no network access for auto-download.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _avgpool3(x: Array) -> Array:
    """3x3 s1 avg pool, count_include_pad=False (torch default in Inception)."""
    ones = jnp.ones_like(x[..., :1])
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              "SAME")
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    return s / c


def _maxpool3s2(x: Array) -> Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: Sequence[int]
    stride: int = 1
    padding: Sequence[int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel
        ph, pw = self.padding
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.out_ch))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, w, (self.stride, self.stride),
                                         [(ph, ph), (pw, pw)],
                                         dimension_numbers=dn)
        # eval-mode BatchNorm with imported running stats
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        gamma = self.param("bn_weight", nn.initializers.ones, (self.out_ch,))
        beta = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        return gamma * (y - mean) * jax.lax.rsqrt(var + 1e-3) + beta


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avgpool3(x))
        return nn.relu(jnp.concatenate(
            [nn.relu(b1), nn.relu(b5), nn.relu(b3), nn.relu(bp)], axis=-1))


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), 2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), 2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([nn.relu(b3), nn.relu(bd), _maxpool3s2(x)],
                               axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate(
            [nn.relu(b1), nn.relu(b7), nn.relu(bd), nn.relu(bp)], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), 2, name="branch3x3_2")(nn.relu(b3))
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name="branch7x7x3_2")(nn.relu(b7))
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0),
                         name="branch7x7x3_3")(nn.relu(b7))
        b7 = BasicConv2d(192, (3, 3), 2, name="branch7x7x3_4")(nn.relu(b7))
        return jnp.concatenate([nn.relu(b3), nn.relu(b7), _maxpool3s2(x)],
                               axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FIDInceptionE_2 (Mixed_7c) uses max pool

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = nn.relu(BasicConv2d(384, (1, 1), name="branch3x3_1")(x))
        b3 = jnp.concatenate([
            nn.relu(BasicConv2d(384, (1, 3), padding=(0, 1),
                                name="branch3x3_2a")(b3)),
            nn.relu(BasicConv2d(384, (3, 1), padding=(1, 0),
                                name="branch3x3_2b")(b3)),
        ], axis=-1)
        bd = nn.relu(BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x))
        bd = nn.relu(BasicConv2d(384, (3, 3), padding=(1, 1),
                                 name="branch3x3dbl_2")(bd))
        bd = jnp.concatenate([
            nn.relu(BasicConv2d(384, (1, 3), padding=(0, 1),
                                name="branch3x3dbl_3a")(bd)),
            nn.relu(BasicConv2d(384, (3, 1), padding=(1, 0),
                                name="branch3x3dbl_3b")(bd)),
        ], axis=-1)
        if self.use_max_pool:
            pooled = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                           (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
        else:
            pooled = _avgpool3(x)
        bp = nn.relu(BasicConv2d(192, (1, 1), name="branch_pool")(pooled))
        return jnp.concatenate([nn.relu(b1), b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """uint8/[0,255] NHWC -> pool3 2048-d features (FID protocol)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # pytorch-fid: resize to 299, scale to [-1, 1]
        n = x.shape[0]
        x = jax.image.resize(x, (n, 299, 299, 3), "bilinear")
        x = x / 255.0 * 2.0 - 1.0
        x = nn.relu(BasicConv2d(32, (3, 3), 2, name="Conv2d_1a_3x3")(x))
        x = nn.relu(BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x))
        x = nn.relu(BasicConv2d(64, (3, 3), padding=(1, 1),
                                name="Conv2d_2b_3x3")(x))
        x = _maxpool3s2(x)
        x = nn.relu(BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x))
        x = nn.relu(BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x))
        x = _maxpool3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 2048]


def load_inception_params(state: Dict) -> Dict:
    """torch (pytorch-fid/torchvision) state dict -> flax params."""
    params: Dict = {}
    for k, v in state.items():
        v = np.asarray(v, np.float32)
        parts = k.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            dest, leaf = parts[:-2], "weight"
            v = v.transpose(2, 3, 1, 0)
        elif parts[-2] == "bn":
            leaf = {"weight": "bn_weight", "bias": "bn_bias",
                    "running_mean": "bn_mean",
                    "running_var": "bn_var"}.get(parts[-1])
            if leaf is None:
                continue
            dest = parts[:-2]
        else:
            continue  # fc head etc. — unused for pool3 features
        node = params
        for p in dest:
            node = node.setdefault(p, {})
        node[leaf] = v
    return {"params": params}


def make_inception_extractor(weights_path: str) -> Callable:
    """Returns batch(uint8 NHWC) -> [N, 2048] features."""
    import pickle

    with open(weights_path, "rb") as f:
        state = pickle.load(f)
    variables = load_inception_params(state)
    mod = InceptionV3Features()
    fwd = jax.jit(lambda x: mod.apply(variables, x))

    def extract(batch: np.ndarray) -> np.ndarray:
        return np.asarray(fwd(jnp.asarray(batch, jnp.float32)))

    return extract
