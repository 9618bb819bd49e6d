"""DISTS metric port (Ding et al. 2020), flax/NHWC.

Used by the reference's calc_metrics on [0,1] inputs (calc_metrics.py:195-216).
VGG16 backbone with L2-pooling (anti-aliased downsampling), per-stage texture
and structure similarity weighted by learned alpha/beta.  Weights must be
imported from the official DISTS checkpoint via ``CRDR_DISTS_WEIGHTS``
(pickle of the torch state dict); without weights the module runs randomly
initialized (smoke tests only).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import Conv2d

Array = jax.Array

_VGG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_VGG_STD = np.array([0.229, 0.224, 0.225], np.float32)

# VGG16 conv layout per stage (torchvision indices)
_STAGES = [
    [("0", 64), ("2", 64)],
    [("5", 128), ("7", 128)],
    [("10", 256), ("12", 256), ("14", 256)],
    [("17", 512), ("19", 512), ("21", 512)],
    [("24", 512), ("26", 512), ("28", 512)],
]

_CHANNELS = [3, 64, 128, 256, 512, 512]


def _l2_pool(x: Array) -> Array:
    """Hanning-windowed L2 pooling (DISTS downsampling)."""
    win = np.hanning(5)[1:-1]
    k2 = np.outer(win, win)
    k2 = (k2 / k2.sum()).astype(np.float32)
    c = x.shape[-1]
    kern = jnp.asarray(k2)[:, :, None, None] * jnp.ones((1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x * x, kern, (2, 2), [(1, 1), (1, 1)],
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return jnp.sqrt(y + 1e-12)


class VGG16Stages(nn.Module):
    """Returns [input, stage1..stage5] feature list."""

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        outs = [x]
        h = (x - _VGG_MEAN) / _VGG_STD
        for si, stage in enumerate(_STAGES):
            if si > 0:
                h = _l2_pool(h)
            for name, ch in stage:
                h = nn.relu(Conv2d(ch, 3, 1, 1, name=f"conv{name}")(h))
            outs.append(h)
        return outs


class DISTS(nn.Module):
    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        """x, y: [0,1] NHWC.  Returns per-image DISTS distance [N]."""
        net = VGG16Stages(name="vgg")
        fx = net(x)
        fy = net(y)
        total_ch = sum(_CHANNELS)
        alpha = self.param("alpha", lambda k, s: jnp.ones(s, jnp.float32) * 0.1,
                           (total_ch,))
        beta = self.param("beta", lambda k, s: jnp.ones(s, jnp.float32) * 0.1,
                          (total_ch,))
        w_sum = jnp.sum(alpha) + jnp.sum(beta)
        c1 = c2 = 1e-6
        dist1 = 0.0
        dist2 = 0.0
        off = 0
        for a, b in zip(fx, fy):
            ch = a.shape[-1]
            al = alpha[off:off + ch] / w_sum
            be = beta[off:off + ch] / w_sum
            off += ch
            mu_a = jnp.mean(a, axis=(1, 2), keepdims=True)
            mu_b = jnp.mean(b, axis=(1, 2), keepdims=True)
            var_a = jnp.mean((a - mu_a) ** 2, axis=(1, 2))
            var_b = jnp.mean((b - mu_b) ** 2, axis=(1, 2))
            cov = jnp.mean((a - mu_a) * (b - mu_b), axis=(1, 2))
            mu_a, mu_b = mu_a[:, 0, 0], mu_b[:, 0, 0]
            s_text = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
            s_struct = (2 * cov + c2) / (var_a + var_b + c2)
            dist1 = dist1 + jnp.sum(al * s_text, axis=-1)
            dist2 = dist2 + jnp.sum(be * s_struct, axis=-1)
        return 1.0 - (dist1 + dist2)


def load_dists_params(state: Dict) -> Dict:
    """Official DISTS torch state dict -> flax params."""
    params: Dict = {"vgg": {}}
    for k, v in state.items():
        v = np.asarray(v, np.float32)
        if k.startswith("stage"):
            # the official DISTS module registers VGG16 layers under their
            # GLOBAL torchvision feature indices (add_module(str(x), ...)),
            # so "stage2.5.weight" is features[5] == our conv5 directly
            rest = k.split(".")
            g = int(rest[1])
            leaf = rest[-1]
            name = f"conv{g}"
            params["vgg"].setdefault(name, {})
            if leaf == "weight":
                params["vgg"][name]["weight"] = v.transpose(2, 3, 1, 0)
            elif leaf == "bias":
                params["vgg"][name]["bias"] = v
        elif k == "alpha":
            params["alpha"] = v.reshape(-1)
        elif k == "beta":
            params["beta"] = v.reshape(-1)
    return {"params": params}


def init_dists(rng=None) -> Dict:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    mod = DISTS()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return mod.init(rng, x, x)
