"""LPIPS (alex) port: AlexNet feature stack + linear heads, in flax/NHWC.

Architecture follows the `lpips` package (used by the reference at
src/losses/perceptual_loss.py:11-30): inputs in [-1, 1] are shifted/scaled by
fixed constants, passed through the 5 AlexNet conv stages, unit-normalized per
channel, weighted by learned 1x1 heads, spatially averaged and summed.

Weights must be imported from a torch LPIPS checkpoint (torchvision AlexNet
features + lpips linear heads) via :func:`load_lpips_params`; no network access
is assumed.  Without weights the module still runs (randomly initialized) for
smoke tests, but is NOT a perceptual metric until real weights are loaded.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import Conv2d

Array = jax.Array

# lpips scaling layer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ALEX_CH = (64, 192, 384, 256, 256)


def _maxpool(x: Array) -> Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features, returning the 5 post-ReLU stages."""

    @nn.compact
    def __call__(self, x: Array):
        outs = []
        x = nn.relu(Conv2d(64, 11, 4, 2, name="conv0")(x))
        outs.append(x)
        x = _maxpool(x)
        x = nn.relu(Conv2d(192, 5, 1, 2, name="conv3")(x))
        outs.append(x)
        x = _maxpool(x)
        x = nn.relu(Conv2d(384, 3, 1, 1, name="conv6")(x))
        outs.append(x)
        x = nn.relu(Conv2d(256, 3, 1, 1, name="conv8")(x))
        outs.append(x)
        x = nn.relu(Conv2d(256, 3, 1, 1, name="conv10")(x))
        outs.append(x)
        return outs


class LPIPSAlex(nn.Module):
    """Full LPIPS-alex distance between two [-1,1] NHWC images."""

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        net = AlexNetFeatures(name="alex")
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a * jax.lax.rsqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            head = Conv2d(1, 1, 1, 0, use_bias=False, name=f"lin{i}")
            total = total + jnp.mean(head(diff), axis=(1, 2, 3))
        return total  # [N]


def init_lpips(rng: Optional[Array] = None) -> Dict:
    """Initialize LPIPS variables (random weights unless imported)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    mod = LPIPSAlex()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return mod.init(rng, x, x)


_TORCH_ALEX_MAP = {
    "features.0": "conv0", "features.3": "conv3", "features.6": "conv6",
    "features.8": "conv8", "features.10": "conv10",
}


def load_lpips_params(alexnet_state: Dict, lpips_state: Dict) -> Dict:
    """Build LPIPS params from torch state dicts.

    * ``alexnet_state``: torchvision AlexNet state_dict (features.* conv weights)
    * ``lpips_state``:   lpips package LPIPS(net='alex') state_dict with
      ``lin{i}.model.1.weight`` 1x1 heads
    """
    params: Dict = {"alex": {}}
    for tname, ours in _TORCH_ALEX_MAP.items():
        w = np.asarray(alexnet_state[f"{tname}.weight"], np.float32)
        b = np.asarray(alexnet_state[f"{tname}.bias"], np.float32)
        params["alex"][ours] = {"weight": w.transpose(2, 3, 1, 0), "bias": b}
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in lpips_state:
                w = np.asarray(lpips_state[cand], np.float32)
                break
        else:
            raise KeyError(f"lin{i} head not found in lpips state dict")
        params[f"lin{i}"] = {"weight": w.transpose(2, 3, 1, 0)}
    return {"params": params}
