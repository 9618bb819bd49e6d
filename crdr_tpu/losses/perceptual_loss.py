"""Perceptual (LPIPS) loss (reference src/losses/perceptual_loss.py:11-30).

Weight loading: set ``weights_path`` to a pickle/npz containing torch AlexNet +
lpips head state dicts (see metrics/lpips.py, scripts/convert_weights.py), or
set the environment variable ``CRDR_LPIPS_WEIGHTS``.  Without weights the loss
REFUSES to build — training against randomly-initialized features silently
optimizes garbage.  Pass ``allow_random: True`` (or env
``CRDR_ALLOW_RANDOM_LPIPS=1``) for smoke tests only.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

from ..metrics.lpips import LPIPSAlex, init_lpips, load_lpips_params
from ..utils.logger import get_root_logger
from ..utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register()
class LPIPSLoss:
    def __init__(self, loss_weight: float, range_norm: bool = False,
                 net: str = "alex", weights_path: Optional[str] = None,
                 allow_random: bool = False):
        assert net == "alex", "only the alex backbone is implemented"
        self.lamb = loss_weight
        self.range_norm = range_norm
        self.module = LPIPSAlex()
        weights_path = weights_path or os.environ.get("CRDR_LPIPS_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            self.variables = _load_weights(weights_path)
            get_root_logger().info(f"LPIPS weights loaded: {weights_path}")
        elif allow_random or os.environ.get("CRDR_ALLOW_RANDOM_LPIPS"):
            self.variables = init_lpips()
            get_root_logger().warning(
                "LPIPS running with RANDOM weights (allow_random set); "
                "smoke-test mode only — not a real perceptual loss")
        else:
            raise FileNotFoundError(
                "LPIPSLoss requires pretrained AlexNet+lpips weights; none "
                f"found (weights_path={weights_path!r}, CRDR_LPIPS_WEIGHTS "
                "unset). Convert them with scripts/convert_weights.py lpips "
                "or set allow_random: True / CRDR_ALLOW_RANDOM_LPIPS=1 for "
                "smoke tests.")

    def __call__(self, real_images, fake_images, variables=None, **kwargs):
        # `variables` lets the trainer thread the (frozen) feature weights
        # through the jitted step as traced args instead of HLO literals
        if self.range_norm:
            real_images = (real_images - 0.5) * 2.0
            fake_images = (fake_images - 0.5) * 2.0
        val = self.module.apply(variables or self.variables, real_images,
                                fake_images)
        return self.lamb * jnp.mean(val)


def _load_weights(path: str):
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    return load_lpips_params(blob["alexnet"], blob["lpips"])
