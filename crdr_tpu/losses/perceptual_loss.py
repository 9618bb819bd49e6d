"""Perceptual (LPIPS) loss (reference src/losses/perceptual_loss.py:11-30).

Weight loading: set ``weights_path`` to a pickle/npz containing torch AlexNet +
lpips head state dicts (see metrics/lpips.py), or set the environment variable
``CRDR_LPIPS_WEIGHTS``.  Without weights the loss runs with random features
(useful for smoke tests / ablation) and logs a prominent warning.
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
                 net: str = "alex", weights_path: Optional[str] = None):
        assert net == "alex", "only the alex backbone is implemented"
        self.lamb = loss_weight
        self.range_norm = range_norm
        self.module = LPIPSAlex()
        weights_path = weights_path or os.environ.get("CRDR_LPIPS_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            self.variables = _load_weights(weights_path)
            get_root_logger().info(f"LPIPS weights loaded: {weights_path}")
        else:
            self.variables = init_lpips()
            get_root_logger().warning(
                "LPIPS running with RANDOM weights (no checkpoint found); "
                "set CRDR_LPIPS_WEIGHTS for a real perceptual loss")

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
