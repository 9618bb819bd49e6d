"""GAN losses (reference src/losses/gan_loss.py)."""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
from jax.nn import relu, sigmoid

from ..utils.registry import LOSS_REGISTRY


def _bce_with_logits(x, target):
    # numerically-stable BCEWithLogits: max(x,0) - x*t + log(1 + exp(-|x|))
    return jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))


@LOSS_REGISTRY.register()
class VanillaGANLoss:
    def __init__(self, loss_weight: float, real_label: float = 1.0,
                 fake_label: float = 0.0, loss_reduction: str = "mean"):
        self.lamb = loss_weight
        self.real_label = real_label
        self.fake_label = fake_label
        self.reduction = loss_reduction

    def __call__(self, x, is_real: bool, is_disc: bool = False, mask=None,
                 **kwargs):
        target = self.real_label if is_real else self.fake_label
        loss = _bce_with_logits(x, target)
        if mask is not None:
            loss = loss * mask
        loss = jnp.mean(loss)
        return loss if is_disc else self.lamb * loss


@LOSS_REGISTRY.register()
class MaskedVanillaGANLoss(VanillaGANLoss):
    def __init__(self, loss_weight: float, real_label: float = 1.0,
                 fake_label: float = 0.0):
        super().__init__(loss_weight, real_label, fake_label, "none")


@LOSS_REGISTRY.register()
class MultiscaleVanillaGANLoss:
    def __init__(self, loss_weight: float):
        self.lamb = loss_weight

    def __call__(self, x: List, is_real: bool, is_disc: bool = False, **kwargs):
        target = 1.0 if is_real else 0.0
        loss = sum(jnp.mean(_bce_with_logits(f, target)) for f in x) / len(x)
        return loss if is_disc else self.lamb * loss


@LOSS_REGISTRY.register()
class HingeGANLoss:
    def __init__(self, loss_weight: float):
        self.lamb = loss_weight

    def __call__(self, x, is_real: bool, is_disc: bool = False, **kwargs):
        if is_disc:
            return jnp.mean(relu(1 - x) if is_real else relu(1 + x))
        assert is_real, "G-side hinge loss requires is_real=True"
        return self.lamb * (-jnp.mean(x))


@LOSS_REGISTRY.register()
class MultiscaleHingeGANLoss(HingeGANLoss):
    def __call__(self, x: List, is_real: bool, is_disc: bool = False, **kwargs):
        return sum(super(MultiscaleHingeGANLoss, self).__call__(
            f, is_real=is_real, is_disc=is_disc) for f in x)
