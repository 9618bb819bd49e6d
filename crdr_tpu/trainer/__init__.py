"""Trainer construction (reference: src/trainer/__init__.py:10)."""

from __future__ import annotations

from ..utils.registry import TRAINER_REGISTRY
from . import gan_trainer, rd_trainer  # noqa: F401  (registration side effects)
from .base_trainer import BaseTrainer, TrainState


def build_trainer(opt) -> BaseTrainer:
    return TRAINER_REGISTRY.get(opt.trainer.type)(opt)
