"""Composed-model construction (reference: src/models/__init__.py:21)."""

from __future__ import annotations

from ..utils.registry import MODEL_REGISTRY
from . import comp_model  # noqa: F401  (registration side effects)
from .comp_model import BaseModel


def build_comp_model(opt) -> BaseModel:
    cls = MODEL_REGISTRY.get(opt.model_type)
    return cls(opt)
