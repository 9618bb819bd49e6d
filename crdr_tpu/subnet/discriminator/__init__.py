"""Discriminator construction (reference: src/models/discriminator/__init__.py:15)."""

from __future__ import annotations

import copy
from typing import Dict

from flax import linen as nn

from ...utils.config import ConfigDict
from ...utils.registry import DISCRIMINATOR_REGISTRY

from . import clic21, hific  # noqa: F401  (registration side effects)


def build_discriminator(opt: Dict, name: str = None) -> nn.Module:
    opt = copy.deepcopy(dict(opt))
    cls_name = opt.pop("type")
    cls = DISCRIMINATOR_REGISTRY.get(cls_name)
    opt = {k: (v.to_dict() if isinstance(v, ConfigDict) else v)
           for k, v in opt.items()}
    if name is not None:
        opt["name"] = name
    return cls(**opt)
