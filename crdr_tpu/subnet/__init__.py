"""Subnet construction from config (reference: src/models/subnet/__init__.py:16)."""

from __future__ import annotations

import copy
from typing import Dict

from flax import linen as nn

from ..utils.config import ConfigDict
from ..utils.registry import (CONTEXTMODEL_REGISTRY, DECODER_REGISTRY,
                              ENCODER_REGISTRY, ENTROPYMODEL_REGISTRY,
                              HYPERDECODER_REGISTRY, HYPERENCODER_REGISTRY)

# import for registration side effects
from .autoencoder import elic, elic_interpca, elic_interpca_beta_cond  # noqa: F401
from .context_model import charm, checkerboard  # noqa: F401
from .hyperprior import minnen20  # noqa: F401
from .. import entropy  # noqa: F401  (registers entropy models)

# alternative model families (Balle18 / Cheng20 / HiFiC) register on import too
from .autoencoder import balle18, cheng20, hific  # noqa: F401  isort: skip
from .hyperprior import alt as hp_alt  # noqa: F401  isort: skip

_REGISTRIES = {
    "encoder": ENCODER_REGISTRY,
    "decoder": DECODER_REGISTRY,
    "hyperencoder": HYPERENCODER_REGISTRY,
    "hyperdecoder": HYPERDECODER_REGISTRY,
    "context_model": CONTEXTMODEL_REGISTRY,
    "entropy_model": ENTROPYMODEL_REGISTRY,
}


def build_subnet(opt: Dict, subnet_type: str, name: str = None) -> nn.Module:
    opt = copy.deepcopy(dict(opt))
    cls_name = opt.pop("type")
    cls = _REGISTRIES[subnet_type].get(cls_name)
    # plain dicts for flax dataclass fields (ConfigDict is unhashable-unsafe there)
    opt = {k: (v.to_dict() if isinstance(v, ConfigDict) else v)
           for k, v in opt.items()}
    if name is not None:
        opt["name"] = name
    return cls(**opt)
