"""Dataset construction (reference: src/dataset/__init__.py:20-43)."""

from __future__ import annotations

import copy
from typing import Dict

from ..utils.config import ConfigDict
from ..utils.registry import DATASET_REGISTRY
from . import datasets  # noqa: F401  (registration side effects)
from .loader import DataLoader, cycle


def build_dataset(opt: Dict, is_train: bool = False):
    opt = copy.deepcopy(dict(opt))
    name = opt.pop("name", "")
    dtype = opt.pop("type", "ImageDataset")
    # reference keys the registry by name+type, e.g. 'openimage'+'ImageDataset'
    # -> OpenImageImageDataset; resolve case-insensitively
    candidates = [f"{name}{dtype}", dtype]
    lower_map = {k.lower(): k for k in DATASET_REGISTRY.keys()}
    cls = None
    for cand in candidates:
        if cand in DATASET_REGISTRY:
            cls = DATASET_REGISTRY.get(cand)
            break
        if cand.lower() in lower_map:
            cls = DATASET_REGISTRY.get(lower_map[cand.lower()])
            break
    if cls is None:
        raise KeyError(f"no dataset registered for {candidates}")
    opt = {k: (v.to_dict() if isinstance(v, ConfigDict) else v)
           for k, v in opt.items()}
    return cls(is_train=is_train, **opt)
