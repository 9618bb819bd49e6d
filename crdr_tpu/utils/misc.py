"""Misc helpers: module auto-import (registration side effects), pretty printers."""

from __future__ import annotations

import importlib
import os
import os.path as osp
from glob import glob
from typing import Dict


def import_modules(package: str, dirname: str, suffix: str = ".py") -> None:
    """Import every module in ``dirname`` matching ``*suffix`` under ``package``.

    Powers decorator-based registration (reference misc.py:38-45).
    """
    for path in sorted(glob(osp.join(dirname, f"*{suffix}"))):
        name = osp.splitext(osp.basename(path))[0]
        if name.startswith("_"):
            continue
        importlib.import_module(f"{package}.{name}")


def dict2str(d: Dict, indent: int = 0) -> str:
    lines = []
    pad = "  " * indent
    for k, v in d.items():
        if isinstance(v, dict):
            lines.append(f"{pad}{k}:")
            lines.append(dict2str(v, indent + 1))
        else:
            lines.append(f"{pad}{k}: {v}")
    return "\n".join(lines)
