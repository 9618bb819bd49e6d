"""Checkpoint saver with rolling deletion (reference: src/utils/model_saver.py).

Checkpoints are msgpack-serialized JAX pytrees (flax.serialization), one file per
label: ``{label}_iter{N|NK}.ckpt``.  Old checkpoints are rolling-deleted: on saving
iter N, the checkpoint from ``N - save_step`` is removed unless it is in
``keep_step`` (list) or ``keep=True`` files are always retained via keep_step.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Any, Dict, List, Optional, Union

import jax
from flax import serialization

from .logger import get_root_logger
from .path import PathHandler, iter2str


def save_pytree(obj: Any, path: str) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    obj = jax.device_get(obj)
    try:
        blob = serialization.to_bytes(obj)
        header = b"MSGP"
    except Exception:
        blob = pickle.dumps(obj)
        header = b"PKLE"
    with open(path, "wb") as f:
        f.write(header)
        f.write(blob)


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    with open(path, "rb") as f:
        header = f.read(4)
        blob = f.read()
    if header == b"PKLE":
        return pickle.loads(blob)
    if target is not None:
        return serialization.from_bytes(target, blob)
    return serialization.msgpack_restore(blob)


class Saver:
    def __init__(self, ckpt_root: str, exp: str, save_step: int,
                 keep_step: Union[List[int], int, None] = None):
        self.path_handler = PathHandler(ckpt_root, exp)
        self.path_handler.make_job_dir()
        self.save_step = save_step
        if keep_step is None:
            keep_step = []
        self.keep_step = keep_step

    def _should_keep(self, itr: int) -> bool:
        if isinstance(self.keep_step, int):
            return self.keep_step > 0 and itr % self.keep_step == 0
        return itr in self.keep_step

    def save(self, state_dict: Dict[str, Any], label: str, current_iter: int,
             keep: bool = True) -> str:
        path = self.path_handler.get_ckpt_path(label, current_iter)
        save_pytree({"iter": current_iter, **state_dict}, path)
        # rolling delete of the previous checkpoint
        prev = current_iter - self.save_step
        if prev > 0 and not (keep and self._should_keep(prev)):
            prev_path = self.path_handler.get_ckpt_path(label, prev)
            if osp.exists(prev_path):
                try:
                    os.remove(prev_path)
                except OSError:
                    get_root_logger().warning(f"failed to remove {prev_path}")
        return path
