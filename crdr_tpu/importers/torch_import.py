"""Reference (PyTorch) checkpoint -> crdr_tpu param-tree importer.

Maps the reference's state_dict names (src/models/comp_model/base_model.py
state layout) onto our flax param tree and converts tensor layouts:

* Conv2d      OIHW          -> HWIO            transpose(2, 3, 1, 0)
* ConvTransp. (in,out,kh,kw) -> HWIO + flipped  transpose(2, 3, 0, 1)[::-1, ::-1]
  (our ConvTranspose2d stores the spatially-flipped kernel; see nn/conv.py)
* Linear      (out,in)      -> (in,out)        .T
* InterpCA    (L,1,C,1,1)   -> (L,C)           squeeze
* EntropyBottleneck _matrixK/_biasK/_factorK -> matrices_K/biases_K/factors_K

Works with torch CPU (available in-image) for .pth.tar deserialization.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from ..utils.logger import get_root_logger

# name rewrite rules applied in order (regex, replacement)
_RULES: List[Tuple[str, str]] = [
    # interp CA module lists
    (r"\.interp_ca_list\.(\d+)\.", r".interp_ca_\1."),
    # charm slice transform lists + their inner Sequential
    (r"\.(mean|scale|lrp)_slice_transforms\.(\d+)\.model\.(\d+)\.",
     r".\1_slice_transforms_\2.model_\3."),
    # torch Sequential inside BaseBlock / BetaCondBaseBlock: conv.0 -> conv_0
    (r"\.conv\.(\d+)\.", r".conv_\1."),
    # NLAM blocks: trunk_block.0.c1 -> trunk_block_0.c1
    (r"\.trunk_block\.(\d+)\.", r".trunk_block_\1."),
    (r"\.attention_block\.(\d+)\.", r".attention_block_\1."),
    # beta-cond MLP
    (r"\.mlp\.(\d+)\.", r".mlp_\1."),
    # entropy bottleneck parameters
    (r"\._matrix(\d+)$", r".matrices_\1"),
    (r"\._bias(\d+)$", r".biases_\1"),
    (r"\._factor(\d+)$", r".factors_\1"),
    # discriminator sub-module lists
    (r"\.subD_list\.(\d+)\.", r".subD_\1."),
]

# buffers that are rebuilt host-side (codec_setup) instead of imported
_SKIP_SUFFIXES = ("_quantized_cdf", "_offset", "_cdf_length", "scale_table",
                  "target", "pedestal", "bound", "lower_bound_scale.bound",
                  "likelihood_lower_bound.bound")

# ELIC layer names that live under the `body` submodule in our InterpCA nets
_ELIC_BODY_LAYERS = r"(conv[1-4]|block[1-3]|attn[1-4])"


def _is_conv_transpose(path: str, decoder_is_deconv: bool) -> bool:
    """Decide torch->jax kernel transform by destination path."""
    if ".deconv." in path or path.endswith(".deconv.weight"):
        return True
    # Minnen20 / Balle18 hyper-decoder towers are ConvTranspose stacks
    if re.search(r"hyperdecoder\.hd_(mu|std)\.conv[123]\.weight$", path):
        return True
    if re.search(r"hyperdecoder\.c[12]\.weight$", path):
        # Balle18HyperDecoder c1/c2 (c3 is a regular conv)
        return True
    return False


def map_reference_name(name: str, use_rate: bool, use_beta: bool,
                       pixel_shuffle: bool = False) -> str:
    """Map one reference state_dict key to our param-tree path (dot-joined)."""
    if name.startswith("module."):
        name = name[len("module."):]
    for pat, rep in _RULES:
        name = re.sub(pat, rep, name)

    # InterpCA encoder/decoder wrap the plain ELIC net in a `body` submodule;
    # the beta-cond decoder holds its layers directly (matching the reference).
    if use_rate:
        name = re.sub(rf"^encoder\.{_ELIC_BODY_LAYERS}\.",
                      r"encoder.body.\1.", name)
        if not use_beta:
            name = re.sub(rf"^decoder\.{_ELIC_BODY_LAYERS}\.",
                          r"decoder.body.\1.", name)

    # ELIC decoder up-convs: torch names the ConvTranspose directly `convN`,
    # ours is a submodule UpConv with inner `deconv` (or `conv_0` + shuffle)
    inner = "conv_0" if pixel_shuffle else "deconv"
    name = re.sub(r"^decoder\.(body\.)?conv([1-4])\.(weight|bias)$",
                  rf"decoder.\1conv\2.{inner}.\3", name)
    return name


def import_state_dict(state_dict: Dict[str, "np.ndarray"], expected: Dict,
                      use_rate: bool, use_beta: bool,
                      pixel_shuffle: bool = False, prefix: str = "",
                      strict: bool = False) -> Dict:
    """Convert a {torch_name: array} dict into a nested flax param tree.

    ``expected`` is a template param tree (from module.init) used for shape
    validation and to locate destinations.
    """
    logger = get_root_logger()
    flat_expected = _flatten(expected)
    out = {k: np.asarray(v) for k, v in flat_expected.items()}
    used = set()
    missing_src = []

    for tname, tval in state_dict.items():
        arr = np.asarray(tval, dtype=np.float32)
        if any(tname.endswith(s) for s in _SKIP_SUFFIXES):
            continue
        path = map_reference_name(tname, use_rate, use_beta, pixel_shuffle)
        if prefix:
            path = f"{prefix}.{path}" if not path.startswith(prefix) else path
        if path not in flat_expected:
            missing_src.append(tname)
            continue
        exp_shape = flat_expected[path].shape
        out[path] = _convert(arr, exp_shape, path)
        used.add(path)

    unfilled = sorted(set(flat_expected) - used)
    if missing_src:
        msg = f"importer: {len(missing_src)} source keys unmapped " \
              f"(e.g. {missing_src[:4]})"
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    if unfilled:
        msg = f"importer: {len(unfilled)} params kept at init " \
              f"(e.g. {unfilled[:4]})"
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    return _unflatten(out)


def _convert(arr: np.ndarray, exp_shape: Tuple[int, ...], path: str) -> np.ndarray:
    # Linear (out,in) -> (in,out).  MUST run before any same-shape early
    # return: a SQUARE torch Linear weight (e.g. the 512x512 beta-MLP second
    # layer) matches the expected shape without the transpose and would be
    # imported transposed-wrong otherwise.
    if arr.ndim == 2 and path.endswith(".weight"):
        w = arr.T
        if w.shape != tuple(exp_shape):
            raise ValueError(f"{path}: linear {arr.shape} -> {w.shape} != "
                             f"expected {exp_shape}")
        return w
    if arr.shape == tuple(exp_shape) and arr.ndim < 4:
        return arr
    # InterpCA (L,1,C,1,1) -> (L,C)
    if arr.ndim == 5 and exp_shape == (arr.shape[0], arr.shape[2]):
        return arr[:, 0, :, 0, 0]
    if arr.ndim == 4 and len(exp_shape) == 4:
        if _is_conv_transpose(path, True):
            w = arr.transpose(2, 3, 0, 1)
            w = w[::-1, ::-1].copy()
        else:
            w = arr.transpose(2, 3, 1, 0)
        if w.shape != tuple(exp_shape):
            raise ValueError(
                f"{path}: converted shape {w.shape} != expected {exp_shape} "
                f"(src {arr.shape})")
        return w
    raise ValueError(f"{path}: cannot convert {arr.shape} -> {exp_shape}")


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def import_reference_checkpoint(ckpt_path: str, model) -> Dict:
    """Load a reference ``.pth.tar`` and produce our param tree for ``model``."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("comp_model", ckpt)
    state = {k: v.numpy() if hasattr(v, "numpy") else v
             for k, v in state.items()}
    if model.params is None:
        model.init_params()
    dec_opt = model.net.subnet_opt.get("decoder", {})
    return import_state_dict(
        state, model.params, use_rate=model.use_rate, use_beta=model.use_beta,
        pixel_shuffle=bool(dec_opt.get("pixel_shuffle", False)))
