"""AOT export/load of the codec's compiled device programs (jax.export).

Serving cold-start on a fresh process pays (a) Python/flax tracing of every
codec program and (b) XLA compilation.  The persistent compilation cache
(runtime/cache.py) removes (b) on the same host; this module removes (a)
anywhere: the traced programs are serialized as StableHLO artifacts
(``jax.export``) into a package directory, and a serving process rehydrates
them without ever tracing the model's Python — it only needs the package,
the checkpoint, and the orchestration code.  Artifacts are lowered for
BOTH tpu and cpu by default (cross-platform lowering works from a CPU-only
host), so one package serves either backend.

Integration point: every device program in the codec path flows through a
named :class:`ExeDispatch` in ``CompModel._jit_cache`` (models/
comp_model.py ``_register_exe``).  The dispatcher
- records (name, concrete args) on first call while an :class:`AotRecorder`
  is armed (``record`` mode — driven by a real compress/decompress
  roundtrip at the target serving shapes),
- prefers a loaded package's exported program whenever the call's argument
  signature matches one recorded at export time, falling back to the live
  ``jax.jit`` path otherwise (new shapes keep working, they just trace).

The reference has no counterpart (PyTorch eager serving); this is
TPU-first deployment infrastructure.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax

__all__ = ["ExeDispatch", "AotRecorder", "AotPackage", "export_package",
           "load_package", "MANIFEST"]

MANIFEST = "manifest.json"


def _leaf_sig(x) -> Tuple:
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return (tuple(x.shape), str(x.dtype),
                bool(getattr(x, "weak_type", False)))
    return ("py", type(x).__name__, repr(x) if isinstance(x, (bool,)) else "")


def _key_str(name: str, args: Tuple) -> str:
    """Stable signature of a dispatch: program name + arg tree structure +
    per-leaf (shape, dtype, weak_type).  Computed identically at record and
    serve time, so a match guarantees the exported program accepts the
    call's arguments."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    return repr((name, str(treedef), tuple(_leaf_sig(l) for l in leaves)))


def _cheap_sig(x, pinned: Optional[Dict[int, Any]] = None) -> Tuple:
    """Near-zero-cost dispatch signature: array leaves by (shape, dtype),
    containers structurally, dicts by identity (param/table dicts are
    stable objects across serving calls — they are replaced wholesale, not
    mutated, when weights change).  ``pinned`` accumulates every dict seen
    so its id cannot be recycled.  Used only to memoize the full
    ``_key_str`` lookup; the full key is what actually gates an AOT hit."""
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return (tuple(x.shape), str(x.dtype))
    if isinstance(x, (tuple, list)):
        return (type(x).__name__,) + tuple(_cheap_sig(v, pinned) for v in x)
    if isinstance(x, dict):
        if pinned is not None:
            pinned.setdefault(id(x), x)
        return ("dict-id", id(x))
    return ("py", type(x).__name__)


class ExeDispatch:
    """One named codec device program: the live jitted callable, plus an
    optional AOT-exported replacement matched on the call signature.
    Delegates unknown attributes (e.g. ``_cache_size``) to the live fn."""

    def __init__(self, owner, name: str, jit_fn: Callable):
        self._owner = owner
        self.name = name
        self.jit_fn = jit_fn
        self.aot_hits = 0
        # cheap-sig -> exported call | None (miss), so the steady-state hot
        # path never re-flattens the params pytree; pinned dicts keep the
        # id()-keyed entries valid
        self._sig_cache: Dict[Tuple, Optional[Callable]] = {}
        self._pinned: Dict[int, Any] = {}

    def _aot_call(self, pkg, args) -> Optional[Callable]:
        sig = _cheap_sig(args, self._pinned)
        try:
            return self._sig_cache[sig]
        except KeyError:
            pass
        call = pkg.lookup(self.name, args)
        self._sig_cache[sig] = call
        return call

    def __call__(self, *args):
        owner = self._owner
        pkg = owner._aot_package
        if pkg is not None:
            call = self._aot_call(pkg, args)
            if call is not None:
                self.aot_hits += 1
                return call(*args)
        rec = owner._aot_recorder
        if rec is not None:
            rec.record(self.name, self.jit_fn, args)
        return self.jit_fn(*args)

    def __getattr__(self, attr):
        return getattr(self.jit_fn, attr)


class AotRecorder:
    """Collects (program name, live jit fn, concrete args) per distinct call
    signature.  Args are retained by reference only, until export."""

    def __init__(self):
        self.entries: Dict[str, Tuple[str, Callable, Tuple]] = {}

    def record(self, name: str, jit_fn: Callable, args: Tuple) -> None:
        key = _key_str(name, args)
        if key not in self.entries:
            self.entries[key] = (name, jit_fn, args)


class AotPackage:
    """Loaded package: lazy-deserializing signature -> exported-call map."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)
        self._files: Dict[str, str] = {
            e["key"]: e["file"] for e in self.manifest["entries"]}
        self._calls: Dict[str, Callable] = {}

    def lookup(self, name: str, args: Tuple) -> Optional[Callable]:
        key = _key_str(name, args)
        call = self._calls.get(key)
        if call is not None:
            return call
        fname = self._files.get(key)
        if fname is None:
            return None
        with open(os.path.join(self.path, fname), "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        self._calls[key] = exported.call
        return exported.call


def export_package(model, out_dir: str,
                   platforms: Tuple[str, ...] = ("tpu", "cpu"),
                   logger=None) -> Dict[str, Any]:
    """Export every program recorded on ``model._aot_recorder`` into
    ``out_dir``.  Programs that refuse to export (e.g. platform-specific
    custom kernels under cross-platform lowering) are skipped with a note —
    they simply stay on the live-trace path at load time."""
    rec = model._aot_recorder
    assert rec is not None and rec.entries, \
        "arm an AotRecorder and run a serving roundtrip before exporting"
    os.makedirs(out_dir, exist_ok=True)
    entries: List[Dict[str, str]] = []
    skipped: List[Dict[str, str]] = []
    for i, (key, (name, jit_fn, args)) in enumerate(
            sorted(rec.entries.items(), key=lambda kv: kv[1][0])):
        try:
            exported = jax.export.export(
                jit_fn, platforms=list(platforms))(*args)
            blob = exported.serialize()
        except Exception as e:  # noqa: BLE001 — skip, keep the live path
            skipped.append({"name": name, "error": f"{type(e).__name__}: {e}"})
            if logger:
                logger.warning(f"aot: skipping {name}: {e}")
            continue
        fname = f"{i:03d}_{name}.jaxexp"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(blob)
        entries.append({"name": name, "key": key, "file": fname,
                        "bytes": len(blob)})
    manifest = {
        "format": "crdr-aot-v1",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "model_class": type(model).__name__,
        "wire_format": getattr(model, "wire_format", "compressai"),
        "entries": entries,
        "skipped": skipped,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def record_serving_roundtrip(model, batch: int, height: int, width: int,
                             rate_ind: float = 0.0, beta: float = 0.0
                             ) -> AotRecorder:
    """Arm (or reuse) the model's recorder and drive one full
    compress+decompress roundtrip at the given serving shape, capturing
    every device program the shape needs.  Call once per (batch, H, W)
    bucket the deployment will serve."""
    import numpy as np

    if model._aot_recorder is None:
        model._aot_recorder = AotRecorder()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, height, width, 3), dtype=np.uint8)
    kw = {"rate_ind": float(rate_ind)} if model.use_rate else {}
    encs = model.compress_batch(imgs, **kw)
    dkw = {"beta": float(beta)} if model.use_beta else {}
    model.decompress_batch([e["string_list"] for e in encs], **dkw)
    return model._aot_recorder


def load_package(model, path: str, logger=None) -> AotPackage:
    """Attach a package to a model: matching codec dispatches run the
    exported programs, everything else stays live.  Warns on provenance
    mismatches (model class / wire format / jax version) instead of
    refusing — signature matching is what actually gates execution."""
    pkg = AotPackage(path)
    man = pkg.manifest
    for field, have in (("model_class", type(model).__name__),
                        ("wire_format", getattr(model, "wire_format",
                                                "compressai")),
                        ("jax_version", jax.__version__)):
        want = man.get(field)
        if want != have and logger:
            logger.warning(
                f"aot package {field} mismatch: package={want} live={have}")
    model._aot_package = pkg
    return pkg
