"""Shims that let the ACTUAL reference source tree (/root/reference/src) import
and run under this environment, with NO reference code copied.

The reference depends on four packages absent from this image:

* ``compressai`` (entropy models, rANS coder, GDN, helpers) — re-implemented in
  ``compressai_shim.py`` on top of our own C++ rANS runtime + torch math;
* ``addict`` — minimal attribute-access dict (used by src/utils/options.py);
* ``python_log_indenter`` — no-op indent adapter (src/utils/logger.py:8);
* ``pytorch_msssim`` — stubbed (only calc_ms_ssim touches it; not under test).

``install_shims()`` registers these in ``sys.modules`` and puts /root/reference
on sys.path so ``import src.models`` resolves the reference's own code.  The
parity tests (tests/test_reference_source_parity.py) then compare the reference
modules' outputs against our JAX build through the strict weight importer —
retiring the risk that our hand-written torch mirrors share a misreading with
the JAX port.
"""

from __future__ import annotations

import logging
import sys
import types

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# addict
# ---------------------------------------------------------------------------

class AddictDict(dict):
    """Minimal ``addict.Dict``: attribute access + recursive conversion."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for arg in args:
            if not arg:
                continue
            items = arg.items() if isinstance(arg, dict) else arg
            for k, v in items:
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    @classmethod
    def _hook(cls, item):
        if isinstance(item, dict) and not isinstance(item, AddictDict):
            return cls(item)
        if isinstance(item, (list, tuple)):
            return type(item)(cls._hook(e) for e in item)
        return item

    def __setitem__(self, key, value):
        super().__setitem__(key, self._hook(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            return self.__missing__(key)

    def __missing__(self, key):
        return self.__class__()

    def __delattr__(self, key):
        del self[key]

    def to_dict(self):
        out = {}
        for k, v in self.items():
            if isinstance(v, AddictDict):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(
                    e.to_dict() if isinstance(e, AddictDict) else e for e in v)
            else:
                out[k] = v
        return out

    def __deepcopy__(self, memo):
        import copy
        new = self.__class__()
        memo[id(self)] = new
        for k, v in self.items():
            dict.__setitem__(new, copy.deepcopy(k, memo), copy.deepcopy(v, memo))
        return new


# ---------------------------------------------------------------------------
# python_log_indenter
# ---------------------------------------------------------------------------

class IndentedLoggerAdapter(logging.LoggerAdapter):
    """Just enough of python_log_indenter for src/utils/logger.py: .add()/.sub()
    adjust an indent prefix applied in process()."""

    def __init__(self, logger, spaces: int = 2, **kwargs):
        super().__init__(logger, {})
        self._spaces = spaces
        self._level = 0

    def add(self, n: int = 1):
        self._level += n
        return self

    def sub(self, n: int = 1):
        self._level = max(0, self._level - n)
        return self

    def push(self, *a, **k):
        return self

    def pop(self, *a, **k):
        return self

    def process(self, msg, kwargs):
        return " " * (self._spaces * self._level) + str(msg), kwargs


def install_shims() -> None:
    """Idempotently register the shim modules and the reference sys.path."""
    if REFERENCE_ROOT not in sys.path:
        # Insert AFTER cwd entries so the repo's own `src`-free layout wins;
        # the reference imports are all `src.*` which nothing here shadows.
        sys.path.insert(0, REFERENCE_ROOT)

    if "addict" not in sys.modules:
        m = types.ModuleType("addict")
        m.Dict = AddictDict
        sys.modules["addict"] = m

    if "python_log_indenter" not in sys.modules:
        m = types.ModuleType("python_log_indenter")
        m.IndentedLoggerAdapter = IndentedLoggerAdapter
        sys.modules["python_log_indenter"] = m

    if "pytorch_msssim" not in sys.modules:
        m = types.ModuleType("pytorch_msssim")

        def _unavailable(*a, **k):
            raise NotImplementedError(
                "pytorch_msssim is shimmed for import only; the parity tests "
                "never call ssim/ms_ssim")

        m.ssim = _unavailable
        m.ms_ssim = _unavailable
        sys.modules["pytorch_msssim"] = m

    if "compressai" not in sys.modules:
        from . import compressai_shim as cs

        root = types.ModuleType("compressai")
        ans = types.ModuleType("compressai.ans")
        ans.RansEncoder = cs.RansEncoder
        ans.RansDecoder = cs.RansDecoder
        em = types.ModuleType("compressai.entropy_models")
        em.EntropyBottleneck = cs.EntropyBottleneck
        em.GaussianConditional = cs.GaussianConditional
        layers = types.ModuleType("compressai.layers")
        layers.GDN = cs.GDN
        models = types.ModuleType("compressai.models")
        models.get_scale_table = cs.get_scale_table
        mutils = types.ModuleType("compressai.models.utils")
        mutils.update_registered_buffers = cs.update_registered_buffers
        cxx = types.ModuleType("compressai._CXX")
        cxx.pmf_to_quantized_cdf = cs.pmf_to_quantized_cdf_torch

        root.ans = ans
        root.entropy_models = em
        root.layers = layers
        root.models = models
        models.utils = mutils
        root._CXX = cxx
        sys.modules["compressai"] = root
        sys.modules["compressai.ans"] = ans
        sys.modules["compressai.entropy_models"] = em
        sys.modules["compressai.layers"] = layers
        sys.modules["compressai.models"] = models
        sys.modules["compressai.models.utils"] = mutils
        sys.modules["compressai._CXX"] = cxx
