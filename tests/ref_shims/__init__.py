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

        class _MSSSIM:  # import-time name only (distortion_loss.py:7);
            def __init__(self, *a, **k):  # building MSSSIMLoss is not
                _unavailable()            # under test

        m.MS_SSIM = _MSSSIM
        m.SSIM = _MSSSIM
        sys.modules["pytorch_msssim"] = m

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401 — real one, if ever installed
        except ImportError:
            # Minimal PIL/numpy implementations of the four transforms
            # src/dataset/data_transform.py:35-39 composes.  Semantics match
            # torchvision (reflect pad_if_needed crop, p=0.5 hflip, [0,1]
            # CHW ToTensor, per-channel Normalize); RNG streams differ,
            # which only matters for crop *positions*, not statistics.
            import numpy as _np
            import torch as _torch
            from PIL import Image as _Image

            class _RandomCrop:
                def __init__(self, size, pad_if_needed=False,
                             padding_mode="reflect"):
                    self.th, self.tw = (size, size) if isinstance(size, int) \
                        else tuple(size)
                    self.pad_if_needed = pad_if_needed
                    self.padding_mode = padding_mode

                def __call__(self, img):
                    a = _np.asarray(img)
                    h, w = a.shape[:2]
                    ph, pw = max(self.th - h, 0), max(self.tw - w, 0)
                    if self.pad_if_needed and (ph or pw):
                        a = _np.pad(a, ((0, ph), (0, pw), (0, 0)),
                                    mode=self.padding_mode)
                        h, w = a.shape[:2]
                    top = _np.random.randint(0, h - self.th + 1)
                    left = _np.random.randint(0, w - self.tw + 1)
                    return _Image.fromarray(
                        a[top:top + self.th, left:left + self.tw])

            class _RandomHorizontalFlip:
                def __init__(self, p=0.5):
                    self.p = p

                def __call__(self, img):
                    if _np.random.random() < self.p:
                        return _Image.fromarray(
                            _np.asarray(img)[:, ::-1].copy())
                    return img

            class _ToTensor:
                def __call__(self, img):
                    a = _np.asarray(img, _np.float32) / 255.0
                    return _torch.from_numpy(a.transpose(2, 0, 1).copy())

            class _Normalize:
                def __init__(self, mean, std):
                    self.mean = _torch.tensor(mean).view(-1, 1, 1)
                    self.std = _torch.tensor(std).view(-1, 1, 1)

                def __call__(self, t):
                    return (t - self.mean) / self.std

            tv = types.ModuleType("torchvision")
            tr = types.ModuleType("torchvision.transforms")
            tr.RandomCrop = _RandomCrop
            tr.RandomHorizontalFlip = _RandomHorizontalFlip
            tr.ToTensor = _ToTensor
            tr.Normalize = _Normalize
            tv.transforms = tr
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tr

    if "wandb" not in sys.modules:
        try:
            import wandb  # noqa: F401 — real one, if ever installed
        except ImportError:
            # import-time name for src/trainer/base_trainer.py:6; only
            # used when opt.use_wandb, which shim-driven runs never set
            m = types.ModuleType("wandb")

            def _no_wandb(*a, **k):
                raise RuntimeError("wandb is shimmed import-only")

            m.init = _no_wandb
            m.log = _no_wandb
            m.Settings = _no_wandb
            sys.modules["wandb"] = m

    if "lpips" not in sys.modules:
        # Random-init architecture clone of lpips.LPIPS(net='alex') (the
        # package and its weights are not downloadable in this image).
        # FLOP- and graph-identical to the real thing, so the reference's
        # stage-1/2/3 perceptual term runs at its true cost — used by
        # scripts/measure_torch_train_baseline.py.  Mirrors the tap/lin/
        # normalize structure of crdr_tpu/metrics/lpips.py (itself a port of
        # reference src/losses/perceptual_loss.py:11-30 semantics).
        import torch as _torch
        import torch.nn as _tnn
        import torch.nn.functional as _tF

        class _AlexFeats(_tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv0 = _tnn.Conv2d(3, 64, 11, 4, 2)
                self.conv3 = _tnn.Conv2d(64, 192, 5, 1, 2)
                self.conv6 = _tnn.Conv2d(192, 384, 3, 1, 1)
                self.conv8 = _tnn.Conv2d(384, 256, 3, 1, 1)
                self.conv10 = _tnn.Conv2d(256, 256, 3, 1, 1)

            def forward(self, x):
                taps = []
                x = _tF.relu(self.conv0(x))
                taps.append(x)
                x = _tF.max_pool2d(x, 3, 2)
                x = _tF.relu(self.conv3(x))
                taps.append(x)
                x = _tF.max_pool2d(x, 3, 2)
                x = _tF.relu(self.conv6(x))
                taps.append(x)
                x = _tF.relu(self.conv8(x))
                taps.append(x)
                x = _tF.relu(self.conv10(x))
                taps.append(x)
                return taps

        class _ShimLPIPS(_tnn.Module):
            def __init__(self, net: str = "alex", **_kw):
                super().__init__()
                assert net == "alex", "shim implements the alex variant only"
                self.feats = _AlexFeats()
                self.lins = _tnn.ModuleList(
                    [_tnn.Conv2d(c, 1, 1, bias=False)
                     for c in (64, 192, 384, 256, 256)])
                self.register_buffer(
                    "shift",
                    _torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1))
                self.register_buffer(
                    "scale",
                    _torch.tensor([.458, .448, .450]).view(1, 3, 1, 1))

            def forward(self, x, y, normalize: bool = False):
                if normalize:  # [0,1] -> [-1,1], like the real package
                    x = 2 * x - 1
                    y = 2 * y - 1
                fx = self.feats((x - self.shift) / self.scale)
                fy = self.feats((y - self.shift) / self.scale)
                tot = 0.0
                for f1, f2, lin in zip(fx, fy, self.lins):
                    n1 = f1 / (f1.norm(dim=1, keepdim=True) + 1e-10)
                    n2 = f2 / (f2.norm(dim=1, keepdim=True) + 1e-10)
                    tot = tot + lin((n1 - n2) ** 2).mean((2, 3), keepdim=True)
                return tot

        m = types.ModuleType("lpips")
        m.LPIPS = _ShimLPIPS
        sys.modules["lpips"] = m

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
