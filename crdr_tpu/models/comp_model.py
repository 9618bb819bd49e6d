"""Composed compression models: the public model API (compress / decompress /
run_model / validation / codec_setup), orchestrating jitted device programs and
the host rANS runtime.

API parity with the reference inheritance chain
(src/models/comp_model/{base_model,hyperprior_model,hyperprior_charm_model,
interpca_hyperprior_model,beta_cond_interpca_hyperprior_model,...}.py).
Key behavioral contracts:

* images flow in [-1, 1]; eval-path inputs are reflect-padded to /64 and
  outputs cropped + clamped (base_model.py:137-167);
* ``compress`` returns ``string_list = [header, z_str, y_str]`` plus predicted
  bit costs (hyperprior_model.py:139-186);
* beta is a decode-side parameter — never stored in the bitstream
  (beta_cond_interpca_hyperprior_model.py:106-135);
* training samples one integer rate_ind per batch and beta = max_beta * U{0..100}/100
  (interpca_hyperprior_model.py:28-29, beta_cond_interpca_hyperprior_model.py:23-26).

TPU-first division of labor: all CNNs (encoder/decoder/hyper/Charm slices) are
jitted XLA programs on device; entropy coding (rANS) is host C++; the Charm
decode interleaves per-slice device programs with streaming host decode.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..entropy import (EntropyBottleneckCodec, GaussianConditionalCodec,
                       get_scale_table)
from ..utils.codec_utils import HeaderHandler, MultiRateHeaderHandler
from ..utils.config import ConfigDict
from ..utils.img_utils import (calc_ms_ssim, calc_psnr, crop_image, pad_image,
                               uint8_to_tensor)
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .net import CompNet

Array = jax.Array

from .codec_common import (_NullCtx, _precision_scope,  # noqa: F401
                           _rate_summary)  # _rate_summary re-exported: trainers import it from here
from .codec_devicewire import DeviceWireCodecMixin
from .codec_hostwire import HostWireCodecMixin
from .codec_programs import CodecProgramsMixin
from .codec_tables import CodecTablesMixin


class BaseModel(CodecTablesMixin, CodecProgramsMixin,
                HostWireCodecMixin, DeviceWireCodecMixin):
    """Python-side model wrapper holding the flax net + params + codec state."""

    use_rate = False
    use_beta = False
    use_charm = False
    stride = 64  # pad stride; overridden by the shape_bucket option

    def __init__(self, opt):
        self.opt = opt
        self.logger = get_root_logger()
        # Shape bucketing: eval/codec inputs pad to a multiple of
        # `shape_bucket` (>= the model stride 64).  Larger buckets bound the
        # number of distinct compiled programs on mixed-size datasets
        # (CLIC/DIV2K) at a small padding-bpp cost; 64 == reference behavior.
        bucket = int(opt.get("shape_bucket", 64) if hasattr(opt, "get") else 64)
        assert bucket % 64 == 0 and bucket > 0, \
            "shape_bucket must be a positive multiple of 64"
        self.stride = bucket
        subnet_opt = opt.subnet.to_dict() if isinstance(opt.subnet, ConfigDict) \
            else dict(opt.subnet)
        # CompressAI-compat [0,1] range option (reference base_model.py:22-27)
        self.convert_img_range = bool(opt.get("convert_img_range_to_01", False)
                                      if hasattr(opt, "get") else False)
        # uint8 wire I/O for the codec path: accept uint8 pixel inputs and
        # produce uint8 reconstructions ON DEVICE, quartering the host<->
        # device image transfers.  The uint8->float conversion matches
        # img_utils.uint8_to_tensor bit-for-bit (pure f32 ops), so the
        # bitstream is identical to the float-input path; the output is
        # quantized to the uint8 grid, which is what every reference metric
        # (uint8-round PSNR/MS-SSIM) measures anyway.
        self.codec_uint8_io = bool(opt.get("codec_uint8_io", False)
                                   if hasattr(opt, "get") else False)
        self.net = CompNet(subnet_opt, use_rate=self.use_rate,
                           use_beta=self.use_beta, use_charm=self.use_charm,
                           img_range_01=self.convert_img_range)
        self.params: Optional[Dict] = None
        self._rng = jax.random.PRNGKey(opt.get("seed", 0) if hasattr(opt, "get")
                                       else 0)
        self._np_rng = np.random.default_rng(
            opt.get("seed", None) if hasattr(opt, "get") else None)
        # codec state (populated by codec_setup)
        self.codec_z: Optional[EntropyBottleneckCodec] = None
        self.codec_y: Optional[GaussianConditionalCodec] = None
        self.header_handler = None
        self._jit_cache: Dict[str, Any] = {}
        # AOT serving hooks (runtime/aot.py): every codec program registers
        # through _register_exe so its dispatches can be recorded for
        # jax.export and later served from a package without re-tracing
        self._aot_package = None
        self._aot_recorder = None
        self._cb_ids_cache: Dict[Tuple[int, int], Tuple[np.ndarray,
                                                        np.ndarray]] = {}
        # context-model geometry / kind
        cm = subnet_opt.get("context_model")
        self.context_type = cm["type"] if cm is not None else None
        if cm is not None:
            self.num_slices = cm["num_slices"]
            self.slice_ch = cm["bottleneck_y"] // cm["num_slices"]
            self.max_support_slices = cm.get("max_support_slices", 5)

    @property
    def _is_checkerboard(self) -> bool:
        return self.context_type == "ElicCheckerboardCharmContextModel"

    # ---------------- parameter management --------------------------------

    def _dummy_args(self) -> Dict:
        kw = {}
        if self.use_rate:
            kw["rate_ind"] = jnp.zeros((1,), jnp.float32)
        if self.use_beta:
            kw["beta"] = jnp.zeros((1,), jnp.float32)
        return kw

    def init_params(self, rng: Optional[Array] = None,
                    input_size: int = 256) -> Dict:
        """Initialize parameters.  The init trace runs on CPU at the minimum
        spatial size (param values are independent of H/W): compiling the full
        flagship forward on the accelerator just to draw init values costs
        minutes via remote compile; on CPU at 64x64 it is seconds."""
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        size = min(input_size, 64)
        x = jnp.zeros((1, size, size, 3), jnp.float32)
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        ctx = jax.default_device(cpu) if cpu is not None else _NullCtx()
        with ctx:
            variables = self.net.init({"params": rng}, x, is_train=False,
                                      **self._dummy_args())
        # The init trace ran with CPU as the default device, so the drawn
        # arrays are committed to host memory; without an explicit target,
        # device_put leaves them there and EVERY subsequent jitted call
        # re-uploads the full 0.5GB f32 weight set through the host link.
        # Pin the weights to the accelerator once, here.
        self.params = jax.device_put(variables["params"], jax.devices()[0])
        return self.params

    def next_rng(self) -> Array:
        self._rng, rng = jax.random.split(self._rng)
        return rng

    # ---------------- pre/post processing ----------------------------------

    def data_preprocess(self, real_images: np.ndarray,
                        is_train: bool = True) -> np.ndarray:
        out = np.asarray(real_images, np.float32)
        if self.convert_img_range:  # [-1,1] -> [0,1]
            out = (out + 1.0) / 2.0
        if not is_train:
            out = pad_image(out, self.stride)
        return out

    def data_postprocess(self, *images, size: Tuple[int, int],
                         is_train: bool) -> Any:
        H, W = size
        out = []
        for img in images:
            img = np.asarray(img)
            if self.convert_img_range:  # [0,1] -> [-1,1]
                img = (img - 0.5) * 2.0
            if not is_train:
                img = crop_image(img, H, W)
                img = np.clip(img, -1.0, 1.0)
            out.append(img)
        return out[0] if len(out) == 1 else tuple(out)

    # ---------------- sampling (training-time controls) ---------------------

    def sample_rate_ind(self) -> float:
        return float(self._np_rng.integers(0, self.rate_level))

    def sample_beta(self) -> float:
        return self.max_beta * float(self._np_rng.integers(0, 101)) / 100.0

    # ---------------- forward ----------------------------------------------

    @property
    def codec_precision(self) -> str:
        """Matmul precision for codec/eval paths.  'highest' (f32 on the MXU)
        keeps entropy parameters deterministic across platforms — required for
        reference-checkpoint rate parity; set ``codec_precision: default`` in
        the config to trade that for ~3x faster convs (bf16 passes)."""
        return self.opt.get("codec_precision", "highest") \
            if hasattr(self.opt, "get") else "highest"

    @property
    def transform_precision(self) -> str:
        """Matmul precision for the analysis/synthesis transforms on the
        codec path.  These are side-local (the encoder only runs at encode
        time, the decoder only at decode time), so unlike the hyper-decoder
        + context-model chain they need no encode/decode bitwise agreement —
        a lower precision here can never corrupt the bitstream, it only
        perturbs y (encode) or the reconstruction (decode).  Defaults to
        ``codec_precision``; set ``transform_precision: default`` for ~25%
        faster transforms with rate parity intact."""
        if hasattr(self.opt, "get"):
            return self.opt.get("transform_precision", self.codec_precision)
        return self.codec_precision

    @property
    def transform_dtype(self):
        """Optional REAL dtype (not just matmul-pass precision) for the
        side-local transforms on the codec path: ``transform_dtype: bfloat16``
        casts the analysis/synthesis weights + activations to bf16, halving
        their HBM traffic on top of the bf16 MXU passes that
        ``transform_precision: default`` already buys.  Bitstream-safe by the
        same argument as ``transform_precision`` (encoder-side y/z noise is an
        encoder *choice*; decoder-side it only perturbs the reconstruction —
        the hyper-decoder + context chain stays f32).  None = keep f32."""
        dt = self.opt.get("transform_dtype", None) \
            if hasattr(self.opt, "get") else None
        if dt in ("bf16", "bfloat16"):
            return jnp.bfloat16
        assert dt in (None, "float32", "f32"), dt
        return None

    def _forward_fn(self, is_train: bool):
        key = f"forward_{is_train}"
        if key not in self._jit_cache:
            net = self.net
            prec = None if is_train else self.codec_precision

            def fn(params, x, rate_ind, beta, rng, num_pixel):
                kw = {}
                if self.use_rate:
                    kw["rate_ind"] = rate_ind
                if self.use_beta:
                    kw["beta"] = beta
                with _precision_scope(prec):
                    out = net.apply({"params": params}, x, is_train=is_train,
                                    rng=rng, **kw)
                # bpp divides by the ORIGINAL pixel count, not the padded one
                # (reference run_model takes num_pixel before preprocessing,
                # hyperprior_model.py:40-41) — passed as a traced scalar
                summary = _rate_summary(out, num_pixel)
                return out, summary

            self._register_exe(key, jax.jit(fn))
        return self._jit_cache[key]

    def _register_exe(self, name: str, jit_fn):
        """Install a named device program behind an AOT-capable dispatch
        point (runtime/aot.py ExeDispatch: record / exported-program /
        live-jit selection)."""
        from ..runtime.aot import ExeDispatch

        self._jit_cache[name] = ExeDispatch(self, name, jit_fn)
        return self._jit_cache[name]

    def forward(self, real_images, rate_ind=None, beta=None,
                is_train: bool = True, num_pixel: Optional[int] = None):
        fn = self._forward_fn(is_train)
        rng = self.next_rng() if is_train else jax.random.PRNGKey(0)
        ri = None if rate_ind is None else jnp.asarray([rate_ind], jnp.float32)
        bt = None if beta is None else jnp.asarray([beta], jnp.float32)
        x = jnp.asarray(real_images)
        if num_pixel is None:
            num_pixel = x.shape[1] * x.shape[2]
        return fn(self.params, x, ri, bt, rng,
                  jnp.asarray(num_pixel, jnp.float32))

    def run_model(self, real_images, rate_ind=None, beta=None,
                  is_train: bool = True) -> Dict:
        real_images = np.asarray(real_images)
        N, H, W, _ = real_images.shape
        x = self.data_preprocess(real_images, is_train=is_train)

        if self.use_rate and rate_ind is None:
            if not is_train:
                raise ValueError('"rate_ind" must be specified if is_train=False')
            rate_ind = self.sample_rate_ind()
        if self.use_beta and beta is None:
            if not is_train:
                raise ValueError('"beta" must be specified if is_train=False')
            beta = self.sample_beta()

        out, summary = self.forward(x, rate_ind, beta, is_train,
                                    num_pixel=H * W)
        real_out, fake_out = self.data_postprocess(
            x, out["fake_images"], size=(H, W), is_train=is_train)
        result = dict(
            real_images=real_out,
            fake_images=fake_out,
            y_hat=out["quantized_code"]["y"],
            z_hat=out["quantized_code"]["z"],
            **{k: np.asarray(v) for k, v in summary.items()},
        )
        if self.use_rate:
            result["rate_ind"] = rate_ind
        if self.use_beta:
            result["beta"] = beta
        return result


    # ---------------- validation -------------------------------------------

    def validation(self, dataloader, max_sample_size: int = 100,
                   save_img: bool = False, save_dir: str = "",
                   use_tqdm: bool = False):
        import pandas as pd

        rows = []
        for idx, data in enumerate(dataloader):
            row: Dict[str, Any] = {"idx": idx + 1}
            if self.use_rate:
                for q in range(self.rate_level):
                    kw = {"rate_ind": float(q)}
                    if self.use_beta:
                        kw["beta"] = self.max_beta / 2
                    out = self.run_model(**data, is_train=False, **kw)
                    row[f"bpp_{q + 1}"] = float(np.mean(out["bpp"]))
                    row[f"psnr_{q + 1}"] = calc_psnr(out["real_images"],
                                                     out["fake_images"])
                    row[f"ms_ssim_{q + 1}"] = calc_ms_ssim(out["real_images"],
                                                           out["fake_images"])
                    self._maybe_save(save_img, save_dir, idx, q, out)
            else:
                out = self.run_model(**data, is_train=False)
                row["bpp"] = float(np.mean(out["bpp"]))
                row["psnr"] = calc_psnr(out["real_images"], out["fake_images"])
                row["ms_ssim"] = calc_ms_ssim(out["real_images"],
                                              out["fake_images"])
                self._maybe_save(save_img, save_dir, idx, None, out)
            rows.append(row)
            if idx + 1 >= max_sample_size:
                break
        return pd.json_normalize(rows)

    def _maybe_save(self, save_img, save_dir, idx, q, out) -> None:
        if not save_img:
            return
        import os

        from ..utils.img_utils import imwrite

        suffix = f"_q{q}" if q is not None else ""
        imwrite(os.path.join(save_dir, f"sample_{idx + 1}_fake{suffix}.jpg"),
                out["fake_images"])
        if q in (None, 0):
            imwrite(os.path.join(save_dir, f"sample_{idx + 1}_real.jpg"),
                    out["real_images"])


    # ---------------- checkpoint IO ----------------------------------------

    def state_dict(self) -> Dict:
        return {"params": jax.device_get(self.params)}

    def load_state_dict(self, state: Dict) -> None:
        """Partial-merge load, matching the reference semantics
        (base_model.py:110-113: keys present in the current model load, new
        modules keep their initialization) — this is what makes the
        stage-1 -> stage-2 -> stage-3 handoff work across model classes."""
        if self.params is None:
            # no template to merge into (codec CLI loads before init):
            # trust the checkpoint to be complete for this architecture
            self.params = jax.device_put(state["params"], jax.devices()[0])
            return
        counts = {"loaded": 0, "kept": 0}

        def merge(cur, loaded):
            if not isinstance(cur, dict):
                shape_ok = loaded is not None and not isinstance(loaded, dict) \
                    and tuple(np.shape(loaded)) == tuple(np.shape(cur))
                counts["loaded" if shape_ok else "kept"] += 1
                return jnp.asarray(loaded) if shape_ok else cur
            loaded = loaded if isinstance(loaded, dict) else {}
            return {k: merge(v, loaded.get(k)) for k, v in cur.items()}

        loaded_params = dict(state["params"])
        # stage handoff across classes: the InterpCA encoder/decoder wrap the
        # shared Elic trunk under "body" (flax composition), where the torch
        # reference keeps flat names via subclassing.  Align the nesting so
        # stage-1 trunks land in the stage-2 body (and vice versa).
        for part in ("encoder", "decoder"):
            cur_p = self.params.get(part)
            src_p = loaded_params.get(part)
            if isinstance(cur_p, dict) and isinstance(src_p, dict):
                if "body" in cur_p and "body" not in src_p:
                    loaded_params[part] = {"body": src_p}
                elif "body" not in cur_p and "body" in src_p:
                    loaded_params[part] = {**src_p["body"],
                                           **{k: v for k, v in src_p.items()
                                              if k != "body"}}
        merged = merge(jax.device_get(self.params), loaded_params)
        # Explicit placement: loaded pytrees are host numpy; without a target
        # they'd stay host-committed and re-upload on every jitted call.
        self.params = jax.device_put(merged, jax.devices()[0])
        if counts["kept"]:
            self.logger.info(
                f"partial load: {counts['loaded']} tensors loaded, "
                f"{counts['kept']} kept at init (new modules)")

    def load_learned_weight(self, ckpt_path: str) -> None:
        """Load a checkpoint saved by this framework, or import a reference
        PyTorch ``.pth.tar`` (detected by extension)."""
        if ckpt_path.endswith((".pth", ".pth.tar", ".pt")):
            from ..importers.torch_import import import_reference_checkpoint

            self.params = jax.device_put(
                import_reference_checkpoint(ckpt_path, self), jax.devices()[0])
        else:
            from ..utils.saver import load_pytree

            ckpt = load_pytree(ckpt_path)
            state = ckpt.get("comp_model", ckpt)
            self.load_state_dict(state)
        self.logger.info(f"loaded checkpoint: {ckpt_path}")

    def separate_aux_parameters(self) -> Tuple[Dict, Dict]:
        """Split params into (main, aux-quantiles) trees, as boolean masks
        usable with optax.masked (reference base_model.py:120-135)."""
        def is_quantiles(path) -> bool:
            return any(getattr(k, "key", None) == "quantiles" for k in path)

        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        main = {jax.tree_util.keystr(p) for p, _ in flat if not is_quantiles(p)}
        aux = {jax.tree_util.keystr(p) for p, _ in flat if is_quantiles(p)}
        assert not (main & aux)
        return main, aux


# ---------------------------------------------------------------------------
# concrete model classes (reference class-name parity)
# ---------------------------------------------------------------------------

@MODEL_REGISTRY.register()
class HyperpriorModel(BaseModel):
    pass


@MODEL_REGISTRY.register()
class HyperpriorCharmModel(BaseModel):
    use_charm = True


class _RateMixin:
    def __init__(self, opt):
        self.rate_level = opt.subnet.encoder.rate_level
        assert opt.subnet.encoder.rate_level == opt.subnet.decoder.rate_level
        super().__init__(opt)


@MODEL_REGISTRY.register()
class InterpCaHyperpriorModel(_RateMixin, BaseModel):
    use_rate = True


@MODEL_REGISTRY.register()
class InterpCaHyperpriorCharmModel(_RateMixin, BaseModel):
    use_rate = True
    use_charm = True


class _BetaMixin(_RateMixin):
    def __init__(self, opt):
        super().__init__(opt)
        self.max_beta: float = opt.subnet.decoder.max_beta


@MODEL_REGISTRY.register()
class BetaCondInterpCaHyperpriorModel(_BetaMixin, BaseModel):
    use_rate = True
    use_beta = True


@MODEL_REGISTRY.register()
class BetaCondInterpCaHyperpriorCharmModel(_BetaMixin, BaseModel):
    use_rate = True
    use_beta = True
    use_charm = True
