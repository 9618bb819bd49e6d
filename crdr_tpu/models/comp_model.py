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


class BaseModel:
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

    # ---------------- codec setup -------------------------------------------

    def codec_setup(self) -> None:
        assert self.params is not None, "initialize or load params first"
        self.header_handler = (MultiRateHeaderHandler() if self.use_rate
                               else HeaderHandler())
        self.codec_z = EntropyBottleneckCodec(self.params["entropy_model_z"])
        self.codec_z.update(force=True)
        scale_bound = float(self.opt.subnet.entropy_model_y.get("scale_bound",
                                                                0.11))
        self.codec_y = GaussianConditionalCodec(scale_bound=scale_bound)
        self.codec_y.update_scale_table(get_scale_table(), force=True)

        enc = self.net.subnet_opt["encoder"]
        hyp = self.net.subnet_opt["hyperencoder"]
        self.yC = enc.get("out_ch", enc.get("bottleneck_y", 320))
        self.zC = hyp.get("bottleneck_z", hyp.get("out_ch", 192))
        self.y_stride = 16
        self.model_stride = 64

        # fused-SliceTransform kernel policy (see ops/charm_uniform.py);
        # the CRDR_PALLAS env var still overrides the config
        from ..ops.charm_uniform import set_fused_default
        set_fused_default(self.opt.get("fused_slice_kernel", None))

        # wire format: "compressai" (default; byte-compatible serial streams)
        # or "device" (lane-interleaved rans32, entropy-decoded ON DEVICE so
        # the whole Charm decode chains asynchronously with no per-slice host
        # round trips — see runtime/lane_rans.py / ops/device_rans.py).
        # CRDR_WIRE env var overrides the config (operator escape hatch).
        self.wire_format = os.environ.get(
            "CRDR_WIRE", self.opt.get("wire_format", "compressai"))
        assert self.wire_format in ("compressai", "device"), self.wire_format
        self.device_wire_lanes = int(self.opt.get("device_wire_lanes", 128))
        self.device_wire_fixup_cap = int(
            self.opt.get("device_wire_fixup_cap", 256))
        # device-wire lane ENCODE placement: "device" (default) runs the
        # rans32 lane coder on the accelerator as one more async dispatch
        # after the pack executable — the encode d2h shrinks to the coded
        # words (~half the sym+idx wire) and the host does zero entropy
        # work; "host" keeps the threaded C++ coder (A/B escape hatch).
        # Bytes are identical either way (tests/test_device_rans_encode.py
        # proves byte equality; the golden digests pin the containers).
        self.device_wire_encoder = os.environ.get(
            "CRDR_DEVICE_ENC", self.opt.get("device_wire_encoder", "device"))
        assert self.device_wire_encoder in ("device", "host"), \
            self.device_wire_encoder
        self._ytab_cache = None
        self._ztab_cache = None
        self._zidx_cache: Dict[Tuple[int, int, int], Array] = {}
        self._lane_enc_cache: Dict[Tuple[int, ...], Tuple] = {}

        # Multi-device serving (capability extension — the reference serves
        # one image on one GPU): `serving_devices: N` shards every batched
        # codec dispatch over an N-device mesh along the batch axis.  Batch
        # ops are embarrassingly parallel, so GSPMD partitions every program
        # with zero collectives; constants/params are replicated.  Batches
        # not divisible by N fall back to replicated placement (correct,
        # just not sharded).  Bitstreams are identical either way: the wire
        # bytes depend only on per-image symbol values.
        n_serve = int(os.environ.get("CRDR_SERVING_DEVICES",
                                     self.opt.get("serving_devices", 1)))
        # "batch": shard dim 0 (throughput for serving batches).  "spatial":
        # shard dim 1 — the HEIGHT axis of images/latents — so ONE huge
        # still decodes across all chips (XLA SPMD inserts the conv halo
        # exchanges; see parallel/spatial.py).  Either way GSPMD only moves
        # placement, never values, so wire bytes match single-device.
        self._serve_partition = self.opt.get("serving_partition", "batch")
        assert self._serve_partition in ("batch", "spatial"), \
            self._serve_partition
        if n_serve > 1:
            devs = jax.devices()
            assert len(devs) >= n_serve, \
                f"serving_devices={n_serve} but only {len(devs)} devices"
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            self._serve_mesh = Mesh(np.asarray(devs[:n_serve]), ("serve",))
            self._dev = NamedSharding(self._serve_mesh, PartitionSpec())
            spec = (PartitionSpec("serve") if self._serve_partition == "batch"
                    else PartitionSpec(None, "serve"))
            self._batch_sharding = NamedSharding(self._serve_mesh, spec)
            # params must live replicated on the SAME device set as the
            # batch inputs, or jit refuses the mixed commitment
            self.params = jax.device_put(self.params, self._dev)
        else:
            self._serve_mesh = None
            self._batch_sharding = None
            self._dev = jax.devices()[0]

        # device-resident codec constants: re-uploading them per call costs
        # an RTT each on a remote-attached accelerator
        self._table_dev = jax.device_put(
            np.asarray(self.codec_y.scale_table, np.float32), self._dev)
        self._scalar_cache: Dict[Tuple[str, float], Array] = {}

        self._charm_packed = None
        if self.use_charm and self.context_type == "Minnen20CharmContextModel":
            from ..ops.charm_uniform import pack_charm_weights

            cm_opt = self.net.subnet_opt["context_model"]
            packed = pack_charm_weights(
                self.params["context_model"], self.num_slices, self.slice_ch,
                cm_opt["hyper_out_ch"] // 2, self.max_support_slices)
            self._charm_packed = {k: jax.device_put(v, self._dev)
                                  for k, v in packed.items()}
        elif self._is_checkerboard:
            from ..ops.cb_uniform import pack_cb_weights

            cm_opt = self.net.subnet_opt["context_model"]
            packed = pack_cb_weights(
                self.params["context_model"], self.num_slices, self.slice_ch,
                cm_opt["hyper_out_ch"] // 2, self.max_support_slices)
            self._charm_packed = {k: jax.device_put(v, self._dev)
                                  for k, v in packed.items()}

    def _place_batch(self, arr) -> Array:
        """Upload a [N, ...] host array for a batched codec dispatch,
        sharded over the serving mesh when one is configured: along dim 0
        (batch) or dim 1 (image/latent height, ``serving_partition:
        spatial``).  Arrays whose sharded dim doesn't exist or divide fall
        back to replicated placement — GSPMD keeps any placement
        value-transparent, so this is a perf choice, never a correctness
        one."""
        arr = np.asarray(arr)
        dim = 0 if self._serve_partition == "batch" else 1
        if (self._batch_sharding is not None and arr.ndim > dim
                and arr.shape[dim] % self._serve_mesh.size == 0):
            return jax.device_put(arr, self._batch_sharding)
        return jax.device_put(arr, self._dev)

    def _dev_scalar(self, kind: str, value: float) -> Array:
        """Cached device-resident [1]-shaped f32 scalar (rate_ind / beta)."""
        key = (kind, float(value))
        if key not in self._scalar_cache:
            self._scalar_cache[key] = jax.device_put(
                np.asarray([float(value)], np.float32), self._dev)
        return self._scalar_cache[key]

    def _cond_arg(self, kind: str, value, n: int) -> Array:
        """Conditioning argument (rate_ind / beta) for a batched dispatch:
        the cached [1] scalar when uniform, a [n] device vector when
        per-image (InterpCA and the Fourier-beta MLP broadcast [N]-shaped
        conditioners per sample — mixed-rate/mixed-realism batches ride one
        dispatch).  Replicated placement: conditioners are tiny and feed
        every shard."""
        arr = np.asarray(value, np.float32).reshape(-1)
        if arr.size == 1:
            return self._dev_scalar(kind, float(arr[0]))
        assert arr.size == n, \
            f"{kind}: got {arr.size} values for a batch of {n}"
        return jax.device_put(arr, self._dev)

    def _ytab(self) -> Dict[str, Array]:
        """Device-resident y CDF tables for the on-device entropy decoder
        (int32; uploaded once per codec_setup)."""
        if self._ytab_cache is None:
            self._ytab_cache = {
                "cdf": jax.device_put(
                    np.asarray(self.codec_y.quantized_cdf, np.int32),
                    self._dev),
                "len": jax.device_put(
                    np.asarray(self.codec_y.cdf_length, np.int32), self._dev),
                "off": jax.device_put(
                    np.asarray(self.codec_y.offset, np.int32), self._dev),
            }
        return self._ytab_cache

    def _ztab(self) -> Dict[str, Array]:
        """Device-resident z (factorized bottleneck) CDF tables for the
        on-device entropy decoder."""
        if self._ztab_cache is None:
            self._ztab_cache = {
                "cdf": jax.device_put(
                    np.asarray(self.codec_z.quantized_cdf, np.int32),
                    self._dev),
                "len": jax.device_put(
                    np.asarray(self.codec_z.cdf_length, np.int32), self._dev),
                "off": jax.device_put(
                    np.asarray(self.codec_z.offset, np.int32), self._dev),
            }
        return self._ztab_cache

    def _zidx(self, n: int, zH: int, zW: int) -> Array:
        """Static z CDF-row indexes [n, zH, zW, C] (the factorized
        bottleneck's row IS the channel id), cached per shape."""
        key = (n, zH, zW)
        if key not in self._zidx_cache:
            c = self.codec_z.channels
            assert c <= 255, "z channel count exceeds the uint8 index wire"
            idx = np.broadcast_to(np.arange(c, dtype=np.uint8),
                                  (n, zH, zW, c))
            self._zidx_cache[key] = self._place_batch(idx)
        return self._zidx_cache[key]

    def _z_device(self, z_strs: List[bytes], zH: int, zW: int) -> Array:
        """Device-resident z symbols [N, zH, zW, C] int16 for the decode
        chain.  Lane containers (the device wire encodes z that way, flat
        [h, w, C] C-order — static per-channel CDF rows) entropy-decode ON
        DEVICE, chaining asynchronously into decode_begin; CompressAI z
        streams (the compressai wire, and device-wire .bins written before
        z rode the lane format) decode on host and upload."""
        from ..runtime.lane_rans import LANE_MAGIC

        if z_strs[0][:len(LANE_MAGIC)] == LANE_MAGIC:
            words, fp, fv, fa = self._upload_lane_streams(z_strs)
            ztab = self._ztab()
            sym, _, _ = self._codec_fn("rans_round")(
                None, None, words, self._zidx(len(z_strs), zH, zW),
                fp, fv, fa, np.int32(0),
                ztab["cdf"], ztab["len"], ztab["off"])
            return sym
        z_sym = self.codec_z.decompress(z_strs, (zH, zW))
        return self._place_batch(z_sym.astype(np.int16))

    def _codec_fn(self, name: str):
        """Jitted codec-path programs, created lazily.  All traced under the
        codec matmul-precision policy."""
        if name in self._jit_cache:
            return self._jit_cache[name]
        net = self.net
        prec = self.codec_precision

        if name == "encode_latents":
            def fn(params, x, rate_ind):
                kw = {"rate_ind": rate_ind} if self.use_rate else {}
                return net.apply({"params": params}, x,
                                 method=lambda n, xx, rate_ind=None:
                                 n.encode_latents(xx, rate_ind), **kw)
        elif name == "encode_head":
            # Encode dispatch 1 (see _compress_charm): analysis +
            # hyper-analysis transforms, z hard-round around the medians, and
            # the z bit estimate.  The hyper-DECODE deliberately does NOT
            # live here: the encoder reuses the decoder's own ``decode_begin``
            # executable for it, so the hm/hs feeding the context chain are
            # bit-identical on both sides BY CONSTRUCTION (executable replay)
            # rather than by hoping two differently-fused XLA programs agree
            # to the last f32 ulp — measured on hardware, they don't (~1-2
            # ulps apart), which is harmless for the f32 context chain but
            # desynchronizes the rANS stream when the bf16 Pallas kernels
            # amplify the ulp through their input cast.  (Also dispatch 1 of
            # the generic replay chain — nothing here is Charm-specific.)
            tprec = self.transform_precision
            tdt = self.transform_dtype
            convert01 = self.convert_img_range

            def fn(params, x, rate_ind):
                if x.dtype == jnp.uint8:
                    # device-side uint8_to_tensor (bit-identical f32 ops)
                    x = (x.astype(jnp.float32) / 255.0 - 0.5) * 2.0
                    if convert01:  # data_preprocess: [-1,1] -> [0,1]
                        x = (x + 1.0) / 2.0
                with _precision_scope(tprec):
                    kw = {"rate_ind": rate_ind} if self.use_rate else {}
                    y, z = _apply_encode_latents(net, params, x, kw, tdt)
                med = params["entropy_model_z"]["quantiles"][:, 0, 1] \
                    [None, None, None, :]
                z_sym = jnp.round(z - med)
                z_lik = net.apply({"params": params}, z,
                                  method=lambda n, zz: n.z_likelihood_eval(zz))
                pred_z_bits = -jnp.sum(
                    jnp.log2(jnp.maximum(z_lik, 1e-12)), axis=(1, 2, 3))
                return y, z_sym.astype(jnp.int16), pred_z_bits
        elif name == "quantize_slice":
            # Charm replay-encode helper: hard-round slice i of y around the
            # mu the SHARED step executable just produced.  Output is int16
            # — the same dtype the host-wire and device-wire decoders feed
            # the step executable — so all three paths hit ONE compiled step
            # program.  Shape-uniform in the slice index (one compile).
            sc = self.slice_ch

            def fn(y, i, mu):
                y_slice = jax.lax.dynamic_slice_in_dim(y, i * sc, sc, axis=3)
                return jnp.round(y_slice - mu).astype(jnp.int16)
        elif name == "replay_pack":
            # Charm replay-encode tail: gather the per-slice symbols/indexes
            # the shared step executables produced, reconstruct the last
            # slice (packed kernels, same math as decode_final's head),
            # predicted bits + maxabs, and the packed int16 wire — ONE d2h
            # for the whole encode.  The wire layout matches the former
            # single-scan encoder, so the host unpack is unchanged.
            assert self.use_charm and self.context_type == \
                "Minnen20CharmContextModel"
            from ..entropy.gaussian import gaussian_likelihood
            from ..ops.charm_uniform import uniform_reconstruct_last

            cm_opt = self.net.subnet_opt["context_model"]
            actv = dict(cm_opt.get("slice_transform_kwargs") or {}) \
                .get("actv", "relu")
            bound = self.codec_y.scale_bound
            ns = self.num_slices

            # NOTE: the packed weight stacks are threaded through the
            # params pytree (traced args) — closing over them would embed
            # ~100MB of literals into the HLO
            def fn(params, hm, support, syms, idxs, sigmas, y_slices,
                   mu_last, z_sym, pred_z_bits):
                packed = params["packed"]
                y_last = uniform_reconstruct_last(
                    packed, hm, support, syms[-1].astype(hm.dtype), mu_last,
                    ns, actv)
                y_hat = jnp.concatenate(list(y_slices) + [y_last], axis=-1)
                symbols = jnp.concatenate(list(syms), axis=-1)  # int16
                indexes = jnp.concatenate(list(idxs), axis=-1)  # uint8
                sigma = jnp.concatenate(list(sigmas), axis=-1)
                lik = gaussian_likelihood(symbols.astype(sigma.dtype), sigma,
                                          bound)
                pred_y_bits = -jnp.sum(jnp.log2(lik), axis=(1, 2, 3))  # [N]
                maxabs = jnp.max(jnp.abs(y_hat), axis=(1, 2, 3))  # per image
                # EVERYTHING the host entropy coder needs rides home in ONE
                # int16 array: y symbols + cdf indexes (small ints), the
                # pass-through z symbols, and the f32 scalars (bitcast to
                # int16 pairs) are flattened into a single wire vector
                nb = symbols.shape[0]
                meta = jnp.stack([pred_y_bits, pred_z_bits, maxabs], axis=1)
                meta16 = jax.lax.bitcast_convert_type(
                    meta, jnp.int16).reshape(nb, -1)
                wire = jnp.concatenate(
                    [symbols.reshape(nb, -1),
                     indexes.astype(jnp.int16).reshape(nb, -1),
                     z_sym.reshape(nb, -1), meta16], axis=1)
                return wire, y_hat
        elif name == "generic_params":
            # The SHARED entropy-parameter executable of the generic
            # (non-Charm, non-checkerboard) families: z dequantize +
            # hyper-decode + mean/scale split + rANS indexes, one program.
            # Both the encoder (dispatch 2 of its replay chain) and the
            # decoder (its bootstrap) run THIS executable, so the indexes
            # that choose the CDF rows are bit-identical on both sides by
            # construction — the generic counterpart of the Charm path's
            # ``decode_begin`` replay (see encode_head's rationale).
            from ..entropy.gaussian import build_indexes as dev_indexes

            bound = self.codec_y.scale_bound

            def fn(params, z_sym, table):
                med = params["entropy_model_z"]["quantiles"][:, 0, 1] \
                    [None, None, None, :]
                z_hat = z_sym.astype(jnp.float32) + med
                hyper_out = net.apply({"params": params}, z_hat,
                                      method=lambda n, zz: n.hyper_decode(zz))
                y_mean, y_scale = jnp.split(hyper_out, 2, axis=-1)
                indexes = dev_indexes(y_scale, table, bound)
                return z_hat, y_mean, y_scale, indexes.astype(jnp.uint8)
        elif name == "generic_pack":
            # Generic encode, dispatch 3 of 3: symbols around the replayed
            # mean, predicted bits, and the packed int16 wire — ONE d2h for
            # the whole encode (the replay-chain successor of the former
            # single fused program; cost profile unchanged, no host syncs
            # between the three chained dispatches).
            from ..entropy.gaussian import gaussian_likelihood

            bound = self.codec_y.scale_bound

            def fn(params, y, y_mean, y_scale, indexes, z_sym, pred_z_bits):
                symbols = jnp.round(y - y_mean)
                y_hat = symbols + y_mean
                lik = gaussian_likelihood(symbols, y_scale, bound)
                pred_y_bits = -jnp.sum(jnp.log2(lik), axis=(1, 2, 3))
                maxabs = jnp.max(jnp.abs(y_hat), axis=(1, 2, 3))  # per image
                nb = symbols.shape[0]
                meta = jnp.stack([pred_y_bits, pred_z_bits, maxabs], axis=1)
                meta16 = jax.lax.bitcast_convert_type(
                    meta, jnp.int16).reshape(nb, -1)
                wire = jnp.concatenate(
                    [symbols.astype(jnp.int16).reshape(nb, -1),
                     indexes.astype(jnp.int16).reshape(nb, -1),
                     z_sym.astype(jnp.int16).reshape(nb, -1), meta16], axis=1)
                return wire, y_hat
        elif name == "generic_final":
            # Generic decode tail: dequantize around the replayed mean +
            # synthesis transform in one dispatch.  ``sym`` is int16 from
            # the host rANS (compressai wire) or f32 from the on-device
            # lane decoder (device wire).
            tprec = self.transform_precision
            tdt = self.transform_dtype
            uint8_io = self.codec_uint8_io
            convert01 = self.convert_img_range

            def fn(params, sym, y_mean, rate_ind, beta):
                y_hat = sym.astype(y_mean.dtype) + y_mean
                kw = {}
                if self.use_rate:
                    kw["rate_ind"] = rate_ind
                if self.use_beta:
                    kw["beta"] = beta
                with _precision_scope(tprec):
                    img = _apply_decode(net, params, y_hat, kw, tdt)
                lo = 0.0 if convert01 else -1.0
                img = jnp.clip(img, lo, 1.0)
                if uint8_io:
                    if convert01:
                        img = img * 2.0 - 1.0
                    u8 = jnp.clip(jnp.round((img + 1.0) * 127.5), 0, 255) \
                        .astype(jnp.uint8)
                    return u8, y_hat
                return img, y_hat
        elif name == "cb_begin":
            # checkerboard device-wire bootstrap: z dequantize + hyper-decode
            # + the zero-filled loop-carry buffers, one dispatch.  The zero
            # carries are created ON DEVICE so round 0 uploads nothing.
            msup, sc = self.max_support_slices, self.slice_ch

            def fn(params, z_sym, table, na_ids):
                p = params["net"]
                med = p["entropy_model_z"]["quantiles"][:, 0, 1] \
                    [None, None, None, :]
                z_hat = z_sym.astype(jnp.float32) + med
                hyper_out = net.apply({"params": p}, z_hat,
                                      method=lambda n, zz: n.hyper_decode(zz))
                hm, hs = jnp.split(hyper_out, 2, axis=-1)
                n_, h_, w_ = hm.shape[:3]
                support0 = jnp.zeros((n_, h_, w_, msup * sc), hm.dtype)
                zeros = jnp.zeros((n_, h_, w_, sc), hm.dtype)
                sym_na0 = jnp.zeros((n_, na_ids.shape[0] * sc), hm.dtype)
                return hm, hs, support0, sym_na0, zeros, zeros, z_hat
        elif name == "cb_a_dev":
            # device-wire checkerboard phase A: scatter the previous round's
            # non-anchor symbols back onto the grid, finish slice i-1, emit
            # slice i's channel-context params + the ANCHOR indexes gathered
            # into the stream consumption order (cell-major, channels
            # contiguous) — ready to feed ``rans_round`` directly.
            from ..ops.cb_uniform import cb_phase_a

            cm_opt = self.net.subnet_opt["context_model"]
            actv = dict(cm_opt.get("slice_transform_kwargs") or {}) \
                .get("actv", "relu")
            bound = self.codec_y.scale_bound
            ns, sc, msup = (self.num_slices, self.slice_ch,
                            self.max_support_slices)

            def fn(params, i, hm, hs, support, sym_na_flat, y_a, mu_c, table,
                   a_ids, na_ids):
                packed = params["packed"]
                n_, h_, w_ = hm.shape[:3]
                sym_na = jnp.zeros((n_, h_ * w_, sc), hm.dtype).at[
                    :, na_ids, :].set(
                        sym_na_flat.astype(hm.dtype).reshape(
                            n_, na_ids.shape[0], sc)).reshape(n_, h_, w_, sc)
                y_prev, support, mu, sigma, idx = cb_phase_a(
                    packed, i, hm, hs, support, sym_na, y_a, mu_c, table,
                    bound, ns, sc, msup, actv)
                idx_a = idx.reshape(n_, h_ * w_, sc)[:, a_ids, :] \
                    .reshape(n_, -1)
                return y_prev, support, mu, sigma, idx_a.astype(jnp.uint8)
        elif name == "cb_b_dev":
            # device-wire checkerboard phase B: scatter the decoded anchor
            # symbols, run the spatial context, emit the NON-ANCHOR indexes
            # in stream order.
            from ..ops.cb_uniform import cb_phase_b

            bound = self.codec_y.scale_bound
            sc = self.slice_ch

            def fn(params, i, sym_a_flat, mu, sigma, table, a_ids, na_ids):
                packed = params["packed"]
                n_, h_, w_ = mu.shape[:3]
                sym_a = jnp.zeros((n_, h_ * w_, sc), mu.dtype).at[
                    :, a_ids, :].set(
                        sym_a_flat.astype(mu.dtype).reshape(
                            n_, a_ids.shape[0], sc)).reshape(n_, h_, w_, sc)
                y_a, mu_c, sigma_c, idx = cb_phase_b(
                    packed, i, sym_a, mu, sigma, table, bound)
                idx_na = idx.reshape(n_, h_ * w_, sc)[:, na_ids, :] \
                    .reshape(n_, -1)
                # sigma_c rides along for the replay ENCODER's predicted-bit
                # accounting; the decoder ignores it (same executable)
                return y_a, mu_c, sigma_c, idx_na.astype(jnp.uint8)
        elif name == "cb_final":
            # device-wire checkerboard tail: scatter the last non-anchor
            # round, finish the last slice, concat + synthesis — one dispatch
            # (mirrors ``decode_final``).
            from ..ops.cb_uniform import cb_reconstruct_last

            cm_opt = self.net.subnet_opt["context_model"]
            actv = dict(cm_opt.get("slice_transform_kwargs") or {}) \
                .get("actv", "relu")
            ns, sc = self.num_slices, self.slice_ch
            tprec = self.transform_precision
            tdt = self.transform_dtype
            uint8_io = self.codec_uint8_io
            convert01 = self.convert_img_range

            def fn(params, hm, support, sym_na_flat, y_a, mu_c, y_slices,
                   na_ids, rate_ind, beta):
                p, packed = params["net"], params["packed"]
                n_, h_, w_ = hm.shape[:3]
                sym_na = jnp.zeros((n_, h_ * w_, sc), hm.dtype).at[
                    :, na_ids, :].set(
                        sym_na_flat.astype(hm.dtype).reshape(
                            n_, na_ids.shape[0], sc)).reshape(n_, h_, w_, sc)
                y_last = cb_reconstruct_last(packed, hm, support, sym_na,
                                             y_a, mu_c, ns, actv)
                y_hat = jnp.concatenate(list(y_slices) + [y_last], axis=-1)
                kw = {}
                if self.use_rate:
                    kw["rate_ind"] = rate_ind
                if self.use_beta:
                    kw["beta"] = beta
                with _precision_scope(tprec):
                    img = _apply_decode(net, p, y_hat, kw, tdt)
                lo = 0.0 if convert01 else -1.0
                img = jnp.clip(img, lo, 1.0)
                if uint8_io:
                    if convert01:
                        img = img * 2.0 - 1.0
                    u8 = jnp.clip(jnp.round((img + 1.0) * 127.5), 0, 255) \
                        .astype(jnp.uint8)
                    return u8, y_hat
                return img, y_hat
        elif name == "cb_quant":
            # Checkerboard replay-encode helper: round slice i of y around
            # the mu the SHARED phase executable just produced, gathered to
            # the phase's cell order (anchors or non-anchors).  int16 — the
            # same dtype the device-wire decoder's ``rans_round`` feeds the
            # phase executables, so both sides hit ONE compiled program.
            sc = self.slice_ch

            def fn(y, i, mu, ids):
                n_, h_, w_ = mu.shape[:3]
                y_slice = jax.lax.dynamic_slice_in_dim(y, i * sc, sc, axis=3)
                sym = jnp.round(y_slice - mu).reshape(n_, h_ * w_, sc)
                return sym[:, ids, :].reshape(n_, -1).astype(jnp.int16)
        elif name == "cb_replay_pack":
            # Checkerboard replay-encode tail (mirrors ``replay_pack``):
            # scatter the per-phase symbols/indexes the SHARED cb_a_dev /
            # cb_b_dev executables produced back onto the grid, reconstruct
            # the last slice, predicted bits + per-image maxabs, and the
            # packed int16 wire — one d2h for the whole encode.  Wire layout
            # matches the former single-scan cb encoder (full grids), so the
            # host unpack is unchanged.
            from ..entropy.gaussian import gaussian_likelihood
            from ..ops.cb_uniform import anchor_mask, cb_reconstruct_last

            cm_opt = self.net.subnet_opt["context_model"]
            actv = dict(cm_opt.get("slice_transform_kwargs") or {}) \
                .get("actv", "relu")
            bound = self.codec_y.scale_bound
            ns, sc = self.num_slices, self.slice_ch

            def fn(params, hm, support_buf, sym_na_last, y_a, mu_c, y_slices,
                   syms_a, syms_na, idxs_a, idxs_na, sigmas, sigmas_c,
                   z_sym, pred_z_bits, a_ids, na_ids):
                packed = params["packed"]
                n_, h_, w_ = hm.shape[:3]

                def scat(flat, ids, dtype):
                    z0 = jnp.zeros((n_, h_ * w_, sc), dtype)
                    return z0.at[:, ids, :].set(
                        flat.astype(dtype).reshape(n_, ids.shape[0], sc)) \
                        .reshape(n_, h_, w_, sc)

                sym_na_grid = scat(sym_na_last, na_ids, hm.dtype)
                y_last = cb_reconstruct_last(packed, hm, support_buf,
                                             sym_na_grid, y_a, mu_c, ns, actv)
                y_hat = jnp.concatenate(list(y_slices) + [y_last], axis=-1)
                amask = anchor_mask(h_, w_, sigmas[0].dtype)[None, :, :, None]
                symbols = jnp.concatenate(
                    [scat(sa, a_ids, jnp.int16) + scat(sn, na_ids, jnp.int16)
                     for sa, sn in zip(syms_a, syms_na)], axis=-1)
                indexes = jnp.concatenate(
                    [scat(ia, a_ids, jnp.int16) + scat(ina, na_ids, jnp.int16)
                     for ia, ina in zip(idxs_a, idxs_na)], axis=-1)
                sigma = jnp.concatenate(
                    [jnp.where(amask > 0, sg, sgc)
                     for sg, sgc in zip(sigmas, sigmas_c)], axis=-1)
                lik = gaussian_likelihood(symbols.astype(sigma.dtype), sigma,
                                          bound)
                pred_y_bits = -jnp.sum(jnp.log2(lik), axis=(1, 2, 3))  # [N]
                maxabs = jnp.max(jnp.abs(y_hat), axis=(1, 2, 3))
                nb = symbols.shape[0]
                meta = jnp.stack([pred_y_bits, pred_z_bits, maxabs], axis=1)
                meta16 = jax.lax.bitcast_convert_type(
                    meta, jnp.int16).reshape(nb, -1)
                wire = jnp.concatenate(
                    [symbols.reshape(nb, -1),
                     indexes.reshape(nb, -1),
                     z_sym.reshape(nb, -1), meta16], axis=1)
                return wire, y_hat
        elif name == "compress_params":
            def fn(params, y, z_hat):
                return net.apply(
                    {"params": params}, y, z_hat,
                    method=lambda n, yy, zz: n.compress_params(yy, zz))
        elif name == "z_likelihood":
            def fn(params, z):
                return net.apply({"params": params}, z,
                                 method=lambda n, zz: n.z_likelihood_eval(zz))
        elif name == "hyper_decode":
            def fn(params, z_hat):
                return net.apply({"params": params}, z_hat,
                                 method=lambda n, zz: n.hyper_decode(zz))
        elif name == "decode_image":
            tprec = self.transform_precision
            tdt = self.transform_dtype

            def fn(params, y_hat, rate_ind, beta):
                kw = {}
                if self.use_rate:
                    kw["rate_ind"] = rate_ind
                if self.use_beta:
                    kw["beta"] = beta
                with _precision_scope(tprec):
                    img = _apply_decode(net, params, y_hat, kw, tdt)
                return jnp.clip(img, -1.0, 1.0)
        elif name == "decode_begin":
            # fused decode bootstrap: z dequantize + hyper-decode + the
            # slice-0 entropy params/indexes in ONE dispatch
            from ..ops.charm_uniform import uniform_decode_step

            cm_opt = self.net.subnet_opt["context_model"]
            actv = dict(cm_opt.get("slice_transform_kwargs") or {}) \
                .get("actv", "relu")
            bound = self.codec_y.scale_bound
            ns, sc, msup = (self.num_slices, self.slice_ch,
                            self.max_support_slices)

            def fn(params, z_sym, table):
                p, packed = params["net"], params["packed"]
                med = p["entropy_model_z"]["quantiles"][:, 0, 1] \
                    [None, None, None, :]
                z_hat = z_sym.astype(jnp.float32) + med
                hyper_out = net.apply({"params": p}, z_hat,
                                      method=lambda n, zz: n.hyper_decode(zz))
                hm, hs = jnp.split(hyper_out, 2, axis=-1)
                n_, h_, w_ = hm.shape[:3]
                support0 = jnp.zeros((n_, h_, w_, msup * sc), hm.dtype)
                zeros = jnp.zeros((n_, h_, w_, sc), hm.dtype)
                _, support, mu0, sigma0, idx0 = uniform_decode_step(
                    packed, jnp.int32(0), hm, hs, support0, zeros, zeros,
                    table, bound, ns, sc, msup, actv)
                return (hm, hs, support, mu0, sigma0,
                        idx0.astype(jnp.uint8), z_hat)
        elif name == "lane_wire":
            # device-wire lane ENCODE: consume the pack executables' int16
            # wire ON DEVICE — permute y sym/idx into lane consumption
            # order, run the rans32 lane coder for y and z
            # (ops/device_rans.lane_encode_rounds, byte-equal to the C++
            # host coder), and hand back only the coded words + fixups +
            # meta.  Chains asynchronously after replay_pack/generic_pack/
            # cb_replay_pack; the encode's single blocking d2h becomes the
            # coded streams (~bpp-sized) instead of the sym+idx wire, and
            # the host does no entropy work at all.  Integer-exact
            # throughout, so it adds no float risk to the bitstream.
            from ..ops.device_rans import lane_encode_rounds

            zc = self.zC
            fix_cap = self.device_wire_fixup_cap

            def fn(wire16, perm_y, grid_y, grid_z,
                   ycdf, ylen_t, yoff, zcdf, zlen_t, zoff):
                n = wire16.shape[0]
                ylen = perm_y.shape[0]
                zlen = wire16.shape[1] - 2 * ylen - 6
                w32 = wire16.astype(jnp.int32)
                sym_l = jnp.take(w32[:, :ylen], perm_y, axis=1)
                idx_l = jnp.take(w32[:, ylen:2 * ylen], perm_y, axis=1)
                y_out = lane_encode_rounds(
                    sym_l, idx_l, grid_y, ycdf, ylen_t, yoff, fix_cap)
                z_f = w32[:, 2 * ylen:2 * ylen + zlen]
                # z CDF row IS the channel id; flat [h, w, C] C-order
                zidx = jnp.broadcast_to(
                    jnp.arange(zlen, dtype=jnp.int32) % zc, (n, zlen))
                z_out = lane_encode_rounds(
                    z_f, zidx, grid_z, zcdf, zlen_t, zoff, fix_cap)
                return y_out + z_out + (wire16[:, -6:],)
        elif name == "rans_round":
            # device-wire entropy decode of ONE autoregressive round: expand
            # the per-symbol CDF rows, advance all lanes, overlay fixups.
            # Chained asynchronously between the (unchanged) Charm step
            # executables, it removes every per-slice host round trip — the
            # serial decode becomes one uninterrupted device dispatch chain.
            # Integer-exact by construction (see ops/device_rans.py), so it
            # adds no cross-program float risk to the bitstream contract.
            from ..ops.device_rans import (apply_fixups, expand_tables,
                                           init_lane_state, lane_decode_round)

            def fn(states, ptrs, words, idx, fix_pos, fix_val, fix_act, lo,
                   cdf, cdf_len, cdf_off):
                n_ = idx.shape[0]
                m = int(np.prod(idx.shape[1:]))
                if states is None:  # first round: seed lanes from the words
                    states, ptrs = init_lane_state(words)
                rows, lens, offs = expand_tables(
                    idx.reshape(n_, m), cdf, cdf_len, cdf_off)
                vals, states, ptrs = lane_decode_round(
                    states, ptrs, words, rows, lens, offs, m)
                vals = apply_fixups(vals, fix_pos, fix_val, fix_act,
                                    lo.astype(jnp.int32), m)
                # int16 symbols: the SAME input dtype the host-wire decode
                # and the replay encoder feed the step executables, so every
                # path shares one compiled step program (int16 holds any
                # symbol the int16 wire itself can carry)
                sym = vals.reshape(idx.shape).astype(jnp.int16)
                return sym, states, ptrs
        elif name == "decode_final":
            # fused tail: final slice reconstruction + full-latent concat +
            # synthesis transform in ONE dispatch
            from ..ops.charm_uniform import uniform_reconstruct_last

            cm_opt = self.net.subnet_opt["context_model"]
            actv = dict(cm_opt.get("slice_transform_kwargs") or {}) \
                .get("actv", "relu")
            ns = self.num_slices
            tprec = self.transform_precision
            tdt = self.transform_dtype

            uint8_io = self.codec_uint8_io
            convert01 = self.convert_img_range

            def fn(params, hyper_mean, support_buf, sym_prev, mu_prev,
                   y_slices, rate_ind, beta):
                p, packed = params["net"], params["packed"]
                # symbols ride h2d as int16 (halves the upload); math in f32
                sym_prev = sym_prev.astype(hyper_mean.dtype)
                y_last = uniform_reconstruct_last(
                    packed, hyper_mean, support_buf, sym_prev, mu_prev, ns,
                    actv)
                y_hat = jnp.concatenate(list(y_slices) + [y_last], axis=-1)
                kw = {}
                if self.use_rate:
                    kw["rate_ind"] = rate_ind
                if self.use_beta:
                    kw["beta"] = beta
                with _precision_scope(tprec):
                    img = _apply_decode(net, p, y_hat, kw, tdt)
                lo = 0.0 if convert01 else -1.0
                img = jnp.clip(img, lo, 1.0)
                if uint8_io:
                    # device-side tensor_to_uint8 (img_utils.py contract):
                    # quarters the d2h image transfer
                    if convert01:
                        img = img * 2.0 - 1.0
                    u8 = jnp.clip(jnp.round((img + 1.0) * 127.5), 0, 255) \
                        .astype(jnp.uint8)
                    return u8, y_hat
                return img, y_hat
        else:
            raise KeyError(name)

        def wrapped(*args):
            with _precision_scope(prec):
                return fn(*args)

        return self._register_exe(name, jax.jit(wrapped))

    # ---------------- compress / decompress ---------------------------------

    def compress_batch(self, real_images,
                       rate_ind: Union[float, int, None] = None) -> List[Dict]:
        """Batched encode: one device pass for N same-size images, per-image
        host rANS.  Throughput extension over the reference's batch-1-only
        compress (hyperprior_model.py:141); used for the DIV2K batch config."""
        real_images = np.asarray(real_images)
        out = self._compress_impl(real_images, rate_ind)
        return out if isinstance(out, list) else [out]

    def compress(self, real_images, rate_ind: Union[float, int, None] = None
                 ) -> Dict:
        real_images = np.asarray(real_images)
        if real_images.ndim == 3:
            real_images = real_images[None]
        assert real_images.shape[0] == 1, \
            f"compress expects batch size 1, got {real_images.shape[0]} " \
            "(use compress_batch)"
        return self._compress_impl(real_images, rate_ind)

    def _compress_impl(self, real_images, rate_ind):
        assert self.codec_z is not None, "call codec_setup() first"
        if real_images.ndim == 3:
            real_images = real_images[None]
        N, H, W, _ = real_images.shape

        is_charm = (self.use_charm
                    and self.context_type == "Minnen20CharmContextModel")
        if self.codec_uint8_io and real_images.dtype == np.uint8:
            # ship raw uint8 pixels; the fused encode converts on device
            x = self._place_batch(pad_image(real_images, self.stride))
        else:
            if real_images.dtype == np.uint8:
                real_images = uint8_to_tensor(real_images)
            x = self._place_batch(
                self.data_preprocess(real_images, is_train=False))

        if is_charm:
            return self._compress_charm(x, N, H, W, rate_ind)

        # fused single-dispatch encode (mirrors _compress_charm): one device
        # program + one blocking d2h of the packed int16 wire
        import time as _time

        from ..runtime import rans_encode_with_indexes

        timing = {}
        t0 = _time.perf_counter()
        ri = self._cond_arg("q", rate_ind, N) if self.use_rate else None
        if self._is_checkerboard:
            # full executable replay of the decoder's phase chain (the cb
            # counterpart of _compress_charm) — encode/decode agreement is
            # structural, so any codec_precision is bitstream-safe
            wire, y_hat, z_hat = self._encode_cb_replay(x, ri)
        else:
            # generic replay chain (mirrors _compress_charm): encode_head ->
            # the decoder's own ``generic_params`` executable -> pack.  Three
            # async dispatches, no host syncs between them, one d2h — and the
            # indexes/means are bit-identical to what the decoder will
            # recompute, by construction.
            y, z_sym16, pred_z_dev = self._codec_fn("encode_head")(
                self.params, x, ri)
            z_hat, y_mean, y_scale, idx_u8 = self._codec_fn(
                "generic_params")(self.params, z_sym16, self._table_dev)
            wire, y_hat = self._codec_fn("generic_pack")(
                self.params, y, y_mean, y_scale, idx_u8, z_sym16, pred_z_dev)
        padH, padW = x.shape[1], x.shape[2]
        yH, yW = padH // self.y_stride, padW // self.y_stride
        zH, zW = padH // self.model_stride, padW // self.model_stride
        ylen = yH * yW * self.yC
        zlen = zH * zW * self.zC
        dev_lane = None
        if (self.wire_format == "device"
                and self.device_wire_encoder == "device"):
            # fully device-resident entropy encode: the lane coder chains
            # asynchronously after the pack executable and the blocking d2h
            # becomes the coded streams + fixups + meta, not sym+idx
            dev_lane = self._lane_wire_dev(wire, N, yH, yW, zH, zW, timing)
        if dev_lane is not None:
            y_str, z_str, meta = dev_lane
        else:
            wire_np = np.asarray(wire)  # the ONE blocking d2h of the encode
            timing["device_encode_s"] = _time.perf_counter() - t0
            t0 = _time.perf_counter()
            sym_f, idx_f, z_f, meta16 = np.split(
                wire_np, [ylen, 2 * ylen, 2 * ylen + zlen], axis=1)
            meta = np.ascontiguousarray(meta16).view(np.float32)  # [N, 3]
            z_sym_np = z_f.reshape(N, zH, zW, self.zC).astype(np.int32)
            z_str = self._z_serialize(z_sym_np)
            sym = sym_f.reshape(N, yH, yW, self.yC).astype(np.int32)
            idx = idx_f.reshape(N, yH, yW, self.yC).astype(np.int32)
            if self._is_checkerboard and self.wire_format == "device":
                # 2*num_slices lane rounds (anchors of slice i, then its
                # non-anchors), each flattened cell-major with channels
                # contiguous — exactly the gather order of the decoder's
                # cb_a_dev / cb_b_dev executables
                a_ids, na_ids = self._cb_ids(yH, yW)
                ns, sc = self.num_slices, self.slice_ch
                s5 = sym.reshape(N, yH * yW, ns, sc)
                i5 = idx.reshape(N, yH * yW, ns, sc)
                parts_s, parts_i, off = [], [], [0]
                for s in range(ns):
                    for ids in (a_ids, na_ids):
                        parts_s.append(s5[:, ids, s, :].reshape(N, -1))
                        parts_i.append(i5[:, ids, s, :].reshape(N, -1))
                        off.append(off[-1] + ids.size * sc)
                y_str = self._lane_serialize(
                    np.concatenate(parts_s, axis=1),
                    np.concatenate(parts_i, axis=1),
                    np.asarray(off, np.int64))
            elif self._is_checkerboard:
                # decode-order serialization: per slice anchors, non-anchors
                y_str = self._host_pmap(lambda i: rans_encode_with_indexes(
                    _checkerboard_serialize(sym[i:i + 1], self.num_slices),
                    _checkerboard_serialize(idx[i:i + 1], self.num_slices),
                    self.codec_y.quantized_cdf, self.codec_y.cdf_length,
                    self.codec_y.offset), N)
            elif self.wire_format == "device":
                # one lane round covering the whole latent, [h, w, C] C-order
                # (the decoder's generic_params index order)
                y_str = self._lane_serialize(
                    sym.reshape(N, -1), idx.reshape(N, -1),
                    np.asarray([0, ylen], np.int64))
            else:
                # channel-major rANS serialization (stream-layout parity)
                sym_flat = sym.transpose(0, 3, 1, 2).reshape(N, -1)
                idx_flat = idx.transpose(0, 3, 1, 2).reshape(N, -1)
                y_str = self._host_pmap(lambda i: rans_encode_with_indexes(
                    sym_flat[i], idx_flat[i], self.codec_y.quantized_cdf,
                    self.codec_y.cdf_length, self.codec_y.offset), N)
            timing["host_rans_s"] = _time.perf_counter() - t0
        pred_y_bits, pred_z_bits, maxabs = meta[:, 0], meta[:, 1], meta[:, 2]

        num_pixel = H * W
        rate_arr = (np.broadcast_to(
            np.asarray(rate_ind, np.float32).reshape(-1), (N,))
            if self.use_rate else None)
        results = []
        for i in range(N):
            if self.use_rate:
                header = self.header_handler.encode(
                    (H, W), maxabs[i:i + 1], rate_ind=float(rate_arr[i]))
            else:
                header = self.header_handler.encode((H, W), maxabs[i:i + 1])
            results.append({
                "string_list": [header, z_str[i], y_str[i]],
                "z_hat": z_hat[i:i + 1],
                "y_hat": y_hat[i:i + 1],
                "z_likelihood": None,
                "y_likelihood": None,
                "pred_y_bit": float(pred_y_bits[i]),
                "pred_y_bpp": float(pred_y_bits[i]) / num_pixel,
                "pred_z_bit": float(pred_z_bits[i]),
                "pred_z_bpp": float(pred_z_bits[i]) / num_pixel,
                "timing": timing,
            })
        return results[0] if N == 1 else results

    def _compress_charm(self, x, N: int, H: int, W: int, rate_ind):
        """Charm encode by FULL EXECUTABLE REPLAY of the decode chain.

        Dispatch layout: ``encode_head`` (analysis/hyper-analysis + z round)
        -> the decoder's own ``decode_begin`` executable (z dequantize +
        hyper-decode + slice-0 params) -> per slice, a tiny ``quantize_
        slice`` program (round y_i around the replayed mu_i) chained with
        the decoder's own shape-uniform step executable -> ``replay_pack``
        (last-slice reconstruct + symbols/indexes/bits wire).  All ~2S+3
        dispatches are asynchronous — device arrays chain d2d and the single
        blocking d2h is the packed int16 wire fetch at the end — so the wall
        cost over the former 3-dispatch scan encode is dispatch overhead
        only, not round trips.

        Why replay instead of the one-scan encoder: every entropy parameter
        that picks a CDF row is now produced by the LITERAL SAME compiled
        program on both sides, so encode/decode agreement is structural, not
        numerical.  Two independently-fused XLA programs only agree to ~1-2
        f32 ulps on TPU (measured), which a `highest`-precision chain
        tolerates statistically but (a) leaves a one-ulp-at-a-boundary
        desync risk, and (b) forbids dropping the chain to bf16-pass
        precision (`codec_precision: default`) or the bf16 Pallas kernels
        (CRDR_PALLAS=1) — the replay structure makes ALL of those
        bitstream-safe by construction.  The reference never faces this
        choice: its encode calls the same Python modules as decode
        (minnen20_charm_context_model.py:143-199), which is exactly the
        executable sharing this reproduces under jit.

        The host receives the y symbols/indexes as a single packed int16
        array and the z symbols as int16; y_hat/z_hat stay on device and are
        returned as lazy device arrays (consumers that need them pay the
        transfer, the codec hot path doesn't)."""
        import time as _time

        from ..runtime import rans_encode_with_indexes

        timing = {}
        t0 = _time.perf_counter()
        ri = self._cond_arg("q", rate_ind, N) if self.use_rate else None
        table = self._table_dev
        cp_params = {"net": self.params, "packed": self._charm_packed}
        y, z_sym16, pred_z_dev = self._codec_fn("encode_head")(
            self.params, x, ri)
        hm, hs, support, mu, sigma, idx, z_hat = self._codec_fn(
            "decode_begin")(cp_params, z_sym16, table)
        ns = self.num_slices
        step = self._charm_step_fn()
        quant = self._codec_fn("quantize_slice")
        syms, idxs, sigmas = [], [], []
        y_slices: List[Array] = []
        for i in range(ns):
            sym = quant(y, jnp.int32(i), mu)
            syms.append(sym)
            idxs.append(idx)
            sigmas.append(sigma)
            if i < ns - 1:
                y_prev, support, mu, sigma, idx = step(
                    self._charm_packed, jnp.int32(i + 1), hm, hs,
                    support, sym, mu, table)
                y_slices.append(y_prev)
        wire, y_hat = self._codec_fn("replay_pack")(
            cp_params, hm, support, tuple(syms), tuple(idxs), tuple(sigmas),
            tuple(y_slices), mu, z_sym16, pred_z_dev)
        padH, padW = x.shape[1], x.shape[2]
        yH, yW = padH // self.y_stride, padW // self.y_stride
        zH, zW = padH // self.model_stride, padW // self.model_stride
        ylen = yH * yW * self.yC
        zlen = zH * zW * self.zC
        dev_lane = None
        if (self.wire_format == "device"
                and self.device_wire_encoder == "device"):
            # fully device-resident entropy encode (see _compress_impl)
            dev_lane = self._lane_wire_dev(wire, N, yH, yW, zH, zW, timing)
        if dev_lane is not None:
            y_str, z_str, meta = dev_lane
        else:
            wire_np = np.asarray(wire)  # the ONE blocking d2h of the encode
            timing["device_encode_s"] = _time.perf_counter() - t0
            t0 = _time.perf_counter()
            # unflatten the wire: y symbols | y indexes | z symbols | meta
            sym_f, idx_f, z_f, meta16 = np.split(
                wire_np, [ylen, 2 * ylen, 2 * ylen + zlen], axis=1)
            # column slices of wire_np are non-contiguous for N > 1
            meta = np.ascontiguousarray(meta16).view(np.float32)  # [N, 3]
            z_sym_np = z_f.reshape(N, zH, zW, self.zC)
            z_str = self._z_serialize(z_sym_np)
            if self.wire_format == "device":
                # slice-major flat (the decoder's consumption order: for
                # each slice, [h, w, sc] C-order)
                ns, sc = self.num_slices, self.slice_ch

                def tolanes(a):
                    return a.reshape(N, yH, yW, ns, sc) \
                        .transpose(0, 3, 1, 2, 4).reshape(N, -1)

                y_str = self._lane_serialize(
                    tolanes(sym_f), tolanes(idx_f),
                    np.arange(ns + 1, dtype=np.int64) * (yH * yW * sc))
            else:
                # channel-major rANS serialization (stream-layout parity)
                sym_flat = sym_f.reshape(N, yH, yW, self.yC) \
                    .transpose(0, 3, 1, 2).reshape(N, -1).astype(np.int32)
                idx_flat = idx_f.reshape(N, yH, yW, self.yC) \
                    .transpose(0, 3, 1, 2).reshape(N, -1).astype(np.int32)
                y_str = self._host_pmap(lambda i: rans_encode_with_indexes(
                    sym_flat[i], idx_flat[i], self.codec_y.quantized_cdf,
                    self.codec_y.cdf_length, self.codec_y.offset), N)
            timing["host_rans_s"] = _time.perf_counter() - t0
        pred_y_bits, pred_z_bits = meta[:, 0], meta[:, 1]
        maxabs_np = meta[:, 2]

        num_pixel = H * W
        rate_arr = (np.broadcast_to(
            np.asarray(rate_ind, np.float32).reshape(-1), (N,))
            if self.use_rate else None)
        results = []
        for i in range(N):
            if self.use_rate:
                header = self.header_handler.encode(
                    (H, W), maxabs_np[i:i + 1], rate_ind=float(rate_arr[i]))
            else:
                header = self.header_handler.encode((H, W), maxabs_np[i:i + 1])
            results.append({
                "string_list": [header, z_str[i], y_str[i]],
                "z_hat": z_hat[i:i + 1],
                "y_hat": y_hat[i:i + 1],
                "z_likelihood": None,
                "y_likelihood": None,
                "pred_y_bit": float(pred_y_bits[i]),
                "pred_y_bpp": float(pred_y_bits[i]) / num_pixel,
                "pred_z_bit": float(pred_z_bits[i]),
                "pred_z_bpp": float(pred_z_bits[i]) / num_pixel,
                "timing": timing,
            })
        return results[0] if N == 1 else results

    def decompress(self, string_list: List[bytes],
                   beta: float = 0.0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        import time as _time

        assert len(string_list) == 3, \
            f"string list must be [header, z, y], got {len(string_list)}"
        header, z_str, y_str = string_list
        self._guard_wire_mismatch(y_str)
        hd = self.header_handler.decode(header)
        H, W = hd["img_size"]
        rate_ind = hd.get("rate_ind")
        # pad geometry must mirror data_preprocess (incl. shape bucketing);
        # the latent grid itself is always /model_stride
        padH = math.ceil(H / self.stride) * self.stride
        padW = math.ceil(W / self.stride) * self.stride
        zH, zW = padH // self.model_stride, padW // self.model_stride

        if self.use_charm and not self._is_checkerboard and \
                self.context_type == "Minnen20CharmContextModel":
            if self.wire_format == "device":
                return self._decompress_charm_device(
                    [z_str], [y_str], zH, zW, rate_ind, beta, H, W)
            return self._decompress_charm([z_str], [y_str], zH, zW, rate_ind,
                                          beta, H, W)
        if self.wire_format == "device":
            if self._is_checkerboard:
                return self._decompress_cb_device(
                    [z_str], [y_str], zH, zW, rate_ind, beta, H, W)
            return self._decompress_generic_device(
                [z_str], [y_str], zH, zW, rate_ind, beta, H, W)

        timing = {}
        t0 = _time.perf_counter()
        z_sym = self.codec_z.decompress([z_str], (zH, zW))
        z16 = self._place_batch(z_sym.astype(np.int16))
        timing["z_hyper_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        if self._is_checkerboard:
            y_hat, z_hat = self._checkerboard_decompress(y_str, z16)
        else:
            # entropy params from the SAME ``generic_params`` executable the
            # encoder replayed (and the device-wire decode bootstraps with)
            # — the indexes picking CDF rows are bit-identical on both
            # sides by construction, at any codec precision; the former
            # hyper_decode + host build_indexes pairing was a separately
            # fused program with a one-ulp-at-a-boundary desync risk
            z_hat, y_mean, _y_scale, idx_u8 = self._codec_fn(
                "generic_params")(self.params, z16, self._table_dev)
            y_hat = self.codec_y.decompress(
                [y_str], np.asarray(idx_u8).astype(np.int32),
                means=np.asarray(y_mean))
        timing["y_entropy_decode_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        ri = jnp.asarray([float(rate_ind)], jnp.float32) if self.use_rate else None
        bt = jnp.asarray([float(beta)], jnp.float32) if self.use_beta else None
        fake = self._codec_fn("decode_image")(self.params, jnp.asarray(y_hat),
                                              ri, bt)
        fake = self.data_postprocess(fake, size=(H, W), is_train=False)
        timing["synthesis_transform_s"] = _time.perf_counter() - t0
        self.last_decode_timing = timing
        return fake, z_hat, np.asarray(y_hat)

    def decompress_batch(self, string_lists: List[List[bytes]],
                         beta: float = 0.0):
        """Batched decode: N same-size bitstreams through ONE set of device
        dispatches (throughput extension over the reference's image-at-a-time
        decompress).  The Charm loop's latency is dominated by its serial
        num_slices+1 device round trips; batching amortizes them across the
        whole batch, so decode throughput scales ~linearly with N.  Host rANS
        still runs one independent stream per image between dispatches.

        Returns (fake [N,H,W,3], z_hat, y_hat).  All streams must share the
        image size; rate indexes ride each header (mixed-rate batches run
        as one dispatch set — InterpCA broadcasts a per-image [N] rate
        vector), and ``beta`` may be a scalar or one value per image."""
        for sl in string_lists:
            self._guard_wire_mismatch(sl[2])
        heads = [self.header_handler.decode(sl[0]) for sl in string_lists]
        H, W = heads[0]["img_size"]
        rate_ind = heads[0].get("rate_ind")
        for hd in heads[1:]:
            assert tuple(hd["img_size"]) == (H, W), \
                "decompress_batch requires equal image sizes"
        if rate_ind is not None:
            rates = np.asarray([hd["rate_ind"] for hd in heads], np.float32)
            rate_ind = (float(rates[0]) if np.all(rates == rates[0])
                        else rates)
        beta_arr = np.asarray(beta, np.float32).reshape(-1)
        assert beta_arr.size in (1, len(string_lists)), \
            f"beta: {beta_arr.size} values for {len(string_lists)} streams"
        beta = float(beta_arr[0]) if beta_arr.size == 1 else beta_arr
        padH = math.ceil(H / self.stride) * self.stride
        padW = math.ceil(W / self.stride) * self.stride
        zH, zW = padH // self.model_stride, padW // self.model_stride
        if self.use_charm and not self._is_checkerboard and \
                self.context_type == "Minnen20CharmContextModel":
            fn = (self._decompress_charm_device
                  if self.wire_format == "device" else self._decompress_charm)
            return fn(
                [sl[1] for sl in string_lists], [sl[2] for sl in string_lists],
                zH, zW, rate_ind, beta, H, W)
        if self.wire_format == "device":
            fn = (self._decompress_cb_device if self._is_checkerboard
                  else self._decompress_generic_device)
            return fn(
                [sl[1] for sl in string_lists], [sl[2] for sl in string_lists],
                zH, zW, rate_ind, beta, H, W)
        outs = [self.decompress(sl, beta=float(beta_arr[i % beta_arr.size]))
                for i, sl in enumerate(string_lists)]
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([np.asarray(o[1]) for o in outs]),
                np.concatenate([np.asarray(o[2]) for o in outs]))

    def _decompress_charm(self, z_strs: List[bytes], y_strs: List[bytes],
                          zH: int, zW: int,
                          rate_ind, beta: float, H: int, W: int):
        """Serial Charm decode with fused ends, batched over N streams.

        Dispatch layout (num_slices = S):
          1. ``decode_begin``: z dequantize + hyper-decode + slice-0 entropy
             params/indexes — one program;
          2. S-1 shape-uniform steps (reconstruct slice i-1, params for i),
             interleaved with the host rANS stream decode (one rANS state
             per image);
          3. ``decode_final``: last slice reconstruction + latent concat +
             synthesis transform — one program.
        Indexes travel d2h as uint8 (scale table < 256 entries); symbols
        ride h2d with the next dispatch.  The serial structure is inherent
        to Charm (the reference decodes slice-by-slice the same way,
        minnen20_charm_context_model.py:88-141); the fusing minimizes the
        per-step host<->device round trips that dominate its latency, and
        the batch dimension amortizes them."""
        import time as _time

        from ..runtime import RansStreamDecoder

        assert self._charm_packed is not None, "codec_setup() builds weights"
        timing = {}
        t0 = _time.perf_counter()
        z_sym = self.codec_z.decompress(z_strs, (zH, zW))
        cp = {"net": self.params, "packed": self._charm_packed}
        table = self._table_dev
        hm, hs, support, mu, _sigma, idx, z_hat = self._codec_fn(
            "decode_begin")(
            cp, self._place_batch(z_sym.astype(np.int16)), table)
        timing["decode_begin_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        n, h, w, sc = mu.shape
        ns = self.num_slices
        step = self._charm_step_fn()
        ri = self._cond_arg("q", rate_ind, n) if self.use_rate else None
        bt = self._cond_arg("b", beta, n) if self.use_beta else None
        decoders = [RansStreamDecoder(ys) for ys in y_strs]

        def _dec_one(j, idx_np):
            return decoders[j].decode(
                idx_np[j].transpose(2, 0, 1).reshape(-1),
                self.codec_y.quantized_cdf, self.codec_y.cdf_length,
                self.codec_y.offset)

        # per-image rANS states are independent; the C decode releases the
        # GIL, so a thread pool parallelizes the host side on multi-core
        # serving hosts (n==1 and 1-core hosts degrade to the serial loop)
        pool = None
        if n > 1 and (os.cpu_count() or 1) > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(min(n, os.cpu_count() or 1))
        y_slices: List[Array] = []
        try:
            for i in range(ns):
                idx_np = np.asarray(idx).astype(np.int32)  # [n, h, w, sc]
                if pool is not None:
                    dec = np.stack(list(pool.map(
                        lambda j: _dec_one(j, idx_np), range(n))))
                else:
                    dec = np.stack([_dec_one(j, idx_np) for j in range(n)])
                sym = self._place_batch(
                    dec.reshape(n, sc, h, w).transpose(0, 2, 3, 1)
                    .astype(np.int16))
                if i < ns - 1:
                    y_prev, support, mu, _sigma, idx = step(
                        self._charm_packed, jnp.int32(i + 1), hm, hs,
                        support, sym, mu, table)
                    y_slices.append(y_prev)
                else:
                    timing["charm_loop_s"] = _time.perf_counter() - t0
                    t0 = _time.perf_counter()
                    fake, y_hat = self._codec_fn("decode_final")(
                        cp, hm, support, sym, mu, tuple(y_slices), ri, bt)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
            for d in decoders:
                d.close()
        fake = np.asarray(fake)
        if fake.dtype == np.uint8:  # codec_uint8_io: device sent uint8
            fake = uint8_to_tensor(fake)
            if self.convert_img_range:
                fake = (fake + 1.0) / 2.0
        fake = self.data_postprocess(fake, size=(H, W), is_train=False)
        timing["decode_final_s"] = _time.perf_counter() - t0
        self.last_decode_timing = timing
        return fake, z_hat, y_hat

    def _host_pmap(self, fn, n: int) -> List:
        """Map ``fn`` over ``range(n)`` with a thread pool when it helps —
        the C++ entropy coders release the GIL, so per-image host coding
        parallelizes across a serving batch on multi-core hosts (1-core
        hosts and single images run the plain loop)."""
        if n > 1 and (os.cpu_count() or 1) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(n, os.cpu_count() or 1)) as ex:
                return list(ex.map(fn, range(n)))
        return [fn(i) for i in range(n)]

    def _z_serialize(self, z_sym_np: np.ndarray) -> List[bytes]:
        """z strings for the current wire.  Device wire: one lane round in
        flat [h, w, C] C-order (exactly `_zidx`'s row-major flattening, so
        the device consumer reshapes directly); CDF rows are the channel
        ids.  CompressAI wire: the reference's channel-major rANS stream."""
        z_sym_np = z_sym_np.astype(np.int32)
        if self.wire_format == "device":
            n, zh, zw, c = z_sym_np.shape
            idx = np.broadcast_to(np.arange(c, dtype=np.int32),
                                  (zh * zw, c)).reshape(-1)
            return self._lane_serialize(
                z_sym_np.reshape(n, -1),
                np.broadcast_to(idx, (n, idx.size)),
                np.asarray([0, idx.size], np.int64), codec=self.codec_z)
        return self.codec_z.compress_symbols(z_sym_np)

    def _guard_wire_mismatch(self, y_str: bytes) -> None:
        """Fail loudly when the configured wire format and the bitstream's
        actual format disagree.  Device-wire y strings are self-describing
        (``LANE_MAGIC``); a compressai-configured decode of one would
        otherwise desync into silent garbage.  The inverse mismatch is
        caught by ``unpack_lane_container`` itself."""
        if self.wire_format == "compressai":
            from ..runtime.lane_rans import LANE_MAGIC

            if y_str[:len(LANE_MAGIC)] == LANE_MAGIC:
                raise ValueError(
                    "this bitstream is in the device wire format (CRDW lane "
                    "container) but the model is configured wire_format: "
                    "compressai — set wire_format: device (or "
                    "CRDR_WIRE=device) to decode it")

    def _lane_k(self, m: int) -> int:
        """Lane count for an ``m``-symbols-per-round stream: the config
        value, auto-reduced for small latents so the fixed per-lane cost
        (2 state words + a u16 length) stays a few percent of the stream;
        the decoder reads K from the container."""
        return min(self.device_wire_lanes,
                   max(8, 1 << max(0, (m // 64).bit_length() - 1)))

    def _lane_wire_statics(self, yH: int, yW: int, zH: int, zW: int):
        """Per-shape static inputs for the ``lane_wire`` executable: the y
        permutation into lane consumption order (family-specific; the same
        order the host serializers build with numpy), the y/z encode grids,
        and the lane counts.  Cached as device arrays per latent shape."""
        key = (yH, yW, zH, zW)
        if key in self._lane_enc_cache:
            return self._lane_enc_cache[key]
        from ..ops.device_rans import encode_grid

        ylen = yH * yW * self.yC
        zlen = zH * zW * self.zC
        is_charm = (self.use_charm
                    and self.context_type == "Minnen20CharmContextModel")
        if is_charm:
            # slice-major: for each slice, [h, w, sc] C-order
            ns, sc = self.num_slices, self.slice_ch
            perm = np.arange(ylen, dtype=np.int32) \
                .reshape(yH, yW, ns, sc).transpose(2, 0, 1, 3).reshape(-1)
            off = np.arange(ns + 1, dtype=np.int64) * (yH * yW * sc)
        elif self._is_checkerboard:
            # per slice: anchors then non-anchors, cell-major with channels
            # contiguous (the gather order of cb_a_dev / cb_b_dev)
            a_ids, na_ids = self._cb_ids(yH, yW)
            ns, sc = self.num_slices, self.slice_ch
            parts, off = [], [0]
            for s in range(ns):
                for ids in (a_ids, na_ids):
                    parts.append((ids[:, None].astype(np.int64) * self.yC
                                  + s * sc + np.arange(sc)[None, :])
                                 .reshape(-1))
                    off.append(off[-1] + ids.size * sc)
            perm = np.concatenate(parts).astype(np.int32)
            off = np.asarray(off, np.int64)
        else:
            perm = np.arange(ylen, dtype=np.int32)
            off = np.asarray([0, ylen], np.int64)
        k_y = self._lane_k(int(off[1] - off[0]))
        k_z = self._lane_k(zlen)
        put = lambda a: jax.device_put(a, self._dev)  # noqa: E731
        statics = (put(perm), put(encode_grid(off, k_y)),
                   put(encode_grid([0, zlen], k_z)))
        self._lane_enc_cache[key] = statics
        return statics

    def _lane_wire_dev(self, wire_dev: Array, N: int, yH: int, yW: int,
                       zH: int, zW: int, timing: Dict[str, float]):
        """Device-side lane encode of the packed int16 wire.  Returns
        ``(y_strs, z_strs, meta [N, 3] f32)`` — or ``None`` when an image's
        escape count exceeds ``device_wire_fixup_cap`` (the caller falls
        back to the host coder, which grows its fixup buffer instead of
        recompiling the fixed-shape device program)."""
        import time as _time

        from ..runtime.lane_rans import pack_lane_container

        t0 = _time.perf_counter()
        perm_d, grid_y, grid_z = self._lane_wire_statics(yH, yW, zH, zW)
        ytab, ztab = self._ytab(), self._ztab()
        out = self._codec_fn("lane_wire")(
            wire_dev, perm_d, grid_y, grid_z,
            ytab["cdf"], ytab["len"], ytab["off"],
            ztab["cdf"], ztab["len"], ztab["off"])
        (yw, yl, yfp, yfv, yne,
         zw, zl, zfp, zfv, zne, meta16) = jax.device_get(out)
        cap = self.device_wire_fixup_cap
        if (yne > cap).any() or (zne > cap).any():
            return None
        timing["device_encode_s"] = \
            timing.get("device_encode_s", 0.0) + _time.perf_counter() - t0
        t0 = _time.perf_counter()
        meta = np.ascontiguousarray(meta16).view(np.float32)

        def _containers(w, l, fp, fv, ne):
            out = []
            for i in range(N):
                f = int(ne[i])
                out.append(pack_lane_container(
                    w[i], l[i].astype(np.int32),
                    fp[i, :f].astype(np.int64), fv[i, :f]))
            return out

        res = (_containers(yw, yl, yfp, yfv, yne),
               _containers(zw, zl, zfp, zfv, zne), meta)
        timing["host_rans_s"] = _time.perf_counter() - t0
        return res

    def _lane_serialize(self, sym_l: np.ndarray, idx_l: np.ndarray,
                        slice_off: np.ndarray, codec=None) -> List[bytes]:
        """Device-wire serialization: lane-encode pre-flattened
        (decode-consumption-order) symbols/indexes [N, M] into K rans32
        streams + escape fixups, one container per image.  ``slice_off``:
        the autoregressive round boundaries (where lane assignment
        restarts — one round per Charm slice; a single round generically).
        ``codec``: the table provider — y (default) or the z bottleneck."""
        from ..runtime.lane_rans import lane_encode, pack_lane_container

        codec = codec or self.codec_y
        k = self._lane_k(int(slice_off[1] - slice_off[0]))
        sym_l = sym_l.astype(np.int32)
        idx_l = idx_l.astype(np.int32)

        def _one(i):
            cap = self.device_wire_fixup_cap
            while True:
                try:
                    enc = lane_encode(
                        sym_l[i], idx_l[i], slice_off, k,
                        codec.quantized_cdf, codec.cdf_length,
                        codec.offset, fix_cap=cap)
                    break
                except RuntimeError:  # fixup overflow: host side, just grow
                    cap *= 4
                    if cap > 1 << 20:
                        raise
            return pack_lane_container(*enc)

        return self._host_pmap(_one, sym_l.shape[0])

    def _encode_cb_replay(self, x: Array, ri) -> Tuple[Array, Array, Array]:
        """Checkerboard encode by FULL EXECUTABLE REPLAY of the decoder's
        phase chain (the cb counterpart of ``_compress_charm``'s replay):
        ``encode_head`` -> the decoder's own ``cb_begin`` -> per slice,
        ``cb_a_dev`` -> anchor quantize -> ``cb_b_dev`` -> non-anchor
        quantize -> ``cb_replay_pack``.  Every entropy parameter that picks
        a CDF row is produced by the LITERAL SAME compiled program on both
        sides, so encode/decode agreement is structural — which makes
        low-precision codec chains bitstream-safe for the checkerboard
        family too (previously guarded to `highest`: the old single-scan
        encoder shared source with the phases but not executables, and
        one-ULP fusion differences corrupted streams on TPU).  All ~4S+3
        dispatches chain asynchronously; the single blocking d2h is the
        packed wire fetch in the caller."""
        cp = {"net": self.params, "packed": self._charm_packed}
        table = self._table_dev
        y, z_sym16, pred_z_dev = self._codec_fn("encode_head")(
            self.params, x, ri)
        yH, yW = x.shape[1] // self.y_stride, x.shape[2] // self.y_stride
        a_ids, na_ids = self._cb_ids(yH, yW)
        a_ids_d = jax.device_put(a_ids, self._dev)
        na_ids_d = jax.device_put(na_ids, self._dev)
        hm, hs, support, sym_na_f, y_a, mu_c, z_hat = self._codec_fn(
            "cb_begin")(cp, z_sym16, table, na_ids_d)
        fa = self._codec_fn("cb_a_dev")
        fb = self._codec_fn("cb_b_dev")
        quant = self._codec_fn("cb_quant")
        ns = self.num_slices
        syms_a, syms_na, idxs_a, idxs_na = [], [], [], []
        sigmas, sigmas_c = [], []
        y_slices: List[Array] = []
        for i in range(ns):
            y_prev, support, mu, sigma, idx_a = fa(
                cp, jnp.int32(i), hm, hs, support, sym_na_f, y_a, mu_c,
                table, a_ids_d, na_ids_d)
            if i > 0:
                y_slices.append(y_prev)
            sym_a_f = quant(y, jnp.int32(i), mu, a_ids_d)
            y_a, mu_c, sigma_c, idx_na = fb(
                cp, jnp.int32(i), sym_a_f, mu, sigma, table, a_ids_d,
                na_ids_d)
            sym_na_f = quant(y, jnp.int32(i), mu_c, na_ids_d)
            syms_a.append(sym_a_f)
            syms_na.append(sym_na_f)
            idxs_a.append(idx_a)
            idxs_na.append(idx_na)
            sigmas.append(sigma)
            sigmas_c.append(sigma_c)
        wire, y_hat = self._codec_fn("cb_replay_pack")(
            cp, hm, support, sym_na_f, y_a, mu_c, tuple(y_slices),
            tuple(syms_a), tuple(syms_na), tuple(idxs_a), tuple(idxs_na),
            tuple(sigmas), tuple(sigmas_c), z_sym16, pred_z_dev,
            a_ids_d, na_ids_d)
        return wire, y_hat, z_hat

    def _cb_ids(self, h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
        """Row-major spatial cell indexes of the checkerboard anchors
        ((y+x) % 2 == 0) and non-anchors — the device wire's flattening
        order, shared by the host serializer and the device gather/scatter
        executables (order agreement is structural, not conventional)."""
        key = (h, w)
        if key not in self._cb_ids_cache:
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            mask = ((yy + xx) % 2 == 0).reshape(-1)
            self._cb_ids_cache[key] = (
                np.flatnonzero(mask).astype(np.int32),
                np.flatnonzero(~mask).astype(np.int32))
        return self._cb_ids_cache[key]

    def _decompress_cb_device(self, z_strs: List[bytes], y_strs: List[bytes],
                              zH: int, zW: int, rate_ind, beta: float,
                              H: int, W: int):
        """Device-wire checkerboard decode: ONE uninterrupted async dispatch
        chain (the checkerboard counterpart of _decompress_charm_device).
        Per slice, TWO lane rounds ride between the phase executables —
        anchors after cb_a_dev, non-anchors after cb_b_dev — so the
        2*num_slices-round autoregression runs with zero host round trips
        until the final image fetch."""
        import time as _time

        assert self._charm_packed is not None, "codec_setup() builds weights"
        timing = {}
        t0 = _time.perf_counter()
        z_dev = self._z_device(z_strs, zH, zW)
        words_d, fp_d, fv_d, fa_d = self._upload_lane_streams(y_strs)
        yH, yW = zH * 4, zW * 4  # y grid = 4x the z grid
        a_ids, na_ids = self._cb_ids(yH, yW)
        a_ids_d = jax.device_put(a_ids, self._dev)
        na_ids_d = jax.device_put(na_ids, self._dev)
        timing["host_unpack_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        cp = {"net": self.params, "packed": self._charm_packed}
        table = self._table_dev
        ytab = self._ytab()
        hm, hs, support, sym_na_f, y_a, mu_c, z_hat = self._codec_fn(
            "cb_begin")(cp, z_dev, table, na_ids_d)
        ns, sc = self.num_slices, self.slice_ch
        rans = self._codec_fn("rans_round")
        fa = self._codec_fn("cb_a_dev")
        fb = self._codec_fn("cb_b_dev")
        ri = self._cond_arg("q", rate_ind, len(z_strs)) \
            if self.use_rate else None
        bt = self._cond_arg("b", beta, len(z_strs)) \
            if self.use_beta else None

        states = ptrs = None
        off = 0
        y_slices: List[Array] = []
        for i in range(ns):
            y_prev, support, mu, sigma, idx_a = fa(
                cp, jnp.int32(i), hm, hs, support, sym_na_f, y_a, mu_c,
                table, a_ids_d, na_ids_d)
            if i > 0:
                y_slices.append(y_prev)
            sym_a_f, states, ptrs = rans(
                states, ptrs, words_d, idx_a, fp_d, fv_d, fa_d,
                np.int32(off), ytab["cdf"], ytab["len"], ytab["off"])
            off += a_ids.size * sc
            y_a, mu_c, _sigma_c, idx_na = fb(cp, jnp.int32(i), sym_a_f, mu,
                                             sigma, table, a_ids_d, na_ids_d)
            sym_na_f, states, ptrs = rans(
                states, ptrs, words_d, idx_na, fp_d, fv_d, fa_d,
                np.int32(off), ytab["cdf"], ytab["len"], ytab["off"])
            off += na_ids.size * sc
        fake, y_hat = self._codec_fn("cb_final")(
            cp, hm, support, sym_na_f, y_a, mu_c, tuple(y_slices), na_ids_d,
            ri, bt)
        fake = np.asarray(fake)  # the ONLY blocking sync of the decode
        timing["device_chain_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        if fake.dtype == np.uint8:  # codec_uint8_io: device sent uint8
            fake = uint8_to_tensor(fake)
            if self.convert_img_range:
                fake = (fake + 1.0) / 2.0
        fake = self.data_postprocess(fake, size=(H, W), is_train=False)
        timing["postprocess_s"] = _time.perf_counter() - t0
        self.last_decode_timing = timing
        return fake, z_hat, y_hat

    def _upload_lane_streams(self, y_strs: List[bytes]):
        """Unpack device-wire containers and upload [N, K, W] words + padded
        fixup buffers (pow2 fixup padding bounds recompiles)."""
        from ..runtime.lane_rans import unpack_lane_container

        n = len(y_strs)
        parts = [unpack_lane_container(ys) for ys in y_strs]
        wmax = max(p[0].shape[1] for p in parts)
        k = parts[0][0].shape[0]
        fmax = max(64, max(p[2].size for p in parts))
        fmax = 1 << (fmax - 1).bit_length()
        words = np.zeros((n, k, wmax), np.uint32)
        fix_pos = np.zeros((n, fmax), np.int32)
        fix_val = np.zeros((n, fmax), np.int32)
        fix_act = np.zeros((n, fmax), bool)
        for i, (w, lens, fp, fv) in enumerate(parts):
            words[i, :, :w.shape[1]] = w
            f = fp.size
            fix_pos[i, :f] = fp
            fix_val[i, :f] = fv
            fix_act[i, :f] = True
        return (self._place_batch(words), self._place_batch(fix_pos),
                self._place_batch(fix_val), self._place_batch(fix_act))

    def _decompress_generic_device(self, z_strs: List[bytes],
                                   y_strs: List[bytes], zH: int, zW: int,
                                   rate_ind, beta: float, H: int, W: int):
        """Device-wire decode for the generic (non-Charm) families: the
        decoder's ``generic_params`` executable (the same one the encoder
        replayed) -> on-device lane decode -> dequantize + synthesis.  One
        uninterrupted async chain, one blocking sync — versus the serial
        path's hyper-decode sync + host rANS + synthesis."""
        import time as _time

        timing = {}
        t0 = _time.perf_counter()
        z_dev = self._z_device(z_strs, zH, zW)
        words_d, fp_d, fv_d, fa_d = self._upload_lane_streams(y_strs)
        timing["host_unpack_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        ytab = self._ytab()
        z_hat, y_mean, _y_scale, idx_u8 = self._codec_fn("generic_params")(
            self.params, z_dev, self._table_dev)
        sym, _, _ = self._codec_fn("rans_round")(
            None, None, words_d, idx_u8, fp_d, fv_d, fa_d, np.int32(0),
            ytab["cdf"], ytab["len"], ytab["off"])
        ri = self._cond_arg("q", rate_ind, len(z_strs)) \
            if self.use_rate else None
        bt = self._cond_arg("b", beta, len(z_strs)) \
            if self.use_beta else None
        fake, y_hat = self._codec_fn("generic_final")(
            self.params, sym, y_mean, ri, bt)
        fake = np.asarray(fake)  # the ONLY blocking sync of the decode
        timing["device_chain_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        if fake.dtype == np.uint8:  # codec_uint8_io: device sent uint8
            fake = uint8_to_tensor(fake)
            if self.convert_img_range:
                fake = (fake + 1.0) / 2.0
        fake = self.data_postprocess(fake, size=(H, W), is_train=False)
        timing["postprocess_s"] = _time.perf_counter() - t0
        self.last_decode_timing = timing
        return fake, z_hat, y_hat

    def _decompress_charm_device(self, z_strs: List[bytes],
                                 y_strs: List[bytes], zH: int, zW: int,
                                 rate_ind, beta: float, H: int, W: int):
        """Device-wire Charm decode: ONE uninterrupted async dispatch chain.

        The per-slice structure (and the exact step executables) match
        _decompress_charm, but the symbols come from the on-device lane
        decoder (``rans_round``) instead of a host rANS stream, so nothing
        blocks until the final image fetch: latency ~= one round trip + the
        device compute, instead of num_slices+1 round trips.  The reference
        cannot express this — its decode pulls symbols from a CPU rANS
        stream between every slice (minnen20_charm_context_model.py:226-266).
        """
        import time as _time

        assert self._charm_packed is not None, "codec_setup() builds weights"
        timing = {}
        t0 = _time.perf_counter()
        z_dev = self._z_device(z_strs, zH, zW)
        words_d, fp_d, fv_d, fa_d = self._upload_lane_streams(y_strs)
        timing["host_unpack_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        cp = {"net": self.params, "packed": self._charm_packed}
        table = self._table_dev
        ytab = self._ytab()
        hm, hs, support, mu, _sigma, idx, z_hat = self._codec_fn(
            "decode_begin")(cp, z_dev, table)
        ns = self.num_slices
        step = self._charm_step_fn()
        rans = self._codec_fn("rans_round")
        ri = self._cond_arg("q", rate_ind, len(z_strs)) \
            if self.use_rate else None
        bt = self._cond_arg("b", beta, len(z_strs)) \
            if self.use_beta else None
        m = zH * 4 * zW * 4 * self.slice_ch  # y grid = 4x the z grid

        states = ptrs = None
        y_slices: List[Array] = []
        for i in range(ns):
            sym, states, ptrs = rans(
                states, ptrs, words_d, idx, fp_d, fv_d, fa_d,
                np.int32(i * m), ytab["cdf"], ytab["len"], ytab["off"])
            if i < ns - 1:
                y_prev, support, mu, _sigma, idx = step(
                    self._charm_packed, jnp.int32(i + 1), hm, hs,
                    support, sym, mu, table)
                y_slices.append(y_prev)
            else:
                fake, y_hat = self._codec_fn("decode_final")(
                    cp, hm, support, sym, mu, tuple(y_slices), ri, bt)
        fake = np.asarray(fake)  # the ONLY blocking sync of the decode
        timing["device_chain_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        if fake.dtype == np.uint8:  # codec_uint8_io: device sent uint8
            fake = uint8_to_tensor(fake)
            if self.convert_img_range:
                fake = (fake + 1.0) / 2.0
        fake = self.data_postprocess(fake, size=(H, W), is_train=False)
        timing["postprocess_s"] = _time.perf_counter() - t0
        self.last_decode_timing = timing
        return fake, z_hat, y_hat

    def _charm_step_fn(self):
        """The single shape-uniform Charm decode program (see
        ops/charm_uniform.py) — one compile serves every slice."""
        if "charm_uniform" in self._jit_cache:
            return self._jit_cache["charm_uniform"]
        from ..ops.charm_uniform import uniform_decode_step

        cm_opt = self.net.subnet_opt["context_model"]
        actv = dict(cm_opt.get("slice_transform_kwargs") or {}) \
            .get("actv", "relu")
        bound = self.codec_y.scale_bound
        ns, sc, msup = self.num_slices, self.slice_ch, self.max_support_slices
        prec = self.codec_precision

        def fn(packed, slice_idx, hyper_mean, hyper_scale, support_buf,
               sym_prev, mu_prev, table):
            # symbols ride h2d as int16 (halves the upload); math in f32
            sym_prev = sym_prev.astype(hyper_mean.dtype)
            with _precision_scope(prec):
                y_prev, support, mu, sigma, indexes = uniform_decode_step(
                    packed, slice_idx, hyper_mean, hyper_scale, support_buf,
                    sym_prev, mu_prev, table, bound, ns, sc, msup, actv)
            # indexes go straight to a host fetch; uint8 quarters the d2h
            # (the scale table has < 256 entries)
            return y_prev, support, mu, sigma, indexes.astype(jnp.uint8)

        return self._register_exe("charm_uniform",
                                  jax.jit(fn, donate_argnums=(4,)))

    def _checkerboard_decompress(self, y_str: bytes,
                                 z16: Array) -> Tuple[np.ndarray, Array]:
        """Host-wire (CompressAI-stream) checkerboard decode, driving the
        SAME ``cb_begin`` + ``cb_a_dev``/``cb_b_dev`` executables as the
        device-wire decode and the replay encoder — one executable family
        for every cb path, so encode/decode agreement (hm/hs included) is
        structural at any codec precision.  The glue between the
        executables' gathered cell order and the stream's
        subgrid-channel-major order is exact integer numpy.
        Returns (y_hat, z_hat)."""
        from ..runtime import RansStreamDecoder
        from ..subnet.context_model.checkerboard import split_checkerboard

        assert self._charm_packed is not None, "codec_setup() builds weights"
        n, zh, zw = z16.shape[:3]
        h, w = zh * 4, zw * 4
        sc = self.slice_ch
        ns = self.num_slices
        a_ids, na_ids = self._cb_ids(h, w)
        a_ids_d = jax.device_put(a_ids, self._dev)
        na_ids_d = jax.device_put(na_ids, self._dev)
        cp = {"net": self.params, "packed": self._charm_packed}
        fa = self._codec_fn("cb_a_dev")
        fb = self._codec_fn("cb_b_dev")
        table = self._table_dev
        hyper_mean, hyper_scale, support, sym_na_f, y_a, mu_c, z_hat = \
            self._codec_fn("cb_begin")(cp, z16, table, na_ids_d)
        decoder = RansStreamDecoder(y_str)

        def _scat(flat_np, ids):
            out = np.zeros((n, h * w, sc), flat_np.dtype)
            out[:, ids, :] = flat_np.reshape(n, ids.size, sc)
            return out.reshape(n, h, w, sc)

        def _gath(grid_np, ids):
            return grid_np.reshape(n, h * w, sc)[:, ids, :].reshape(n, -1)

        def _decode_grids(grids):
            """Decode subgrids (channel-major each) from the stream."""
            outs = []
            for g in grids:
                sym = decoder.decode(g.transpose(0, 3, 1, 2).reshape(-1),
                                     self.codec_y.quantized_cdf,
                                     self.codec_y.cdf_length,
                                     self.codec_y.offset)
                outs.append(sym.reshape(g.shape[0], sc, g.shape[1],
                                        g.shape[2]).transpose(0, 2, 3, 1)
                            .astype(np.float32))
            return outs

        y_slices: List[Array] = []
        try:
            for i in range(ns):
                y_prev, support, mu, sigma, idx_a = fa(
                    cp, jnp.int32(i), hyper_mean, hyper_scale, support,
                    sym_na_f, y_a, mu_c, table, a_ids_d, na_ids_d)
                if i > 0:
                    y_slices.append(y_prev)
                idx_grid = _scat(np.asarray(idx_a).astype(np.int32), a_ids)
                ia1, ia2, _, _ = split_checkerboard(idx_grid)
                a1, a2 = _decode_grids((ia1, ia2))
                z2 = np.zeros_like(a1)
                sym_a_f = self._place_batch(
                    _gath(_merge_np(a1, a2, z2, z2), a_ids)
                    .astype(np.int16))
                y_a, mu_c, _sigma_c, idx_na = fb(
                    cp, jnp.int32(i), sym_a_f, mu, sigma, table, a_ids_d,
                    na_ids_d)
                idx_grid = _scat(np.asarray(idx_na).astype(np.int32), na_ids)
                _, _, in1, in2 = split_checkerboard(idx_grid)
                na1, na2 = _decode_grids((in1, in2))
                sym_na_f = self._place_batch(
                    _gath(_merge_np(z2, z2, na1, na2), na_ids)
                    .astype(np.int16))
        finally:
            decoder.close()
        # reconstruct the last slice (cb_a_dev at i == ns runs exactly the
        # y_prev head; its params outputs are dead)
        y_last, _, _, _, _ = fa(
            cp, jnp.int32(ns), hyper_mean, hyper_scale, support, sym_na_f,
            y_a, mu_c, table, a_ids_d, na_ids_d)
        return (np.asarray(jnp.concatenate(y_slices + [y_last], axis=-1)),
                z_hat)

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


def _checkerboard_serialize(arr: np.ndarray, num_slices: int) -> np.ndarray:
    """NHWC -> 1D symbol order: per slice, anchor subgrids (A1, A2) then
    non-anchor subgrids (NA1, NA2), each channel-major."""
    parts = []
    for s in np.split(arr, num_slices, axis=-1):
        a1 = s[:, 0::2, 0::2]
        a2 = s[:, 1::2, 1::2]
        na1 = s[:, 0::2, 1::2]
        na2 = s[:, 1::2, 0::2]
        for g in (a1, a2, na1, na2):
            parts.append(g.transpose(0, 3, 1, 2).reshape(-1))
    return np.concatenate(parts)


def _merge_np(a1, a2, na1, na2):
    n, h2, w2, c = a1.shape
    out = np.zeros((n, h2 * 2, w2 * 2, c), a1.dtype)
    out[:, 0::2, 0::2] = a1
    out[:, 1::2, 1::2] = a2
    out[:, 0::2, 1::2] = na1
    out[:, 1::2, 0::2] = na2
    return out


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _precision_scope(prec: Optional[str]):
    """Context manager setting the default matmul precision during tracing."""
    import contextlib

    if prec is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(prec)


def _cast_float_tree(tree, dt):
    """Cast every floating leaf of a pytree to ``dt`` (ints/bools pass
    through).  Used to run the side-local transforms in bf16; XLA dead-code-
    eliminates casts of leaves the traced program never touches."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, tree)


def _apply_encode_latents(net, p, x, kw, tdt):
    """Analysis + hyper-analysis, optionally in bf16 (``transform_dtype``).
    y/z always come back f32: everything downstream (z-round, hyper-decode,
    context chain, symbolization) is the precision-pinned codec chain."""
    if tdt is not None:
        p = _cast_float_tree(p, tdt)
        x = x.astype(tdt)
        kw = {k: v.astype(tdt) for k, v in kw.items()}
    y, z = net.apply({"params": p}, x,
                     method=lambda n, xx, rate_ind=None:
                     n.encode_latents(xx, rate_ind), **kw)
    return y.astype(jnp.float32), z.astype(jnp.float32)


def _apply_decode(net, p, y_hat, kw, tdt):
    """Synthesis transform, optionally in bf16 (``transform_dtype``); the
    image comes back f32 so the clamp + uint8 rounding keep their exact f32
    semantics (bf16 cannot represent every value in [0, 255])."""
    if tdt is not None:
        p = _cast_float_tree(p, tdt)
        y_hat = y_hat.astype(tdt)
        kw = {k: v.astype(tdt) for k, v in kw.items()}
    img = net.apply({"params": p}, y_hat,
                    method=lambda n, yy, rate_ind=None, beta=None:
                    n.decode(yy, rate_ind, beta), **kw)
    return img.astype(jnp.float32)


def _rate_summary(out: Dict, num_pixel: int) -> Dict:
    def bits(lik):
        axes = tuple(range(1, lik.ndim))
        return -jnp.sum(jnp.log(lik), axis=axes) / jnp.log(2.0)

    y_bpp = bits(out["likelihoods"]["y"]) / num_pixel
    z_bpp = bits(out["likelihoods"]["z"]) / num_pixel
    y_qbpp = bits(out["q_likelihoods"]["y"]) / num_pixel
    z_qbpp = bits(out["q_likelihoods"]["z"]) / num_pixel
    return {
        "bpp": y_bpp + z_bpp,
        "qbpp": y_qbpp + z_qbpp,
        "y_bpp": y_bpp,
        "z_bpp": z_bpp,
    }


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
