"""Codec setup + device-resident CDF/scale-table plumbing for BaseModel
(mixin).  Split out of comp_model.py (VERDICT r3 item 8); semantics unchanged.
Reference: codec_setup builds z CDFs + the 64-entry y scale bank and pins the
entropy stack host-side (hyperprior_model.py:120-136)."""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

import jax

from ..entropy import (EntropyBottleneckCodec, GaussianConditionalCodec,
                       get_scale_table)
from ..utils.codec_utils import HeaderHandler, MultiRateHeaderHandler

Array = jax.Array


class CodecTablesMixin:
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
        # fused whole-loop device-wire decode (one lax.scan program for all
        # slices); only dispatched when the Pallas kernel is active — see
        # codec_devicewire._use_fused_loop for the bit-safety contract
        self.fused_decode_loop = bool(self.opt.get("fused_decode_loop",
                                                   False))
        self.fused_encode_loop = bool(self.opt.get("fused_encode_loop",
                                                   False))

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

