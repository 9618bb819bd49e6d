"""Host-wire (CompressAI-format) compress/decompress: the public codec API
plus the host C++ rANS coding paths (mixin for BaseModel).  Split out of
comp_model.py (VERDICT r3 item 8); semantics unchanged.  Reference:
compress returns [header, z_str, y_str] (hyperprior_model.py:139-186); the
Charm decode loop is hyperprior_charm_model.py:121-147 +
minnen20_charm_context_model.py:192-240."""

from __future__ import annotations

import math
import os
from typing import Dict, List, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.img_utils import pad_image, uint8_to_tensor
from .codec_common import _checkerboard_serialize

Array = jax.Array


class HostWireCodecMixin:
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

    def _use_fused_encode_loop(self, hm) -> bool:
        """Encode-side twin of codec_devicewire._use_fused_loop: the fused
        encode scan is dispatched only when the Pallas SliceTransform kernel
        carries the conv arithmetic, so its symbols/indexes are bit-identical
        to the per-step replay chain (and to every decoder path).  Opt-in:
        ``fused_encode_loop`` config key; env CRDR_FUSED_ENC_LOOP=1/0
        overrides."""
        import os

        env = os.environ.get("CRDR_FUSED_ENC_LOOP")
        want = bool(getattr(self, "fused_encode_loop", False)) \
            if env is None else env == "1"
        if not want:
            return False
        from ..ops.charm_uniform import _fused_mode

        return _fused_mode(hm) is not None

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
        if self._use_fused_encode_loop(hm):
            # ONE program for the whole slice loop (see ops/charm_uniform.
            # uniform_encode_loop); replay_pack stays the shared executable
            syms, idxs, sigmas, y_slices, mu_l, support = self._codec_fn(
                "charm_encode_loop")(cp_params, y, hm, hs, support, mu,
                                     sigma, idx, table)
            wire, y_hat = self._codec_fn("replay_pack")(
                cp_params, hm, support, syms, idxs, sigmas, y_slices,
                mu_l, z_sym16, pred_z_dev)
        else:
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
                cp_params, hm, support, tuple(syms), tuple(idxs),
                tuple(sigmas), tuple(y_slices), mu, z_sym16, pred_z_dev)
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

