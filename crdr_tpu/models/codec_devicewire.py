"""Device-wire codec paths: lane-interleaved on-device rANS (rans32) so the
Charm decode is one uninterrupted async dispatch chain, plus the checkerboard
device decode (mixin for BaseModel).  Split out of comp_model.py (VERDICT r3
item 8); semantics unchanged.  No reference counterpart — this wire format is
a TPU-native capability extension (the reference always decodes y on the host,
minnen20_charm_context_model.py:192-240)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.img_utils import uint8_to_tensor
from .codec_common import _merge_np, _precision_scope

Array = jax.Array


class DeviceWireCodecMixin:
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

        if self._use_fused_loop(hm):
            # ONE program for the whole loop (see ops/charm_uniform.
            # uniform_decode_loop); decode_final stays the shared executable
            y_slices, sym_l, mu_l, support = self._codec_fn("charm_loop")(
                cp, hm, hs, support, mu, idx, words_d, fp_d, fv_d, fa_d,
                ytab["cdf"], ytab["len"], ytab["off"], table)
            fake, y_hat = self._codec_fn("decode_final")(
                cp, hm, support, sym_l, mu_l, y_slices, ri, bt)
        else:
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

    def _use_fused_loop(self, hm) -> bool:
        """Fused whole-loop decode is safe only when the Pallas
        SliceTransform kernel carries the conv arithmetic: the encoder
        replays the per-step executables, and a Mosaic kernel is the only
        conv compilation that is byte-stable across call sites (everything
        else in the loop is elementwise f32 or exact integer).  With plain
        XLA convs (kernel off, CPU backend, or a latent too big for VMEM)
        the per-step dispatch chain stays the decode path.

        Opt-in: ``fused_decode_loop`` config key; env CRDR_FUSED_LOOP=1/0
        overrides (the A/B escape hatch, like CRDR_PALLAS)."""
        import os

        env = os.environ.get("CRDR_FUSED_LOOP")
        want = bool(getattr(self, "fused_decode_loop", False)) \
            if env is None else env == "1"
        if not want:
            return False
        from ..ops.charm_uniform import _fused_mode

        return _fused_mode(hm) is not None

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

