"""Jitted codec device programs (encode/decode/charm parameter passes) for
BaseModel (mixin).  Split out of comp_model.py (VERDICT r3 item 8); semantics
unchanged.  Reference call stacks: SURVEY.md section 3.2/3.3."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .codec_common import (_apply_decode, _apply_encode_latents,
                           _precision_scope)


class CodecProgramsMixin:
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
                                           init_lane_state,
                                           instep_tables_enabled,
                                           lane_decode_round,
                                           lane_decode_round_instep)

            from ..ops.pallas_lane_decode import (kernel_fits,
                                                  pallas_lane_decode_round,
                                                  pallas_lanes_mode)

            def fn(states, ptrs, words, idx, fix_pos, fix_val, fix_act, lo,
                   cdf, cdf_len, cdf_off):
                n_ = idx.shape[0]
                m = int(np.prod(idx.shape[1:]))
                if states is None:  # first round: seed lanes from the words
                    states, ptrs = init_lane_state(words)
                lanes_mode = pallas_lanes_mode()
                if lanes_mode and not kernel_fits(n_, words.shape[1], m,
                                                  cdf.shape[-1]):
                    lanes_mode = None  # VMEM gate -> XLA in-step path
                if lanes_mode:  # opt-in Mosaic lane kernel
                    vals, states, ptrs = pallas_lane_decode_round(
                        states, ptrs, words, idx.reshape(n_, m), cdf,
                        cdf_len, cdf_off, m,
                        interpret=(lanes_mode == "interp"))
                elif instep_tables_enabled():  # see ops/device_rans.py: the
                    # bandwidth-lean form (rows expanded per scan step from
                    # the VMEM-class table; bit-identical by construction)
                    vals, states, ptrs = lane_decode_round_instep(
                        states, ptrs, words, idx.reshape(n_, m), cdf,
                        cdf_len, cdf_off, m)
                else:
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
        elif name == "charm_loop":
            # device-wire FUSED decode loop: all num_slices (lane-decode
            # round, charm step) pairs as ONE lax.scan program — the serial
            # path's ~2S async dispatches (each paying the relay's dispatch
            # floor) collapse into one.  Output shapes feed the unchanged
            # ``decode_final`` executable.  Only dispatched when the fused
            # Pallas kernel carries the conv arithmetic (see
            # codec_devicewire._use_fused_loop for the bit-safety contract).
            from ..ops.charm_uniform import uniform_decode_loop

            cm_opt = self.net.subnet_opt["context_model"]
            actv = dict(cm_opt.get("slice_transform_kwargs") or {}) \
                .get("actv", "relu")
            bound = self.codec_y.scale_bound
            ns, sc, msup = (self.num_slices, self.slice_ch,
                            self.max_support_slices)

            def fn(params, hm, hs, support0, mu0, idx0, words, fix_pos,
                   fix_val, fix_act, cdf, cdf_len, cdf_off, table):
                return uniform_decode_loop(
                    params["packed"], hm, hs, support0, mu0, idx0, words,
                    fix_pos, fix_val, fix_act, cdf, cdf_len, cdf_off, table,
                    bound, ns, sc, msup, actv)
        elif name == "charm_encode_loop":
            # replay-encode counterpart of ``charm_loop``: the per-slice
            # (quantize_slice, step) dispatch pairs as ONE lax.scan program,
            # feeding the unchanged ``replay_pack`` executable.  Same
            # bit-safety gate (codec_hostwire._use_fused_encode_loop).
            from ..ops.charm_uniform import uniform_encode_loop

            cm_opt = self.net.subnet_opt["context_model"]
            actv = dict(cm_opt.get("slice_transform_kwargs") or {}) \
                .get("actv", "relu")
            bound = self.codec_y.scale_bound
            ns, sc, msup = (self.num_slices, self.slice_ch,
                            self.max_support_slices)

            def fn(params, y, hm, hs, support0, mu0, sigma0, idx0, table):
                return uniform_encode_loop(
                    params["packed"], y, hm, hs, support0, mu0, sigma0,
                    idx0, table, bound, ns, sc, msup, actv)
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

