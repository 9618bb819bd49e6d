"""Uniform-shape Charm decode step: ONE compiled program for all slices.

The naive serial decode needs a distinct XLA program per slice (support width
grows 0..160 ch and each slice has its own weights), which costs a full
compile per slice.  Here every slice runs the SAME program:

* the decoded-support lives in a fixed (N, H, W, max_support*slice_ch) buffer,
  zero-padded for not-yet-decoded slices;
* each slice's three SliceTransform weight sets are zero-padded to the maximum
  input width and stacked along a leading slice axis; the program gathers the
  current slice's weights with a traced index.

Zero-padded input channels meet zero-padded weight rows, so outputs are
bit-identical to the per-slice-shaped computation (modulo float addition of
exact zeros).  Extra FLOPs on early slices are marginal against the latency of
10 separate device-program compiles.

Weight layout convention for the padded first conv (in-channel axis):
``[hyper(Ch) | support(max_support*slice_ch) | (lrp only) current slice]``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

_ACTV = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2),
}


def pack_charm_weights(cm_params: Dict, num_slices: int, slice_ch: int,
                       hyper_ch: int, max_support: int) -> Dict[str, np.ndarray]:
    """Stack + zero-pad the per-slice SliceTransform weights.

    ``cm_params``: the flax param subtree of Minnen20CharmContextModel.
    Returns arrays keyed ``{mean,scale,lrp}{0,2,4}_{w,b}`` with a leading
    slice axis.
    """
    sup_w = max_support * slice_ch
    out: Dict[str, list] = {}

    def first_in_width(kind: str) -> int:
        return hyper_ch + sup_w + (slice_ch if kind == "lrp" else 0)

    for kind in ("mean", "scale", "lrp"):
        for layer, tag in (("model_0", "0"), ("model_2", "2"), ("model_4", "4")):
            ws, bs = [], []
            for i in range(num_slices):
                p = cm_params[f"{kind}_slice_transforms_{i}"][layer]
                w = np.asarray(p["weight"], np.float32)
                b = np.asarray(p["bias"], np.float32)
                if layer == "model_0":
                    nsup = min(i, max_support) if max_support >= 0 else i
                    used = nsup * slice_ch
                    kh, kw, cin, cout = w.shape
                    padded = np.zeros((kh, kw, first_in_width(kind), cout),
                                      np.float32)
                    # hyper rows
                    padded[:, :, :hyper_ch] = w[:, :, :hyper_ch]
                    # support rows go to their fixed offsets
                    padded[:, :, hyper_ch:hyper_ch + used] = \
                        w[:, :, hyper_ch:hyper_ch + used]
                    if kind == "lrp":
                        # the current-slice rows sit at the fixed tail offset
                        padded[:, :, hyper_ch + sup_w:] = \
                            w[:, :, hyper_ch + used:hyper_ch + used + slice_ch]
                    w = padded
                ws.append(w)
                bs.append(b)
            out[f"{kind}{tag}_w"] = np.stack(ws)
            out[f"{kind}{tag}_b"] = np.stack(bs)
    return {k: np.ascontiguousarray(v) for k, v in out.items()}


def _conv(x: Array, w: Array, b: Array, pad: int) -> Array:
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)], dimension_numbers=dn) + b


def _slice_transform(packed: Dict[str, Array], kind: str, idx: Array,
                     x: Array, actv: str) -> Array:
    act = _ACTV[actv]
    w0 = jnp.take(packed[f"{kind}0_w"], idx, axis=0)
    b0 = jnp.take(packed[f"{kind}0_b"], idx, axis=0)
    w2 = jnp.take(packed[f"{kind}2_w"], idx, axis=0)
    b2 = jnp.take(packed[f"{kind}2_b"], idx, axis=0)
    w4 = jnp.take(packed[f"{kind}4_w"], idx, axis=0)
    b4 = jnp.take(packed[f"{kind}4_b"], idx, axis=0)
    mode = _fused_mode(x)
    if actv == "relu" and mode:
        from .pallas_slice_transform import pallas_slice_transform

        return pallas_slice_transform(x, w0, b0, w2, b2, w4, b4,
                                      interpret=(mode == "interp"))
    x = act(_conv(x, w0, b0, 2))
    x = act(_conv(x, w2, b2, 2))
    return _conv(x, w4, b4, 1)


# config-level default for the fused kernel, set by the model's
# codec_setup from ``fused_slice_kernel`` in its YAML config; the
# CRDR_PALLAS env var (operator escape hatch) always wins when set.
# Process-wide: the last codec_setup decides for configless callers.
_CONFIG_DEFAULT = "0"


def set_fused_default(mode) -> None:
    """mode: True/"1" (compiled kernel, TPU only), "interp" (Pallas
    interpreter, any backend — CI use), False/None/"0" (plain XLA)."""
    global _CONFIG_DEFAULT
    _CONFIG_DEFAULT = {True: "1", False: "0", None: "0"}.get(mode, str(mode))


def _fused_mode(x: Array):
    """Opt-in fused VMEM kernel.  CRDR_PALLAS=1: compiled Mosaic kernel
    (TPU only); CRDR_PALLAS=interp: the same kernel through the Pallas
    interpreter on any backend — slow, exists so CI without a TPU can run
    the full codec path through the kernel's exact arithmetic.  Returns
    the mode string or None (plain XLA convs)."""
    import os

    mode = os.environ.get("CRDR_PALLAS", _CONFIG_DEFAULT)
    if mode not in ("1", "interp"):
        return None
    from .pallas_slice_transform import fits_fused

    if not fits_fused(x.shape[1], x.shape[2]):
        return None
    if mode == "interp":
        return "interp"
    try:
        return "1" if jax.devices()[0].platform != "cpu" else None
    except Exception:
        return None


def uniform_encode_scan(packed: Dict[str, Array], y: Array, hyper_mean: Array,
                        hyper_scale: Array, num_slices: int, slice_ch: int,
                        max_support: int, actv: str = "relu"
                        ) -> Tuple[Array, Array, Array]:
    """Whole Charm encode pass as ONE lax.scan of the uniform step body.

    The autoregressive chain on the encode side only flows through the
    quantized slices (which the encoder can compute itself), so the entire
    10-slice loop runs on device with no host round trips, and the uniform
    shapes mean the scan body compiles once.

    NO LONGER the production encoder: BaseModel._compress_charm now replays
    the decoder's own step executables so encode/decode agreement is
    structural (see its docstring).  Kept as the independent single-program
    implementation of the same math — the unit tests cross-check it against
    both the flax modules and the replay chain, which would catch a
    packed-weight or step-ordering bug in either.

    Returns (y_mean, y_scale, y_hat) stacked back to full channel width.
    """
    n, h, w, _ = y.shape
    sup_w = max_support * slice_ch
    y_slices = jnp.stack(jnp.split(y, num_slices, axis=-1))  # [S,N,H,W,sc]

    def body(carry, inputs):
        support_buf, idx = carry
        y_slice = inputs
        mean_in = jnp.concatenate([hyper_mean, support_buf], axis=-1)
        scale_in = jnp.concatenate([hyper_scale, support_buf], axis=-1)
        mu = _slice_transform(packed, "mean", idx, mean_in, actv)
        sigma = _slice_transform(packed, "scale", idx, scale_in, actv)
        y_hat = jnp.round(y_slice - mu) + mu
        lrp_in = jnp.concatenate([hyper_mean, support_buf, y_hat], axis=-1)
        lrp = 0.5 * jnp.tanh(_slice_transform(packed, "lrp", idx, lrp_in, actv))
        y_hat = y_hat + lrp
        write = idx < max_support
        offset = jnp.clip(idx, 0, max_support - 1) * slice_ch
        updated = jax.lax.dynamic_update_slice(support_buf, y_hat,
                                               (0, 0, 0, offset))
        support_buf = jnp.where(write, updated, support_buf)
        return (support_buf, idx + 1), (mu, sigma, y_hat)

    support0 = jnp.zeros((n, h, w, sup_w), y.dtype)
    _, (mus, sigmas, y_hats) = jax.lax.scan(
        body, (support0, jnp.int32(0)), y_slices)

    def unstack(s):  # [S,N,H,W,sc] -> [N,H,W,S*sc]
        return jnp.concatenate(list(s), axis=-1)

    return unstack(mus), unstack(sigmas), unstack(y_hats)


def uniform_encode_loop(packed: Dict[str, Array], y: Array, hyper_mean: Array,
                        hyper_scale: Array, support0: Array, mu0: Array,
                        sigma0: Array, idx0: Array, scale_table: Array,
                        scale_bound: float, num_slices: int, slice_ch: int,
                        max_support: int, actv: str = "relu"):
    """The Charm REPLAY-ENCODE loop as one ``lax.scan`` program.

    Same dispatch-collapse as :func:`uniform_decode_loop`, encode side: the
    per-slice (``quantize_slice``, step-executable) pairs — ~2*num_slices
    dispatches in ``_compress_charm`` — become one program.  The body calls
    the very same :func:`uniform_decode_step` FUNCTION the decoder's
    programs trace, and the quantize is the same round-around-mu arithmetic
    as the ``quantize_slice`` executable; under the fused-Pallas-kernel
    gate (all conv work byte-stable across programs, everything else
    elementwise/exact) the emitted symbols/indexes/sigmas are bit-identical
    to the per-step replay chain's — asserted byte-for-byte on the wire in
    tests/test_fused_loop.py.

    mu0/sigma0/idx0/support0 come from the shared ``decode_begin``
    executable.  Returns ``(syms, idxs, sigmas, y_slices, mu_last,
    support)`` shaped exactly for the existing ``replay_pack`` executable:
    tuples of per-slice int16 symbols, uint8 indexes, bounded sigmas, and
    the first ``num_slices - 1`` reconstructions.
    """
    def body(carry, i):
        support, mu, sigma, idx = carry
        y_slice = jax.lax.dynamic_slice_in_dim(y, i * slice_ch, slice_ch,
                                               axis=3)
        sym = jnp.round(y_slice - mu).astype(jnp.int16)
        sym_f = sym.astype(hyper_mean.dtype)
        y_prev, support, mu_next, sigma_next, idx_next = uniform_decode_step(
            packed, i + 1, hyper_mean, hyper_scale, support, sym_f, mu,
            scale_table, scale_bound, num_slices, slice_ch, max_support,
            actv)
        out = (sym, idx.astype(jnp.uint8), sigma, y_prev, mu)
        return (support, mu_next, sigma_next, idx_next), out

    carry0 = (support0, mu0, sigma0, idx0.astype(jnp.int32))
    (support, _, _, _), (syms, idxs, sigmas, ys, mus) = jax.lax.scan(
        body, carry0, jnp.arange(num_slices, dtype=jnp.int32))
    to_tuple = lambda s, k: tuple(s[i] for i in range(k))
    return (to_tuple(syms, num_slices), to_tuple(idxs, num_slices),
            to_tuple(sigmas, num_slices), to_tuple(ys, num_slices - 1),
            mus[num_slices - 1], support)


def uniform_reconstruct_last(packed: Dict[str, Array], hyper_mean: Array,
                             support_buf: Array, sym_prev: Array,
                             mu_prev: Array, num_slices: int,
                             actv: str = "relu") -> Array:
    """Reconstruct the FINAL slice (dequantize + LRP) with the packed
    weights and the same padded-input layout as the encode scan body — so
    the decode-side y_hat is bit-identical to the encoder's.  Used by the
    fused last-step+synthesis decode program (no entropy params needed
    after the last slice)."""
    y_prev = sym_prev + mu_prev
    lrp_in = jnp.concatenate([hyper_mean, support_buf, y_prev], axis=-1)
    lrp = 0.5 * jnp.tanh(_slice_transform(
        packed, "lrp", jnp.int32(num_slices - 1), lrp_in, actv))
    return y_prev + lrp


def uniform_decode_step(packed: Dict[str, Array], slice_idx: Array,
                        hyper_mean: Array, hyper_scale: Array,
                        support_buf: Array, sym_prev: Array, mu_prev: Array,
                        scale_table: Array, scale_bound: float,
                        num_slices: int, slice_ch: int, max_support: int,
                        actv: str = "relu"
                        ) -> Tuple[Array, Array, Array, Array, Array]:
    """One serial-decode step, shape-uniform across slices.

    For call ``slice_idx = i`` (i in 0..num_slices):
      * if i > 0: reconstruct slice i-1 from (sym_prev, mu_prev) via LRP and
        write it into the support buffer (only while it is a support slice);
      * if i < num_slices: produce (mu_i, sigma_i, rANS indexes_i) for the
        next decode round (garbage, ignored, at i == num_slices).

    Returns (y_prev, support_buf, mu_i, sigma_i, indexes_i).  sigma is the
    scale-bounded value; the ENCODER (which replays this very executable,
    see BaseModel._compress_charm) consumes it for its predicted-bits
    accounting — decoders ignore it.  It is already computed for the index
    search, so exposing it costs one extra output buffer write.
    """
    i = jnp.asarray(slice_idx, jnp.int32)
    prev = jnp.maximum(i - 1, 0)

    # --- reconstruct slice i-1 ------------------------------------------
    y_prev = sym_prev + mu_prev
    lrp_in = jnp.concatenate([hyper_mean, support_buf, y_prev], axis=-1)
    lrp = 0.5 * jnp.tanh(_slice_transform(packed, "lrp", prev, lrp_in, actv))
    y_prev = jnp.where(i > 0, y_prev + lrp, y_prev)

    # --- grow the support buffer ----------------------------------------
    write = (i >= 1) & (prev < max_support)
    offset = jnp.clip(prev, 0, max_support - 1) * slice_ch
    updated = jax.lax.dynamic_update_slice(
        support_buf, y_prev, (0, 0, 0, offset))
    support_buf = jnp.where(write, updated, support_buf)

    # --- entropy params for slice i -------------------------------------
    cur = jnp.minimum(i, num_slices - 1)
    mean_in = jnp.concatenate([hyper_mean, support_buf], axis=-1)
    scale_in = jnp.concatenate([hyper_scale, support_buf], axis=-1)
    mu = _slice_transform(packed, "mean", cur, mean_in, actv)
    sigma = _slice_transform(packed, "scale", cur, scale_in, actv)

    sigma = jnp.maximum(sigma, scale_bound)
    indexes = jnp.minimum(
        jnp.searchsorted(scale_table, sigma, side="left"),
        len(scale_table) - 1).astype(jnp.int32)
    return y_prev, support_buf, mu, sigma, indexes


def uniform_decode_loop(packed: Dict[str, Array], hyper_mean: Array,
                        hyper_scale: Array, support0: Array, mu0: Array,
                        idx0: Array, words: Array, fix_pos: Array,
                        fix_val: Array, fix_act: Array, cdf: Array,
                        cdf_len: Array, cdf_off: Array, scale_table: Array,
                        scale_bound: float, num_slices: int, slice_ch: int,
                        max_support: int, actv: str = "relu"
                        ) -> Tuple[Tuple[Array, ...], Array, Array, Array]:
    """The WHOLE device-wire Charm decode loop as one ``lax.scan`` program.

    Fuses the per-slice (lane-decode round, ``uniform_decode_step``) pairs —
    ~2*num_slices separate dispatches on the serial path — into a single
    compiled program: iteration ``i`` entropy-decodes round ``i`` with the
    on-device lane coder (ops/device_rans.py) and runs the step for slice
    ``i+1``.  Under a high-RTT relay each async dispatch still costs a
    dispatch-floor fee; this removes all of them but one.

    Bitstream-safety contract: the ENCODER replays the per-step
    ``charm_uniform`` executable (codec_hostwire._compress_charm), so the
    mu/sigma/indexes computed here — a DIFFERENT compiled program — must be
    bit-identical to that executable's.  That holds when every non-exact op
    is inside the fused Pallas SliceTransform kernel (compiled standalone by
    Mosaic, byte-stable across call sites); everything outside is
    elementwise f32 or exact integer (lane decoder invariants, searchsorted
    comparisons).  Callers therefore gate this path on the fused-kernel mode
    being active (codec_devicewire._use_fused_loop); with plain XLA convs
    the per-step executables remain the decode path.

    idx0/mu0/support0 come from the shared ``decode_begin`` executable.
    Returns ``(y_slices, sym_last, mu_last, support)`` shaped exactly for
    the existing ``decode_final`` executable: y_slices is a tuple of the
    first ``num_slices - 1`` reconstructed slices; the last slice is left
    to ``decode_final`` (the same program the host wire runs).
    """
    from .device_rans import (apply_fixups, expand_tables, init_lane_state,
                              instep_tables_enabled, lane_decode_round,
                              lane_decode_round_instep)

    n, h, w = hyper_mean.shape[:3]
    m = h * w * slice_ch
    states, ptrs = init_lane_state(words)
    instep = instep_tables_enabled()
    from .pallas_lane_decode import (kernel_fits, pallas_lane_decode_round,
                                     pallas_lanes_mode)
    lanes_mode = pallas_lanes_mode()
    if lanes_mode and not kernel_fits(n, words.shape[1], m, cdf.shape[-1]):
        lanes_mode = None  # VMEM gate: fall back to the XLA in-step path

    def body(carry, i):
        states, ptrs, support, mu, idx = carry
        if lanes_mode:  # opt-in Mosaic kernel (whole round in VMEM)
            vals, states, ptrs = pallas_lane_decode_round(
                states, ptrs, words, idx.reshape(n, m), cdf, cdf_len,
                cdf_off, m, interpret=(lanes_mode == "interp"))
        elif instep:  # bandwidth-lean: rows expanded per step, VMEM-resident
            vals, states, ptrs = lane_decode_round_instep(
                states, ptrs, words, idx.reshape(n, m), cdf, cdf_len,
                cdf_off, m)
        else:
            rows, lens, offs = expand_tables(
                idx.reshape(n, m), cdf, cdf_len, cdf_off)
            vals, states, ptrs = lane_decode_round(
                states, ptrs, words, rows, lens, offs, m)
        vals = apply_fixups(vals, fix_pos, fix_val, fix_act, i * m, m)
        # int16 round trip matches the rans_round executable's output dtype
        sym = vals.reshape(idx.shape).astype(jnp.int16)
        sym_f = sym.astype(hyper_mean.dtype)
        y_prev, support, mu_next, _sigma, idx_next = uniform_decode_step(
            packed, i + 1, hyper_mean, hyper_scale, support, sym_f, mu,
            scale_table, scale_bound, num_slices, slice_ch, max_support,
            actv)
        # at i == num_slices - 1 the step's params are the documented
        # garbage-at-last (support write masked); y_prev/emit stay valid
        return (states, ptrs, support, mu_next, idx_next), (y_prev, sym, mu)

    carry0 = (states, ptrs, support0, mu0,
              idx0.astype(jnp.int32).reshape(mu0.shape))
    (_, _, support, _, _), (ys, syms, mus) = jax.lax.scan(
        body, carry0, jnp.arange(num_slices, dtype=jnp.int32))
    y_slices = tuple(ys[i] for i in range(num_slices - 1))
    return y_slices, syms[num_slices - 1], mus[num_slices - 1], support
