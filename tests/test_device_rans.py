"""Device (jitted) lane-rans decoder vs the host coder: bit-exact values.

Runs on the CPU backend (conftest forces it); the decoder is pure jnp so
the same program compiles for TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from crdr_tpu.ops.device_rans import (apply_fixups, expand_tables,
                                      init_lane_state, lane_decode_round)
from crdr_tpu.runtime.lane_rans import lane_encode
from tests.test_lane_rans import _random_tables


def _upload_words(words_list):
    """Per-image [K, len] uint16 -> common-padded [N, K, W] uint32."""
    w = max(x.shape[1] for x in words_list)
    n = len(words_list)
    k = words_list[0].shape[0]
    out = np.zeros((n, k, w), np.uint32)
    for i, x in enumerate(words_list):
        out[i, :, :x.shape[1]] = x
    return jnp.asarray(out)


def _case(rng, n_imgs, n_slices, m, K, escape_frac):
    cdfs, cdf_len, offsets = _random_tables(rng)
    rows = cdfs.shape[0]
    per_img = []
    for _ in range(n_imgs):
        idx = rng.integers(0, rows, size=(n_slices, m)).astype(np.int32)
        max_v = cdf_len[idx] - 2
        v = (offsets[idx]
             + rng.integers(0, np.maximum(max_v, 1))).astype(np.int32)
        if escape_frac:
            esc = rng.random((n_slices, m)) < escape_frac
            v = np.where(esc, offsets[idx] + max_v + 7, v).astype(np.int32)
        off = np.arange(n_slices + 1) * m
        enc = lane_encode(v, idx, off, K, cdfs, cdf_len, offsets)
        per_img.append((v, idx, enc))
    return cdfs, cdf_len, offsets, per_img


def _decode_all(cdfs, cdf_len, offsets, per_img, n_slices, m, K, fix_cap=64):
    words = _upload_words([e[2][0] for e in per_img])
    idx_all = jnp.asarray(np.stack([e[1] for e in per_img]))  # [N, S, m]
    n = len(per_img)
    fix_pos = np.zeros((n, fix_cap), np.int32)
    fix_val = np.zeros((n, fix_cap), np.int32)
    fix_act = np.zeros((n, fix_cap), bool)
    for i, (_, _, enc) in enumerate(per_img):
        f = enc[2].size
        assert f <= fix_cap
        fix_pos[i, :f] = enc[2]
        fix_val[i, :f] = enc[3]
        fix_act[i, :f] = True

    @jax.jit
    def run(words, idx_all, fp, fv, fa):
        states, ptrs = init_lane_state(words)
        outs = []
        for s in range(n_slices):
            rows_f, lens_f, offs_f = expand_tables(
                idx_all[:, s], jnp.asarray(cdfs), jnp.asarray(cdf_len),
                jnp.asarray(offsets))
            vals, states, ptrs = lane_decode_round(
                states, ptrs, words, rows_f, lens_f, offs_f, m)
            vals = apply_fixups(vals, fp, fv, fa, s * m, m)
            outs.append(vals)
        return jnp.stack(outs, axis=1)  # [N, S, m]

    return np.asarray(run(words, idx_all, jnp.asarray(fix_pos),
                          jnp.asarray(fix_val), jnp.asarray(fix_act)))


def test_device_decode_matches_encoder():
    rng = np.random.default_rng(0)
    n_slices, m, K = 3, 100, 16
    cdfs, cdf_len, offsets, per_img = _case(rng, 2, n_slices, m, K, 0.0)
    got = _decode_all(cdfs, cdf_len, offsets, per_img, n_slices, m, K)
    for i, (v, _, _) in enumerate(per_img):
        np.testing.assert_array_equal(got[i], v)


def test_device_decode_escapes_and_ragged():
    rng = np.random.default_rng(1)
    n_slices, m, K = 4, 37, 8  # m % K != 0 exercises the tail mask
    cdfs, cdf_len, offsets, per_img = _case(rng, 3, n_slices, m, K, 0.08)
    assert any(e[2][2].size for e in per_img)
    got = _decode_all(cdfs, cdf_len, offsets, per_img, n_slices, m, K)
    for i, (v, _, _) in enumerate(per_img):
        np.testing.assert_array_equal(got[i], v)


def test_device_decode_more_lanes_than_symbols():
    rng = np.random.default_rng(2)
    n_slices, m, K = 2, 5, 32
    cdfs, cdf_len, offsets, per_img = _case(rng, 1, n_slices, m, K, 0.0)
    got = _decode_all(cdfs, cdf_len, offsets, per_img, n_slices, m, K)
    np.testing.assert_array_equal(got[0], per_img[0][0])


def test_device_decode_fuzz():
    rng = np.random.default_rng(3)
    for _ in range(6):
        n_slices = int(rng.integers(1, 4))
        m = int(rng.integers(2, 120))
        K = int(rng.integers(1, 40))
        cdfs, cdf_len, offsets, per_img = _case(
            rng, 2, n_slices, m, K, float(rng.random() * 0.1))
        got = _decode_all(cdfs, cdf_len, offsets, per_img, n_slices, m, K)
        for i, (v, _, _) in enumerate(per_img):
            np.testing.assert_array_equal(got[i], v)
