"""Mosaic lane-decode kernel vs the XLA forms and the host C++ coder.

Runs the kernel in interpret mode (CPU backend); on hardware the A/B
harness re-asserts byte equality before timing (scripts/ab_fused_loop.py
protocol).  Exactness argument in ops/pallas_lane_decode.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdr_tpu.ops.device_rans import apply_fixups, init_lane_state
from crdr_tpu.ops.pallas_lane_decode import (pallas_lane_decode_round,
                                             pallas_lanes_enabled)
from tests.test_device_rans import _case, _decode_all, _upload_words


def _decode_all_pallas(cdfs, cdf_len, offsets, per_img, n_slices, m, K,
                       fix_cap=64):
    words = _upload_words([e[2][0] for e in per_img])
    idx_all = jnp.asarray(np.stack([e[1] for e in per_img]))  # [N, S, m]
    n = len(per_img)
    fix_pos = np.zeros((n, fix_cap), np.int32)
    fix_val = np.zeros((n, fix_cap), np.int32)
    fix_act = np.zeros((n, fix_cap), bool)
    for i, (_, _, enc) in enumerate(per_img):
        f = enc[2].size
        fix_pos[i, :f] = enc[2]
        fix_val[i, :f] = enc[3]
        fix_act[i, :f] = True

    states, ptrs = init_lane_state(words)
    outs = []
    for s in range(n_slices):
        vals, states, ptrs = pallas_lane_decode_round(
            states, ptrs, words, idx_all[:, s], jnp.asarray(cdfs),
            jnp.asarray(cdf_len), jnp.asarray(offsets), m, interpret=True)
        vals = apply_fixups(vals, jnp.asarray(fix_pos),
                            jnp.asarray(fix_val), jnp.asarray(fix_act),
                            s * m, m)
        outs.append(np.asarray(vals))
    return np.stack(outs, axis=1)  # [N, S, m]


@pytest.mark.parametrize("seed,n_slices,m,K,esc", [
    (0, 3, 100, 16, 0.0),        # ragged m vs K
    (1, 4, 37, 8, 0.08),         # escapes + tail mask
    (2, 2, 5, 32, 0.0),          # more lanes than symbols
    (5, 2, 300, 128, 0.02),      # full-lane-quantum K, wide round
])
def test_pallas_kernel_matches(seed, n_slices, m, K, esc):
    rng = np.random.default_rng(seed)
    cdfs, cdf_len, offsets, per_img = _case(rng, 2, n_slices, m, K, esc)
    ref = _decode_all(cdfs, cdf_len, offsets, per_img, n_slices, m, K)
    got = _decode_all_pallas(cdfs, cdf_len, offsets, per_img,
                             n_slices, m, K)
    np.testing.assert_array_equal(got, ref)  # == XLA form
    for i, (v, _, _) in enumerate(per_img):
        np.testing.assert_array_equal(got[i], v)  # == C++ encoder input


def test_state_carry_across_forms():
    """The kernel's carried (states, ptrs) interoperate with the XLA form
    mid-stream (same contract)."""
    from crdr_tpu.ops.device_rans import lane_decode_round_instep

    rng = np.random.default_rng(9)
    n_slices, m, K = 4, 64, 16
    cdfs, cdf_len, offsets, per_img = _case(rng, 2, n_slices, m, K, 0.0)
    words = _upload_words([e[2][0] for e in per_img])
    idx_all = jnp.asarray(np.stack([e[1] for e in per_img]))
    cdf_d, len_d, off_d = (jnp.asarray(cdfs), jnp.asarray(cdf_len),
                           jnp.asarray(offsets))
    states, ptrs = init_lane_state(words)
    outs = []
    for s in range(n_slices):
        if s % 2 == 0:
            vals, states, ptrs = pallas_lane_decode_round(
                states, ptrs, words, idx_all[:, s], cdf_d, len_d, off_d,
                m, interpret=True)
        else:
            vals, states, ptrs = lane_decode_round_instep(
                states, ptrs, words, idx_all[:, s], cdf_d, len_d, off_d, m)
        outs.append(np.asarray(vals))
    got = np.stack(outs, axis=1)
    for i, (v, _, _) in enumerate(per_img):
        np.testing.assert_array_equal(got[i], v)


def test_opt_in_flag(monkeypatch):
    monkeypatch.delenv("CRDR_PALLAS_LANES", raising=False)
    assert not pallas_lanes_enabled()  # off until promoted by on-chip A/B
    monkeypatch.setenv("CRDR_PALLAS_LANES", "interp")
    assert pallas_lanes_enabled()
    monkeypatch.setenv("CRDR_PALLAS_LANES", "1")
    # compiled mode needs a non-CPU backend; under the CPU conftest it
    # must gate itself off rather than hand Mosaic an impossible target
    assert not pallas_lanes_enabled()
