"""In-step table expansion (lane_decode_round_instep) vs the precomputed
form and vs the host C++ coder: bit-exact values at every shape class.

The in-step form is the HBM-traffic fix from profile_r4.md (rows expanded
per scan step from the VMEM-class CDF table instead of streaming an
N*m*L f32 tensor).  It is arithmetic-identical by construction; these
tests pin that, including the padded-tail and escape-fixup paths, and
assert the env escape hatch actually switches forms.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdr_tpu.ops.device_rans import (apply_fixups, expand_tables,
                                      init_lane_state,
                                      instep_tables_enabled,
                                      lane_decode_round,
                                      lane_decode_round_instep)
from tests.test_device_rans import _case, _decode_all, _upload_words


def _decode_all_instep(cdfs, cdf_len, offsets, per_img, n_slices, m, K,
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

    @jax.jit
    def run(words, idx_all, fp, fv, fa):
        states, ptrs = init_lane_state(words)
        outs = []
        for s in range(n_slices):
            vals, states, ptrs = lane_decode_round_instep(
                states, ptrs, words, idx_all[:, s], jnp.asarray(cdfs),
                jnp.asarray(cdf_len), jnp.asarray(offsets), m)
            vals = apply_fixups(vals, fp, fv, fa, s * m, m)
            outs.append(vals)
        return jnp.stack(outs, axis=1)

    return np.asarray(run(words, idx_all, jnp.asarray(fix_pos),
                          jnp.asarray(fix_val), jnp.asarray(fix_act)))


@pytest.mark.parametrize("seed,n_slices,m,K,esc", [
    (0, 3, 100, 16, 0.0),        # exact multiple of K
    (1, 4, 37, 8, 0.08),         # ragged tail + escapes
    (2, 2, 5, 32, 0.0),          # more lanes than symbols
    (3, 1, 257, 64, 0.03),       # wide round, escapes
])
def test_instep_matches_encoder_and_precomputed(seed, n_slices, m, K, esc):
    rng = np.random.default_rng(seed)
    cdfs, cdf_len, offsets, per_img = _case(rng, 2, n_slices, m, K, esc)
    ref = _decode_all(cdfs, cdf_len, offsets, per_img, n_slices, m, K)
    got = _decode_all_instep(cdfs, cdf_len, offsets, per_img, n_slices, m, K)
    np.testing.assert_array_equal(got, ref)  # identical to precomputed form
    for i, (v, _, _) in enumerate(per_img):
        np.testing.assert_array_equal(got[i], v)  # and to the C++ encoder


def test_instep_state_and_ptr_continuity():
    """Interleaving forms mid-stream decodes correctly: the carried
    (states, ptrs) contract is identical between the two forms."""
    rng = np.random.default_rng(7)
    n_slices, m, K = 4, 50, 8
    cdfs, cdf_len, offsets, per_img = _case(rng, 2, n_slices, m, K, 0.0)
    words = _upload_words([e[2][0] for e in per_img])
    idx_all = jnp.asarray(np.stack([e[1] for e in per_img]))
    cdf_d = jnp.asarray(cdfs)
    len_d = jnp.asarray(cdf_len)
    off_d = jnp.asarray(offsets)

    states, ptrs = init_lane_state(words)
    outs = []
    for s in range(n_slices):
        if s % 2 == 0:
            vals, states, ptrs = lane_decode_round_instep(
                states, ptrs, words, idx_all[:, s], cdf_d, len_d, off_d, m)
        else:
            rows, lens, offs = expand_tables(idx_all[:, s], cdf_d, len_d,
                                             off_d)
            vals, states, ptrs = lane_decode_round(
                states, ptrs, words, rows, lens, offs, m)
        outs.append(np.asarray(vals))
    got = np.stack(outs, axis=1)
    for i, (v, _, _) in enumerate(per_img):
        np.testing.assert_array_equal(got[i], v)


def test_env_escape_hatch(monkeypatch):
    monkeypatch.delenv("CRDR_INSTEP_TABLES", raising=False)
    assert instep_tables_enabled()  # default ON
    monkeypatch.setenv("CRDR_INSTEP_TABLES", "0")
    assert not instep_tables_enabled()
    monkeypatch.setenv("CRDR_INSTEP_TABLES", "1")
    assert instep_tables_enabled()
