"""Stage-1 -> stage-2 -> stage-3 weight handoff across model classes.

The reference loads pretrained weights partially (base_model.py:110-113:
shared keys transfer, new modules keep their init).  Here the stage-2
multirate InterpCA model loads a stage-1 single-rate checkpoint: the shared
subnets (hyper, context model, entropy, conv trunks) must transfer exactly
while the InterpCA/beta additions stay initialized."""

import numpy as np
import pytest

import jax

from crdr_tpu.models import build_comp_model
from crdr_tpu.utils.saver import save_pytree
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def _flat(params):
    # normalize the InterpCA "body" nesting so stage-1 and stage-2 trunk
    # leaves compare under the same key (mirrors the loader's alignment)
    return {jax.tree_util.keystr(p).replace("['body']", ""): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}


def test_stage1_to_stage2_partial_load(tmp_path):
    # stage 1: single-rate ELIC + charm
    m1 = build_comp_model(tiny_opt(model_type="HyperpriorCharmModel",
                                   rate=False, beta=False))
    m1.init_params(input_size=64)
    ckpt = str(tmp_path / "stage1.ckpt")
    save_pytree({"comp_model": m1.state_dict()}, ckpt)

    # stage 2: multirate InterpCA variant of the same trunk
    m2 = build_comp_model(tiny_opt(model_type="InterpCaHyperpriorCharmModel",
                                   rate=True, beta=False))
    m2.init_params(input_size=64)
    init2 = _flat(m2.params)
    m2.load_learned_weight(ckpt)
    loaded2 = _flat(m2.params)
    src = _flat(m1.params)

    transferred = kept = 0
    for k, v in loaded2.items():
        if k in src and src[k].shape == v.shape:
            np.testing.assert_array_equal(v, src[k], err_msg=k)
            transferred += 1
        else:
            np.testing.assert_array_equal(v, init2[k], err_msg=k)
            kept += 1
    # the shared trunk must dominate; the InterpCA adds a handful of gains
    assert transferred > kept, (transferred, kept)
    assert kept > 0  # InterpCA modules are new

    # the merged model must run
    out = m2.run_model(
        real_images=np.random.default_rng(0)
        .uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32),
        is_train=False, rate_ind=1)
    assert np.isfinite(out["fake_images"]).all()


def test_stage2_to_stage3_partial_load(tmp_path):
    # stage 2 ckpt loads into the beta-conditioned stage-3 flagship class
    m2 = build_comp_model(tiny_opt(model_type="InterpCaHyperpriorCharmModel",
                                   rate=True, beta=False))
    m2.init_params(input_size=64)
    ckpt = str(tmp_path / "stage2.ckpt")
    save_pytree({"comp_model": m2.state_dict()}, ckpt)

    m3 = build_comp_model(tiny_opt())  # BetaCondInterpCaHyperpriorCharmModel
    m3.init_params(input_size=64)
    m3.load_learned_weight(ckpt)
    src = _flat(m2.params)
    loaded = _flat(m3.params)
    shared = [k for k in loaded
              if k in src and src[k].shape == loaded[k].shape]
    assert len(shared) > 0
    for k in shared:
        np.testing.assert_array_equal(loaded[k], src[k], err_msg=k)
