"""Data-parallel trainer wiring: the SAME trainers run over an 8-device mesh
(``n_devices`` config key) with batch sharding + replicated state, and the
resulting parameter trajectory matches the single-device trainer.

This is the TPU-native capability beyond the single-device reference
(reference README.md:62-63 — one GPU); here DP is a config switch.
"""

import copy

import numpy as np
import pytest

import jax

from crdr_tpu.trainer import build_trainer
from tests.test_trainer import _train_cfg

pytestmark = pytest.mark.slow


def _run(cfg, n_steps=3):
    cfg.dataset.train_dataset.num_images = 32
    trainer = build_trainer(cfg)
    it = iter(trainer.train_loader)
    logs = []
    for i in range(n_steps):
        data = next(it)
        log = trainer.optimize_parameters(i + 1, data)
        assert log is not None
        logs.append(log)
    return trainer, logs


def test_dp_trainer_matches_single_device(tmp_path):
    cfg1 = _train_cfg(tmp_path / "single")
    cfg1.dataset.batch_size = 8
    cfg1.exp = "dp_single"
    t1, logs1 = _run(copy.deepcopy(cfg1))

    cfg8 = _train_cfg(tmp_path / "mesh")
    cfg8.dataset.batch_size = 8
    cfg8.exp = "dp_mesh"
    cfg8["n_devices"] = 8
    t8, logs8 = _run(cfg8)

    assert t8.mesh is not None and t8.mesh.devices.size == 8
    # batch really sharded: state replicated on all 8 devices
    assert len(jax.tree.leaves(t8.state.params)[0].devices()) == 8

    for l1, l8 in zip(logs1, logs8):
        assert abs(l1["total"] - l8["total"]) < 2e-3, (l1["total"], l8["total"])
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t8.state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_dp_gan_trainer_steps(tmp_path):
    cfg = _train_cfg(tmp_path, stage3=True)
    cfg.dataset.batch_size = 8
    cfg["n_devices"] = 8
    trainer, logs = _run(cfg, n_steps=2)
    assert trainer.mesh is not None
    for log in logs:
        for key in ("distortion", "rate", "adv", "d_real", "d_fake"):
            assert np.isfinite(log[key]), key


def test_dp_batch_divisibility_guard(tmp_path):
    cfg = _train_cfg(tmp_path)
    cfg.dataset.batch_size = 6  # not divisible by 8
    cfg["n_devices"] = 8
    with pytest.raises(AssertionError):
        build_trainer(cfg)


def test_dp_validation_and_save(tmp_path):
    """Replicated state flows through validation + checkpointing unchanged."""
    cfg = _train_cfg(tmp_path)
    cfg.dataset.batch_size = 8
    cfg["n_devices"] = 8
    trainer, _ = _run(cfg, n_steps=1)
    trainer.validation(1)
    trainer.save(2)
    import os

    assert os.path.exists(os.path.join(
        str(tmp_path), "tiny_test", "model", "comp_model_iter2.ckpt"))
