"""Trainer smoke tests: a few optimization steps of the stage-1 (RD) and
stage-3 (HRRGAN beta-cond) trainers on a tiny model + synthetic data, verifying
losses are finite, parameters move, and checkpoints save/load."""

import os

import numpy as np
import pytest

import jax

from crdr_tpu.trainer import build_trainer
from crdr_tpu.utils.config import Config, ConfigDict
from tests.test_comp_model import tiny_opt

pytestmark = pytest.mark.slow


def _train_cfg(tmp_path, stage3=False):
    opt = tiny_opt()
    opt.update({
        "exp": "tiny_test",
        "ckpt_root": str(tmp_path),
        "start_iter": 0,
        "total_iter": 3,
        "log_step": 2,
        "eval_step": 1000,
        "save_step": 2,
        "time_step": 1000,
        "keep_step": [],
        "is_train": True,
        "dataset": {
            "batch_size": 2,
            "train_dataset": {"name": "", "type": "SyntheticImageDataset",
                              "num_images": 4, "image_size": 64},
            "eval_dataset": {"name": "", "type": "SyntheticImageDataset",
                             "num_images": 2, "image_size": 64,
                             "base_size": 64},
        },
        "optim": {
            "clip_max_norm": 1.0,
            "g_optimizer": {"type": "Adam", "lr": 1e-4},
            "g_scheduler": {"type": "MultiStepLR", "milestones": [800000],
                            "gamma": 0.1},
            "aux_optimizer": {"type": "Adam", "lr": 1e-3},
        },
        "loss": {
            "rate_loss": {"type": "HificVariableRateLoss",
                          "lambda_A": [3.4, 1.3, 0.4],
                          "lambda_B": 0.015625,
                          "target_rate": [0.08, 0.16, 0.36]},
            "distortion_loss": {"type": "MSELoss", "loss_weight": 150},
        },
        "trainer": {"type": "RateDistortionTrainer"},
    })
    if stage3:
        opt["trainer"] = {"type": "MultirateBetaCondHrrGanRateDistortionTrainer"}
        opt["discriminator"] = {"type": "ModuleListDiscriminator",
                                "_subd_type": "CLIC21GVAEDiscriminator",
                                "_num_subd": 3, "in_ch": 3, "out_ch": 1,
                                "main_ch": 8, "norm_type": "none"}
        opt["loss"]["perceptual_loss"] = {"type": "LPIPSLoss",
                                          "loss_weight": 0.390625}
        opt["loss"]["gan_loss"] = {"type": "VanillaGANLoss",
                                   "loss_weight": 0.000390625}
        opt["optim"]["d_optimizer"] = {"type": "Adam", "lr": 1e-4}
    cfg = Config(opt)
    from crdr_tpu.utils.config import _fill_paths

    _fill_paths(cfg)
    return cfg


def _params_differ(a, b) -> bool:
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    return any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(leaves_a, leaves_b))


def test_rd_trainer_steps(tmp_path):
    trainer = build_trainer(_train_cfg(tmp_path))
    p0 = jax.device_get(trainer.state.params)
    data = next(iter(trainer.train_loader))
    logs = []
    for i in range(3):
        log = trainer.optimize_parameters(i + 1, data)
        assert log is not None
        assert np.isfinite(log["total"]) and np.isfinite(log["rate"])
        assert log["aux"] > 0
        logs.append(log)
    assert _params_differ(p0, trainer.state.params)
    # save & reload round-trip: optimizer state must survive, not just params
    trainer.save(2)
    ckpt = os.path.join(str(tmp_path), "tiny_test", "model",
                        "comp_model_iter2.ckpt")
    assert os.path.exists(ckpt)
    saved_params = jax.device_get(trainer.state.params)
    saved_opt = jax.device_get(trainer.state.opt_state)
    # perturb, then restore
    trainer.state = trainer.state.replace(
        params=jax.tree.map(lambda a: a + 1.0, trainer.state.params))
    trainer.load_checkpoint("tiny_test", 2)
    for a, b in zip(jax.tree.leaves(saved_params),
                    jax.tree.leaves(trainer.state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a))
    for a, b in zip(jax.tree.leaves(saved_opt),
                    jax.tree.leaves(trainer.state.opt_state)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a))


def test_stage3_gan_trainer_steps(tmp_path):
    trainer = build_trainer(_train_cfg(tmp_path, stage3=True))
    d0 = jax.device_get(trainer.state.d_params)
    data = next(iter(trainer.train_loader))
    log = trainer.optimize_parameters(1, data)
    assert log is not None
    for key in ("distortion", "rate", "perceptual", "adv", "d_real", "d_fake"):
        assert np.isfinite(log[key]), key
    assert _params_differ(d0, trainer.state.d_params)


def test_uint8_batch_matches_float_batch(tmp_path):
    """The jitted step converts uint8 batches on device with the exact
    uint8_to_tensor formula — the loss must equal the float-batch step."""
    import copy
    import jax.numpy as jnp

    cfg = _train_cfg(tmp_path / "f")
    t_f = build_trainer(copy.deepcopy(cfg))
    cfg_u = _train_cfg(tmp_path / "u")
    cfg_u.dataset.train_dataset["uint8_io"] = True
    t_u = build_trainer(cfg_u)

    data_f = next(iter(t_f.train_loader))
    data_u = next(iter(t_u.train_loader))
    assert data_u["real_images"].dtype == np.uint8
    log_f = t_f.optimize_parameters(1, data_f)
    log_u = t_u.optimize_parameters(1, data_u)
    assert abs(log_f["total"] - log_u["total"]) < 1e-5, (log_f, log_u)


def test_latest_checkpoint_iter(tmp_path):
    import os

    from scripts.train import _latest_checkpoint_iter
    from crdr_tpu.utils.config import ConfigDict

    d = tmp_path / "exp" / "model"
    os.makedirs(d)
    for n in ("comp_model_iter15K.ckpt", "comp_model_iter500.ckpt",
              "training_state_iter15K.ckpt"):
        (d / n).touch()
    opt = ConfigDict({"ckpt_root": str(tmp_path), "exp": "exp"})
    assert _latest_checkpoint_iter(opt) == 15000
