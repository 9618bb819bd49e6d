"""End-to-end train_loop test: log/eval/save cadence, CSV outputs, validation
sweep, rolling checkpoints — the full trainer surface on a tiny model."""

import os

import pytest

from crdr_tpu.trainer import build_trainer
from tests.test_trainer import _train_cfg

pytestmark = pytest.mark.slow


def test_train_loop_end_to_end(tmp_path):
    cfg = _train_cfg(tmp_path)
    cfg.update({"total_iter": 8, "log_step": 4, "eval_step": 4,
                "save_step": 4, "time_step": 4})
    trainer = build_trainer(cfg)
    trainer.train_loop()

    job_dir = os.path.join(str(tmp_path), "tiny_test")
    # loss CSV written at iters 4 and 8
    with open(os.path.join(job_dir, "log_loss.csv")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) >= 3  # header + 2 rows
    assert "total" in lines[0] and "bpp" in lines[0]

    # eval CSV with per-rate validation columns (multirate model)
    with open(os.path.join(job_dir, "eval_result.csv")) as f:
        header = f.readline()
    assert "bpp_1" in header and "psnr_1" in header and "ms_ssim_1" in header
    assert "bpp_3" in header  # rate_level = 3

    # checkpoints: iter 8 present; iter 4 rolled away (not in keep_step)
    model_dir = os.path.join(job_dir, "model")
    names = sorted(os.listdir(model_dir))
    assert "comp_model_iter8.ckpt" in names
    assert "comp_model_iter4.ckpt" not in names
    assert "training_state_iter8.ckpt" in names
