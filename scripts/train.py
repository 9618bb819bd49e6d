"""Training CLI (API parity with reference scripts/train.py:16-27).

    python scripts/train.py config/crdr_stage_1.yaml [--total_iter N ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdr_tpu.trainer import build_trainer
from crdr_tpu.utils.config import get_train_config
from crdr_tpu.utils.logger import get_root_logger
from crdr_tpu.utils.path import PathHandler


def main(argv=None):
    opt = get_train_config(argv)
    if opt.get("device"):
        os.environ["JAX_PLATFORMS"] = opt.device
        import jax

        jax.config.update("jax_platforms", opt.device)
    if opt.get("distributed"):
        from crdr_tpu.parallel.distributed import init_distributed

        init_distributed()
    ph = PathHandler(opt.ckpt_root, opt.exp)
    ph.make_job_dir()
    from crdr_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    logger = get_root_logger(log_file=opt.path.log_file_path)
    logger.info(f"experiment: {opt.exp} (host {opt.host})")
    opt.dump(opt.path.config_dump_path)
    trainer = build_trainer(opt)
    trainer.train_loop()


if __name__ == "__main__":
    main()
