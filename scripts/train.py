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
    if opt.get("auto_resume") and not opt.start_iter:
        itr = _latest_checkpoint_iter(opt)
        if itr:
            opt["start_iter"] = itr
            logger.info(f"auto-resume from iter {itr}")
    opt.dump(opt.path.config_dump_path)
    trainer = build_trainer(opt)
    trainer.train_loop()


def _latest_checkpoint_iter(opt) -> int:
    """Newest comp_model checkpoint iteration in the experiment dir (0 if
    none).  Filenames use the PathHandler iter2str layout (e.g. iter15K)."""
    import re
    from glob import glob

    iters = []
    for p in glob(os.path.join(opt.ckpt_root, opt.exp, "model",
                               "comp_model_iter*.ckpt")):
        m = re.search(r"iter(\d+)([KM]?)\.ckpt$", os.path.basename(p))
        if m:
            mult = {"": 1, "K": 1000, "M": 1000000}[m.group(2)]
            iters.append(int(m.group(1)) * mult)
    return max(iters) if iters else 0


if __name__ == "__main__":
    main()
