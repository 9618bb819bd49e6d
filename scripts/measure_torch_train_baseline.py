"""Measure the ACTUAL torch reference's CPU training-step rate for bench.py.

Runs /root/reference's own trainer code (imported through tests/ref_shims,
which supply compressai / lpips / addict on top of in-repo implementations)
on the torch CPU backend: `RateDistortionTrainer.optimize_parameters`
(src/trainer/rate_distortion_trainer.py:57-101) with the stage-1 recipe —
forward (incl. the 10-slice Charm loop), MSE + HiFiC rate + LPIPS losses,
backward, clip, Adam step, scheduler step, aux (quantile) step.  Batch 8,
crop 256, like config/crdr_stage_1.yaml.  Records steps/s into
BASELINE_TORCH_TRAIN.json, which bench.py reports as ``vs_torch_cpu_train``
(VERDICT r4 item 7 — the training axis gets the same honest measured
denominator serving got in r4; the reference publishes no speed numbers).

The timed region is the optimization step on a prefetched batch (loader
excluded on both sides — scripts/bench_train.py times our jitted step the
same way).  LPIPS runs the real AlexNet-LPIPS graph at random init (weights
are not downloadable here; FLOPs identical).

    python scripts/measure_torch_train_baseline.py [--steps 2] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_FILE = os.path.join(REPO, "BASELINE_TORCH_TRAIN.json")
WORK = "/tmp/ref_train_baseline"


def _make_data_tree() -> str:
    """OpenImageImageDataset-shaped tree (train_0/*.jpg + validation/*.jpg)
    from the demo images (reference openimage_dataset.py:20-30)."""
    from PIL import Image

    root = os.path.join(WORK, "data")
    tr, ev = os.path.join(root, "train_0"), os.path.join(root, "validation")
    os.makedirs(tr, exist_ok=True)
    os.makedirs(ev, exist_ok=True)
    demo = "/root/reference/demo_images"
    srcs = [n for n in sorted(os.listdir(demo))
            if n.lower().endswith((".png", ".jpg"))]
    for i, name in enumerate(srcs):
        im = Image.open(os.path.join(demo, name)).convert("RGB")
        # several copies each: the loader needs >= one full batch
        # (drop_last=True) and the timed step reuses one batch anyway
        for k in range(4):
            im.save(os.path.join(tr, f"img{i}_{k}.jpg"), quality=95)
        if i == 0:
            im.save(os.path.join(ev, "val0.jpg"), quality=95)
    return root


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2, help="timed steps")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    import torch

    from tests.ref_shims import install_shims

    install_shims()
    torch.manual_seed(0)

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(os.path.join(WORK, "checkpoint"), exist_ok=True)
    data_root = _make_data_tree()

    # Drive the reference's own TrainConfig CLI (options.py:200-264) so the
    # opt/path plumbing is exactly what scripts/train.py would build.
    from src.utils.options import TrainConfig  # noqa: E402 (shimmed path)

    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(WORK)
    try:
        sys.argv = ["train.py", "/root/reference/config/crdr_stage_1.yaml",
                    "-d", "cpu", "-b", str(args.batch)]
        opt = TrainConfig.get_opt("/root/reference/config")
    finally:
        sys.argv = old_argv
    opt["dataset"]["train_dataset"] = {
        "name": "openimage", "type": "ImageDataset",
        "root_dir": data_root, "subset_list": [0], "image_size": 256}
    opt["dataset"]["eval_dataset"] = {
        "name": "openimage", "type": "ImageDataset", "root_dir": data_root,
        "subset_list": [0]}

    from src.trainer import build_trainer  # noqa: E402
    from src.utils.path import PathHandler  # noqa: E402

    PathHandler(opt.ckpt_root, opt.exp).make_job_dir()
    print("torch train baseline: building trainer...", file=sys.stderr,
          flush=True)
    trainer = build_trainer(opt)

    # one prefetched batch, reused for every timed step (loader excluded)
    data = next(iter(trainer.train_loader))
    print("torch train baseline: warmup step...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    trainer.optimize_parameters(1, data)
    t_first = time.perf_counter() - t0
    print(f"torch train baseline: first step {t_first:.1f}s",
          file=sys.stderr, flush=True)

    times = []
    n = args.steps if t_first < 200 else 1
    for i in range(n):
        t0 = time.perf_counter()
        trainer.optimize_parameters(2 + i, data)
        times.append(time.perf_counter() - t0)
        print(f"torch train baseline: step {i}: {times[-1]:.1f}s",
              file=sys.stderr, flush=True)
    dt = float(np.median(times))
    os.chdir(old_cwd)

    blob = {
        "steps_per_s": round(1.0 / dt, 6),
        "seconds_per_step": round(dt, 3),
        "images_per_s": round(args.batch / dt, 4),
        "batch": args.batch,
        "iters": len(times),
        "hardware": f"torch-{torch.__version__} CPU, "
                    f"{os.cpu_count()} core(s)",
        "protocol": "reference RateDistortionTrainer.optimize_parameters "
                    "(stage-1 recipe: MSE + HificRateLoss + LPIPS, aux "
                    "step), batch 8 crop 256, prefetched batch, median of "
                    "timed steps (rANS/compressai surface via "
                    "tests/ref_shims)",
    }
    with open(OUT_FILE, "w") as f:
        json.dump(blob, f, indent=2)
    print(json.dumps(blob), flush=True)


if __name__ == "__main__":
    main()
