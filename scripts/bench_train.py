"""Training-step throughput benchmark (stage-1 or stage-3 recipe).

    python scripts/bench_train.py [--stage 3] [--batch 8] [--size 256] [--mixed]

Reports steps/s and images/s for the full jitted optimization step on the
current default device.  Uses synthetic data; LPIPS runs with random features
unless CRDR_LPIPS_WEIGHTS is set (same FLOPs either way).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=1, choices=[1, 3])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--mixed", action="store_true", help="bf16 transforms")
    args = p.parse_args(argv)

    from crdr_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    from crdr_tpu.trainer import build_trainer
    from crdr_tpu.utils.config import Config, _fill_paths

    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "config",
        f"crdr_stage_{args.stage}.yaml")
    cfg = Config.from_file(cfg_path)
    cfg.update({
        "exp": "bench_train", "ckpt_root": "/tmp/bench_train_ckpt",
        "start_iter": 0, "is_train": True, "mixed_precision": args.mixed,
    })
    cfg["dataset"]["batch_size"] = args.batch
    cfg["dataset"]["train_dataset"] = {
        "name": "", "type": "SyntheticImageDataset", "num_images": 16,
        "image_size": args.size}
    cfg["dataset"]["eval_dataset"] = {
        "name": "", "type": "SyntheticImageDataset", "num_images": 2,
        "image_size": args.size, "base_size": args.size}
    cfg["pretrained_weight_path"] = None
    _fill_paths(cfg)

    trainer = build_trainer(cfg)
    data = next(iter(trainer.train_loader))
    print("compiling train step...", flush=True)
    trainer.optimize_parameters(1, data)
    import jax

    t0 = time.time()
    out = None
    for i in range(args.iters):
        out = trainer.optimize_parameters(i + 2, data)
    if out is not None:  # close the async-dispatch window before stopping
        jax.block_until_ready(jax.tree.leaves(out))
    dt = (time.time() - t0) / args.iters
    print(f"stage {args.stage} batch {args.batch} size {args.size} "
          f"mixed={args.mixed}: {dt:.3f}s/step = {1 / dt:.2f} steps/s "
          f"({args.batch / dt:.1f} img/s)", flush=True)

    # committed measurement consumed by bench.py's vs_torch_cpu_train
    # (labeled with provenance there; see BASELINE_TORCH_TRAIN.json for the
    # reference-source denominator)
    import datetime
    import json

    blob = {
        "steps_per_s": round(1.0 / dt, 4),
        "seconds_per_step": round(dt, 4),
        "images_per_s": round(args.batch / dt, 2),
        "stage": args.stage, "batch": args.batch, "size": args.size,
        "mixed_precision": bool(args.mixed), "iters": args.iters,
        "hardware": str(jax.devices()[0].device_kind),
        "date": datetime.date.today().isoformat(),
    }
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts",
        "train_bench_latest.json")
    if os.environ.get("CRDR_TRAIN_BENCH_WRITE", "1") == "1" \
            and jax.devices()[0].platform != "cpu":
        with open(art, "w") as f:
            json.dump(blob, f, indent=2)
        print(f"wrote {art}", flush=True)
    print(json.dumps(blob), flush=True)


if __name__ == "__main__":
    main()
