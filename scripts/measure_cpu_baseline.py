"""Measure the CPU-reference throughput baseline for bench.py.

Runs the same end-to-end pipeline as bench.py (flagship model, 768x512,
compress + decompress incl. host rANS) on the CPU backend and records
Mpixel/s into BASELINE_CPU.json.  The torch/CUDA reference cannot run in this
image (compressai not installed) and publishes no speed numbers, so this
CPU-JAX figure is the measured stand-in baseline (SURVEY.md section 6).

    JAX_PLATFORMS=cpu python scripts/measure_cpu_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from bench import BASELINE_FILE, run_pipeline  # noqa: E402
from __graft_entry__ import _flagship_model  # noqa: E402


def main():
    H, W = 512, 768
    model = _flagship_model(tiny=False)
    model.codec_setup()
    img = np.random.default_rng(0).uniform(-1, 1, (1, H, W, 3)) \
        .astype(np.float32)
    run_pipeline(model, img)  # warmup/compile
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        run_pipeline(model, img)
    dt = (time.perf_counter() - t0) / iters
    mpix_s = (H * W) / dt / 1e6
    with open(BASELINE_FILE, "w") as f:
        json.dump({
            "mpixel_s": mpix_s,
            "hardware": "single-core CPU (JAX cpu backend)",
            "protocol": "768x512 flagship compress+decompress, "
                        "matmul precision highest",
        }, f, indent=2)
    print(f"CPU baseline: {mpix_s:.4f} Mpixel/s -> {BASELINE_FILE}")


if __name__ == "__main__":
    main()
