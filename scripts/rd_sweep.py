"""RD-curve sweep: compress+decompress a directory at the paper protocol
(17 quality values x 2 betas — reference rd_results/README.md) and write a CSV
matching the rd_results/*.csv schema (quality, beta, bpp, PSNR, ...).

    python scripts/rd_sweep.py config/crdr.yaml --model_path ckpt \
        --img_dir kodak --save_dir sweep_out \
        --qualities 0 0.25 ... --betas 0 3.84
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdr_tpu.models import build_comp_model
from crdr_tpu.utils.codec_utils import save_byte_strings
from crdr_tpu.utils.config import Config
from crdr_tpu.utils.img_utils import calc_ms_ssim, calc_psnr, imread
from crdr_tpu.utils.logger import get_root_logger


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config_path", type=str)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--img_dir", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--qualities", type=float, nargs="+",
                   default=[q * 0.25 for q in range(17)])
    p.add_argument("--betas", type=float, nargs="+", default=[0.0, 3.84])
    p.add_argument("--max_images", type=int, default=0)
    p.add_argument("--no_rate_batch", action="store_true",
                   help="disable the mixed-rate batched sweep (one "
                        "(image, quality) pair per dispatch set instead)")
    args = p.parse_args(argv)
    logger = get_root_logger()
    from crdr_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.from_file(args.config_path)
    cfg["is_train"] = False
    model = build_comp_model(cfg)
    if args.model_path:
        model.load_learned_weight(args.model_path)
    else:
        logger.warning("random init (no --model_path)")
        model.init_params()
    model.codec_setup()

    img_paths = sorted(sum((glob(os.path.join(args.img_dir, e))
                            for e in ("*.png", "*.jpg")), []))
    if args.max_images:
        img_paths = img_paths[: args.max_images]
    assert img_paths

    os.makedirs(args.save_dir, exist_ok=True)
    # Mixed-rate batching (default): ONE compress_batch per image covers
    # every quality (a per-image [Q] rate vector conditions InterpCA), and
    # one decompress_batch per (image, beta) covers every quality's stream
    # — the Charm decode's serial round trips amortize across the whole
    # sweep axis instead of repeating 17x.  --no_rate_batch restores the
    # one-(image,quality)-at-a-time protocol (identical math, [1]-shaped
    # programs).
    qs = [float(q) for q in args.qualities]
    acc = {(q, float(b)): {"psnr": [], "ms_ssim": [], "bpp": []}
           for q in qs for b in args.betas}
    bin_path = os.path.join(args.save_dir, "tmp.bin")
    for path in img_paths:
        real = imread(path)[None]
        if args.no_rate_batch:
            encs = [model.compress(real, rate_ind=q) for q in qs]
        else:
            encs = model.compress_batch(
                np.repeat(real, len(qs), axis=0),
                rate_ind=np.asarray(qs, np.float32))
        bpps = []
        for enc in encs:
            save_byte_strings(bin_path, enc["string_list"])
            bits = os.path.getsize(bin_path) * 8
            bpps.append(bits / (real.shape[1] * real.shape[2]))
        for beta in args.betas:
            if args.no_rate_batch:
                fakes = np.concatenate([
                    model.decompress(e["string_list"], beta=beta)[0]
                    for e in encs])
            else:
                fakes, _, _ = model.decompress_batch(
                    [e["string_list"] for e in encs], beta=beta)
            for qi, q in enumerate(qs):
                a = acc[(q, float(beta))]
                a["psnr"].append(calc_psnr(real, fakes[qi:qi + 1]))
                a["ms_ssim"].append(calc_ms_ssim(real, fakes[qi:qi + 1]))
                a["bpp"].append(bpps[qi])
        logger.info(f"{os.path.basename(path)}: swept {len(qs)} qualities "
                    f"x {len(args.betas)} betas")

    rows = []
    for q in qs:
        for beta in args.betas:
            a = acc[(q, float(beta))]
            rows.append({
                "quality": q, "beta": beta,
                "bpp": float(np.mean(a["bpp"])),
                "psnr": float(np.mean(a["psnr"])),
                "ms_ssim": float(np.mean(a["ms_ssim"])),
            })
            logger.info(f"q={q} beta={beta}: bpp={rows[-1]['bpp']:.4f} "
                        f"psnr={rows[-1]['psnr']:.3f}")

    import pandas as pd

    out_csv = os.path.join(args.save_dir, "rd_curve.csv")
    pd.DataFrame(rows).to_csv(out_csv, index=False)
    logger.info(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
