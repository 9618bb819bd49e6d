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
    rows = []
    for q in args.qualities:
        # encode once per quality (bpp independent of beta)
        encs = []
        for path in img_paths:
            img = imread(path)[None]
            enc = model.compress(img, rate_ind=q)
            bin_path = os.path.join(args.save_dir, "tmp.bin")
            save_byte_strings(bin_path, enc["string_list"])
            bits = os.path.getsize(bin_path) * 8
            encs.append((path, enc, bits / (img.shape[1] * img.shape[2])))
        for beta in args.betas:
            psnrs, msssims, bpps = [], [], []
            for path, enc, bpp in encs:
                fake, _, _ = model.decompress(enc["string_list"], beta=beta)
                real = imread(path)[None]
                psnrs.append(calc_psnr(real, fake))
                msssims.append(calc_ms_ssim(real, fake))
                bpps.append(bpp)
            rows.append({
                "quality": q, "beta": beta,
                "bpp": float(np.mean(bpps)),
                "psnr": float(np.mean(psnrs)),
                "ms_ssim": float(np.mean(msssims)),
            })
            logger.info(f"q={q} beta={beta}: bpp={rows[-1]['bpp']:.4f} "
                        f"psnr={rows[-1]['psnr']:.3f}")

    import pandas as pd

    out_csv = os.path.join(args.save_dir, "rd_curve.csv")
    pd.DataFrame(rows).to_csv(out_csv, index=False)
    logger.info(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
