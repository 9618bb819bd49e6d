"""Metrics CLI (API parity with reference scripts/calc_metrics.py).

Computes PSNR / MS-SSIM (always), and LPIPS / FID (HiFiC patch protocol) /
DISTS when feature weights are available; reads ``_avg_bitrate.json`` from the
fake dir and writes ``_metrics.json``.

    python scripts/calc_metrics.py --real_dir kodak --fake_dir out \
        --metrics psnr ms_ssim
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdr_tpu.utils.img_utils import calc_ms_ssim, calc_psnr, imread
from crdr_tpu.utils.logger import get_root_logger


def _list_images(d):
    out = []
    for e in ("*.png", "*.jpg", "*.jpeg"):
        out.extend(glob(os.path.join(d, e)))
    return sorted(out)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--real_dir", required=True)
    p.add_argument("--fake_dir", required=True)
    p.add_argument("--metrics", nargs="+",
                   default=["psnr", "ms_ssim", "lpips", "fid"])
    # reference compat (calc_metrics.py:43): accepted; cuda devices map to
    # the default JAX backend, 'cpu' forces the CPU backend
    p.add_argument("-d", "--device", type=str, default=None)
    args = p.parse_args(argv)
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    logger = get_root_logger()

    real_paths = _list_images(args.real_dir)
    fake_paths = _list_images(args.fake_dir)
    real_names = {os.path.splitext(os.path.basename(q))[0]: q
                  for q in real_paths}
    pairs = []
    for f in fake_paths:
        name = os.path.splitext(os.path.basename(f))[0]
        if name in real_names:
            pairs.append((real_names[name], f))
    assert pairs, "no matching real/fake image pairs"

    results = {}
    if "psnr" in args.metrics:
        vals = [calc_psnr(imread(r), imread(f)) for r, f in pairs]
        results["PSNR"] = float(np.mean(vals))
    if "ms_ssim" in args.metrics:
        vals = [calc_ms_ssim(imread(r), imread(f)) for r, f in pairs]
        results["MS-SSIM"] = float(np.mean(vals))
    # Perceptual metrics are only meaningful with imported pretrained
    # features (reference calc_metrics.py:171-318 downloads them; this image
    # cannot).  Each leg returns (value, status); a skipped/random-weight leg
    # records WHY in _metrics.json instead of a bare sentinel so golden
    # comparisons can never silently ingest garbage numbers.
    if "lpips" in args.metrics:
        _record(results, "LPIPS", *_lpips(pairs, logger))
    if "fid" in args.metrics:
        _record(results, "FID", *_fid(pairs, logger))
    if "dists" in args.metrics:
        _record(results, "DISTS", *_dists(pairs, logger))

    rate_json = os.path.join(args.fake_dir, "_avg_bitrate.json")
    if os.path.exists(rate_json):
        with open(rate_json) as f:
            results["bpp"] = json.load(f)["avg_bpp"]

    out_path = os.path.join(args.fake_dir, "_metrics.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    logger.info(json.dumps(results, indent=2))
    return results


def _record(results, name, value, status):
    """value=None -> metric omitted; status != 'pretrained' is recorded
    alongside the value so provenance is always explicit."""
    if value is not None:
        results[name] = value
    if status != "pretrained":
        results[f"{name}_weights"] = status


def _lpips(pairs, logger):
    if not os.environ.get("CRDR_LPIPS_WEIGHTS"):
        if os.environ.get("CRDR_ALLOW_RANDOM_LPIPS"):
            logger.warning("LPIPS computed with RANDOM weights — tagged in "
                           "_metrics.json; NOT comparable to reference")
            return _lpips_value(pairs), "random"
        logger.warning("LPIPS skipped: set CRDR_LPIPS_WEIGHTS to enable")
        return None, "skipped: no pretrained weights"
    return _lpips_value(pairs), "pretrained"


def _lpips_value(pairs):
    import jax.numpy as jnp

    from crdr_tpu.losses.perceptual_loss import LPIPSLoss

    loss = LPIPSLoss(loss_weight=1.0)
    vals = [float(loss(jnp.asarray(imread(r))[None],
                       jnp.asarray(imread(f))[None])) for r, f in pairs]
    return float(np.mean(vals))


def _dists(pairs, logger):
    if not os.environ.get("CRDR_DISTS_WEIGHTS"):
        logger.warning("DISTS skipped: set CRDR_DISTS_WEIGHTS to enable")
        return None, "skipped: no pretrained weights"
    import pickle

    import jax.numpy as jnp

    from crdr_tpu.metrics.dists import DISTS, load_dists_params

    with open(os.environ["CRDR_DISTS_WEIGHTS"], "rb") as f:
        variables = load_dists_params(pickle.load(f))
    mod = DISTS()
    vals = []
    for r, fk in pairs:
        # DISTS consumes [0,1] inputs (reference calc_metrics.py:195-216)
        a = (jnp.asarray(imread(r))[None] + 1) / 2
        b = (jnp.asarray(imread(fk))[None] + 1) / 2
        vals.append(float(mod.apply(variables, a, b)[0]))
    return float(np.mean(vals)), "pretrained"


def _fid(pairs, logger):
    if len(pairs) < 50:
        logger.error(f"num_img (={len(pairs)}) is too small to calc FID")
        return None, f"skipped: {len(pairs)} images < 50 (HiFiC protocol)"
    if not os.environ.get("CRDR_INCEPTION_WEIGHTS"):
        logger.warning("FID skipped: set CRDR_INCEPTION_WEIGHTS to enable")
        return None, "skipped: no pretrained weights"
    from crdr_tpu.metrics.fid import fid_from_image_lists
    from crdr_tpu.metrics.inception import make_inception_extractor
    from crdr_tpu.utils.img_utils import tensor_to_uint8

    extractor = make_inception_extractor(
        os.environ["CRDR_INCEPTION_WEIGHTS"])
    reals = (tensor_to_uint8(imread(r)) for r, _ in pairs)
    fakes = (tensor_to_uint8(imread(f)) for _, f in pairs)
    return fid_from_image_lists(reals, fakes, extractor), "pretrained"


if __name__ == "__main__":
    main()
