"""Codec CLI (API parity with reference scripts/compress.py).

Per image: model.compress -> save length-prefixed .bin -> measure real size ->
optionally reload + model.decompress -> write PNG.  Emits ``_bitrates.csv``
(per-image header/z/y bits, real vs predicted bpp) and ``_avg_bitrate.json``
({'avg_bpp': mean}), matching compress.py:103-134 of the reference.

Usage:
    python scripts/compress.py config/crdr.yaml --model_path ckpt \
        --img_dir demo_images --save_dir out -q 0.0 -b 3.84 --decompress
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdr_tpu.models import build_comp_model
from crdr_tpu.utils.codec_utils import load_byte_strings, save_byte_strings
from crdr_tpu.utils.config import Config
from crdr_tpu.utils.img_utils import imread, imwrite
from crdr_tpu.utils.logger import get_root_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="compress/decompress images")
    # the reference CLI passes the config as --config_path (compress.py:37);
    # we prefer it positional — accept both spellings
    p.add_argument("config_path", type=str, nargs="?", default=None)
    p.add_argument("--config_path", dest="config_path_flag", type=str,
                   default=None, help="alias of the positional config path")
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint (.ckpt ours / .pth.tar reference)")
    p.add_argument("--img_dir", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("-q", "--quality", type=float, default=-1.0,
                   help="rate index in [0, rate_level-1]; <0 disables")
    p.add_argument("-b", "--beta", type=float, default=-1.0,
                   help="realism weight; <0 disables")
    p.add_argument("--decompress", action="store_true")
    p.add_argument("-d", "--device", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shape_bucket", type=int, default=None,
                   help="pad images to multiples of this (>=64, multiple of "
                        "64) to bound compile count on mixed-size datasets")
    p.add_argument("--batch", type=int, default=1,
                   help="serving batch size: groups same-size images through "
                        "compress_batch/decompress_batch (one device dispatch "
                        "set per batch; streams identical to batch 1)")
    p.add_argument("--wire", type=str, default=None,
                   choices=["compressai", "device"],
                   help="bitstream wire format: compressai (reference-"
                        "compatible, default) or device (lane-interleaved, "
                        "entropy-decoded on device — 1 round trip/decode)")
    p.add_argument("--serving_devices", type=int, default=None,
                   help="shard each serving batch over this many devices "
                        "(batch-axis GSPMD mesh; streams identical to one "
                        "device). Pair with --batch >= this value")
    args = p.parse_args(argv)
    args.config_path = args.config_path or args.config_path_flag
    if not args.config_path:
        p.error("a config path is required (positional or --config_path)")
    return args


def _finish_chunk(fut, args, logger, rows, bpps, decode_fn):
    """Drain one pipelined chunk: join its encode future, run the decode
    stage on the main thread, record + log its rows."""
    names, chunk_rows = fut.result()
    if args.decompress:
        decode_fn(names, chunk_rows)
    for row in chunk_rows:
        rows.append(row)
        bpps.append(row["real_bpp"])
        logger.info(
            f"{row['name']}: bpp {row['real_bpp']:.4f} "
            f"(pred {row['pred_bpp']:.4f}) enc {row['enc_time']:.2f}s"
            + (f" dec {row['dec_time']:.2f}s" if args.decompress else ""))


def main(argv=None):
    args = parse_args(argv)
    if args.device:
        os.environ["JAX_PLATFORMS"] = args.device
        import jax

        jax.config.update("jax_platforms", args.device)
    logger = get_root_logger()
    from crdr_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.from_file(args.config_path)
    cfg["is_train"] = False
    if args.shape_bucket:
        cfg["shape_bucket"] = args.shape_bucket
    if args.serving_devices:
        cfg["serving_devices"] = args.serving_devices
    if args.wire:
        cfg["wire_format"] = args.wire

    model = build_comp_model(cfg)
    if args.model_path:
        model.load_learned_weight(args.model_path)
    else:
        logger.warning("no --model_path given: using random initialization")
        model.init_params()
    model.codec_setup()

    os.makedirs(args.save_dir, exist_ok=True)
    img_paths = sorted(
        sum((glob(os.path.join(args.img_dir, e))
             for e in ("*.png", "*.jpg", "*.jpeg")), []))
    assert img_paths, f"no images in {args.img_dir}"

    # group consecutive same-size images into serving batches (one device
    # dispatch set per batch; per-image streams identical to batch 1)
    def _chunks():
        cur, cur_hw = [], None
        for path in img_paths:
            name = os.path.splitext(os.path.basename(path))[0]
            img = imread(path)
            hw = img.shape[:2]
            if cur and (hw != cur_hw or len(cur) >= max(args.batch, 1)):
                yield cur
                cur = []
            cur_hw = hw
            cur.append((name, img))
        if cur:
            yield cur

    def _encode_chunk(chunk):
        """Encode stage: imread batch -> compress_batch -> .bin files + rows.
        Runs one chunk ahead of the decode stage (see pipeline below)."""
        names = [n for n, _ in chunk]
        imgs = np.stack([im for _, im in chunk])
        H, W = imgs.shape[1:3]
        t0 = time.perf_counter()
        kwargs = {}
        if model.use_rate:
            q = args.quality if args.quality >= 0 else 0.0
            kwargs["rate_ind"] = q
        encs = model.compress_batch(imgs, **kwargs)
        enc_time = (time.perf_counter() - t0) / len(chunk)

        chunk_rows = []
        for name, enc in zip(names, encs):
            bin_path = os.path.join(args.save_dir, f"{name}.bin")
            save_byte_strings(bin_path, enc["string_list"])
            real_bits = os.path.getsize(bin_path) * 8
            real_bpp = real_bits / (H * W)
            chunk_rows.append({
                "name": name,
                "header_bit": len(enc["string_list"][0]) * 8,
                "z_bit": len(enc["string_list"][1]) * 8,
                "y_bit": len(enc["string_list"][2]) * 8,
                "real_bit": real_bits,
                "real_bpp": real_bpp,
                "pred_y_bpp": enc["pred_y_bpp"],
                "pred_z_bpp": enc["pred_z_bpp"],
                "pred_bpp": enc["pred_y_bpp"] + enc["pred_z_bpp"],
                "enc_time": enc_time,
            })
        return names, chunk_rows

    def _decode_chunk(names, chunk_rows):
        """Decode stage (main thread): reload .bin -> decompress_batch -> PNG."""
        strings = [load_byte_strings(
            os.path.join(args.save_dir, f"{n}.bin")) for n in names]
        t0 = time.perf_counter()
        dec_kwargs = {}
        if model.use_beta:
            dec_kwargs["beta"] = args.beta if args.beta >= 0 else 0.0
        fakes, z_hat, y_hat = model.decompress_batch(strings, **dec_kwargs)
        dec_time = (time.perf_counter() - t0) / len(names)
        fakes = np.asarray(fakes)
        for j, (name, row) in enumerate(zip(names, chunk_rows)):
            row["dec_time"] = dec_time
            imwrite(os.path.join(args.save_dir, f"{name}.png"),
                    fakes[j:j + 1])

    # Two-stage serving pipeline: the encode of chunk k+1 (worker thread)
    # overlaps the decode of chunk k (main thread).  The Charm decode loop is
    # RTT-floor-bound behind a remote-attached chip, so the next chunk's
    # encode compute and host rANS hide under it almost entirely; streams and
    # outputs are byte-identical to the sequential order.
    from concurrent.futures import ThreadPoolExecutor

    rows = []
    bpps = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        pending = None
        for chunk in _chunks():
            fut = ex.submit(_encode_chunk, chunk)
            if pending is not None:
                _finish_chunk(pending, args, logger, rows, bpps,
                              _decode_chunk)
            pending = fut
        if pending is not None:
            _finish_chunk(pending, args, logger, rows, bpps, _decode_chunk)

    import pandas as pd

    pd.DataFrame(rows).to_csv(os.path.join(args.save_dir, "_bitrates.csv"),
                              index=False)
    avg = float(np.mean(bpps))
    with open(os.path.join(args.save_dir, "_avg_bitrate.json"), "w") as f:
        json.dump({"avg_bpp": avg}, f)
    logger.info(f"avg_bpp: {avg:.4f}")
    return avg


if __name__ == "__main__":
    main()
