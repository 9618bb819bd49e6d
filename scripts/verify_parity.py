"""One-command parity verification against the reference's golden numbers.

    python scripts/verify_parity.py --ckpt crdr.pth.tar --img_dir kodak/ \
        [--rd_csv /root/reference/rd_results/kodak.csv] [--demo_only]
    python scripts/verify_parity.py --synthetic        # harness self-test

Checks, in order (reference golden sources in parentheses):

1. **Weight import**: loads the released ``crdr.pth.tar`` through the strict
   torch importer (importers/torch_import.py).  Missing/garbled weights FAIL
   LOUDLY — there is no silent random-init fallback here.
2. **Latent round-trip**: for every image, ``decompress(compress(x))`` must
   reproduce the encoder-side quantized latents exactly
   (the allclose check the reference left commented out, compress.py:126-127).
3. **3-image Kodak demo**: avg real bpp at q=0.00/beta=3.84 must equal
   0.0641 +- 2e-4 (reference README.md:58).
4. **RD sweep diff**: the 17-quality sweep's (bpp, PSNR) per quality against
   ``rd_results/kodak.csv`` (rd_results/README.md protocol), with per-row
   tolerances; writes ``verify_parity_report.json``.

``--synthetic`` runs the same pipeline on a randomly initialized model with
relaxed assertions (structure only, no golden numbers) so the harness itself
stays continuously testable without the released checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DEMO_BPP = 0.0641  # reference README.md:58 (3-image demo, q=0, b=3.84)
DEMO_TOL = 2e-4
SWEEP_QUALITIES = [q * 0.25 for q in range(17)]  # 0.00 .. 4.00


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "config", "crdr.yaml"))
    p.add_argument("--ckpt", default=None,
                   help="released reference checkpoint (crdr.pth.tar) or a "
                        "framework .ckpt")
    p.add_argument("--img_dir", default=None,
                   help="Kodak images; first 3 (sorted) form the demo set")
    p.add_argument("--rd_csv", default=None,
                   help="golden RD csv (rd_results/kodak.csv) to diff against")
    p.add_argument("--beta", type=float, default=3.84)
    p.add_argument("--demo_only", action="store_true",
                   help="skip the 17-point sweep")
    p.add_argument("--synthetic", action="store_true",
                   help="self-test on random init + synthetic images "
                        "(no golden assertions)")
    p.add_argument("--out", default="verify_parity_report.json")
    return p.parse_args(argv)


def _fail(msg: str) -> None:
    print(f"PARITY FAIL: {msg}", file=sys.stderr)
    sys.exit(1)


def _load_model(args):
    from crdr_tpu.models import build_comp_model
    from crdr_tpu.runtime.cache import enable_compilation_cache
    from crdr_tpu.utils.config import Config

    enable_compilation_cache()
    cfg = Config.from_file(args.config)
    cfg["is_train"] = False
    model = build_comp_model(cfg)
    if args.synthetic:
        model.init_params()
    else:
        if not args.ckpt:
            _fail("--ckpt is required (pass --synthetic for a harness "
                  "self-test without weights)")
        if not os.path.exists(args.ckpt):
            _fail(f"checkpoint not found: {args.ckpt}")
        model.load_learned_weight(args.ckpt)
    model.codec_setup()
    return model


def _load_images(args):
    if args.synthetic and not args.img_dir:
        from crdr_tpu.utils.img_utils import uint8_to_tensor

        rng = np.random.default_rng(0)
        return [(f"synthetic_{i}", uint8_to_tensor(
                 rng.integers(0, 256, (256, 384, 3), np.uint8)))
                for i in range(3)]
    if not args.img_dir or not os.path.isdir(args.img_dir):
        _fail(f"--img_dir missing or not a directory: {args.img_dir}")
    from crdr_tpu.utils.img_utils import imread

    paths = sorted(sum((glob(os.path.join(args.img_dir, e))
                        for e in ("*.png", "*.jpg", "*.jpeg")), []))
    if not paths:
        _fail(f"no images in {args.img_dir}")
    return [(os.path.splitext(os.path.basename(p))[0], imread(p))
            for p in paths]


def _roundtrip(model, img, q, beta):
    """compress -> decompress; returns (real_bpp, psnr, latents_equal)."""
    from crdr_tpu.utils.img_utils import calc_psnr

    x = img[None] if img.ndim == 3 else img
    H, W = x.shape[1:3]
    kw = {"rate_ind": q} if model.use_rate else {}
    enc = model.compress(x, **kw)
    # on-disk size: uint32-LE length prefix per string (codec_utils layout)
    bits = sum(len(s) + 4 for s in enc["string_list"]) * 8
    dec_kw = {"beta": beta} if model.use_beta else {}
    fake, z_hat, y_hat = model.decompress(enc["string_list"], **dec_kw)
    y_ok = np.allclose(np.asarray(enc["y_hat"]), np.asarray(y_hat),
                       atol=1e-5)
    z_ok = np.allclose(np.asarray(enc["z_hat"]), np.asarray(z_hat),
                       atol=1e-5)
    psnr = float(calc_psnr(x, fake))
    return bits / (H * W), psnr, (y_ok and z_ok)


def main(argv=None):
    args = parse_args(argv)
    model = _load_model(args)
    images = _load_images(args)
    report = {"synthetic": bool(args.synthetic), "checks": {}}

    # ---- latent round-trip + demo bpp (first 3 images, q=0) ----
    demo_bpps = []
    for name, img in images[:3]:
        bpp, psnr, latents_equal = _roundtrip(model, img, 0.0, args.beta)
        print(f"demo {name}: bpp={bpp:.4f} psnr={psnr:.2f} "
              f"latents_equal={latents_equal}")
        if not latents_equal:
            _fail(f"{name}: decode-side latents differ from encode side")
        demo_bpps.append(bpp)
    avg = float(np.mean(demo_bpps))
    report["checks"]["latent_roundtrip"] = "ok"
    report["checks"]["demo_avg_bpp"] = avg
    if args.synthetic:
        print(f"demo avg bpp (random init, no golden): {avg:.4f}")
    else:
        print(f"demo avg bpp: {avg:.4f} (golden {GOLDEN_DEMO_BPP})")
        if abs(avg - GOLDEN_DEMO_BPP) > DEMO_TOL:
            _fail(f"demo avg bpp {avg:.4f} != {GOLDEN_DEMO_BPP} "
                  f"(tol {DEMO_TOL})")

    # ---- 17-point sweep (batched: one device dispatch set per quality
    # for each same-size image group) ----
    if not args.demo_only:
        golden = _load_golden(args.rd_csv, args.beta) if args.rd_csv else None
        sweep = []
        for q in SWEEP_QUALITIES:
            bpps, psnrs = _sweep_point(model, images, q, args.beta)
            row = {"quality": q, "bpp": float(np.mean(bpps)),
                   "psnr": float(np.mean(psnrs))}
            sweep.append(row)
            msg = f"sweep q={q:.2f}: bpp={row['bpp']:.6f} psnr={row['psnr']:.4f}"
            if golden is not None and q in golden:
                g = golden[q]
                row["golden_bpp"], row["golden_psnr"] = g
                msg += f"  (golden bpp={g[0]:.6f} psnr={g[1]:.4f})"
                if not args.synthetic:
                    if abs(row["bpp"] - g[0]) > max(0.002, 0.01 * g[0]):
                        _fail(f"q={q}: bpp {row['bpp']:.6f} vs golden "
                              f"{g[0]:.6f}")
                    if abs(row["psnr"] - g[1]) > 0.1:
                        _fail(f"q={q}: psnr {row['psnr']:.4f} vs golden "
                              f"{g[1]:.4f}")
            print(msg)
        report["sweep"] = sweep
        # rate must be monotone in quality regardless of weights
        bpp_seq = [r["bpp"] for r in sweep]
        if not all(b2 >= b1 * 0.98 for b1, b2 in zip(bpp_seq, bpp_seq[1:])):
            _fail(f"bpp not monotone over quality: {bpp_seq}")
        report["checks"]["bpp_monotone"] = "ok"

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"PARITY OK — report written to {args.out}")


def _sweep_point(model, images, q, beta):
    """(bpps, psnrs) for one quality, batching same-size images through
    compress_batch/decompress_batch (streams identical to per-image)."""
    from crdr_tpu.utils.img_utils import calc_psnr

    groups = {}
    for name, img in images:
        groups.setdefault(img.shape, []).append(img)
    bpps, psnrs = [], []
    for imgs in groups.values():
        batch = np.stack(imgs)
        H, W = batch.shape[1:3]
        kw = {"rate_ind": q} if model.use_rate else {}
        encs = model.compress_batch(batch, **kw)
        dec_kw = {"beta": beta} if model.use_beta else {}
        fakes, _, _ = model.decompress_batch(
            [e["string_list"] for e in encs], **dec_kw)
        fakes = np.asarray(fakes)
        for j, enc in enumerate(encs):
            bits = sum(len(s) + 4 for s in enc["string_list"]) * 8
            bpps.append(bits / (H * W))
            psnrs.append(float(calc_psnr(batch[j:j + 1], fakes[j:j + 1])))
    return bpps, psnrs


def _load_golden(csv_path, beta):
    """rd_results/kodak.csv rows at the requested beta -> {quality: (bpp, psnr)}."""
    if not os.path.exists(csv_path):
        _fail(f"--rd_csv not found: {csv_path}")
    import csv as _csv

    out = {}
    with open(csv_path) as f:
        for row in _csv.DictReader(f):
            if abs(float(row.get("beta", beta)) - beta) < 1e-6:
                out[float(row["quality"])] = (float(row["bpp"]),
                                              float(row["PSNR"]))
    if not out:
        _fail(f"no rows at beta={beta} in {csv_path}")
    return out


if __name__ == "__main__":
    main()
