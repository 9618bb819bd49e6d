"""Curate a local photographic-statistics image set from packages already in
this image (no network).

The reference trains on ~1.1M OpenImages photos (docs/training.md); this
environment ships exactly 3 photographic images (the reference demo set), so
endurance training so far `repeat`-oversampled those 3.  This script scans
the installed packages' texture/photo assets (labmaze wall/floor textures,
dm_control / gymnasium-robotics material textures, matplotlib's
grace_hopper, pygame examples, ...), keeps images with natural-image
statistics, and splits them into train/eval sets under ``data_local/``
(gitignored) with a provenance manifest.

Filters: >= 256px on both sides, RGB-convertible, neighbour-gradient
statistics in the photographic band (0.3 <= mean|dx| <= 25 on [0,255]),
global std >= 15 (not flat), and a flat-area screen (frac(|dx|<0.5) <= 0.85)
that drops synthetic plots/diagrams with large constant regions.  Exact
duplicates (lib/lib64 mirrors) collapse by content hash.

    python scripts/build_local_dataset.py [--out data_local] [--eval_n 16]
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os

import numpy as np
from PIL import Image

ROOTS = (
    "/opt/venv/lib/python3.12/site-packages",
    "/usr/share",
)
EXTS = ("png", "jpg", "jpeg")


def photographic(a: np.ndarray):
    """(ok, stats) for an RGB float array in [0, 255].

    Band checks keep natural-statistics content (textures, photos, smooth
    skies) and drop noise and synthetic plots/diagrams: the latter are
    dominated by ONE exact background color, which photographs never are."""
    dx = np.abs(np.diff(a, axis=1))
    mean_dx = float(dx.mean())
    std = float(a.std())
    flat = a[::4, ::4].astype(np.uint32)
    packed = (flat[..., 0] << 16) | (flat[..., 1] << 8) | flat[..., 2]
    _, counts = np.unique(packed, return_counts=True)
    mode_frac = float(counts.max() / packed.size)
    ok = (0.3 <= mean_dx <= 25.0) and std >= 15.0 and mode_frac <= 0.25
    return ok, {"mean_dx": round(mean_dx, 2), "std": round(std, 1),
                "mode_frac": round(mode_frac, 3)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data_local")
    ap.add_argument("--eval_n", type=int, default=16)
    ap.add_argument("--min_px", type=int, default=256)
    args = ap.parse_args(argv)

    cands = []
    for root in ROOTS:
        for ext in EXTS:
            cands += glob.glob(f"{root}/**/*.{ext}", recursive=True)
    cands.sort()

    kept, seen = [], set()
    for p in cands:
        try:
            if os.path.getsize(p) < 40_000:
                continue
            im = Image.open(p)
            if im.size[0] < args.min_px or im.size[1] < args.min_px:
                continue
            a = np.asarray(im.convert("RGB"), np.float32)
        except Exception:
            continue
        digest = hashlib.sha256(a.tobytes()).hexdigest()
        if digest in seen:
            continue
        seen.add(digest)
        ok, stats = photographic(a)
        if ok:
            kept.append((digest, p, im.size, stats))

    os.makedirs(os.path.join(args.out, "train"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "eval"), exist_ok=True)
    # deterministic split: order by content hash, every k-th goes to eval
    kept.sort(key=lambda t: t[0])
    k = max(1, len(kept) // max(1, args.eval_n))
    manifest = []
    for i, (digest, p, size, stats) in enumerate(kept):
        split = "eval" if (i % k == 0 and
                           sum(m["split"] == "eval" for m in manifest)
                           < args.eval_n) else "train"
        name = f"{digest[:12]}.png"
        dst = os.path.join(args.out, split, name)
        if not os.path.exists(dst):
            Image.open(p).convert("RGB").save(dst)
        manifest.append({"file": f"{split}/{name}", "source": p,
                         "size": list(size), "split": split, **stats})
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    n_eval = sum(m["split"] == "eval" for m in manifest)
    print(f"kept {len(kept)} images -> {len(kept) - n_eval} train / "
          f"{n_eval} eval under {args.out}/ (manifest.json has provenance)")


if __name__ == "__main__":
    main()
