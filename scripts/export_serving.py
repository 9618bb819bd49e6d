"""Export an AOT serving package: the codec's compiled device programs as
jax.export (StableHLO) artifacts, per serving shape bucket.

    python scripts/export_serving.py config/crdr_throughput.yaml \
        --model_path ckpt.ckpt --out /path/pkg \
        --shapes 8x512x768,1x512x768 --platforms tpu,cpu

A serving process then loads the package (``scripts/serve.py
--aot_package /path/pkg``) and runs matching requests without tracing the
model's Python — cold start pays only checkpoint load + XLA binary load.
Shapes not in the package transparently fall back to live tracing.

Prints one JSON line summarizing the manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--out", required=True, help="package directory")
    ap.add_argument("--shapes", default="8x512x768,1x512x768",
                    help="comma list of BxHxW serving buckets to capture")
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="lowering targets (comma list)")
    ap.add_argument("-q", "--quality", type=float, default=0.0)
    ap.add_argument("-b", "--beta", type=float, default=0.0)
    ap.add_argument("--wire", choices=["compressai", "device"], default=None)
    args = ap.parse_args(argv)

    # honor JAX_PLATFORMS over the axon sitecustomize override (CPU exports)
    want = os.environ.get("JAX_PLATFORMS")
    if want and want != "axon":
        import jax

        jax.config.update("jax_platforms", want)

    from scripts.serve import build_model, parse_args as serve_args

    from crdr_tpu.runtime.aot import export_package, record_serving_roundtrip
    from crdr_tpu.utils.logger import get_root_logger

    logger = get_root_logger()
    model = build_model(serve_args(
        [args.config]
        + (["--model_path", args.model_path] if args.model_path else [])
        + (["--wire", args.wire] if args.wire else [])))

    for spec in args.shapes.split(","):
        b, h, w = (int(v) for v in spec.lower().split("x"))
        logger.info(f"recording serving roundtrip {b}x{h}x{w}...")
        record_serving_roundtrip(model, b, h, w, rate_ind=args.quality,
                                 beta=args.beta)

    platforms = tuple(p.strip() for p in args.platforms.split(","))
    manifest = export_package(model, args.out, platforms=platforms,
                              logger=logger)
    print(json.dumps({
        "package": args.out,
        "programs": len(manifest["entries"]),
        "skipped": len(manifest["skipped"]),
        "bytes": sum(e["bytes"] for e in manifest["entries"]),
        "platforms": manifest["platforms"],
    }))


if __name__ == "__main__":
    main()
