"""Codec serving daemon: HTTP front end + micro-batching TPU scheduler.

Usage:
    python scripts/serve.py config/crdr_throughput.yaml \
        --model_path checkpoint/.../comp_model_iter5K.ckpt \
        --port 8080 --max_batch 8 --max_wait_ms 10

Endpoints (see crdr_tpu/serving/http_server.py):
    POST /compress?q=1.0     PNG/JPEG in  -> .bin container out
    POST /decompress?beta=2.56  .bin in   -> PNG out
    GET  /healthz            model/devices/batcher stats

Concurrent requests with the same image size coalesce into one batched
device dispatch (mixed q/beta per batch rides the per-image conditioning
vectors), which is where TPU serving throughput comes from — see
DESIGN.md's batch-scaling measurements.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdr_tpu.utils.config import Config  # noqa: E402
from crdr_tpu.utils.logger import get_root_logger  # noqa: E402


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="model config yaml")
    ap.add_argument("--model_path", default=None, help="checkpoint to load")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max_batch", type=int, default=8,
                    help="micro-batch cap per device dispatch")
    ap.add_argument("--max_wait_ms", type=float, default=10.0,
                    help="coalesce window from the first queued request")
    ap.add_argument("-q", "--quality", type=float, default=None,
                    help="default rate_ind when the request omits ?q=")
    ap.add_argument("-b", "--beta", type=float, default=None,
                    help="default beta when the request omits ?beta=")
    ap.add_argument("--wire", choices=["compressai", "device"], default=None,
                    help="override the bitstream wire format")
    ap.add_argument("--aot_package", default=None,
                    help="AOT serving package (scripts/export_serving.py): "
                         "matching requests run the exported programs "
                         "without tracing")
    return ap.parse_args(argv)


def build_model(args):
    from crdr_tpu.models import build_comp_model
    from crdr_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.from_file(args.config)
    model = build_comp_model(cfg)
    logger = get_root_logger()
    if args.model_path:
        model.load_learned_weight(args.model_path)
    else:
        logger.warning("no --model_path: serving RANDOM weights (demo only)")
        model.init_params()
    model.codec_setup()
    if args.wire:
        model.wire_format = args.wire
    if getattr(args, "aot_package", None):
        from crdr_tpu.runtime.aot import load_package

        pkg = load_package(model, args.aot_package, logger=logger)
        logger.info(f"aot package: {len(pkg.manifest['entries'])} programs "
                    f"({args.aot_package})")
    return model


def main(argv=None):
    args = parse_args(argv)
    logger = get_root_logger()
    model = build_model(args)

    from crdr_tpu.serving.http_server import make_server

    srv = make_server(model, host=args.host, port=args.port,
                      max_batch=args.max_batch,
                      max_wait_s=args.max_wait_ms / 1e3,
                      default_q=args.quality, default_beta=args.beta)
    logger.info(
        f"serving on http://{args.host}:{srv.server_address[1]} "
        f"(wire={getattr(model, 'wire_format', 'host')}, "
        f"max_batch={args.max_batch}, window={args.max_wait_ms}ms)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
        srv.shutdown()


if __name__ == "__main__":
    main()
