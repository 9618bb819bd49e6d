"""One-shot serving-daemon smoke + measurement: spin the HTTP server
in-process, fire concurrent mixed-quality requests with real images, and
print ONE JSON line with latencies and the micro-batch histogram.

Usage (CPU smoke uses the tiny model):
    python scripts/serve_smoke.py config/crdr_throughput.yaml \
        --model_path checkpoint/real_stage2/model/comp_model_iter5K.ckpt \
        --img_dir /root/reference/demo_images --clients 8

Exercises the full serving stack (HTTP parse -> PNG decode -> micro-batch
coalescing -> batched device dispatch -> container/PNG responses) the way
a load balancer would drive it.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--img_dir", default="/root/reference/demo_images")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3,
                    help="request waves per client")
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=25.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + synthetic 128px images (CPU smoke)")
    args = ap.parse_args(argv)

    # honor JAX_PLATFORMS over the axon sitecustomize override (the
    # conftest/bench trick) so CPU smokes really run on CPU
    want = os.environ.get("JAX_PLATFORMS")
    if want and want != "axon":
        import jax

        jax.config.update("jax_platforms", want)

    from PIL import Image

    from crdr_tpu.serving.http_server import make_server

    if args.tiny:
        from __graft_entry__ import _flagship_model

        model = _flagship_model(tiny=True)
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
                for _ in range(3)]
    else:
        from scripts.serve import build_model, parse_args as serve_args

        model = build_model(serve_args([args.config] + (
            ["--model_path", args.model_path] if args.model_path else [])))
        paths = sorted(glob(os.path.join(args.img_dir, "*.png")))
        assert paths, f"no images in {args.img_dir}"
        imgs = [np.asarray(Image.open(p).convert("RGB"), np.uint8)
                for p in paths]
    if args.tiny:
        model.codec_setup()  # build_model already ran it in the real path

    srv = make_server(model, port=0, max_batch=args.max_batch,
                      max_wait_s=args.max_wait_ms / 1e3, default_beta=0.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def _png(a):
        buf = io.BytesIO()
        Image.fromarray(a, "RGB").save(buf, format="PNG")
        return buf.getvalue()

    bodies = [_png(a) for a in imgs]

    def _post(url, body):
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.read()

    # warmup wave (compile)
    _post(base + "/decompress", _post(base + "/compress?q=0.0", bodies[0]))

    lat_c, lat_d = [], []
    errors = []
    lock = threading.Lock()

    def client(i):
        body = bodies[i % len(bodies)]
        q = float(i % 3)
        try:
            for _ in range(args.rounds):
                t0 = time.perf_counter()
                blob = _post(base + f"/compress?q={q}", body)
                t1 = time.perf_counter()
                png = _post(base + "/decompress?beta=0.0", blob)
                t2 = time.perf_counter()
                assert png[:4] == b"\x89PNG", "response is not a PNG"
                with lock:
                    lat_c.append(t1 - t0)
                    lat_d.append(t2 - t1)
        except Exception as e:  # propagate to main: a failed request must
            with lock:          # fail the smoke, not skew its numbers
                errors.append(f"client {i}: {type(e).__name__}: {e}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    srv.shutdown()
    if errors:
        print(json.dumps({"error": errors[:5],
                          "failed_clients": len(errors)}))
        sys.exit(1)

    st = srv.batcher.stats()
    n_req = len(lat_c) + len(lat_d)
    print(json.dumps({
        "metric": "serving daemon requests/s (mixed q, concurrent clients)",
        "value": round(n_req / wall, 3),
        "unit": "req/s",
        "clients": args.clients,
        "compress_p50_ms": round(float(np.median(lat_c)) * 1e3, 1),
        "decompress_p50_ms": round(float(np.median(lat_d)) * 1e3, 1),
        "batch_hist": st["batch_hist"],
        "mean_batch": round(st["batched_requests"] / max(st["batches"], 1),
                            2),
    }))


if __name__ == "__main__":
    main()
