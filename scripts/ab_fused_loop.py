"""Paired A/B of the fused whole-loop Charm programs on the live backend.

Round-4 built `uniform_decode/encode` whole-loop fusions (ops/charm_uniform.
fused_decode_loop / uniform_encode_loop) that collapse the ~2S+3 per-slice
dispatch chain into ONE lax.scan program and stream the packed SliceTransform
weights once instead of once per dispatch (profile_r4.md measured 18 x 7.2 GB
of re-streamed weights per roundtrip).  They were left opt-in pending a
TPU A/B (VERDICT r4 item 2).  This script runs that A/B lean: device wire
only, median-protocol serial + pipelined legs and batch-1 latency, for

  base        — per-step replay chain (round-4 promoted default)
  fused_dec   — CRDR_FUSED_LOOP=1       (decode loop fused)
  fused_both  — + CRDR_FUSED_ENC_LOOP=1 (encode loop fused too)

and asserts the bitstreams of every config are byte-identical before timing
(the fusions are only dispatched when the Pallas SliceTransform kernel
carries the conv math, which makes agreement structural — see
codec_hostwire._use_fused_encode_loop).  Output: one JSON line per config +
a `winner` line, appended to --out (default /tmp/ab_fused_loop.json).

    python scripts/ab_fused_loop.py [--trials 5] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench.py: reuse its trial/probe helpers

CONFIGS = [
    ("base", {"CRDR_FUSED_LOOP": "0", "CRDR_FUSED_ENC_LOOP": "0"}),
    ("fused_dec", {"CRDR_FUSED_LOOP": "1", "CRDR_FUSED_ENC_LOOP": "0"}),
    ("fused_both", {"CRDR_FUSED_LOOP": "1", "CRDR_FUSED_ENC_LOOP": "1"}),
]


def _set_env(env: dict) -> None:
    for k, v in env.items():
        os.environ[k] = v


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/ab_fused_loop.json")
    ap.add_argument("--config", default="crdr_throughput.yaml")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke of the A/B code path (not a measurement)")
    args = ap.parse_args(argv)

    H, W, batch = (128, 192, 2) if args.tiny else (512, 768, args.batch)
    trials = 2 if args.tiny else args.trials

    bench._honor_platform_env()
    bench._require_backend(600.0, "ab_fused_loop")
    link0 = bench._probe_relay_link()
    print(f"ab: link probe {link0}", file=sys.stderr, flush=True)

    from __graft_entry__ import _flagship_model

    model = _flagship_model(tiny=args.tiny, config_name=args.config)
    model.codec_setup()
    model.wire_format = "device"
    imgs = bench.load_bench_images(batch, H, W)
    npix = batch * H * W

    # --- byte-identity gate across configs (and warmup/compile) ---------
    streams = {}
    for name, env in CONFIGS:
        _set_env(env)
        t0 = time.perf_counter()
        encs, _ = bench.run_pipeline(model, imgs)
        print(f"ab: {name} warmup+compile {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        streams[name] = [[bytes(s) for s in e["string_list"]] for e in encs]
    for name, _ in CONFIGS[1:]:
        assert streams[name] == streams["base"], \
            f"bitstream mismatch base vs {name}"
    print("ab: bitstreams byte-identical across all configs",
          file=sys.stderr, flush=True)

    results = []
    for name, env in CONFIGS:
        _set_env(env)
        ser = bench._serial_trials(model, imgs, trials)
        pip = bench._pipelined_trials(model, imgs, max(2, trials - 2))
        lat = bench._latency_trials(model, imgs[:1], trials)[1:]
        ser_med, ser_iqr = bench._median_iqr(ser)
        pip_med, pip_iqr = bench._median_iqr(pip)
        row = {
            "config": name,
            "serial_mpix_s": round(npix / ser_med / 1e6, 4),
            "serial_iqr_s": round(ser_iqr, 4),
            "pipelined_mpix_s": round(npix / pip_med / 1e6, 4),
            "pipelined_iqr_s": round(pip_iqr, 4),
            "batch1_latency_ms": round(float(np.median(lat)) * 1e3, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    linkN = bench._probe_relay_link()
    best = max(results, key=lambda r: r["pipelined_mpix_s"])
    summary = {
        "winner": best["config"],
        "pipelined_mpix_s": best["pipelined_mpix_s"],
        "batch1_latency_ms": min(r["batch1_latency_ms"] for r in results),
        "link_start": link0, "link_end": linkN,
        "batch": batch, "trials": trials, "tiny": args.tiny,
    }
    print(json.dumps(summary), flush=True)
    with open(args.out, "a") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")
        f.write(json.dumps(summary) + "\n")
    # restore env so a crash here can't leak config into a later process
    for k in ("CRDR_FUSED_LOOP", "CRDR_FUSED_ENC_LOOP"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
