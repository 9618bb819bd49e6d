"""Per-program cost profile of one serving roundtrip on the current backend.

Drives one full compress+decompress batch per wire format through the
flagship model with an ExeDispatch recorder armed (runtime/aot.py), then
prints a table per program: dispatch count, XLA cost_analysis FLOPs and
bytes accessed, and the roofline-optimal time on the chip (max of MXU time
at peak FLOP/s and HBM time at peak bandwidth) — against the measured wall
stage timings.  This is the decode/encode "where does the time go" artifact
(VERDICT r3 item 4); committed summaries live in docs/artifacts/.

    python scripts/profile_roundtrip.py [--wire device|compressai] \
        [--batch 8] [--config crdr_throughput.yaml]

The reference has no profiling beyond wall timers (SURVEY.md section 5);
this is the TPU-native equivalent of a torch-profiler table.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_FLOPS = 197e12   # TPU v5 lite bf16 MXU peak (assumption, echoed below)
PEAK_HBM = 819e9      # v5e HBM bandwidth bytes/s


class _CostRecorder:
    def __init__(self):
        self.counts = {}
        self.exemplars = {}
        self.order = []

    def record(self, name, jit_fn, args):
        from crdr_tpu.runtime.aot import _key_str

        key = _key_str(name, args)
        if key not in self.counts:
            self.order.append(key)
            self.exemplars[key] = (name, jit_fn, args)
        self.counts[key] = self.counts.get(key, 0) + 1

    def rows(self):
        out = []
        for key in self.order:
            name, jit_fn, args = self.exemplars[key]
            print(f"profile:   costing {name}...", file=sys.stderr,
                  flush=True)
            flops = bts = None
            try:
                lowered = jit_fn.lower(*args)
                try:
                    cost = lowered.cost_analysis()
                except Exception:
                    cost = None
                if cost is None:
                    cost = lowered.compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0))
                bts = float(cost.get("bytes accessed", 0.0))
            except Exception as e:  # noqa: BLE001
                print(f"cost_analysis failed for {name}: {e}",
                      file=sys.stderr)
            out.append((name, self.counts[key], flops, bts))
        return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--wire", default=None,
                    choices=("device", "compressai"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--config", default="crdr_throughput.yaml")
    args = ap.parse_args(argv)

    os.environ.setdefault("CRDR_BENCH_CONFIG", args.config)
    from __graft_entry__ import _flagship_model

    from bench import load_bench_images, run_pipeline

    def note(msg):
        print(f"profile: {msg}", file=sys.stderr, flush=True)

    note(f"building model ({args.config})...")
    model = _flagship_model(tiny=bool(os.environ.get("CRDR_BENCH_TINY")),
                            config_name=args.config)
    note("codec_setup...")
    model.codec_setup()
    if args.wire:
        model.wire_format = args.wire
    h, w = (128, 192) if os.environ.get("CRDR_BENCH_TINY") else (512, 768)
    imgs = load_bench_images(args.batch, h, w)

    note("warmup/compile roundtrip...")
    run_pipeline(model, imgs)  # warmup/compile
    note("recorded roundtrip...")
    rec = _CostRecorder()
    model._aot_recorder = rec
    t0 = time.perf_counter()
    encs, _ = run_pipeline(model, imgs)
    wall = time.perf_counter() - t0
    model._aot_recorder = None
    note(f"costing {len(rec.order)} programs (lower + cost_analysis)...")

    enc_t = dict(encs[0].get("timing") or {})
    dec_t = dict(getattr(model, "last_decode_timing", {}) or {})

    rows = rec.rows()
    tot_flops = sum((f or 0.0) * c for _, c, f, _ in rows)
    tot_bytes = sum((b or 0.0) * c for _, c, _, b in rows)
    print(f"# roundtrip profile  wire={model.wire_format} "
          f"batch={args.batch} {w}x{h}  wall={wall:.3f}s")
    print(f"# stage timings enc={enc_t} dec={dec_t}")
    print(f"# totals: {tot_flops/1e9:.1f} GFLOP, {tot_bytes/1e6:.1f} MB "
          f"accessed | roofline floor "
          f"{max(tot_flops/PEAK_FLOPS, tot_bytes/PEAK_HBM)*1e3:.1f} ms "
          f"(peaks assumed: {PEAK_FLOPS/1e12:.0f}T FLOP/s, "
          f"{PEAK_HBM/1e9:.0f} GB/s HBM)")
    print(f"{'program':<28}{'n':>4}{'GFLOP':>10}{'MB':>10}"
          f"{'mxu_ms':>9}{'hbm_ms':>9}{'share':>8}")
    for name, cnt, flops, bts in sorted(
            rows, key=lambda r: -((r[2] or 0.0) * r[1])):
        fl = (flops or 0.0) * cnt
        by = (bts or 0.0) * cnt
        mxu_ms = fl / PEAK_FLOPS * 1e3
        hbm_ms = by / PEAK_HBM * 1e3
        share = fl / tot_flops if tot_flops else 0.0
        print(f"{name:<28}{cnt:>4}{fl/1e9:>10.1f}{by/1e6:>10.1f}"
              f"{mxu_ms:>9.2f}{hbm_ms:>9.2f}{share:>8.1%}")


if __name__ == "__main__":
    main()
