#!/bin/bash
# One-shot TPU validation queue: everything the round-3 additions need from a
# single healthy-relay window, sequenced (one JAX process at a time — the
# relay must never be shared).  Run from the repo root; logs land in
# /tmp/tpuval/.  Each leg is individually bounded so one hang cannot eat the
# window.  Safe to re-run: legs are read-only w.r.t. tracked files (bench
# JSON lines + RD CSVs are copied out at the end by hand after inspection);
# the conditional train_short_ckpt leg writes to the gitignored checkpoint/
# directory (plus its logs/config dump under there).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpuval
run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a /tmp/tpuval/summary.log
  timeout "$tmo" env "${ENV_EXTRA[@]}" "$@" >"/tmp/tpuval/$name.log" 2>&1
  local rc=$?
  tail -4 "/tmp/tpuval/$name.log" | tee -a /tmp/tpuval/summary.log
  echo "--- $name rc=$rc" | tee -a /tmp/tpuval/summary.log
}

ENV_EXTRA=()

# 1. Scored protocol: throughput config, both wire legs (device wire leg is
#    on by default).  First compile ~2-4 min, cached after.
run bench_throughput 1500 python bench.py

# 1b. Device-wire encoder placement A/B: the on-device lane coder (default)
#     vs the threaded host C++ coder.  Bytes are identical (tested); this
#     isolates the wall-clock effect of host-free encode + smaller d2h.
ENV_EXTRA=(CRDR_DEVICE_ENC=host)
run bench_hostenc 1200 python bench.py
ENV_EXTRA=()

# 1c. Batch=16 floor re-check (round-3 measured pipelined==serial there;
#     confirms whether fastchain/Pallas move the compute floor).
ENV_EXTRA=(CRDR_BENCH_BATCH=16)
run bench_b16 1200 python bench.py
ENV_EXTRA=()

# 2. Fastchain A/B: whole codec chain at default precision (bf16-capable).
ENV_EXTRA=(CRDR_BENCH_CONFIG=crdr_fastchain.yaml)
run bench_fastchain 1200 python bench.py
ENV_EXTRA=()

# 3. Pallas fused SliceTransform under the round-3 pipeline (bitstream-safe
#    by executable replay; compiled Mosaic kernel, TPU only).
ENV_EXTRA=(CRDR_PALLAS=1)
run bench_pallas 1200 python bench.py
ENV_EXTRA=()

# 3b. Fused whole-loop device-wire decode (one lax.scan program for the
#     charm loop) on top of the promoted kernel — the round-4 dispatch-floor
#     lever.  Promote `fused_decode_loop: True` if the device-wire medians
#     win both paired windows (same protocol as the kernel promotion).
ENV_EXTRA=(CRDR_FUSED_LOOP=1)
run bench_fusedloop 1200 python bench.py
ENV_EXTRA=(CRDR_FUSED_LOOP=1 CRDR_FUSED_ENC_LOOP=1)
run bench_fusedboth 1200 python bench.py
ENV_EXTRA=()

# Legs 4-6 need a trained checkpoint.  Checkpoints are gitignored and do not
# survive a filesystem reset; if the real-data one is absent, rebuild a short
# cold-start equivalent first (config/real_stage2_short.yaml, ~2k steps,
# ~12 min on the chip) and point the legs at it.
CKPT=checkpoint/real_stage2/model/comp_model_iter5K.ckpt
if [ ! -f "$CKPT" ]; then
  CKPT=checkpoint/real_stage2_short/model/comp_model_iter2K.ckpt
  if [ ! -f "$CKPT" ]; then
    run train_short_ckpt 2400 python scripts/train.py config/real_stage2_short.yaml
  fi
fi
if [ ! -f "$CKPT" ]; then
  echo "short checkpoint build failed ($CKPT missing) — skipping legs 4-6" \
    | tee -a /tmp/tpuval/summary.log
  echo "=== queue done, ckpt legs skipped ($(date +%T)) ===" \
    | tee -a /tmp/tpuval/summary.log
  exit 1
fi

# 4. RD delta of the fastchain on the trained real-data checkpoint — same
#    ckpt as the bf16-transform sweep leg below, so the diff isolates the
#    chain precision.
run rd_fastchain 2400 python scripts/rd_sweep.py config/crdr_fastchain.yaml \
    --model_path "$CKPT" \
    --img_dir /root/reference/demo_images --save_dir /tmp/tpuval/rd_fastchain

# 5. Serving daemon under concurrent mixed-quality load (HTTP + micro-batch
#    coalescing): one JSON line with req/s, p50 latencies, batch histogram.
run serve_smoke 1500 python scripts/serve_smoke.py config/crdr_throughput.yaml \
    --model_path "$CKPT" \
    --img_dir /root/reference/demo_images --clients 8 --rounds 3

# 6. CLI surface sanity (compress+decompress roundtrip on the demo set).
run cli_roundtrip 1200 python scripts/compress.py config/crdr_throughput.yaml \
    --model_path "$CKPT" \
    --img_dir /root/reference/demo_images --save_dir /tmp/tpuval/cli_out \
    -q 1.0 -b 0.0 --decompress

echo "=== queue done ($(date +%T)) ===" | tee -a /tmp/tpuval/summary.log
