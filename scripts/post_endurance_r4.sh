#!/bin/bash
# Post-endurance TPU queue (round 4): runs the moment the endurance chain
# releases the chip.  Legs: roundtrip profiler (both wires), final default
# bench sanity (promoted fused_slice_kernel), fastchain RD-delta sweep on
# the endurance stage-3 checkpoint (vs the chain's own default-config final
# sweep in /tmp/endurance_r4/rd_final), and a batch=16 floor re-check.
# One JAX process at a time; logs in /tmp/post_r4/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/post_r4

PIDFILE=/tmp/endurance.pid
[ -f /tmp/endurance_driver.pid ] && PIDFILE=/tmp/endurance_driver.pid
if [ -f "$PIDFILE" ]; then
  EPID=$(cat "$PIDFILE")
  echo "waiting for endurance chain (pid $EPID)..." | tee -a /tmp/post_r4/summary.log
  while kill -0 "$EPID" 2>/dev/null; do sleep 60; done
fi
echo "=== endurance done; post queue starts $(date +%T) ===" \
  | tee -a /tmp/post_r4/summary.log

ENV_EXTRA=()
run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a /tmp/post_r4/summary.log
  timeout "$tmo" env "${ENV_EXTRA[@]}" "$@" >"/tmp/post_r4/$name.log" 2>&1
  local rc=$?
  tail -4 "/tmp/post_r4/$name.log" | tee -a /tmp/post_r4/summary.log
  echo "--- $name rc=$rc" | tee -a /tmp/post_r4/summary.log
}

# 1. Where does the time go: per-program roofline, both wires (VERDICT r3
#    item 4's committed-profile criterion).
run profile_device 1500 python scripts/profile_roundtrip.py --wire device
run profile_host 1200 python scripts/profile_roundtrip.py --wire compressai

# 2. Final bench sanity: the promoted default should reproduce the
#    CRDR_PALLAS=1 A/B leg (~1.5 Mpix/s in a healthy window).
run bench_default 1500 python bench.py

# 3. Batch=16 floor re-check under the promoted kernel.
ENV_EXTRA=(CRDR_BENCH_BATCH=16)
run bench_b16 1200 python bench.py
ENV_EXTRA=()

# 4. Fastchain RD delta on the TRAINED endurance stage-3 checkpoint
#    (promotion re-review with quality evidence; compare against
#    /tmp/endurance_r4/rd_final from the chain's default-config sweep).
CKPT=checkpoint/endurance_r4_stage3/model/comp_model_iter20K.ckpt
if [ -f "$CKPT" ]; then
  run rd_fastchain 2400 python scripts/rd_sweep.py config/crdr_fastchain.yaml \
      --model_path "$CKPT" \
      --img_dir /root/reference/demo_images --save_dir /tmp/post_r4/rd_fastchain
  if [ -f /tmp/endurance_r4/rd_final/rd_curve.csv ] && \
     [ -f /tmp/post_r4/rd_fastchain/rd_curve.csv ]; then
    run bd_fastchain 300 python scripts/bd_rate.py \
        /tmp/endurance_r4/rd_final/rd_curve.csv \
        /tmp/post_r4/rd_fastchain/rd_curve.csv
  fi
else
  echo "no stage-3 ckpt ($CKPT) — skipping RD legs" | tee -a /tmp/post_r4/summary.log
fi

# 5. (r5) Fused whole-loop A/B repeat in what is hopefully a healthier
#    window than the 10:00 promotion run — targets: pipelined >= 2.0
#    Mpix/s, batch-1 < 300 ms (VERDICT r4 item 2 "Done =" criteria).
run ab_fused 2400 python scripts/ab_fused_loop.py \
    --out /tmp/post_r4/ab_fused_loop.json

# 6. (r5) Train-step rate on the chip -> docs/artifacts/train_bench_latest
#    .json, the numerator of bench.py's vs_torch_cpu_train.
run bench_train 1800 python scripts/bench_train.py --stage 1 --mixed

# 7. (r5) In-step table expansion A/B (VERDICT r4 item 4): the default now
#    expands CDF rows inside the scan step (ops/device_rans.py
#    lane_decode_round_instep — cuts the profiler's top HBM line ~10x);
#    this leg re-times the OLD precomputed-rows form for the delta, and
#    the profiler re-run quantifies the byte reduction vs profile_r4.md.
#    (leg 1 profile_device is the "after"; this is the same-window "before")
ENV_EXTRA=(CRDR_INSTEP_TABLES=0)
run bench_instep0 1500 python bench.py
run profile_instep0 1500 python scripts/profile_roundtrip.py --wire device
ENV_EXTRA=()

# 8. (r5) Scan-unroll A/B: default is unroll=8 on the serial lane scans;
#    this leg re-times unroll=1 (the pre-r5 behavior) for the delta.
ENV_EXTRA=(CRDR_SCAN_UNROLL=1)
run bench_unroll1 1500 python bench.py
ENV_EXTRA=()

# 9. (r5) Opt-in Mosaic lane-decode kernel (ops/pallas_lane_decode.py):
#    whole decode round as one VMEM-resident kernel.  First compiled run on
#    real hardware — bounded; a Mosaic rejection fails only this leg and
#    the default (off) is unaffected.
ENV_EXTRA=(CRDR_PALLAS_LANES=1)
run bench_lanes 1500 python bench.py
ENV_EXTRA=()

echo "=== post queue done ($(date +%T)) ===" | tee -a /tmp/post_r4/summary.log
