#!/bin/bash
# Round-5 endurance chain driver: the full reference 3-stage recipe
# (docs/training.md) at 15k + 15k + 20k steps on the curated photographic
# set (data_local/), hardened against the TWO observed relay failure modes:
#
#   1. d2h collapse BEFORE a leg starts  -> health-gate (warmed probe) and
#      wait, like scripts/endurance_r4_resume.sh;
#   2. relay wedge MID-leg -> the client process blocks forever even after
#      the relay recovers (observed 2026-08-20: a wedged process sat 30+
#      min while a fresh one worked immediately).  A stall watchdog kills
#      the trainer when the newest file under its checkpoint dir stops
#      moving for 25 min (covers train-step compile and eval-bucket
#      compiles), then the leg retries with --auto_resume from the newest
#      5k checkpoint.
#
# Logs in /tmp/endurance_r4/ (same place the r4 recipe used, so the
# post-endurance queue and artifact copy steps stay unchanged).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/endurance_r4
SUM=/tmp/endurance_r4/summary.log
STALL_S=1500
MAX_ATTEMPTS=8

probe() {  # 32MB d2h < 8s, after a warmup pull (cold-pull setup ~2 min)
  timeout 600 python - <<'EOF'
import time, numpy as np, jax
w = jax.device_put(np.zeros((256, 256), np.float32)); w.block_until_ready()
_ = np.asarray(w)
x = jax.device_put(np.zeros((8, 1024, 1024), np.float32))
x.block_until_ready()
t0 = time.time(); _ = np.asarray(x); dt = time.time() - t0
print(f"D2H_S {dt:.2f}", flush=True)
raise SystemExit(0 if dt < 8 else 1)
EOF
}

wait_health() {
  until probe; do
    echo "$(date +%T) relay degraded; sleeping 5 min" | tee -a "$SUM"
    sleep 300
  done
  echo "$(date +%T) relay healthy" | tee -a "$SUM"
}

newest_mtime() {  # newest file under $1 (0 if none)
  local f
  f=$(ls -t "$1" 2>/dev/null | head -1)
  if [ -n "$f" ]; then stat -c %Y "$1/$f"; else echo 0; fi
}

run_leg() {  # run_leg <name> <config> <ckpt>
  local name=$1 cfg=$2 ckpt=$3
  local exp dir attempts=0
  exp=$(basename "$cfg" .yaml)
  dir="checkpoint/$exp"
  while [ ! -f "$ckpt" ] && [ $attempts -lt $MAX_ATTEMPTS ]; do
    attempts=$((attempts + 1))
    wait_health
    echo "=== $name attempt $attempts $(date +%T) ===" | tee -a "$SUM"
    python scripts/train.py "$cfg" --auto_resume \
        > "/tmp/endurance_r4/$name.a$attempts.log" 2>&1 &
    local tp=$!
    local start ref now m
    start=$(date +%s)
    while kill -0 "$tp" 2>/dev/null; do
      sleep 60
      now=$(date +%s)
      m=$(newest_mtime "$dir")
      ref=$(( m > start ? m : start ))
      if [ $((now - ref)) -gt $STALL_S ]; then
        echo "$(date +%T) $name stalled ${STALL_S}s; killing pid $tp" \
          | tee -a "$SUM"
        kill "$tp" 2>/dev/null; sleep 10; kill -9 "$tp" 2>/dev/null
        break
      fi
    done
    wait "$tp" 2>/dev/null
    tail -2 "/tmp/endurance_r4/$name.a$attempts.log" | tee -a "$SUM"
    echo "--- $name attempt $attempts ended $(date +%T)" | tee -a "$SUM"
  done
  if [ ! -f "$ckpt" ]; then
    echo "!!! $name failed after $attempts attempts" | tee -a "$SUM"
    exit 1
  fi
  python scripts/check_aux_convergence.py "$dir/log_loss.csv" \
      | tee -a "$SUM" || true
}

echo "=== endurance_r5 driver start $(date +%T) ===" | tee -a "$SUM"
run_leg stage1 config/endurance_r4_stage1.yaml \
    checkpoint/endurance_r4_stage1/model/comp_model_iter15K.ckpt
run_leg stage2 config/endurance_r4_stage2.yaml \
    checkpoint/endurance_r4_stage2/model/comp_model_iter15K.ckpt
run_leg stage3 config/endurance_r4_stage3.yaml \
    checkpoint/endurance_r4_stage3/model/comp_model_iter20K.ckpt

# 5-point RD curve from the final stage-3 checkpoint (same artifact
# criterion as r3/r4: monotone RD from the final checkpoint)
if [ ! -f /tmp/endurance_r4/rd_final/rd_curve.csv ]; then
  wait_health
  timeout 2400 python scripts/rd_sweep.py config/crdr.yaml \
      --model_path checkpoint/endurance_r4_stage3/model/comp_model_iter20K.ckpt \
      --img_dir /root/reference/demo_images \
      --save_dir /tmp/endurance_r4/rd_final \
      > /tmp/endurance_r4/rd_final.log 2>&1
  tail -8 /tmp/endurance_r4/rd_final.log | tee -a "$SUM"
fi
echo "=== endurance_r5 driver done $(date +%T) ===" | tee -a "$SUM"
