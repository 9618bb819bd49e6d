#!/bin/bash
# Recovery driver for the round-4 endurance chain after a relay outage.
# Waits for d2h health, then finishes whatever legs are missing, resuming
# stage 2/3 from their newest checkpoints (--auto_resume).  Safe to re-run:
# every leg is skipped once its final checkpoint exists.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/endurance_r4
SUM=/tmp/endurance_r4/summary.log

probe() {  # 32MB d2h must come back in < 8s (after one warmup pull —
           # the first d2h of a fresh process pays a one-time setup cost)
  timeout 600 python - <<'EOF'
import time, numpy as np, jax
w = jax.device_put(np.zeros((256, 256), np.float32)); w.block_until_ready()
_ = np.asarray(w)  # warmup: absorb the cold-pull setup cost
x = jax.device_put(np.zeros((8, 1024, 1024), np.float32))
x.block_until_ready()
t0 = time.time(); _ = np.asarray(x); dt = time.time() - t0
print(f"D2H_S {dt:.2f}", flush=True)
raise SystemExit(0 if dt < 8 else 1)
EOF
}

echo "=== resume driver start $(date +%T) ===" | tee -a "$SUM"
# never probe while the original chain still holds the chip
if [ -f /tmp/endurance.pid ]; then
  EPID=$(cat /tmp/endurance.pid)
  while kill -0 "$EPID" 2>/dev/null; do
    echo "$(date +%T) original chain (pid $EPID) still running; waiting" \
      | tee -a "$SUM"
    sleep 120
  done
fi
until probe; do
  echo "$(date +%T) relay still degraded; sleeping 5 min" | tee -a "$SUM"
  sleep 300
done
echo "$(date +%T) relay healthy — resuming chain" | tee -a "$SUM"

leg() {  # leg <name> <timeout-s> <ckpt> <cmd...>
  local name=$1 tmo=$2 ckpt=$3; shift 3
  if [ -f "$ckpt" ]; then
    echo "--- $name already complete ($ckpt)" | tee -a "$SUM"
    return 0
  fi
  echo "=== $name resume $(date +%T) ===" | tee -a "$SUM"
  timeout "$tmo" "$@" > "/tmp/endurance_r4/$name.resume.log" 2>&1
  local rc=$?
  tail -3 "/tmp/endurance_r4/$name.resume.log" | tee -a "$SUM"
  echo "--- $name rc=$rc $(date +%T)" | tee -a "$SUM"
  [ -f "$ckpt" ] || { echo "!!! $name still missing $ckpt" | tee -a "$SUM"; exit 1; }
}

leg stage1 11000 checkpoint/endurance_r4_stage1/model/comp_model_iter15K.ckpt \
    python scripts/train.py config/endurance_r4_stage1.yaml --auto_resume
leg stage2 11000 checkpoint/endurance_r4_stage2/model/comp_model_iter15K.ckpt \
    python scripts/train.py config/endurance_r4_stage2.yaml --auto_resume
leg stage3 16000 checkpoint/endurance_r4_stage3/model/comp_model_iter20K.ckpt \
    python scripts/train.py config/endurance_r4_stage3.yaml --auto_resume

python scripts/check_aux_convergence.py \
    checkpoint/endurance_r4_stage2/log_loss.csv \
    checkpoint/endurance_r4_stage3/log_loss.csv | tee -a "$SUM" || true

if [ ! -f /tmp/endurance_r4/rd_final/rd_curve.csv ]; then
  timeout 2400 python scripts/rd_sweep.py config/crdr.yaml \
      --model_path checkpoint/endurance_r4_stage3/model/comp_model_iter20K.ckpt \
      --img_dir /root/reference/demo_images \
      --save_dir /tmp/endurance_r4/rd_final \
      > /tmp/endurance_r4/rd_final.log 2>&1
  tail -8 /tmp/endurance_r4/rd_final.log | tee -a "$SUM"
fi
echo "=== resume driver done $(date +%T) ===" | tee -a "$SUM"
