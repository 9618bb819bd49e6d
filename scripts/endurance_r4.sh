#!/bin/bash
# Round-4 endurance driver: the full reference 3-stage recipe
# (docs/training.md) at 15k + 15k + 20k steps on photographic crops, with
# eval sweeps every 5k and the aux-convergence guard after each stage.
# One JAX process at a time (the TPU relay must never be shared).  Logs in
# /tmp/endurance_r4/; checkpoints under the gitignored checkpoint/ tree.
# Copy loss/eval CSVs into docs/artifacts/ by hand after inspection.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/endurance_r4

leg() {  # leg <name> <timeout-s> <config> <ckpt-to-check>
  local name=$1 tmo=$2 cfg=$3 ckpt=$4
  echo "=== $name start $(date +%T) ===" | tee -a /tmp/endurance_r4/summary.log
  timeout "$tmo" python scripts/train.py "$cfg" \
      > "/tmp/endurance_r4/$name.log" 2>&1
  local rc=$?
  tail -3 "/tmp/endurance_r4/$name.log" | tee -a /tmp/endurance_r4/summary.log
  echo "--- $name rc=$rc $(date +%T)" | tee -a /tmp/endurance_r4/summary.log
  if [ ! -f "$ckpt" ]; then
    echo "!!! $name did not produce $ckpt — aborting chain" \
      | tee -a /tmp/endurance_r4/summary.log
    exit 1
  fi
  local exp
  exp=$(basename "$cfg" .yaml)
  python scripts/check_aux_convergence.py \
      "checkpoint/$exp/log_loss.csv" \
      | tee -a /tmp/endurance_r4/summary.log || true
}

leg stage1 11000 config/endurance_r4_stage1.yaml \
    checkpoint/endurance_r4_stage1/model/comp_model_iter15K.ckpt
leg stage2 11000 config/endurance_r4_stage2.yaml \
    checkpoint/endurance_r4_stage2/model/comp_model_iter15K.ckpt
leg stage3 16000 config/endurance_r4_stage3.yaml \
    checkpoint/endurance_r4_stage3/model/comp_model_iter20K.ckpt

# 5-point RD curve from the final stage-3 checkpoint (VERDICT r3 item 5
# "Done =" criterion: monotone RD curve from the final checkpoint).
timeout 2400 python scripts/rd_sweep.py config/crdr.yaml \
    --model_path checkpoint/endurance_r4_stage3/model/comp_model_iter20K.ckpt \
    --img_dir /root/reference/demo_images \
    --save_dir /tmp/endurance_r4/rd_final \
    > /tmp/endurance_r4/rd_final.log 2>&1
tail -8 /tmp/endurance_r4/rd_final.log | tee -a /tmp/endurance_r4/summary.log
echo "=== endurance_r4 done $(date +%T) ===" | tee -a /tmp/endurance_r4/summary.log
