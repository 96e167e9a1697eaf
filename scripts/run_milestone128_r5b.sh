#!/bin/bash
# Continuation after the epoch-6 host OOM (130 GB anon RSS): finish head
# epochs 6-9, evaluate, re-pack the bench checkpoint.
set -uo pipefail
cd /root/repo || exit 1
LOG=runs/milestone128/logs
stage() {
  local task=$1 cfg=$2 name=$3
  echo "=== [$(date +%T)] $task ($cfg) ==="
  timeout 14000 python main.py --task "$task" --config_path "$cfg" \
    > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%T)] $task rc=$rc ==="
  tail -3 "$LOG/$name.log"
  if [ $rc -ne 0 ]; then echo "STAGE FAILED: $task"; exit $rc; fi
}
stage HEAD_TRAINING    configs/milestone128/heads_e2e_synth128_resume2.json head_r5b
stage MRCNN_EVALUATION configs/milestone128/mrcnn_eval_synth128_resume.json eval_r5
python scripts/pack_bench_ckpt.py \
  /root/repo/runs/milestone128/head2/weights/best.msgpack \
  /root/repo/weights/bench_ckpt.f16.msgpack || { echo "PACK FAILED"; exit 1; }
echo "=== MILESTONE128 R5B COMPLETE ==="
