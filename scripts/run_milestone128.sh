#!/bin/bash
# 128^3 convergence + bench-checkpoint run: RPN -> e2e HEAD -> evaluation on
# data/synth128, then pack the trained head checkpoint into the git-tracked
# bench checkpoint (VERDICT r3 item 2b: the bench workload must detect at
# >= 0.9 recall on the 128^3 bench volumes, which a 64^3-trained model
# does not).
# Prereq: data/synth128 (python -m m3d.data.synthetic --train_dir data/synth128
#         --train_image_nb 100 --image_size 128 --split)
set -uo pipefail
cd /root/repo || exit 1
LOG=runs/milestone128/logs
mkdir -p "$LOG"

stage() {
  local task=$1 cfg=$2 name=$3
  echo "=== [$(date +%T)] $task ($cfg) ==="
  timeout 9000 python main.py --task "$task" --config_path "$cfg" \
    > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%T)] $task rc=$rc ==="
  tail -3 "$LOG/$name.log"
  if [ $rc -ne 0 ]; then echo "STAGE FAILED: $task"; exit $rc; fi
}

stage RPN_TRAINING     configs/milestone128/rpn_synth128.json       rpn
stage HEAD_TRAINING    configs/milestone128/heads_e2e_synth128.json head
stage MRCNN_EVALUATION configs/milestone128/mrcnn_eval_synth128.json eval
python scripts/pack_bench_ckpt.py \
  /root/repo/runs/milestone128/head/weights/best.msgpack \
  /root/repo/weights/bench_ckpt.f16.msgpack || { echo "PACK FAILED"; exit 1; }
echo "=== MILESTONE128 COMPLETE ==="
