#!/bin/bash
# Retrain the compact git-tracked bench checkpoint after a workspace reset.
# Prereq: data/synth64 exists (m3d.data.synthetic --train_image_nb 150
# --image_size 64 --split). ~35 min on one v5e with a warm /root/.jax_cache.
set -uo pipefail
cd /root/repo || exit 1
LOG=runs/bench_ckpt/logs
mkdir -p "$LOG"

stage() {
  local task=$1 cfg=$2 name=$3
  echo "=== [$(date +%T)] $task ($cfg) ==="
  timeout 5400 python main.py --task "$task" --config_path "$cfg" \
    > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%T)] $task rc=$rc ==="
  tail -3 "$LOG/$name.log"
  if [ $rc -ne 0 ]; then echo "STAGE FAILED: $task"; exit $rc; fi
}

stage RPN_TRAINING  configs/bench_ckpt/rpn.json       rpn
stage HEAD_TRAINING configs/bench_ckpt/heads_e2e.json head
python scripts/pack_bench_ckpt.py || { echo "PACK FAILED"; exit 1; }
echo "=== BENCH CKPT COMPLETE ==="
