#!/bin/bash
# Aniso v4 (VERDICT r4 item 3): extend the plateaued v2 RPN 20->30 epochs at
# a reduced lr, retrain the e2e head LONG (12 epochs, 2x the v3 budget)
# on the best trunk warm-started from the v3 head subtree, evaluate with
# auto confidence, then re-run the FP failure-mode analysis.
set -uo pipefail
cd /root/repo || exit 1
LOG=runs/aniso4/logs
mkdir -p "$LOG"

stage() {
  local task=$1 cfg=$2 name=$3
  echo "=== [$(date +%T)] $task ($cfg) ==="
  timeout 10000 python main.py --task "$task" --config_path "$cfg" \
    > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%T)] $task rc=$rc ==="
  tail -3 "$LOG/$name.log"
  if [ $rc -ne 0 ]; then echo "STAGE FAILED: $task"; exit $rc; fi
}

stage RPN_TRAINING     configs/aniso/rpn4.json       rpn
stage HEAD_TRAINING    configs/aniso/heads_e2e4.json head
stage MRCNN_EVALUATION configs/aniso/eval4.json      eval
python scripts/analyze_fp.py --eval_dir runs/aniso4/eval \
  --data_dir data/aniso256 --min_score 0.8 > "$LOG/fp_analysis.json" 2>&1 \
  || echo "FP analysis failed (check eval dir layout)"
echo "=== ANISO4 COMPLETE ==="
