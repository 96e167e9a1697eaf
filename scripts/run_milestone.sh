#!/bin/bash
# Convergence milestone: full product pipeline on the real TPU.
# Usage: scripts/run_milestone.sh <config_dir> <log_dir>
# Stages mirror the reference's documented workflow (README.md:118-170):
#   RPN_TRAINING -> TARGET_GENERATION -> HEAD_TRAINING -> MRCNN_EVALUATION
set -uo pipefail
CFG=${1:-configs/milestone}
LOG=${2:-runs/milestone/logs}
mkdir -p "$LOG"
cd /root/repo

stage() {
  local task=$1 cfg=$2 name=$3
  echo "=== [$(date +%T)] $task ($cfg) ==="
  timeout 14400 python main.py --task "$task" --config_path "$cfg" \
    > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%T)] $task rc=$rc ==="
  tail -5 "$LOG/$name.log"
  if [ $rc -ne 0 ]; then echo "STAGE FAILED: $task"; exit $rc; fi
}

stage RPN_TRAINING      "$CFG/rpn_synth64.json"        rpn
stage TARGET_GENERATION "$CFG/targeting_synth64.json"  targeting
stage HEAD_TRAINING     "$CFG/heads_e2e_synth64.json"  head
stage MRCNN_EVALUATION  "$CFG/mrcnn_eval_synth64.json" eval
echo "=== MILESTONE PIPELINE COMPLETE ==="
