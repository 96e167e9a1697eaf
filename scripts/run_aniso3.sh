#!/bin/bash
# Anisotropic pipeline v3: v2's corrected anchors + the reference's own
# rats-regime optimizer recipe (Adam lr=1e-4, per-variable clipnorm=5.0 —
# reference configs/heads/scp_heads_rats.json), which v2 surfaced as
# load-bearing: at SGD lr=1e-2 unclipped, the first e2e epoch blows the
# classifier logits past the ±10 clip and the head dies (ANISO.md).
# Reuses the v2-trained RPN (runs/aniso2/rpn) — only the head stage and
# evaluation rerun.
set -uo pipefail
cd /root/repo || exit 1
LOG=runs/aniso3/logs
mkdir -p "$LOG"

stage() {
  local task=$1 cfg=$2 name=$3
  echo "=== [$(date +%T)] $task ($cfg) ==="
  timeout 7200 python main.py --task "$task" --config_path "$cfg" \
    > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%T)] $task rc=$rc ==="
  tail -3 "$LOG/$name.log"
  if [ $rc -ne 0 ]; then echo "STAGE FAILED: $task"; exit $rc; fi
}

stage HEAD_TRAINING    configs/aniso/heads_e2e3.json head
stage MRCNN_EVALUATION configs/aniso/eval3.json      eval
echo "=== ANISO3 COMPLETE ==="
