#!/bin/bash
# Corrected anisotropic pipeline (v2): physical z/xy anchor ratios
# [0.7, 1.0, 1.3] with VOXEL_Z_OVER_Y=4 doing the voxel-space squash.
# v1 (configs/aniso/{rpn,heads_e2e,eval}.json) double-squashed the anchors
# — voxel-space ratios AND the factor — capping anchor z-extents at ~2.8
# voxels against 6-11-voxel GT objects; diagnosed in ANISO.md.
set -uo pipefail
cd /root/repo || exit 1
LOG=runs/aniso2/logs
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

stage RPN_TRAINING     configs/aniso/rpn2.json       rpn
stage HEAD_TRAINING    configs/aniso/heads_e2e2.json head
stage MRCNN_EVALUATION configs/aniso/eval2.json      eval
echo "=== ANISO2 COMPLETE ==="
