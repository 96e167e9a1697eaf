#!/bin/bash
# Anisotropic (rats/HeLa-shaped) end-to-end exercise: 256x256x12 volumes,
# z-stride-2 pyramid, VOXEL_Z_OVER_Y=4 anchors (VERDICT r2 item 7).
# Prereq: data/aniso256 (m3d.data.synthetic --image_size 256 --image_depth 12
#         --voxel_z_over_y 4.0 --split)
set -uo pipefail
cd /root/repo || exit 1
LOG=runs/aniso/logs
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

stage RPN_TRAINING     configs/aniso/rpn.json       rpn
stage HEAD_TRAINING    configs/aniso/heads_e2e.json head
stage MRCNN_EVALUATION configs/aniso/eval.json      eval
echo "=== ANISO E2E COMPLETE ==="
