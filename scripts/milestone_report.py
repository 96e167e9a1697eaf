"""Assemble MILESTONE.md from a finished milestone pipeline's artifacts.

Reads the per-stage telemetry/evaluation outputs under a run root and writes
a markdown summary with the reference's documented expected ranges
(/root/reference/README.md:173-196) next to the measured values.

Usage: python scripts/milestone_report.py runs/milestone data/synth64 MILESTONE.md
"""

import json
import os
import sys


def last_records(path, n=3):
    if not os.path.exists(path):
        return []
    rows = [json.loads(line) for line in open(path)]
    return rows[-n:]


def main():
    run_root = sys.argv[1] if len(sys.argv) > 1 else "runs/milestone"
    data_root = sys.argv[2] if len(sys.argv) > 2 else "data/synth64"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "MILESTONE.md"

    rpn_tel = last_records(
        os.path.join(run_root, "rpn/weights/telemetry.jsonl"), 25)
    head_tel = last_records(
        os.path.join(run_root, "head/weights/telemetry.jsonl"), 25)
    eval_summary_path = os.path.join(run_root, "eval/evaluation_summary.json")
    eval_summary = (json.load(open(eval_summary_path))
                    if os.path.exists(eval_summary_path) else {})

    def ex(rec):
        return rec.get("extra", rec)

    lines = []
    a = lines.append
    a("# MILESTONE — synthetic convergence run (full product pipeline)")
    a("")
    a("Pipeline: `RPN_TRAINING -> TARGET_GENERATION -> HEAD_TRAINING"
      " (training_head_e2e) -> MRCNN_EVALUATION` via `main.py`, configs in"
      " `configs/milestone/`, on one real TPU v5e chip through the axon"
      " tunnel. Dataset: 150 synthetic 64^3 volumes"
      " (`m3d.data.synthetic`, reference generate_data.py formats),"
      " 120/30 train/test split.")
    a("")

    if rpn_tel:
        a("## RPN training (20 epochs)")
        a("")
        a("| epoch | loss | det@0.5 (top500) | det@0.3 | lr |")
        a("|---|---|---|---|---|")
        for rec in rpn_tel:
            e = ex(rec)
            if "loss" not in e:
                continue
            a(f"| {rec.get('epoch')} | {e.get('loss', 0):.4f} | "
              f"{e.get('det@0.5_top500', 0):.3f} | "
              f"{e.get('det@0.3_top500', 0):.3f} | {e.get('lr', 0):.1e} |")
        last = ex(rpn_tel[-1])
        a("")
        a(f"Final Detection@IoU0.50 = **{last.get('det@0.5_top500', 0):.1%}**"
          " — reference expectation: 55-65% by epoch 15-20"
          " (core/models.py:2944).")
        a("")

    if head_tel:
        a("## E2E head training (frozen RPN live proposals, 20 epochs)")
        a("")
        keys = [k for k in ex(head_tel[-1])
                if k in ("loss", "class_loss", "bbox_loss", "mask_loss",
                         "dice", "mask_dice", "class_pos_acc", "class_bg_acc",
                         "class_fg_prob", "lr", "val_loss", "val_dice",
                         "val_mask_dice")]
        a("| epoch | " + " | ".join(keys) + " |")
        a("|---" * (len(keys) + 1) + "|")
        for rec in head_tel:
            e = ex(rec)
            if "loss" not in e:
                continue
            a(f"| {rec.get('epoch')} | "
              + " | ".join(f"{e.get(k, 0):.4f}" for k in keys) + " |")
        a("")

    if eval_summary:
        a("## MRCNN evaluation (held-out test volumes)")
        a("")
        a("```json")
        a(json.dumps(eval_summary, indent=2))
        a("```")
        a("")
        dice = eval_summary.get("instance_dice_mean",
                                eval_summary.get("instance_dice", 0))
        a(f"**Instance Dice = {dice:.3f}** — reference documented range"
          " 0.80-0.90 (/root/reference/README.md:191); BASELINE.json"
          " correctness bar.")
        a("")

    open(out_path, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out_path} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
