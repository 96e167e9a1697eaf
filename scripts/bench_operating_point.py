"""Throughput at the reference's product inference operating point.

Same model, data, and measurement as bench.py, but with
DETECTION_MIN_CONFIDENCE = 0.4 — the value the reference's own MRCNN
inference config ships (/root/reference/configs/mrcnn/scp_mrcnn_config.json:24;
its rats config uses 0.6). At a product confidence floor the detection slots
hold real instances instead of junk that saturates the 0.2 class-default
floor, and the adaptive per-ROI chunking (m3d/models/inference.py) converts
the empty padding into skipped compute.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_operating_point.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

if __name__ == "__main__":
    bench.main(min_confidence=0.4)
