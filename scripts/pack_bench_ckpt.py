"""Pack a trained checkpoint into the git-tracked compact bench checkpoint.

Workspace resets between rounds wipe runs/ (gitignored), which silently
downgraded bench.py to its random-weights monolithic fallback. This script
casts a trained param tree's float leaves to float16 (half the bytes; ~1e-3
relative weight error, detection behavior unchanged) and writes it to
weights/bench_ckpt.f16.msgpack, which IS tracked. restore_by_name casts
leaves back to the target model's dtype on load.

Usage:
  python scripts/pack_bench_ckpt.py [src.msgpack] [dst.msgpack]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from m3d.train.checkpoints import load_params, save_params  # noqa: E402


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/runs/bench_ckpt/head/weights/best.msgpack"
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/weights/bench_ckpt.f16.msgpack"
    tree, meta = load_params(src)

    n = {"cast": 0, "kept": 0}

    def cast(leaf):
        arr = np.asarray(leaf)
        if arr.dtype in (np.float32, np.float64):
            n["cast"] += 1
            return arr.astype(np.float16)
        n["kept"] += 1
        return arr

    import jax

    packed = jax.tree_util.tree_map(cast, tree)
    meta = dict(meta or {})
    meta["packed_from"] = src
    meta["storage_dtype"] = "float16"
    save_params(dst, packed, meta)
    import os

    print(f"wrote {dst} ({os.path.getsize(dst) / 1e6:.1f} MB): "
          f"{n['cast']} float leaves cast to f16, {n['kept']} kept")


if __name__ == "__main__":
    main()
