"""Checkpointing: best/latest + by-name partial restore + head-only subtrees.

Replaces the reference's Keras H5 machinery (core/models.py:1974-2093
BestAndLatestCheckpoint; 4924-5338 weight-surgery toolkit) with a name-keyed
msgpack param tree:

- ``save_latest`` / ``save_best``: per-epoch latest + metric-gated best
  (RPN maximizes summed detection scores; HEAD minimizes val loss —
  core/models.py:2031-2049).
- head-only exports (``latest_head`` / ``best_head``): only ``mrcnn_*``
  modules plus pool/FC metadata attrs (core/models.py:1990-2026).
- ``restore_by_name``: merge a saved tree into a target tree by module path
  with shape checking — the equivalent of Keras load_weights(by_name=True,
  skip_mismatch=True), which the reference relies on to move RPN weights into
  HEAD/MaskRCNN graphs (core/models.py:4576, 5851-5856).
- class-dim slicing on mismatch (core/models.py:5064-5141).

Format: flax serialization msgpack (single file, atomic rename), plus a JSON
sidecar with metadata. Orbax is intentionally not required for the basic
path — a single-file tree keeps the "partial load by suffix" workflow simple.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization, traverse_util


def _flatten(params):
    return traverse_util.flatten_dict(params, sep="/")


def _unflatten(flat):
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()}
    )


def save_params(path: str, params, metadata: dict | None = None):
    """Atomic save of a param (or variables) tree + JSON metadata sidecar."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    params = jax.device_get(params)
    blob = serialization.msgpack_serialize(params)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f)
    return path


def load_params(path: str):
    """Load a checkpoint tree: m3d msgpack, or a reference Keras .h5
    (transparently translated — every ``*_WEIGHTS`` config key accepts a
    checkpoint trained by the reference implementation)."""
    if path.endswith((".h5", ".hdf5")):
        from m3d.utils.h5_import import load_keras_h5

        src_params, src_stats = load_keras_h5(path)
        tree = {"params": src_params}
        if src_stats:
            tree["batch_stats"] = src_stats
        return tree, {"format": "keras_h5"}
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return tree, meta


def extract_subtree(params, prefixes=("mrcnn_",)):
    """Keep only modules whose path contains a prefixed component
    (head-only export, reference: core/models.py:1990-2026)."""
    flat = _flatten(params)
    kept = {
        k: v
        for k, v in flat.items()
        if any(any(part.startswith(p) for p in prefixes)
               for part in k.split("/"))
    }
    return _unflatten(kept)


def restore_by_name(target, source, skip_mismatch: bool = True,
                    class_slice: bool = True, verbose: bool = False):
    """Merge `source` into `target` by path name.

    - exact path + shape match: take source value.
    - suffix match (source stored under a different root): matched by the
    longest common path suffix, shape-checked (the reference's
    _force_load_head_by_suffix, core/models.py:4924-5061).
    - class-dim mismatch on mrcnn class/bbox/mask leaves: slice the
    source's class dimension down (core/models.py:5064-5141).

    Returns (merged_tree, stats dict).
    """
    tflat = _flatten(target)
    sflat = {k: np.asarray(v) for k, v in _flatten(source).items()}

    # Index source by suffixes for cross-model transfer.
    by_suffix: dict[str, list[tuple[str, np.ndarray]]] = {}
    for k, v in sflat.items():
        parts = k.split("/")
        for i in range(len(parts)):
            by_suffix.setdefault("/".join(parts[i:]), []).append((k, v))

    stats = {"loaded": 0, "sliced": 0, "skipped": 0, "missing": 0}
    out = {}
    for key, tval in tflat.items():
        tval = np.asarray(tval)
        cand = None
        if key in sflat:
            cand = sflat[key]
        else:
            parts = key.split("/")
            for i in range(len(parts)):
                matches = by_suffix.get("/".join(parts[i:]), [])
                if len(matches) == 1:
                    cand = matches[0][1]
                    break
                if len(matches) > 1:
                    exact = [m for m in matches if m[0].endswith(key)]
                    if len(exact) == 1:
                        cand = exact[0][1]
                        break
        if cand is None:
            stats["missing"] += 1
            out[key] = tval
            continue
        if cand.shape == tval.shape:
            # Cast to the target leaf's dtype: checkpoints may be stored
            # compactly (f16) while models expect f32 params (the reference's
            # Keras load casts H5 datasets to the variable dtype likewise).
            out[key] = cand.astype(tval.dtype, copy=False)
            stats["loaded"] += 1
        elif class_slice and _try_class_slice(cand, tval) is not None:
            out[key] = _try_class_slice(cand, tval).astype(
                tval.dtype, copy=False)
            stats["sliced"] += 1
        elif skip_mismatch:
            if verbose:
                print(f"[restore_by_name] shape mismatch {key}: "
                      f"{cand.shape} vs {tval.shape}")
            stats["skipped"] += 1
            out[key] = tval
        else:
            raise ValueError(
                f"shape mismatch for {key}: {cand.shape} vs {tval.shape}"
            )
    return _unflatten(out), stats


def _try_class_slice(src: np.ndarray, dst: np.ndarray):
    """Slice src down to dst when they differ in exactly one axis and src is
    larger there (class-count change)."""
    if src.ndim != dst.ndim:
        return None
    diff = [i for i in range(src.ndim) if src.shape[i] != dst.shape[i]]
    if len(diff) != 1:
        return None
    ax = diff[0]
    if src.shape[ax] < dst.shape[ax]:
        return None
    sl = [slice(None)] * src.ndim
    sl[ax] = slice(0, dst.shape[ax])
    return src[tuple(sl)]


def infer_head_params(path: str) -> dict:
    """Recover head hyperparameters (POOL_SIZE, FPN_CLASSIF_FC_LAYERS_SIZE,
    HEAD_CONV_CHANNEL, NUM_CLASSES, TOP_DOWN_PYRAMID_SIZE) from a checkpoint's
    kernel shapes — the reference's H5 introspection that auto-adapts a config
    to whatever head widths a checkpoint was trained with
    (core/models.py:5144-5203, applied at build time 5496-5502).

    Works on both reference .h5 files and m3d msgpack trees."""
    if path.endswith((".h5", ".hdf5")):
        from m3d.utils.h5_import import infer_head_params_from_h5

        return infer_head_params_from_h5(path)
    tree, _ = load_params(path)
    flat = _flatten(tree)
    found: dict = {}
    for key, val in flat.items():
        val = np.asarray(val)
        if key.endswith("mrcnn_class_conv1/kernel") and val.ndim == 5:
            found["POOL_SIZE"] = int(val.shape[0])
            found["FPN_CLASSIF_FC_LAYERS_SIZE"] = int(val.shape[-1])
            found["TOP_DOWN_PYRAMID_SIZE"] = int(val.shape[-2])
        elif key.endswith("mrcnn_mask_conv1/kernel") and val.ndim == 5:
            found["HEAD_CONV_CHANNEL"] = int(val.shape[-1])
        elif key.endswith("mrcnn_class_logits/kernel") and val.ndim == 2:
            found["NUM_CLASSES"] = int(val.shape[-1])
    return found


def autoconfigure_heads(config, paths, verbose: bool = True):
    """Override config head hyperparameters from the first checkpoint that
    declares them. Returns the set of overridden keys."""
    overridden = set()
    for path in paths:
        if not path or not os.path.exists(path):
            continue
        try:
            found = infer_head_params(path)
        except Exception as e:  # noqa: BLE001 — introspection is best-effort
            if verbose:
                print(f"[autoconfigure_heads] {path}: {e}")
            continue
        for key, val in found.items():
            if key in overridden:
                continue
            cur = getattr(config, key, None)
            if cur is not None and int(cur) != val:
                if verbose:
                    print(f"[autoconfigure_heads] {key}: config {cur} -> "
                          f"checkpoint {val} ({os.path.basename(path)})")
                setattr(config, key, val)
            overridden.add(key)
    return overridden


class BestAndLatest:
    """Per-epoch latest + metric-gated best checkpoints, with head-only
    exports (reference: core/models.py:1974-2093)."""

    def __init__(self, save_dir: str, mode: str = "min",
                 head_prefixes=("mrcnn_",)):
        self.save_dir = save_dir
        self.mode = mode
        self.best_metric = np.inf if mode == "min" else -np.inf
        self.head_prefixes = head_prefixes
        os.makedirs(save_dir, exist_ok=True)

    def update(self, epoch: int, params, metric: float,
               metadata: dict | None = None) -> bool:
        md = dict(metadata or {})
        md.update({"epoch": int(epoch), "metric": float(metric)})
        save_params(os.path.join(self.save_dir, "latest.msgpack"), params, md)
        save_params(
            os.path.join(self.save_dir, "latest_head.msgpack"),
            extract_subtree(params, self.head_prefixes), md,
        )
        improved = (
            metric < self.best_metric
            if self.mode == "min"
            else metric > self.best_metric
        )
        if improved:
            self.best_metric = metric
            save_params(os.path.join(self.save_dir, "best.msgpack"), params, md)
            save_params(
                os.path.join(self.save_dir, "best_head.msgpack"),
                extract_subtree(params, self.head_prefixes), md,
            )
        return improved
