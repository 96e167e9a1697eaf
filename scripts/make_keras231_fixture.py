"""Generate a committed Keras-2.3.1-layout H5 fixture from a shape spec.

VERDICT r4 stretch item 7: the H5 *import* direction should be tested
against a file m3d's own code never touched. This writer is deliberately
independent of the m3d package — it reads a JSON inventory of layer
name -> shape (tests/fixtures/keras231_tiny.shapes.json) and emits the H5
exactly as Keras 2.3.1 ``model.save_weights`` would for the reference's
model builds (layout spec: /root/reference/core/models.py:1121-1413 layer
graph; save path 2074-2093; the TimeDistributed auto-naming and suffix
surgery the loader must survive: 4924-5061):

- top-level attrs ``layer_names`` (every layer, weightless included),
  ``keras_version`` = 2.3.1, ``backend`` = tensorflow;
- one group per layer, ``weight_names`` attr of b"<owner>/<leaf>:0";
- backbone/FPN/RPN layers own their weights under their group name;
- mrcnn_* layers are TimeDistributed-wrapped, so the group keeps the
  meaningful name while weight names use the wrapped layer's
  auto-generated name (conv3d_N / dense_N / batch_normalization_N);
- Conv3DTranspose kernels are stored (k,k,k,out,in) — swapped vs flax;
- BN leaves are gamma/beta/moving_mean/moving_variance.

All values are seeded-deterministic; a checksum manifest is written next
to the H5 so the import test can assert exact array identity without
re-running this script.

Usage: python scripts/make_keras231_fixture.py  (writes into tests/fixtures/)
"""

from __future__ import annotations

import json
import os

import h5py
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(HERE, "..", "tests", "fixtures")

WEIGHTLESS = ["input_image", "input_image_meta", "anchors",
              "pool_reshape", "mrcnn_class", "mrcnn_bbox",
              "roi_align_classifier", "roi_align_mask", "ROI"]
ORDER = ("kernel", "bias", "gamma", "beta", "moving_mean",
         "moving_variance")


def build_layers(shapes: dict) -> dict:
    """name -> {leaf: array} with Keras leaf naming, from the flax-side
    shape inventory ({"params": {path: shape}, "batch_stats": {...}})."""
    rng = np.random.RandomState(20260821)
    layers: dict[str, dict[str, np.ndarray]] = {}
    pflat = shapes["params"]
    for key, shape in sorted(pflat.items()):
        layer, leaf = key.split("/")[-2], key.split("/")[-1]
        val = rng.standard_normal(shape).astype(np.float32) * 0.05
        is_bn = leaf == "scale" or (
            leaf == "bias"
            and f"{key.rsplit('/', 1)[0]}/scale" in pflat)
        if leaf == "scale":
            leaf, val = "gamma", np.abs(val) + 0.5
        elif is_bn and leaf == "bias":
            leaf = "beta"
        elif leaf == "kernel" and "deconv" in layer:
            val = np.swapaxes(val, -1, -2)
        layers.setdefault(layer, {})[leaf] = val
    for key, shape in sorted(shapes["batch_stats"].items()):
        layer, leaf = key.split("/")[-2], key.split("/")[-1]
        name = {"mean": "moving_mean", "var": "moving_variance"}[leaf]
        val = rng.standard_normal(shape).astype(np.float32) * 0.1
        if name == "moving_variance":
            val = np.abs(val) + 0.25
        layers.setdefault(layer, {})[name] = val
    return layers


def write_h5(path: str, layers: dict) -> dict:
    counters = {"conv3d": 0, "dense": 0, "batch_normalization": 0}
    manifest = {}
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [np.bytes_(n) for n in
                                  sorted(layers) + WEIGHTLESS]
        f.attrs["backend"] = np.bytes_("tensorflow")
        f.attrs["keras_version"] = np.bytes_("2.3.1")
        for name in sorted(layers):
            g = f.create_group(name)
            inner = name
            if name.startswith("mrcnn_"):
                if "bn" in name:
                    kind = "batch_normalization"
                elif any(v.ndim == 2 for v in layers[name].values()):
                    kind = "dense"
                else:
                    kind = "conv3d"
                counters[kind] += 1
                inner = f"{kind}_{counters[kind]}"
            wnames = []
            for leaf in sorted(layers[name], key=ORDER.index):
                wn = f"{inner}/{leaf}:0"
                arr = layers[name][leaf]
                g.create_dataset(wn, data=arr)
                wnames.append(np.bytes_(wn))
                manifest[f"{name}/{leaf}"] = {
                    "shape": list(arr.shape),
                    "sum": float(arr.astype(np.float64).sum()),
                    "absmax": float(np.abs(arr).max()),
                }
            g.attrs["weight_names"] = wnames
        for name in WEIGHTLESS:
            g = f.create_group(name)
            g.attrs["weight_names"] = []
    return manifest


# Committed-fixture layer subset: every naming regime the loader must
# survive (stem conv, res/bn residual block, FPN lateral+output, RPN
# shared convs, TimeDistributed mrcnn_* conv/dense/BN/deconv) without the
# uncommittable bulk of the full resnet50 (192 MB of random weights).
SUBSET_PREFIXES = ("conv1", "bn_conv1", "res2a_", "bn2a_", "fpn_c2p2",
                   "fpn_p2", "rpn_", "mrcnn_")


def write_head_only_h5(path: str, layers: dict) -> dict:
    """The reference's head-only dump format: mrcnn_* groups copied under a
    'model_weights' root plus a head_meta group with pool/fc attrs
    (core/models.py:1990-2026)."""
    heads = {n: w for n, w in layers.items() if n.startswith("mrcnn_")}
    counters = {"conv3d": 0, "dense": 0, "batch_normalization": 0}
    manifest = {}
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")
        root.attrs["layer_names"] = [np.bytes_(n) for n in sorted(heads)]
        for name in sorted(heads):
            g = root.create_group(name)
            if "bn" in name:
                kind = "batch_normalization"
            elif any(v.ndim == 2 for v in heads[name].values()):
                kind = "dense"
            else:
                kind = "conv3d"
            counters[kind] += 1
            inner = f"{kind}_{counters[kind]}"
            wnames = []
            for leaf in sorted(heads[name], key=ORDER.index):
                wn = f"{inner}/{leaf}:0"
                arr = heads[name][leaf]
                g.create_dataset(wn, data=arr)
                wnames.append(np.bytes_(wn))
                manifest[f"{name}/{leaf}"] = {
                    "shape": list(arr.shape),
                    "sum": float(arr.astype(np.float64).sum()),
                    "absmax": float(np.abs(arr).max()),
                }
            g.attrs["weight_names"] = wnames
        meta = f.create_group("head_meta")
        k1 = layers["mrcnn_class_conv1"]["kernel"].shape
        k2 = layers["mrcnn_class_conv2"]["kernel"].shape
        meta.attrs["pool_kernel"] = np.asarray(k1[:3], dtype=np.int32)
        meta.attrs["fc_channels"] = np.asarray([k2[-1]], dtype=np.int32)
    return manifest


def main():
    shapes_path = os.path.join(FIXDIR, "keras231_tiny.shapes.json")
    with open(shapes_path) as f:
        shapes = json.load(f)
    subset = {
        coll: {k: v for k, v in shapes[coll].items()
               if k.split("/")[-2].startswith(SUBSET_PREFIXES)}
        for coll in shapes
    }
    layers = build_layers(subset)
    h5_path = os.path.join(FIXDIR, "keras231_tiny.h5")
    manifest = write_h5(h5_path, layers)
    with open(os.path.join(FIXDIR, "keras231_tiny.manifest.json"),
              "w") as f:
        json.dump(manifest, f, indent=0, sort_keys=True)
    print(f"wrote {h5_path}: {len(manifest)} weights, "
          f"{os.path.getsize(h5_path)/1e6:.1f} MB")

    ho_path = os.path.join(FIXDIR, "keras231_tiny_head.h5")
    ho_manifest = write_head_only_h5(ho_path, layers)
    with open(os.path.join(FIXDIR, "keras231_tiny_head.manifest.json"),
              "w") as f:
        json.dump(ho_manifest, f, indent=0, sort_keys=True)
    print(f"wrote {ho_path}: {len(ho_manifest)} weights, "
          f"{os.path.getsize(ho_path)/1e6:.1f} MB")


if __name__ == "__main__":
    main()
