"""Serving export: self-contained AOT-compiled inference bundles.

The reference has no deployment story — inference means importing the whole
framework, rebuilding the Keras graph, and loading H5 weights in-process
(/root/reference/core/models.py:6338-6420). For production serving we
instead serialize the traced inference computation itself: ``jax.export``
lowers the jitted graph to versioned StableHLO with multi-platform lowering,
so a serving host needs only jax + this bundle — no model-building code, no
config plumbing, no trace step — and compile-at-load is a single XLA
compile of a frozen artifact.

A bundle is a directory:

    graph.jaxexport   serialized jax.export artifact (StableHLO + vjp-less
                      calling convention; weights stay ARGUMENTS so the
                      graph is small and weights swap without re-export)
    weights.msgpack   trained parameters (m3d checkpoint format,
                      m3d/train/checkpoints.py)
    manifest.json     config snapshot + input shapes + chunk sizes +
                      platforms + jax version

Platform note: the export is traced on the HOST backend, so trace-time
backend dispatch (m3d/ops/roialign3d.py:pyramid_roi_align_auto) picks the
portable XLA gather formulation when exporting from a CPU host — correct on
every platform; exporting ON a TPU host additionally bakes the Pallas VMEM
ROIAlign kernel for the mask stage.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

__all__ = ["export_bundle", "ServingBundle"]


def _inference_fn(config, batch: int, monolithic_default: bool = False):
    """Build (infer, chunks): infer(variables, image, image_meta) -> dict.

    ``monolithic_default``: suppress the adaptive-chunk auto defaults (used
    for data-parallel exports — the compacted stages sort ROIs across the
    whole batch, which would all-gather the feature pyramid across shards;
    the per-image monolithic graph shards cleanly). Explicit
    CLASSIFIER_CHUNK / MASK_CHUNK config keys still win.
    """
    from m3d.anchors import normalized_pyramid_anchors
    from m3d.models.inference import adaptive_inference, chunks_from_config
    from m3d.models.mask_rcnn import MaskRCNN

    model = MaskRCNN.from_config(config, mode="inference")
    anchors = normalized_pyramid_anchors(config)
    cls_chunk, mask_chunk = chunks_from_config(config, model)
    if monolithic_default:
        cls_chunk = (int(getattr(config, "CLASSIFIER_CHUNK", 0) or 0)
                     or None)
        mask_chunk = int(getattr(config, "MASK_CHUNK", 0) or 0) or None

    def infer(variables, image, image_meta):
        return adaptive_inference(
            model, variables, image, image_meta, anchors,
            classifier_chunk=cls_chunk, mask_chunk=mask_chunk,
        )

    return infer, (cls_chunk, mask_chunk)


def export_bundle(config, variables, out_dir: str, batch: int = 1,
                  platforms=("cpu", "tpu"),
                  data_parallel: int | None = None) -> dict[str, Any]:
    """Export an AOT serving bundle for the given config + trained params.

    Returns the manifest dict. ``variables`` is the full inference variable
    collection (as produced by init_params + restore_by_name).

    ``data_parallel``: export the graph SHARDED over an n-device mesh —
    the batch axis of inputs/outputs is partitioned over the mesh's
    ``data`` axis and weights are replicated, exactly the serving-side
    analog of the training mesh (m3d/parallel/mesh.py). The exported
    artifact records the device count; loading requires >= n local
    devices. ``batch`` must divide by n.
    """
    import jax
    from jax import export as jax_export
    from jax.sharding import NamedSharding, PartitionSpec as P

    from m3d.train.checkpoints import save_params

    infer, (cls_chunk, mask_chunk) = _inference_fn(
        config, batch,
        monolithic_default=bool(data_parallel and int(data_parallel) > 1))

    H, W, D, C = (int(v) for v in config.IMAGE_SHAPE)
    img_sds = jax.ShapeDtypeStruct((batch, H, W, D, C), np.float32)
    meta_sds = jax.ShapeDtypeStruct(
        (batch, int(config.IMAGE_META_SIZE)), np.float32)
    var_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        variables)

    if data_parallel and int(data_parallel) > 1:
        n = int(data_parallel)
        if batch % n:
            raise ValueError(f"batch {batch} not divisible by "
                             f"data_parallel {n}")
        if len(jax.devices()) < n:
            raise ValueError(f"data_parallel={n} needs {n} local devices "
                             f"to trace the sharded export, "
                             f"have {len(jax.devices())}")
        from m3d.parallel.mesh import make_mesh

        mesh = make_mesh(devices=jax.devices()[:n])
        repl = NamedSharding(mesh, P())
        split = NamedSharding(mesh, P("data"))
        jitted = jax.jit(
            infer,
            in_shardings=(jax.tree.map(lambda _: repl, var_sds),
                          split, split),
            out_shardings=split,  # every output is batch-leading
        )
    else:
        n = 1
        jitted = jax.jit(infer)

    exported = jax_export.export(
        jitted, platforms=tuple(platforms)
    )(var_sds, img_sds, meta_sds)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "graph.jaxexport"), "wb") as f:
        f.write(exported.serialize())
    save_params(os.path.join(out_dir, "weights.msgpack"), variables,
                metadata={"kind": "serving"})
    manifest = {
        "format": "m3d-serving-bundle-v1",
        "config": config.to_dict(),
        "batch": batch,
        "image_shape": [H, W, D, C],
        "meta_size": int(config.IMAGE_META_SIZE),
        "platforms": list(platforms),
        "chunks": {"classifier": cls_chunk, "mask": mask_chunk},
        "data_parallel": n,
        "jax_version": jax.__version__,
        "output_keys": ["detections", "detections_valid", "mrcnn_masks",
                        "mrcnn_probs", "mrcnn_bbox", "proposals",
                        "proposals_valid"],
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingBundle:
    """Loaded serving bundle: ``predict(image[, image_meta])`` -> dict.

    The deserialized graph is called through ``exported.call`` — jax traces
    it as an opaque call and XLA compiles the embedded StableHLO for the
    local backend; weights are device-put once at load.
    """

    def __init__(self, exported, variables, manifest: dict):
        import jax

        self._exported = exported
        self.manifest = manifest
        n = int(manifest.get("data_parallel", 1))
        if n > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from m3d.parallel.mesh import make_mesh

            if len(jax.devices()) < n:
                raise ValueError(
                    f"bundle was exported data_parallel={n}; only "
                    f"{len(jax.devices())} local devices available")
            self._mesh = make_mesh(devices=jax.devices()[:n])
            self._split = NamedSharding(self._mesh, P("data"))
            variables = jax.device_put(
                variables, NamedSharding(self._mesh, P()))
        else:
            self._mesh = self._split = None
        self._variables = jax.device_put(variables)
        self._call = jax.jit(exported.call)

    @classmethod
    def load(cls, path: str) -> "ServingBundle":
        from jax import export as jax_export

        from m3d.train.checkpoints import load_params

        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest.get("format") != "m3d-serving-bundle-v1":
            raise ValueError(f"not a serving bundle: {path}")
        with open(os.path.join(path, "graph.jaxexport"), "rb") as f:
            exported = jax_export.deserialize(f.read())
        variables, _meta = load_params(os.path.join(path, "weights.msgpack"))
        return cls(exported, variables, manifest)

    def default_meta(self) -> np.ndarray:
        """Meta batch for unpadded volumes of the bundle's nominal shape."""
        from m3d.config import Config
        from m3d.image_meta import default_meta

        cfg = Config(**self.manifest["config"])
        return np.tile(default_meta(cfg)[None],
                       (int(self.manifest["batch"]), 1))

    def predict(self, image, image_meta=None) -> dict[str, np.ndarray]:
        image = np.asarray(image, np.float32)
        want = tuple(self.manifest["image_shape"])
        if tuple(image.shape[1:]) != want or \
                image.shape[0] != self.manifest["batch"]:
            raise ValueError(
                f"bundle expects [{self.manifest['batch']}, {want}] images, "
                f"got {image.shape} — exports are shape-frozen; re-export "
                f"for other shapes")
        if image_meta is None:
            image_meta = self.default_meta()
        image_meta = np.asarray(image_meta, np.float32)
        if self._split is not None:
            import jax

            image = jax.device_put(image, self._split)
            image_meta = jax.device_put(image_meta, self._split)
        out = self._call(self._variables, image, image_meta)
        return {k: np.asarray(v) for k, v in out.items()}
