"""m3d — a TPU-native 3D Mask R-CNN framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of the reference 3D Mask R-CNN
(volumetric instance segmentation for microscopy), designed TPU-first:

- fixed shapes everywhere: every ROI tensor is ``[N_fixed, ...]`` plus a
  validity mask — no dynamic partitions, no per-sample graph replication
- ``vmap`` over the batch axis replaces the reference's per-sample
  ``batch_slice`` trick (reference: core/utils.py:1459-1544)
- Pallas kernels for 3D NMS and 3D crop-and-resize (ROIAlign), replacing the
  reference's compiled C++/CUDA custom ops (reference: core/custom_op/)
- mesh data parallelism via ``jax.sharding`` replaces the reference's
  in-graph GPU towers (reference: core/parallel_model.py)

Box convention throughout: ``(y1, x1, z1, y2, x2, z2)``; normalized
coordinates divide by ``(H, W, D)`` with **no** ``-1`` shift
(reference: core/models.py:7574-7591).
"""

__version__ = "0.1.0"

from m3d.config import Config, load_config  # noqa: F401
