"""Minimal multi-page TIFF volume IO (PIL/imageio backed).

The environment ships neither skimage nor tifffile; volumes are stored as
multi-page TIFFs with axis 0 as the page axis — byte-compatible with the
reference's skimage.io.imsave of 3-D arrays (generate_data.py:138-143).
"""

from __future__ import annotations

import numpy as np


def imwrite_volume(path: str, volume: np.ndarray) -> None:
    """Write a 3-D array as a multi-page TIFF (axis 0 = pages)."""
    from PIL import Image

    volume = np.asarray(volume)
    assert volume.ndim == 3, f"expected 3-D volume, got {volume.shape}"
    pages = [Image.fromarray(volume[i]) for i in range(volume.shape[0])]
    pages[0].save(path, save_all=True, append_images=pages[1:],
                  compression=None)


def imread_volume(path: str) -> np.ndarray:
    """Read a multi-page TIFF as a 3-D array (pages on axis 0).

    Uses the native C++ reader (m3d.native) when available — the dataset IO
    hot path — falling back to PIL for formats it doesn't cover.
    """
    try:
        from m3d import native

        arr = native.read_tiff_volume(path)
        if arr is not None:
            return arr
    except Exception:  # noqa: BLE001 — any native failure falls back to PIL
        pass
    from PIL import Image

    img = Image.open(path)
    frames = []
    try:
        i = 0
        while True:
            img.seek(i)
            frames.append(np.asarray(img))
            i += 1
    except EOFError:
        pass
    arr = np.stack(frames, axis=0)
    return arr[0] if arr.shape[0] == 1 and arr.ndim == 4 else arr
