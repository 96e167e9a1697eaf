"""Native C++ host library vs numpy oracles."""

import numpy as np
import pytest

from m3d import native
from m3d.data.rpn_targets import overlaps_3d_numpy
from m3d.ops.nms3d import nms_3d_numpy
from tests.test_boxes import random_boxes


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")


def test_iou_matrix_matches_numpy(rng):
    a = random_boxes(rng, 500)
    b = random_boxes(rng, 37)
    got = native.iou_matrix_3d(a, b)
    want = overlaps_3d_numpy(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nms_matches_numpy(rng):
    boxes = random_boxes(rng, 400)
    scores = rng.uniform(0, 1, 400).astype(np.float32)
    for thr in (0.3, 0.6):
        got = native.nms_3d_host(boxes, scores, thr, 128)
        want = nms_3d_numpy(boxes, scores, thr, 128)
        np.testing.assert_array_equal(got, want)


def test_tiff_roundtrip(tmp_path, rng):
    from m3d.utils.tiffio import imwrite_volume

    vol = rng.randint(0, 255, (5, 12, 9)).astype(np.uint8)
    path = str(tmp_path / "t.tiff")
    imwrite_volume(path, vol)
    got = native.read_tiff_volume(path)
    assert got is not None
    np.testing.assert_array_equal(got, vol)


def test_tiff_used_by_loader(tmp_path, rng):
    """tiffio.imread_volume prefers the native reader when available."""
    from m3d.utils import tiffio

    vol = rng.randint(0, 255, (3, 8, 8)).astype(np.uint8)
    path = str(tmp_path / "u.tiff")
    tiffio.imwrite_volume(path, vol)
    np.testing.assert_array_equal(tiffio.imread_volume(path), vol)
