"""Offline tooling: MRC IO, patch preprocessing, prediction visualization.

Covers the CLI twins of the reference notebooks (prepocess.ipynb /
prediction.ipynb) end-to-end on tiny synthetic volumes.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from m3d.utils.mrcio import read_mrc, write_mrc
from m3d.utils.tiffio import imread_volume, imwrite_volume

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("dtype", [np.int8, np.int16, np.float32, np.uint16])
def test_mrc_roundtrip(tmp_path, dtype):
    rng = np.random.RandomState(0)
    vol = (rng.rand(5, 8, 9) * 100).astype(dtype)
    path = str(tmp_path / "v.mrc")
    write_mrc(path, vol)
    back = read_mrc(path)
    assert back.shape == vol.shape
    np.testing.assert_array_equal(back, vol)


def test_preprocess_patches_end_to_end(tmp_path, monkeypatch):
    pp = _load("preprocess_patches")

    img_dir, msk_dir = tmp_path / "images", tmp_path / "masks"
    img_dir.mkdir()
    msk_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(3):
        img = (rng.rand(8, 32, 32) * 255).astype(np.uint8)
        seg = np.zeros((8, 32, 32), np.uint16)
        seg[2:6, 4:10, 4:10] = 1
        seg[2:6, 20:28, 20:28] = 2
        imwrite_volume(str(img_dir / f"v{i}.tiff"), img)
        write_mrc(str(msk_dir / f"v{i}.mrc"), seg)  # mixed formats on purpose

    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "preprocess_patches", "--images", str(img_dir), "--masks",
        str(msk_dir), "--out", str(out), "--patch", "8", "16", "16",
        "--stride", "4", "16", "16", "--test-ratio", "0.34",
    ])
    pp.main()

    for split in ("train", "test"):
        csv_path = out / "datasets" / f"{split}.csv"
        assert csv_path.exists()
        lines = csv_path.read_text().strip().split("\n")
        assert lines[0] == "names,images,segs,cabs,masks"
        assert len(lines) > 1
        # Spot-check one patch row end-to-end.
        row = dict(zip(lines[0].split(","), lines[1].split(",")))
        vol = imread_volume(row["images"])
        assert vol.shape == (8, 16, 16)
        assert os.path.exists(row["masks"])
        cab = open(row["cabs"]).read().strip()
        if cab:
            vals = cab.split("\n")[0].split()
            assert len(vals) == 7 and vals[0] == "1"


def test_visualize_prediction_metrics(tmp_path, monkeypatch):
    vz = _load("visualize_prediction")

    # Two GT instances; prediction hits one exactly, misses the other,
    # plus one spurious instance.
    gt = np.zeros((6, 16, 16), np.uint16)
    gt[1:4, 2:6, 2:6] = 1
    gt[1:4, 10:14, 10:14] = 2
    pred = np.zeros_like(gt)
    pred[1:4, 2:6, 2:6] = 7
    pred[4:6, 1:3, 1:3] = 9
    img = (gt > 0).astype(np.uint8) * 200 + 20

    tp, fp, fn = vz.match_instances(gt, pred, 0.5)
    assert (tp, fp, fn) == (1, 1, 1)

    prof = vz.slice_dice_profile(gt > 0, pred > 0)
    assert np.isnan(prof[0])
    assert prof[1] == pytest.approx(2 * 16 / (2 * 16 + 16), rel=1e-6)

    for name, vol in (("i", img), ("g", gt), ("p", pred)):
        imwrite_volume(str(tmp_path / f"{name}.tiff"), vol)
    outdir = tmp_path / "viz"
    monkeypatch.setattr(sys, "argv", [
        "visualize_prediction", "--image", str(tmp_path / "i.tiff"),
        "--gt", str(tmp_path / "g.tiff"), "--pred", str(tmp_path / "p.tiff"),
        "--out", str(outdir),
    ])
    vz.main()
    assert (outdir / "p_mosaic.png").exists()
    import json

    report = json.loads((outdir / "p_report.json").read_text())
    assert report["instance"]["tp"] == 1
    assert report["instance"]["fp"] == 1
    assert report["instance"]["fn"] == 1


def test_resolve_auto_confidence(tmp_path):
    """DETECTION_MIN_CONFIDENCE="auto" applies the last evaluation's
    recommended threshold (reference recommendation machinery,
    core/models.py:7144-7164); numeric values pass through; missing
    summaries fall back to the reference class default 0.2."""
    import json as _json

    from m3d.config import Config, resolve_auto_confidence

    # numeric passthrough
    cfg = Config(DETECTION_MIN_CONFIDENCE=0.4)
    assert resolve_auto_confidence(cfg) == pytest.approx(0.4)

    # auto + summary in OUTPUT_DIR
    out = tmp_path / "eval"
    out.mkdir()
    (out / "evaluation_summary.json").write_text(
        _json.dumps({"recommended_confidence": 0.57}))
    cfg = Config(DETECTION_MIN_CONFIDENCE="auto", OUTPUT_DIR=str(out))
    assert resolve_auto_confidence(cfg) == pytest.approx(0.57)
    assert float(cfg.DETECTION_MIN_CONFIDENCE) == pytest.approx(0.57)

    # auto + summary in the sibling eval/ of the same run family
    stage = tmp_path / "fam" / "head"
    stage.mkdir(parents=True)
    ev = tmp_path / "fam" / "eval"
    ev.mkdir()
    (ev / "evaluation_summary.json").write_text(
        _json.dumps({"recommended_confidence": 0.61}))
    cfg = Config(DETECTION_MIN_CONFIDENCE="auto", OUTPUT_DIR=str(stage))
    assert resolve_auto_confidence(cfg) == pytest.approx(0.61)

    # auto + nothing on disk -> reference default (isolated dir: the
    # sibling-eval lookup must not see summaries of other run families)
    bare = tmp_path / "bare" / "stage"
    bare.mkdir(parents=True)
    cfg = Config(DETECTION_MIN_CONFIDENCE="auto", OUTPUT_DIR=str(bare))
    assert resolve_auto_confidence(cfg) == pytest.approx(0.2)
