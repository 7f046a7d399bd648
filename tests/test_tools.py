"""Offline tooling (SURVEY §2.9): behavioural tests on tiny synthetic data.

The reference ships these as untested manual scripts (utils/*.py + two
notebooks); here each one is exercised end to end: resize_images,
check_labels, compare_labels, visualize_labels, copy_split, clean_logs,
split_rgbt. (check_tpu needs the TPU; bench_input is a benchmark — both
excluded.)
"""
import os
import sys

import numpy as np
import pytest
from PIL import Image


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _run_main(module, argv):
    old = sys.argv
    sys.argv = [module.__name__] + argv
    try:
        return module.main()
    finally:
        sys.argv = old


def test_resize_images(tmp_path):
    from rgbx_semantic_segmentation_tpu.tools import resize_images

    root = tmp_path / "ds"
    rng = np.random.RandomState(0)
    _png(str(root / "RGB" / "a.png"),
         rng.randint(0, 255, (12, 16, 3), dtype=np.uint8))
    _png(str(root / "Thermal" / "a.png"),
         rng.randint(0, 255, (12, 16), dtype=np.uint8))
    _png(str(root / "Label" / "a.png"),
         rng.randint(0, 4, (12, 16)).astype(np.uint8))
    _run_main(resize_images, ["--input_dir", str(root), "--width", "8",
                              "--height", "6"])
    out = str(root) + "_resized"
    rgb = np.asarray(Image.open(os.path.join(out, "RGB", "a.png")))
    lab = np.asarray(Image.open(os.path.join(out, "Label", "a.png")))
    assert rgb.shape == (6, 8, 3)
    assert lab.shape == (6, 8)
    # Labels resize nearest: no new class ids invented by interpolation.
    assert set(np.unique(lab)) <= {0, 1, 2, 3}


def test_check_labels(tmp_path):
    from rgbx_semantic_segmentation_tpu.tools import check_labels

    d = tmp_path / "labels"
    _png(str(d / "ok.png"), np.zeros((4, 4), np.uint8))
    ignore = np.full((4, 4), 255, np.uint8)
    _png(str(d / "ign.png"), ignore)
    bad = np.full((4, 4), 7, np.uint8)
    _png(str(d / "bad.png"), bad)
    result = check_labels.check_labels(str(d), num_classes=4)
    assert [name for name, _ in result] == ["bad.png"]
    assert result[0][1] == [7]
    with pytest.raises(SystemExit) as e:
        _run_main(check_labels, ["--label_dir", str(d), "--num_classes", "4"])
    assert e.value.code == 1


def test_compare_labels(tmp_path):
    from rgbx_semantic_segmentation_tpu.tools import compare_labels

    root = tmp_path / "ds"
    img = np.full((8, 8, 3), 128, np.uint8)
    _png(str(root / "RGB" / "good.png"), img)
    _png(str(root / "Thermal" / "good.png"), img[..., 0])
    _png(str(root / "Label" / "good.png"), np.zeros((8, 8), np.uint8))
    assert compare_labels.compare(str(root)) == []

    # size mismatch
    _png(str(root / "RGB" / "mis.png"), img)
    _png(str(root / "Thermal" / "mis.png"), np.zeros((6, 8), np.uint8))
    _png(str(root / "Label" / "mis.png"), np.zeros((8, 8), np.uint8))
    issues = compare_labels.compare(str(root))
    assert [(n, k) for n, k, _ in issues] == [("mis.png", "size mismatch")]

    # missing modal pair
    _png(str(root / "RGB" / "lonely.png"), img)
    kinds = {n: k for n, k, _ in compare_labels.compare(str(root))}
    assert kinds["lonely.png"] == "missing pair"


def test_detect_border_padding():
    from rgbx_semantic_segmentation_tpu.tools.compare_labels import (
        detect_border_padding)

    arr = np.zeros((10, 12), np.uint8)
    arr[2:-3, 1:] = 100  # 2 zero rows top, 3 bottom, 1 zero col left
    assert detect_border_padding(arr) == (2, 3, 1, 0)


def test_visualize_labels(tmp_path):
    from rgbx_semantic_segmentation_tpu.tools import visualize_labels

    d = tmp_path / "labels"
    out = tmp_path / "viz"
    lab = np.zeros((6, 6), np.uint8)
    lab[3:] = 2
    _png(str(d / "x.png"), lab)
    _run_main(visualize_labels, ["--label_dir", str(d), "--out_dir", str(out),
                                 "--dataset_name", "mfnet"])
    img = np.asarray(Image.open(out / "x.png").convert("RGB"))
    assert img.shape == (6, 6, 3)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) == 2  # two classes


def test_copy_split(tmp_path):
    from rgbx_semantic_segmentation_tpu.tools import copy_split

    root = tmp_path / "ds"
    _png(str(root / "RGB" / "a.png"), np.zeros((4, 4, 3), np.uint8))
    _png(str(root / "RGB" / "b.png"), np.zeros((4, 4, 3), np.uint8))
    (root / "train.txt").write_text("a\nmissing\n")
    _run_main(copy_split, ["--dataset_dir", str(root), "--split", "train.txt",
                           "--src_folder", "RGB", "--dst_folder", "RGB_train"])
    assert sorted(os.listdir(root / "RGB_train")) == ["a.png"]


def test_clean_logs(tmp_path):
    from rgbx_semantic_segmentation_tpu.tools import clean_logs

    logs = tmp_path / "logs"
    (logs / "empty_run").mkdir(parents=True)
    (logs / "empty_run" / "events").write_bytes(b"x" * 10)
    (logs / "real_run").mkdir()
    (logs / "real_run" / "events").write_bytes(b"x" * 5000)
    _run_main(clean_logs, ["--log_dir", str(logs), "--dry_run"])
    assert (logs / "empty_run").exists()  # dry run removes nothing
    _run_main(clean_logs, ["--log_dir", str(logs)])
    assert not (logs / "empty_run").exists()
    assert (logs / "real_run").exists()


def test_split_rgbt(tmp_path):
    from rgbx_semantic_segmentation_tpu.tools import split_rgbt

    src = tmp_path / "fused"
    out = tmp_path / "out"
    rng = np.random.RandomState(1)
    rgbt = rng.randint(0, 255, (5, 7, 4), dtype=np.uint8)
    _png(str(src / "im.png"), rgbt)
    _run_main(split_rgbt, ["--input_dir", str(src), "--output_dir", str(out)])
    rgb = np.asarray(Image.open(out / "RGB" / "im.png"))
    th = np.asarray(Image.open(out / "Thermal" / "im.png"))
    np.testing.assert_array_equal(rgb, rgbt[..., :3])
    np.testing.assert_array_equal(th, rgbt[..., 3])


def test_fetch_mfnet_convert(tmp_path):
    """fetch_mfnet.convert: ir_seg_dataset-style source (4-ch RGBT images/,
    labels/, train/val/test splits) -> the RGB/Thermal/Label + train_val.txt
    layout the mfnet config trains on — then an RGBXDataset actually loads
    an item from the converted tree."""
    from rgbx_semantic_segmentation_tpu.tools import fetch_mfnet

    src = tmp_path / "ir_seg_dataset"
    out = tmp_path / "MFNet"
    rng = np.random.RandomState(2)
    names = ["00001D", "00002D", "00003N"]
    for n in names:
        _png(str(src / "images" / f"{n}.png"),
             rng.randint(0, 255, (10, 12, 4), dtype=np.uint8))
        _png(str(src / "labels" / f"{n}.png"),
             rng.randint(0, 9, (10, 12), dtype=np.uint8))
    (src / "train.txt").write_text(names[0] + "\n")
    (src / "val.txt").write_text(names[1] + "\n")
    (src / "test.txt").write_text(names[2] + "\n")

    summary = fetch_mfnet.convert(str(src), str(out))
    assert summary == {"images": 3, "labels": 3, "train_val": 2, "test": 1}
    assert (out / "train_val.txt").read_text().split() == names[:2]
    for folder in ("RGB", "Thermal", "Label"):
        assert sorted(os.listdir(out / folder)) == [f"{n}.png" for n in names]
    th = np.asarray(Image.open(out / "Thermal" / f"{names[0]}.png"))
    assert th.ndim == 2  # single-channel, matches x_is_single_channel=True

    from rgbx_semantic_segmentation_tpu.config import mfnet_config
    from rgbx_semantic_segmentation_tpu.data.dataset import RGBXDataset

    cfg = mfnet_config()
    ds = RGBXDataset(cfg.dataset, "val", root=str(out))
    item = ds[0]
    assert item["rgb"].shape == (10, 12, 3)
    assert item["label"].shape == (10, 12)


def test_fetch_mfnet_rejects_bad_source(tmp_path):
    from rgbx_semantic_segmentation_tpu.tools import fetch_mfnet

    with pytest.raises(SystemExit):
        fetch_mfnet.convert(str(tmp_path / "nope"), str(tmp_path / "out"))
