"""Dataset importers: CSV + XML -> manifest."""

import json
import os

import numpy as np
import pytest

from frcnn_tpu.data.importers import (
    create_duplo_manifest,
    create_imagenet_manifest,
    load_manifest,
    read_csv_rois,
    save_manifest,
)

CSV = """\
"img001.png", 10, 20, 110, 140, "Brick_2x2", 2, "Green", 11
"img002.png", 5, 5, 50, 60, "Brick_2x4", 3, "Red", 7
"img001.png", 30, 40, 90, 100, "Brick_2x4", 3, "Red", 7
"""


def test_read_csv_rois(tmp_path):
    p = tmp_path / "boxes.csv"
    p.write_text(CSV)
    gt, names, index = read_csv_rois(str(p))
    assert names == ["Brick_2x2", "Brick_2x4"]  # first-seen order
    assert index == {"Brick_2x2": 0, "Brick_2x4": 1}
    assert set(gt.keys()) == {"img001.png", "img002.png"}
    assert len(gt["img001.png"]["rois"]) == 2
    roi = gt["img001.png"]["rois"][0]
    assert roi["rect"] == [10, 20, 110, 140]
    assert roi["class_index"] == 0


def test_create_duplo_manifest_split(tmp_path):
    rows = []
    for i in range(10):
        rows.append(f'"img{i:03d}.png", 0, 0, 50, 50, "C{i % 3}", {i % 3}, "M", 0')
    (tmp_path / "boxes.csv").write_text("\n".join(rows))
    bg = tmp_path / "bg"
    bg.mkdir()
    (bg / "b1.jpg").write_bytes(b"x")
    (bg / "b2.jpg").write_bytes(b"x")
    out = str(tmp_path / "manifest.json")
    m = create_duplo_manifest("toy", str(tmp_path / "boxes.csv"), str(bg), out)
    # ceil(10 * 0.2) = 2 validation files
    assert len(m["validation_set"]) == 2
    assert len(m["training_set"]) == 8
    assert set(m["training_set"]) | set(m["validation_set"]) == set(
        m["ground_truth"].keys()
    )
    assert sorted(m["background_files"]) == ["b1.jpg", "b2.jpg"]
    m2 = load_manifest(out)
    assert m2 == json.loads(json.dumps(m))


XML = """<annotation>
  <folder>f</folder><filename>x</filename>
  <source><database>d</database></source>
  <size><width>320</width><height>240</height></size>
  <object><name>n02084071</name>
    <bndbox><xmin>10</xmin><ymin>12</ymin><xmax>100</xmax><ymax>99</ymax></bndbox>
  </object>
  <object><name>n02121808</name>
    <bndbox><xmin>50</xmin><ymin>60</ymin><xmax>70</xmax><ymax>90</ymax></bndbox>
  </object>
</annotation>
"""


def test_create_imagenet_manifest(tmp_path):
    base = tmp_path
    anno = base / "Annotations/DET/train/sub"
    anno.mkdir(parents=True)
    (anno / "a1.xml").write_text(XML)
    (base / "Annotations/DET/val").mkdir(parents=True)
    bgdir = base / "Data/DET/train/ILSVRC2013_train_extra0"
    bgdir.mkdir(parents=True)
    (bgdir / "b.JPEG").write_bytes(b"x")

    m = create_imagenet_manifest(
        "toy-det", str(base),
        "Annotations/DET/train", "Annotations/DET/val",
        "Data/DET/train", "Data/DET/val",
        background_dirs=["Data/DET/train/ILSVRC2013_train_extra0"],
    )
    assert len(m["class_names"]) == 2
    assert len(m["ground_truth"]) == 1
    key = next(iter(m["ground_truth"]))
    assert key.endswith("Data/DET/train/sub/a1.JPEG")
    rois = m["ground_truth"][key]["rois"]
    assert len(rois) == 2  # no debug early-exit (ref bug not replicated)
    assert rois[0]["rect"] == [10, 12, 100, 99]
    assert len(m["background_files"]) == 1


def test_config_json_artifacts_roundtrip():
    """configs/*.json ship the presets; from_json must reconstruct them."""
    import os

    from frcnn_tpu.config import Config, duplo_config, imagenet_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    with open(os.path.join(root, "duplo.json")) as f:
        c = Config.from_json(f.read())
    assert c == duplo_config()
    with open(os.path.join(root, "imagenet.json")) as f:
        c2 = Config.from_json(f.read())
    assert c2 == imagenet_config()
