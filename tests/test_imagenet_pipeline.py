"""ILSVRC-style XML dataset end-to-end through importer + pipeline
(BASELINE.json config #3, shrunk)."""

import dataclasses

import numpy as np
import pytest

from frcnn_tpu.config import imagenet_config
from frcnn_tpu.data.importers import create_imagenet_manifest
from frcnn_tpu.data.pipeline import BatchIterator

XML_TMPL = """<annotation>
  <folder>f</folder><filename>{name}</filename>
  <source><database>d</database></source>
  <size><width>{w}</width><height>{h}</height></size>
  {objects}
</annotation>
"""

OBJ_TMPL = """<object><name>{cls}</name>
  <bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin><xmax>{x1}</xmax><ymax>{y1}</ymax></bndbox>
</object>"""


def build_dataset(base, n=6, w=320, h=240):
    from PIL import Image

    rng = np.random.default_rng(0)
    anno = base / "Annotations/DET/train/sub"
    data = base / "Data/DET/train/sub"
    anno.mkdir(parents=True)
    data.mkdir(parents=True)
    (base / "Annotations/DET/val").mkdir(parents=True)
    classes = ["n001", "n002"]
    for i in range(n):
        img = np.full((h, w, 3), 40, np.uint8)
        objs = []
        for j in range(2):
            x0 = int(rng.integers(5, w - 120))
            y0 = int(rng.integers(5, h - 100))
            bw, bh = int(rng.integers(60, 110)), int(rng.integers(50, 90))
            img[y0 : y0 + bh, x0 : x0 + bw] = (200, 60 + 90 * j, 60)
            objs.append(OBJ_TMPL.format(
                cls=classes[j], x0=x0, y0=y0, x1=x0 + bw, y1=y0 + bh
            ))
        Image.fromarray(img).save(data / f"im{i}.JPEG")
        (anno / f"im{i}.xml").write_text(
            XML_TMPL.format(name=f"im{i}", w=w, h=h, objects="\n".join(objs))
        )
    return create_imagenet_manifest(
        "toy-ilsvrc", str(base),
        "Annotations/DET/train", "Annotations/DET/val",
        "Data/DET/train", "Data/DET/val",
    )


def test_imagenet_xml_to_batches(tmp_path):
    manifest = build_dataset(tmp_path)
    assert len(manifest["ground_truth"]) == 6
    assert len(manifest["class_names"]) == 2

    cfg = imagenet_config().replace(
        class_count=2,
        target_smaller_side=192,
        max_pixel_size=300,
        shapes=dataclasses.replace(
            imagenet_config().shapes, image_hw=(192, 256), images_per_step=2,
        ),
    )
    it = BatchIterator(cfg, manifest, seed=0)
    batch = it.next_training_batch()
    assert batch.image.shape == (2, 192, 256, 3)
    assert batch.gt_mask.any(axis=1).all()
    # two classes present across the gt
    classes = np.asarray(batch.gt_classes)[np.asarray(batch.gt_mask)]
    assert set(classes.tolist()) <= {0, 1}
    for b in range(2):
        h, wd = batch.true_hw[b]
        assert 128 <= h <= 192 and 128 <= wd <= 256
        for g in np.nonzero(batch.gt_mask[b])[0]:
            box = batch.gt_boxes[b, g]
            assert 0 <= box[0] < box[2] <= wd + 1e-3
            assert 0 <= box[1] < box[3] <= h + 1e-3
