"""End-to-end on a synthetic drawn-rectangle dataset (SURVEY.md §4 tier 3):
import -> pipeline -> overfit a repeated batch -> losses drop; plus mAP
machinery sanity."""

import os

import numpy as np
import pytest

from frcnn_tpu.data.importers import create_duplo_manifest
from frcnn_tpu.data.pipeline import BatchIterator, find_target_size
from frcnn_tpu.detect.evaluation import compute_map
from tests.tiny import tiny_config


def make_dataset(tmp_path, n=10, w=200, h=160):
    """Images with one bright rectangle each + CSV."""
    from PIL import Image

    rng = np.random.default_rng(0)
    rows = []
    classes = ["Red", "Green", "Blue"]
    colors = {"Red": (220, 40, 40), "Green": (40, 220, 40), "Blue": (40, 40, 220)}
    for i in range(n):
        img = np.full((h, w, 3), 30, np.uint8)
        ci = i % 3
        x0 = int(rng.integers(10, w - 90))
        y0 = int(rng.integers(10, h - 80))
        bw = int(rng.integers(50, 80))
        bh = int(rng.integers(45, 70))
        img[y0 : y0 + bh, x0 : x0 + bw] = colors[classes[ci]]
        fn = f"img{i:03d}.png"
        Image.fromarray(img).save(tmp_path / fn)
        rows.append(
            f'"{fn}", {x0}, {y0}, {x0 + bw}, {y0 + bh}, "{classes[ci]}", {ci}, "M", 0'
        )
    (tmp_path / "boxes.csv").write_text("\n".join(rows))
    return create_duplo_manifest(
        "synthetic", str(tmp_path / "boxes.csv"), None,
        str(tmp_path / "manifest.json"),
    )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("synth")
    manifest = make_dataset(tmp)
    return tmp, manifest


def make_cfg(tmp):
    cfg = tiny_config()
    return cfg.replace(
        target_smaller_side=128,
        max_pixel_size=192,
        examples_base_path=str(tmp),
    )


def test_find_target_size():
    # 200x160 at smaller-side 128 capped 192 -> 160x128
    assert find_target_size(200, 160, 128, 192) == (160, 128)
    # cap kicks in: 1000x200 at 450/600 -> w capped to 600
    w, h = find_target_size(1000, 200, 450, 600)
    assert w == 600 and h == 120


def test_pipeline_batches(dataset):
    tmp, _ = dataset
    cfg = make_cfg(tmp)
    it = BatchIterator(cfg, str(tmp / "manifest.json"), seed=1)
    batch = it.next_training_batch()
    B = cfg.shapes.images_per_step
    H, W = cfg.shapes.image_hw
    assert batch.image.shape == (B, H, W, 3)
    assert batch.true_hw.shape == (B, 2)
    # all slots foreground (no background files)
    assert not batch.is_background.any()
    assert batch.gt_mask.any(axis=1).all()   # every image has a box
    # boxes live inside the true image area
    for b in range(B):
        h, w = batch.true_hw[b]
        for g in np.nonzero(batch.gt_mask[b])[0]:
            box = batch.gt_boxes[b, g]
            assert 0 <= box[0] < box[2] <= w + 1e-3
            assert 0 <= box[1] < box[3] <= h + 1e-3


def test_pipeline_flip_consistency(dataset):
    """With deterministic flips, GT rects track pixel content: the bright
    rectangle's pixel bbox must match the transformed ROI."""
    tmp, _ = dataset
    cfg = make_cfg(tmp).replace()
    it = BatchIterator(cfg, str(tmp / "manifest.json"), seed=3)
    batch = it.next_training_batch()
    for b in range(cfg.shapes.images_per_step):
        h, w = batch.true_hw[b]
        img = np.asarray(batch.image[b][:h, :w])
        lum = img.sum(-1)
        ys, xs = np.nonzero(lum > lum.mean() + lum.std())
        if len(xs) < 50:
            continue
        px_box = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        g = np.nonzero(batch.gt_mask[b])[0][0]
        gt = batch.gt_boxes[b, g]
        for a, c in zip(px_box, gt):
            assert abs(a - c) <= 4.0, (px_box, gt)


def test_validation_batch(dataset):
    tmp, _ = dataset
    cfg = make_cfg(tmp)
    it = BatchIterator(cfg, str(tmp / "manifest.json"), seed=2)
    items = it.next_validation(2)
    assert len(items) == 2
    for x in items:
        assert x["image"].ndim == 3
        assert len(x["rois"]) >= 1


def test_overfit_repeated_batch(dataset):
    """Loss on a single repeated batch must drop substantially."""
    import jax

    from frcnn_tpu.parallel.mesh import make_mesh
    from frcnn_tpu.train.trainer import Trainer

    tmp, _ = dataset
    cfg = make_cfg(tmp).replace(learning_rate=2e-3)
    it = BatchIterator(cfg, str(tmp / "manifest.json"), seed=4)
    batch = it.next_training_batch()
    tr = Trainer(cfg, mesh=make_mesh(n_devices=2))
    losses = [tr.run_step(batch)["pcls"] for _ in range(12)]
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert last < first * 0.7, losses


def test_compute_map_sanity():
    gt = [
        {"image": 0, "class": 0, "box": [0, 0, 10, 10]},
        {"image": 0, "class": 1, "box": [20, 20, 40, 40]},
        {"image": 1, "class": 0, "box": [5, 5, 15, 15]},
    ]
    perfect = [
        {"image": g["image"], "class": g["class"], "score": 0.9, "box": g["box"]}
        for g in gt
    ]
    r = compute_map(perfect, gt, num_classes=3)
    assert r["mAP"] == pytest.approx(1.0)
    # a false positive at higher score drags AP below 1
    noisy = perfect + [
        {"image": 1, "class": 0, "score": 0.95, "box": [100, 100, 120, 120]}
    ]
    r2 = compute_map(noisy, gt, num_classes=3)
    assert r2["mAP"] < 1.0
    # empty detections -> mAP 0
    assert compute_map([], gt, 3)["mAP"] == 0.0


def test_proposal_coverage_attribution():
    """proposal_coverage is class-agnostic GT coverage by any stage-1
    survivor: full coverage despite wrong classes, and a missed image
    counts against recall."""
    from frcnn_tpu.detect.evaluation import proposal_coverage

    gt = [
        {"image": 0, "class": 0, "box": [0, 0, 10, 10]},
        {"image": 0, "class": 1, "box": [20, 20, 40, 40]},
        {"image": 1, "class": 0, "box": [5, 5, 15, 15]},
    ]
    props = {
        0: [[1, 0, 10, 10], [19, 21, 41, 39]],  # both IoU > 0.5
        1: [[50, 50, 60, 60]],                  # misses its GT
    }
    r = proposal_coverage(props, gt)
    assert r["num_covered"] == 2
    assert r["proposal_recall"] == pytest.approx(2 / 3)
    # image with no proposals at all
    assert proposal_coverage({}, gt)["proposal_recall"] == 0.0
    assert np.isnan(proposal_coverage({}, [])["proposal_recall"])


def test_empty_validation_set_yields_empty_batch(tmp_path):
    """An empty (or fully unreadable) validation set must yield a 0-batch,
    not crash (demo/evaluate entry path)."""
    make_dataset(tmp_path)
    from frcnn_tpu.data.importers import create_duplo_manifest

    create_duplo_manifest("synthetic", str(tmp_path / "boxes.csv"), None,
                          str(tmp_path / "m0.json"), validation_size=0.0)
    cfg = make_cfg(tmp_path)
    it = BatchIterator(cfg, str(tmp_path / "m0.json"), seed=1)
    assert it.next_validation(3) == []
    imgs, hws, rois = it.padded_validation_batch(3)
    H, W = cfg.shapes.image_hw
    assert imgs.shape == (0, H, W, 3)
    assert hws.shape == (0, 2)
    assert rois == []


def test_multihost_input_sharding_disjoint_coverage(dataset):
    """num_shards > 1: each process's training stream draws from a disjoint
    stride of the training list, and the shards jointly cover it."""
    tmp, manifest = dataset
    cfg = make_cfg(tmp)
    full = set(manifest["training_set"])
    seen = []
    for shard in range(2):
        it = BatchIterator(cfg, str(tmp / "manifest.json"), seed=1,
                           shard_index=shard, num_shards=2)
        names = set(it.training.items)
        assert names == set(manifest["training_set"][shard::2])
        # the shard stream only ever serves its own files
        served = {it.training.next() for _ in range(3 * len(names))}
        assert served == names
        seen.append(names)
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == full


def test_pipeline_wide_image_keeps_right_edge_gt(tmp_path):
    """A 2.2:1 landscape image resizes to 990x450 (smaller side 450, width
    capped at 1000, utilities.lua:188-203). The duplo bucket is the full
    450x1000 envelope, so GT near the right edge (x > 800) must survive the
    pipeline — round-1 buckets cropped it away."""
    import dataclasses

    from PIL import Image

    from frcnn_tpu.config import AugmentationConfig, duplo_config
    from frcnn_tpu.data import native
    from frcnn_tpu.data.importers import create_duplo_manifest

    w, h = 1408, 640  # 2.2:1
    img = np.full((h, w, 3), 25, np.uint8)
    img[100:300, 1300:1400] = (230, 40, 40)
    Image.fromarray(img).save(tmp_path / "wide.png")
    (tmp_path / "wide.csv").write_text(
        '"wide.png", 1300, 100, 1400, 300, "Red", 0, "M", 0'
    )
    create_duplo_manifest("wide", str(tmp_path / "wide.csv"), None,
                          str(tmp_path / "wide.json"), validation_size=0.0)

    cfg = duplo_config(
        examples_base_path=str(tmp_path),
        augmentation=AugmentationConfig(),
        color_space="rgb",
    )
    cfg = cfg.replace(
        shapes=dataclasses.replace(cfg.shapes, images_per_step=1, max_gt=4)
    )
    sx = 990.0 / w  # find_target_size(1408, 640, 450, 1000) -> (990, 450)
    paths = [False] + ([True] if native.available() else [])
    for use_native in paths:
        it = BatchIterator(cfg, str(tmp_path / "wide.json"), seed=1,
                           use_native=use_native)
        batch = it.next_training_batch()
        assert tuple(batch.true_hw[0]) == (450, 990)
        g = np.nonzero(batch.gt_mask[0])[0]
        assert len(g) == 1, f"right-edge GT lost (native={use_native})"
        box = batch.gt_boxes[0, g[0]]
        np.testing.assert_allclose(
            box, [1300 * sx, 100 * sx, 1400 * sx, 300 * sx], atol=1.0
        )
        assert box[2] > 900  # genuinely beyond the old 800px bucket


def test_pipeline_taller_than_bucket(dataset):
    """Portrait-ish content taller than the compile bucket is clamped with
    ROIs kept consistent (the reference would random-crop; we top-left
    crop at the bucket boundary — PARITY.md divergence 1)."""
    import dataclasses

    from PIL import Image

    tmp, _ = dataset
    # tall image 160x240 (w x h): smaller side 160 -> target w=128, h=192
    # exceeds the 128-tall bucket -> clamped to 128
    rng = np.random.default_rng(9)
    img = np.full((240, 160, 3), 25, np.uint8)
    img[30:110, 40:120] = (230, 40, 40)
    Image.fromarray(img).save(tmp / "tall.png")
    rows = ['"tall.png", 40, 30, 120, 110, "Red", 0, "M", 0']
    (tmp / "tall.csv").write_text("\n".join(rows))
    from frcnn_tpu.data.importers import create_duplo_manifest

    m = create_duplo_manifest("tall", str(tmp / "tall.csv"), None,
                              str(tmp / "tall.json"), validation_size=0.0)
    cfg = make_cfg(tmp)
    from frcnn_tpu.config import AugmentationConfig

    cfg = cfg.replace(augmentation=AugmentationConfig())
    batches = {}
    for use_native in (False, True):
        it = BatchIterator(cfg, str(tmp / "tall.json"), seed=1,
                           use_native=use_native)
        batch = it.next_training_batch()
        batches[use_native] = batch
        h, w = batch.true_hw[0]
        assert h <= cfg.shapes.image_hw[0] and w <= cfg.shapes.image_hw[1]
        g = np.nonzero(batch.gt_mask[0])[0]
        assert len(g) >= 1
        box = batch.gt_boxes[0, g[0]]
        assert 0 <= box[0] < box[2] <= w + 1e-3
        assert 0 <= box[1] < box[3] <= h + 1e-3
    # both paths must CROP at the bucket (not squash): same content + rois
    np.testing.assert_array_equal(
        np.asarray(batches[False].true_hw), np.asarray(batches[True].true_hw)
    )
    np.testing.assert_allclose(
        np.asarray(batches[False].gt_boxes), np.asarray(batches[True].gt_boxes),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(batches[False].image), np.asarray(batches[True].image),
        atol=5e-3,
    )
