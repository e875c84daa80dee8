"""Dual compile buckets (landscape + portrait): routing, training, detect.

The reference keeps every resized image at its natural size
(``utilities.lua:188-203``) — portrait images come out taller than wide.
On TPU each distinct shape is its own XLA program, so the framework routes
images to one of (at most) two fixed buckets; these tests drive the whole
path at tiny scale: pipeline routing, per-bucket train steps, per-bucket
detect programs, orientation-homogeneous validation batches.
"""

import dataclasses

import numpy as np
import pytest

from frcnn_tpu.config import AugmentationConfig
from frcnn_tpu.data.importers import create_duplo_manifest
from frcnn_tpu.data.pipeline import BatchIterator
from tests.tiny import tiny_config

LAND = (128, 160)   # landscape bucket (tiny: target 128, cap 192)
PORT = (160, 128)   # portrait bucket


def make_mixed_dataset(tmp, n_each=8):
    """n_each landscape (200x160) + n_each portrait (160x200) images, one
    bright rectangle each; the portrait boxes sit near the BOTTOM edge
    (beyond the landscape bucket's 128-row crop)."""
    from PIL import Image

    rng = np.random.default_rng(5)
    rows = []
    classes = ["Red", "Green", "Blue"]
    colors = {"Red": (220, 40, 40), "Green": (40, 220, 40), "Blue": (40, 40, 220)}
    for i in range(2 * n_each):
        portrait = i >= n_each
        w, h = (160, 200) if portrait else (200, 160)
        img = np.full((h, w, 3), 30, np.uint8)
        ci = i % 3
        if portrait:
            x0 = int(rng.integers(5, w - 70))
            y0 = int(rng.integers(h - 60, h - 50))  # bottom edge
            bw, bh = 60, 45
        else:
            x0 = int(rng.integers(10, w - 90))
            y0 = int(rng.integers(10, h - 80))
            bw, bh = 64, 48
        img[y0:y0 + bh, x0:x0 + bw] = colors[classes[ci]]
        fn = f"mix{i:03d}.png"
        Image.fromarray(img).save(tmp / fn)
        rows.append(
            f'"{fn}", {x0}, {y0}, {x0 + bw}, {y0 + bh}, "{classes[ci]}", {ci}, "M", 0'
        )
    (tmp / "mix.csv").write_text("\n".join(rows))
    return create_duplo_manifest(
        "mixed", str(tmp / "mix.csv"), None, str(tmp / "mix.json"),
        validation_size=0.25,
    )


def dual_cfg(tmp):
    cfg = tiny_config().replace(
        target_smaller_side=128,
        max_pixel_size=192,
        examples_base_path=str(tmp),
        augmentation=AugmentationConfig(),
    )
    return cfg.replace(
        shapes=dataclasses.replace(cfg.shapes, portrait_hw=PORT)
    )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mixed")
    manifest = make_mixed_dataset(tmp)
    return tmp, manifest


@pytest.mark.parametrize("use_native", [False, True])
def test_bucket_routing_and_portrait_gt_survival(dataset, use_native):
    from frcnn_tpu.data import native

    if use_native and not native.available():
        pytest.skip("native host pipeline not built")
    tmp, _ = dataset
    cfg = dual_cfg(tmp)
    it = BatchIterator(cfg, str(tmp / "mix.json"), seed=1,
                       use_native=use_native)
    assert it.use_native == use_native
    seen = {}
    for _ in range(8):
        b = it.next_training_batch()
        seen[b.image.shape[1:3]] = b
    assert set(seen) == {LAND, PORT}, f"buckets seen: {set(seen)}"

    pb = seen[PORT]
    for i in range(pb.image.shape[0]):
        h, w = pb.true_hw[i]
        assert (h, w) == (160, 128)  # full portrait resize kept, no crop
        g = np.nonzero(pb.gt_mask[i])[0]
        assert len(g) == 1
        box = pb.gt_boxes[i, g[0]]
        # bottom-edge GT survives (it would be lost at a 128-row crop)
        assert box[3] > 128
        assert 0 <= box[0] < box[2] <= w + 1e-3
        assert 0 <= box[1] < box[3] <= h + 1e-3


def test_dual_bucket_training_steps(dataset):
    from frcnn_tpu.parallel.mesh import make_mesh
    from frcnn_tpu.train.trainer import Trainer

    tmp, _ = dataset
    cfg = dual_cfg(tmp)
    it = BatchIterator(cfg, str(tmp / "mix.json"), seed=2)
    tr = Trainer(cfg, mesh=make_mesh(n_devices=2))
    stepped = set()
    for _ in range(6):
        b = it.next_training_batch()
        m = tr.run_step(b)
        assert np.isfinite(m["loss"])
        stepped.add(b.image.shape[1:3])
        if stepped == {LAND, PORT}:
            break
    assert stepped == {LAND, PORT}
    assert set(tr._steps) == {LAND, PORT}


def test_dual_bucket_detector_and_validation(dataset):
    import jax

    from frcnn_tpu.detect.detector import Detector
    from frcnn_tpu.models.factory import init_params

    tmp, _ = dataset
    cfg = dual_cfg(tmp)
    it = BatchIterator(cfg, str(tmp / "mix.json"), seed=3)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    det = Detector(cfg, params, stats)

    shapes = set()
    for _ in range(4):
        imgs, hws, rois = it.padded_validation_batch(2)
        if imgs.shape[0] == 0:
            break
        # orientation-homogeneous batch
        assert imgs.shape[1:3] in (LAND, PORT)
        shapes.add(imgs.shape[1:3])
        out = det.detect(imgs, hws)
        D = cfg.shapes.max_detections
        assert out.boxes.shape == (imgs.shape[0], D, 4)
    assert shapes == {LAND, PORT}, f"validation buckets seen: {shapes}"


def test_rejects_unconfigured_bucket(dataset):
    import jax

    from frcnn_tpu.detect.detector import Detector
    from frcnn_tpu.models.factory import init_params

    tmp, _ = dataset
    cfg = dual_cfg(tmp)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    det = Detector(cfg, params, stats)
    bad = np.zeros((1, 96, 96, 3), np.float32)
    with pytest.raises(AssertionError):
        det.detect(bad, np.asarray([[96, 96]], np.int32))
