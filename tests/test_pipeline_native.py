"""Native C++ batch pipeline vs the Python path: same batches."""

import dataclasses

import numpy as np
import pytest

from frcnn_tpu.config import AugmentationConfig
from frcnn_tpu.data import native
from frcnn_tpu.data.pipeline import BatchIterator
from tests.test_e2e_synthetic import make_dataset
from tests.tiny import tiny_config

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host pipeline not built"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("synth_native")
    make_dataset(tmp)
    return tmp


def _cfg(tmp):
    cfg = tiny_config()
    return cfg.replace(
        target_smaller_side=128,
        max_pixel_size=192,
        examples_base_path=str(tmp),
        augmentation=AugmentationConfig(),  # deterministic comparison
    )


def test_native_matches_python_batches(dataset):
    cfg = _cfg(dataset)
    it_py = BatchIterator(cfg, str(dataset / "manifest.json"), seed=7,
                          use_native=False)
    it_nat = BatchIterator(cfg, str(dataset / "manifest.json"), seed=7,
                           use_native=True)
    assert not it_py.use_native and it_nat.use_native

    for _ in range(2):
        a = it_py.next_training_batch()
        b = it_nat.next_training_batch()
        np.testing.assert_array_equal(np.asarray(a.true_hw), np.asarray(b.true_hw))
        np.testing.assert_array_equal(np.asarray(a.gt_mask), np.asarray(b.gt_mask))
        np.testing.assert_array_equal(
            np.asarray(a.gt_classes), np.asarray(b.gt_classes)
        )
        np.testing.assert_allclose(
            np.asarray(a.gt_boxes), np.asarray(b.gt_boxes), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(a.image), np.asarray(b.image), atol=3e-3
        )


def test_native_with_flips_valid_geometry(dataset):
    cfg = _cfg(dataset).replace(
        augmentation=AugmentationConfig(hflip=1.0, vflip=1.0)
    )
    it = BatchIterator(cfg, str(dataset / "manifest.json"), seed=8,
                       use_native=True)
    batch = it.next_training_batch()
    for b in range(cfg.shapes.images_per_step):
        h, w = batch.true_hw[b]
        g = np.nonzero(batch.gt_mask[b])[0]
        assert len(g) >= 1
        for gi in g:
            box = batch.gt_boxes[b, gi]
            assert 0 <= box[0] < box[2] <= w + 1e-3
            assert 0 <= box[1] < box[3] <= h + 1e-3
        # flipped bright-rect bbox still tracks the ROI
        img = np.asarray(batch.image[b][: int(h), : int(w)])
        lum = img.sum(-1)
        ys, xs = np.nonzero(lum > lum.mean() + lum.std())
        if len(xs) >= 50:
            px_box = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
            gt = batch.gt_boxes[b, g[0]]
            for a, c in zip(px_box, gt):
                assert abs(a - c) <= 4.0, (px_box, gt)
