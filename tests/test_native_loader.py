"""Native C++ host pipeline vs the Python/PIL path."""

import numpy as np
import pytest

from frcnn_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host pipeline not built"
)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def _write_jpg(path, arr, quality=95):
    from PIL import Image

    Image.fromarray(arr).save(path, quality=quality)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    # add smooth structure so resampling differences show
    yy, xx = np.mgrid[0:96, 0:128]
    base[:, :, 0] = (127 + 120 * np.sin(xx / 9.0)).astype(np.uint8)
    base[:, :, 1] = (127 + 120 * np.cos(yy / 7.0)).astype(np.uint8)
    return base


def test_resample_matches_pil(img):
    from PIL import Image

    src = img.astype(np.float32) / 255.0
    for (dh, dw) in [(48, 64), (192, 256), (70, 100)]:
        got = native.resample(src, dh, dw)
        chans = [
            np.asarray(
                Image.fromarray(src[:, :, c], mode="F").resize(
                    (dw, dh), Image.BILINEAR
                )
            )
            for c in range(3)
        ]
        expect = np.stack(chans, axis=-1)
        np.testing.assert_allclose(got, expect, atol=2e-3, rtol=1e-3)


def test_load_process_png(tmp_path, img):
    p = str(tmp_path / "a.png")
    _write_png(p, img)
    out = native.load_process(
        p, (128, 160), target_smaller_side=96, max_pixel_size=160,
        color_space="rgb",
    )
    assert out is not None
    canvas, (h, w), (gh, gw) = out
    assert (gh, gw) == (96, 128)
    # 128x96 smaller side 96 -> same size 128x96
    assert (h, w) == (96, 128)
    np.testing.assert_allclose(
        canvas[:h, :w], img.astype(np.float32) / 255.0, atol=2e-3
    )
    assert np.all(canvas[h:] == 0) and np.all(canvas[:, w:] == 0)


def test_load_process_jpeg_and_yuv(tmp_path, img):
    from frcnn_tpu.ops.color import rgb2yuv

    p = str(tmp_path / "a.jpg")
    _write_jpg(p, img)
    out = native.load_process(
        p, (128, 160), 96, 160, color_space="yuv",
    )
    assert out is not None
    canvas, (h, w), _ = out
    from PIL import Image

    decoded = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    expect = rgb2yuv(decoded)
    np.testing.assert_allclose(canvas[:h, :w], expect, atol=5e-3)


def test_load_process_flips(tmp_path, img):
    p = str(tmp_path / "a.png")
    _write_png(p, img)
    plain, (h, w), _ = native.load_process(p, (128, 160), 96, 160)
    hf, _, _ = native.load_process(p, (128, 160), 96, 160, hflip=True)
    vf, _, _ = native.load_process(p, (128, 160), 96, 160, vflip=True)
    np.testing.assert_allclose(hf[:h, :w], plain[:h, :w][:, ::-1], atol=1e-6)
    np.testing.assert_allclose(vf[:h, :w], plain[:h, :w][::-1, :], atol=1e-6)


def test_batch_and_corrupt(tmp_path, img):
    good = str(tmp_path / "g.png")
    _write_png(good, img)
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"\x89PNGgarbage-not-an-image")
    missing = str(tmp_path / "missing.png")
    out = native.load_process_batch(
        [good, bad, missing, good], (128, 160), 96, 160, color_space="rgb",
        num_threads=2,
    )
    assert out is not None
    canvases, out_hw, status = out
    assert status[0] == 0 and status[3] == 0
    assert status[1] != 0 and status[2] != 0
    np.testing.assert_array_equal(out_hw[0], [96, 128, 96, 128])
    np.testing.assert_allclose(canvases[0], canvases[3])


def test_downscale_resampling_antialiases(tmp_path):
    """Checker pattern downscaled 4x must average toward gray (the triangle
    filter antialiases on downscale, like PIL; naive bilinear would alias)."""
    checker = np.indices((64, 64)).sum(0) % 2 * 255
    arr = np.stack([checker] * 3, -1).astype(np.uint8)
    p = str(tmp_path / "c.png")
    _write_png(p, arr)
    canvas, (h, w), _ = native.load_process(p, (64, 64), 16, 16)
    region = canvas[:h, :w]
    assert abs(float(region.mean()) - 0.5) < 0.02
    assert float(region.std()) < 0.2


def test_native_pack_s2d_matches_numpy():
    """csrc frcnn_pack_s2d_batch == the numpy packer (layout contract of
    ops/pallas_block0.py::pack_s2d)."""
    import numpy as np
    from frcnn_tpu.data import native
    from frcnn_tpu.ops.pallas_block0 import pack_s2d_np

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (3, 20, 28, 3)).astype(np.float32)
    got = native.pack_s2d_batch(x)
    want_l, want_c = pack_s2d_np(x)
    np.testing.assert_array_equal(got[0], want_l)
    np.testing.assert_array_equal(got[1], want_c)
