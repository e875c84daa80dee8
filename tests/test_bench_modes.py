"""bench.py mode-string semantics: each mode must select the config the
metric name claims (the compiled paths themselves are covered by the
detector/serving e2e tests; this pins the cheap glue that decides WHAT the
driver-recorded BENCH numbers measure)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_default_duplo_mode_pins_north_star_bucket():
    cfg = bench.bench_config("bf16")
    assert cfg.shapes.image_hw == (450, 800)
    assert cfg.pallas_mode == "off"
    assert cfg.input_layout == "nhwc"
    assert cfg.model.layers[0].conv_steps == 1  # vgg_small


def test_headline_mode_enables_full_fast_stack():
    cfg = bench.bench_config("int8s+pallas+s2d")
    assert cfg.shapes.image_hw == (450, 800)
    assert cfg.pallas_mode == "on"
    assert cfg.input_layout == "s2d"


def test_large_mode_swaps_model_family():
    cfg = bench.bench_config("large+int8s+pallas+s2d")
    assert cfg.model.layers[0].conv_steps == 2  # vgg_large 2-conv block 0
    assert cfg.input_layout == "s2d"  # served by the fused 2-conv kernel
    assert cfg.shapes.image_hw == (450, 800)


def test_imagenet_mode_uses_reference_envelope():
    # reference config/imagenet.lua: vgg_large, 480 px smaller side
    cfg = bench.bench_config("imagenet+int8s+pallas+s2d")
    assert cfg.shapes.image_hw == (480, 1000)
    assert cfg.model.layers[0].conv_steps == 2
    assert cfg.class_count == 200
    assert cfg.pallas_mode == "on"
    assert cfg.input_layout == "s2d"
    # every compile bucket of the s2d frontend must be even-sized
    h, w = cfg.shapes.image_hw
    assert h % 2 == 0 and w % 2 == 0


def test_interpret_env_hook(monkeypatch):
    monkeypatch.setenv("FRCNN_BENCH_INTERPRET", "1")
    cfg = bench.bench_config("int8s+pallas+s2d")
    assert cfg.pallas_mode == "interpret"


def test_metric_names_match_mode():
    assert "@1000x480" in bench.metric_name("imagenet+int8s")
    assert "vgg_large/imagenet" in bench.metric_name("imagenet+int8s")
    assert "@800x450" in bench.metric_name("large+int8s")
    assert "vgg_large/duplo" in bench.metric_name("large+int8s")
    assert bench.metric_name("bf16").endswith("(vgg_small/duplo)")


def test_b0bf16_mode_disables_in_kernel_int8():
    cfg = bench.bench_config("large+int8s+pallas+s2d+b0bf16")
    assert cfg.s2d_block0_int8 is False
    assert bench.bench_config("large+int8s+pallas+s2d").s2d_block0_int8


def test_b0roll_mode_selects_roll_layout():
    cfg = bench.bench_config("large+int8s+pallas+s2d+b0roll")
    assert cfg.s2d_block0_layout == "roll"
    assert bench.bench_config("large+int8s+pallas+s2d").s2d_block0_layout == "zg"
