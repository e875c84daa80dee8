"""Experiment configuration.

Mirrors the three config axes of the reference (run flags / experiment config
/ model factory — see reference ``main.lua:18-47`` and ``config/*.lua``) as
frozen dataclasses, plus the static-shape knobs a fixed-shape TPU build needs
(the reference uses dynamic host-side lists everywhere; XLA requires fixed
shapes, so maximum counts + masks are first-class configuration here).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class NormalizationConfig:
    """Input normalization (reference ``config/duplo.lua:6``)."""

    method: str = "contrastive"  # 'contrastive' | 'none'
    width: int = 7               # gaussian kernel width for contrastive norm
    centering: bool = True       # per-channel mean subtraction
    scaling: bool = True         # per-channel std division


@dataclass(frozen=True)
class AugmentationConfig:
    """Data augmentation probabilities (reference ``config/duplo.lua:7``)."""

    vflip: float = 0.0
    hflip: float = 0.0
    random_scaling: float = 0.0
    aspect_jitter: float = 0.0


@dataclass(frozen=True)
class RoiPoolingConfig:
    """Adaptive max-pool output grid (reference ``config/duplo.lua:9``)."""

    kw: int = 6
    kh: int = 6


@dataclass(frozen=True)
class LayerSpec:
    """One conv block of the backbone: ``conv_steps`` conv+PReLU layers
    followed by a ceil-mode 2x2/2 max-pool (reference
    ``models/model_utilities.lua:17-25``, ``models/vgg_small.lua:5-10``)."""

    filters: int
    kW: int = 3
    kH: int = 3
    padW: int = 1
    padH: int = 1
    dropout: float = 0.0
    conv_steps: int = 1


@dataclass(frozen=True)
class AnchorNetSpec:
    """One anchor head: conv(kW x kW -> n) + PReLU + 1x1 conv -> 18 channels
    (3 aspects x (2 cls + 4 reg)); attaches to backbone block ``input``
    (1-based like the reference, ``models/vgg_small.lua:12-17``)."""

    kW: int
    n: int
    input: int


@dataclass(frozen=True)
class ClassLayerSpec:
    """One hidden layer of the classifier head
    (reference ``models/model_utilities.lua:76-92``)."""

    n: int
    dropout: float = 0.0
    batch_norm: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Declarative model architecture (reference model factory files)."""

    name: str = "vgg_small"
    layers: Tuple[LayerSpec, ...] = ()
    anchor_nets: Tuple[AnchorNetSpec, ...] = ()
    class_layers: Tuple[ClassLayerSpec, ...] = ()
    anchor_net_filters_cls: int = 256  # 'n' inside AnchorNetwork


def vgg_small_model() -> ModelConfig:
    """Reference ``models/vgg_small.lua:3-24``."""
    return ModelConfig(
        name="vgg_small",
        layers=(
            LayerSpec(filters=64, dropout=0.0, conv_steps=1),
            LayerSpec(filters=128, dropout=0.4, conv_steps=2),
            LayerSpec(filters=256, dropout=0.4, conv_steps=2),
            LayerSpec(filters=384, dropout=0.4, conv_steps=2),
        ),
        anchor_nets=(
            AnchorNetSpec(kW=3, n=256, input=3),
            AnchorNetSpec(kW=3, n=256, input=4),
            AnchorNetSpec(kW=5, n=256, input=4),
            AnchorNetSpec(kW=7, n=256, input=4),
        ),
        class_layers=(
            ClassLayerSpec(n=1024, dropout=0.5, batch_norm=True),
            ClassLayerSpec(n=512, dropout=0.5),
        ),
    )


def vgg_large_model() -> ModelConfig:
    """Reference ``models/vgg_large.lua:3-24``."""
    return ModelConfig(
        name="vgg_large",
        layers=(
            LayerSpec(filters=64, dropout=0.0, conv_steps=2),
            LayerSpec(filters=128, dropout=0.4, conv_steps=2),
            LayerSpec(filters=256, dropout=0.4, conv_steps=3),
            LayerSpec(filters=512, dropout=0.4, conv_steps=3),
        ),
        anchor_nets=(
            AnchorNetSpec(kW=3, n=256, input=3),
            AnchorNetSpec(kW=3, n=256, input=4),
            AnchorNetSpec(kW=5, n=256, input=4),
            AnchorNetSpec(kW=7, n=256, input=4),
        ),
        class_layers=(
            ClassLayerSpec(n=1024, dropout=0.5, batch_norm=True),
            ClassLayerSpec(n=512, dropout=0.5),
        ),
    )


@dataclass(frozen=True)
class StaticShapeConfig:
    """Fixed-shape envelope for XLA compilation.

    The reference keeps dynamic Lua lists of positives/negatives/proposals
    (``BatchIterator.lua:247``, ``Detector.lua:59``); on TPU every such list
    becomes a padded tensor with a validity mask. These are the pad sizes.
    """

    # Input image bucket after resize (H, W). Images are letterbox-padded
    # (bottom/right) to this size; the true (h, w) travels alongside.
    image_hw: Tuple[int, int] = (450, 800)
    # Optional second compile bucket for PORTRAIT images (H, W). The
    # reference resizes the smaller side to the target and caps the larger
    # side (utilities.lua:188-203), so portrait inputs come out taller than
    # wide; without this bucket they are cropped at image_hw. When set,
    # the pipeline routes each image to the bucket that fits it (one more
    # XLA program per consumer: train step / detect).
    portrait_hw: Tuple[int, int] | None = None
    # Images per train step (the reference instead accumulates images until
    # >= batch_size anchor examples are collected, main driver of its
    # variable step composition; we fix the image count and keep the loss
    # normalization by *real* example counts, preserving loss semantics).
    images_per_step: int = 8
    max_gt: int = 32            # ground-truth boxes per image
    max_positives: int = 96     # positive anchor examples per image
    max_negatives: int = 32     # random negative examples per image (>=16 used)
    max_nearby: int = 96        # nearby-aversion negatives per image
    # Detection-time caps
    max_proposals: int = 512    # proposals entering first NMS
    max_detections: int = 128   # survivors entering the classifier head

    @property
    def max_roi_examples(self) -> int:
        return self.max_positives + self.max_negatives + self.max_nearby

    def buckets(self):
        """All configured compile buckets, primary first."""
        out = [tuple(self.image_hw)]
        if self.portrait_hw is not None:
            out.append(tuple(self.portrait_hw))
        return out

    def bucket_for(self, h: int, w: int) -> Tuple[int, int]:
        """Smallest configured bucket that fits an (h, w) image; falls back
        to the primary bucket (caller crops) if none fits."""
        fitting = [b for b in self.buckets() if h <= b[0] and w <= b[1]]
        if fitting:
            return min(fitting, key=lambda b: b[0] * b[1])
        return tuple(self.image_hw)


@dataclass(frozen=True)
class Config:
    """Experiment config, superset of the reference's ``config/*.lua`` schema."""

    class_count: int = 16            # excluding background
    target_smaller_side: int = 450
    scales: Tuple[int, ...] = (32, 64, 128, 256)
    max_pixel_size: int = 1000
    normalization: NormalizationConfig = field(default_factory=NormalizationConfig)
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    color_space: str = "yuv"         # 'rgb' | 'yuv' | 'lab' | 'hsv'
    roi_pooling: RoiPoolingConfig = field(default_factory=RoiPoolingConfig)
    examples_base_path: str = ""
    background_base_path: str = ""
    batch_size: int = 256            # target anchor examples per step (advisory)
    positive_threshold: float = 0.5
    negative_threshold: float = 0.25
    best_match: bool = True
    nearby_aversion: bool = True

    model: ModelConfig = field(default_factory=vgg_small_model)
    shapes: StaticShapeConfig = field(default_factory=StaticShapeConfig)

    # Training schedule (reference main.lua:126-135; note: the reference's
    # lr halving writes `rmsprop_state.lr` while the optimizer reads
    # `learningRate`, so it silently runs at constant lr.  We implement the
    # *intended* halve-every-5k schedule; set lr_schedule='constant' for
    # bug-compatible behavior).
    learning_rate: float = 1e-4
    rms_decay: float = 0.9
    optimizer: str = "rmsprop"       # 'rmsprop' | 'sgd' | 'nag'
    lr_schedule: str = "halve5k"     # 'halve5k' | 'constant'
    total_steps: int = 50_000
    snapshot_interval: int = 1000
    plot_interval: int = 100
    seed: int = 0

    # Numerics: compute dtype of conv/matmul paths ('bfloat16' for speed on
    # MXU, 'float32' for strict parity testing). Params are always fp32.
    compute_dtype: str = "bfloat16"

    # Rematerialize the pnet forward during the backward pass
    # (jax.checkpoint): trades ~1/3 more conv FLOPs for dropping the
    # backbone activation footprint — lets images_per_step grow past HBM
    # limits on large buckets. Gradients are bit-identical.
    remat: bool = False

    # Wire format of the pipeline->device image transfer. False: float32
    # canvases already converted to ``color_space`` on the host. True:
    # uint8 RGB canvases; the device does /255 and rgb->yuv at the
    # objective/detector entry (ops/color.py::unwire_uint8) — 4x fewer
    # host->device bytes (PCIe on real pods; the measured train-step wall
    # on this box's remote-TPU tunnel was transfer-bound). rgb/yuv only
    # (lab/hsv are nonlinear in 8-bit RGB); quantization happens AFTER
    # the float resize, so the only divergence from the float path is
    # one 1/255 rounding per pixel.
    uint8_wire: bool = False

    # Pallas kernel usage in the detect path: 'off' (XLA formulations),
    # 'on' (Pallas ROI pool + NMS), 'interpret' (Pallas in interpreter
    # mode, for CPU testing of the kernel path).
    pallas_mode: str = "off"

    # Final-stage confidence gate: keep detections with
    # exp(class logprob) > detect_confidence (``Detector.lua:115`` hardcodes
    # 0.2). Configurable so the gate's recall sensitivity can be swept
    # (scripts/sweep_conf_gate.py); 0.2 is reference-parity.
    detect_confidence: float = 0.2

    # Stage-1 proposal gate: keep anchors with P(fg) > detect_fg_threshold
    # before the proposal NMS (``Detector.lua:54`` hardcodes 0.95).
    # Configurable so recall lost UPSTREAM of the final confidence gate can
    # be attributed/swept (docs/accuracy recall-attribution analysis);
    # 0.95 is reference-parity.
    detect_fg_threshold: float = 0.95

    # Serving input layout: 'nhwc' (images [B,H,W,3]) or 's2d' (host-packed
    # space-to-depth pair (lum4 [B,4,Hc,Wc], chroma [B,Hc,8,Wc]),
    # ops/pallas_block0.py::pack_s2d) — normalization runs on the planes
    # (phase-major luminance: zero relayouts) and the first conv block
    # executes as a fused Pallas s2d kernel: ops/pallas_block0.py for
    # 1-conv first blocks (vgg_small, 5.8 -> 1.5 ms/batch16),
    # ops/pallas_block0_2conv.py for 2-conv first blocks (vgg_large).
    # Requires pallas_mode on/interpret, layers[0].conv_steps in (1, 2)
    # and an even-sized bucket. Inference only; training always uses NHWC.
    input_layout: str = "nhwc"

    # With input_layout='s2d', a 2-conv first block (vgg_large) and an
    # int8 static-scale pnet (QuantizedPNetAdapter with calibrated
    # act_scales): run the fused kernel's conv1 on the int8 MXU (2x the
    # bf16 rate on v5e) using the adapter's block0_conv1 weight/activation
    # scales. False keeps conv1 bf16 in-kernel (the apples-to-apples
    # comparison point for measurements).
    s2d_block0_int8: bool = True

    # Int8 static-scale serving: quantize each block's activation in the
    # conv epilogue and run the 2x2 pool on int8 (exact reorder — monotone
    # round commutes with max; see models/quant.py::quant_pnet_apply).
    # Off by default until TPU-measured.
    quant_pool_s8: bool = False

    # Fused 2-conv block0 kernel layout: "zg" writes conv0 output straight
    # into the group-ordered conv1 stack (no per-row copies/rolls; the
    # default), "roll" keeps the original per-row tap-scratch assembly
    # (comparison point; TPU round 3: its f32 lane rolls dominated the
    # kernel). See ops/pallas_block0_2conv.py.
    s2d_block0_layout: str = "zg"

    @property
    def num_classes_with_bg(self) -> int:
        return self.class_count + 1

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        d["normalization"] = NormalizationConfig(**d["normalization"])
        d["augmentation"] = AugmentationConfig(**d["augmentation"])
        d["roi_pooling"] = RoiPoolingConfig(**d["roi_pooling"])
        m = d["model"]
        m["layers"] = tuple(LayerSpec(**x) for x in m["layers"])
        m["anchor_nets"] = tuple(AnchorNetSpec(**x) for x in m["anchor_nets"])
        m["class_layers"] = tuple(ClassLayerSpec(**x) for x in m["class_layers"])
        d["model"] = ModelConfig(**m)
        sh = dict(d["shapes"])
        sh["image_hw"] = tuple(sh["image_hw"])
        if sh.get("portrait_hw") is not None:
            sh["portrait_hw"] = tuple(sh["portrait_hw"])
        d["shapes"] = StaticShapeConfig(**sh)
        d["scales"] = tuple(d["scales"])
        return Config(**d)


def duplo_config(**overrides) -> Config:
    """Reference ``config/duplo.lua``: 16 classes, scales {32,64,128,256},
    450/1000 px, yuv, 6x6 ROI grid, thresholds 0.5/0.25.

    The compile bucket is the config's landscape resize envelope
    (``utilities.lua:188-203``: smaller side -> 450, larger side capped at
    1000), so wide images up to 1000 px keep their full width instead of
    being cropped. Portrait images (h up to 1000 at w 450) are still
    clamped at the bucket with a warning — see ``pipeline.py``. Workloads
    with a known tighter envelope (e.g. all-16:9 video frames) should
    override ``shapes.image_hw`` to (450, 800) for ~25% less conv compute.
    """
    cfg = Config(
        class_count=16,
        target_smaller_side=450,
        scales=(32, 64, 128, 256),
        max_pixel_size=1000,
        augmentation=AugmentationConfig(vflip=0.5, hflip=0.5),
        batch_size=256,
        positive_threshold=0.5,
        negative_threshold=0.25,
        model=vgg_small_model(),
        shapes=StaticShapeConfig(image_hw=(450, 1000)),
    )
    return cfg.replace(**overrides) if overrides else cfg


def imagenet_config(**overrides) -> Config:
    """Reference ``config/imagenet.lua``: 200 classes, scales {48,96,192,384},
    480 px, thresholds 0.6/0.25."""
    cfg = Config(
        class_count=200,
        target_smaller_side=480,
        scales=(48, 96, 192, 384),
        max_pixel_size=1000,
        augmentation=AugmentationConfig(vflip=0.0, hflip=0.25),
        batch_size=300,
        positive_threshold=0.6,
        negative_threshold=0.25,
        model=vgg_large_model(),
        # ImageNet DET photos come in both orientations; portrait images
        # (w -> 480, h up to 1000) get their own compile bucket
        shapes=StaticShapeConfig(image_hw=(480, 1000),
                                 portrait_hw=(1000, 480)),
    )
    return cfg.replace(**overrides) if overrides else cfg


def serving_config(base: Config = None, **overrides) -> Config:
    """The measured-fastest TPU serving configuration applied to ``base``
    (default: :func:`duplo_config`): Pallas kernels on (NMS + ROI pool +
    fused s2d block0), host-packed space-to-depth input layout. Pair with
    ``Detector(..., quantized=True, quant_calibration=batch)`` for the
    int8 static-scale backbone — the full stack measured 539 -> 887+
    img/s/chip on v5e (scripts/tpu_results.log); accuracy parity of every
    fast mode vs bf16: docs/accuracy/quant_parity_tiny2500.json.

    Inference only — training ignores ``input_layout`` and must keep
    ``pallas_mode`` off unless the kernels' VJPs are wanted.
    """
    cfg = base if base is not None else duplo_config()
    spec0 = cfg.model.layers[0]
    # EVERY compile bucket must be even-sized, not just the primary one:
    # a portrait bucket's program is built lazily on the first portrait
    # batch, and an odd bucket would only fail then, mid-serving
    s2d_ok = (
        spec0.conv_steps in (1, 2)
        and (spec0.kH, spec0.kW, spec0.padH, spec0.padW) == (3, 3, 1, 1)
        and all(h % 2 == 0 and w % 2 == 0
                for h, w in cfg.shapes.buckets())
    )
    # the fused s2d frontend covers 3x3/1/1 first blocks with one conv
    # (vgg_small, ops/pallas_block0.py) or two convs (vgg_large,
    # ops/pallas_block0_2conv.py); anything else gets the Pallas NMS/pool
    # kernels without the s2d input layout
    cfg = cfg.replace(pallas_mode="on",
                      input_layout="s2d" if s2d_ok else "nhwc",
                      # s8-pooled int8 chain: +8.2% e2e measured (1152.9 ->
                      # 1246.9 img/s, same-window A/B, docs/
                      # tpu_results_r05.log); exact vs the default order
                      quant_pool_s8=True)
    return cfg.replace(**overrides) if overrides else cfg


CONFIGS = {"duplo": duplo_config, "imagenet": imagenet_config}
