"""Batched jitted inference.

Replaces ``Detector:detect`` (``Detector.lua:17-141``). The reference's
dominant cost is a host loop reading device memory cell-by-cell over
4 layers x H x W x 3 aspects (``Detector.lua:39-66``); here the whole decode
is one dense device program, batched over images:

  1. pnet forward (eval mode),
  2. dense decode: softmax over the 2-class logits of every anchor cell,
     keep P(fg) > 0.95 (``Detector.lua:54``), decode boxes via
     ``anchorToInput`` (``Detector.lua:57``), require overlap with the image
     rect (``Detector.lua:58``) and the cell to exist in the true-size
     feature map,
  3. top-K by score -> proposal NMS at IoU 0.25 ordered by score
     (``Detector.lua:81-82``),
  4. ROI adaptive max-pool of survivors on the shared feature map; one cnet
     batch (``Detector.lua:92-101``),
  5. refine boxes by decoding the regression head against the proposal
     (``Detector.lua:107``), argmax class; keep non-background with
     exp(confidence) > 0.2 (``Detector.lua:115``),
  6. per-class NMS at IoU 0.1 scored by confidence (``Detector.lua:125-136``).

Outputs are fixed-shape padded arrays + validity mask. ``boxes`` is the
refined box r2; ``proposal_boxes`` the stage-1 box r (which is what the
reference's evaluation demo draws, ``main.lua:209``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from frcnn_tpu.config import Config
from frcnn_tpu.geometry import boxes as B
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.cnet import ClassificationNet
from frcnn_tpu.models.pnet import ProposalNet
from frcnn_tpu.ops.color import unwire_uint8
from frcnn_tpu.ops.nms import class_offset_boxes, nms
from frcnn_tpu.ops.normalization import normalize_image
from frcnn_tpu.ops.roi_pool import adaptive_max_pool, prepare_roi_rects

FG_THRESHOLD = 0.95       # P(fg) cutoff (Detector.lua:54)
PROPOSAL_NMS_IOU = 0.25   # Detector.lua:81
CONFIDENCE_THRESHOLD = 0.2  # exp(logprob) cutoff (Detector.lua:115); the
# per-config gate is Config.detect_confidence (this module constant is its
# reference-parity default)
CLASS_NMS_IOU = 0.1       # Detector.lua:133


def select_proposals(keep, score, k: int):
    """Pick up to ``k`` gate-passing anchors per image, exact top-k by score.

    The reference keeps ALL gated proposals (``Detector.lua:69-85``); here
    the count is fixed at ``k``. When at most ``k`` anchors pass the gate
    (every real scene), top-k keeps exactly the reference's set — only the
    order differs, and downstream NMS re-sorts by score anyway. On overflow
    the k best-scored passers win. Measured on TPU (round 2):
    ``lax.top_k`` 0.41 ms vs the O(A) mask-compaction scan 2.06 ms at
    A=26544, so top-k is unconditionally the fast path as well as the
    simpler one.

    Args: ``keep`` [B, A] bool, ``score`` [B, A] (log P(fg); finite > log
    0.95 wherever ``keep``). Returns (indices [B, k] int32, valid [B, k]).
    """
    masked = jnp.where(keep, score, -jnp.inf)
    top_s, idx = jax.lax.top_k(masked, k)
    return idx.astype(jnp.int32), top_s > -jnp.inf


class DetectionResult(NamedTuple):
    boxes: jnp.ndarray           # [B, D, 4] refined (r2)
    proposal_boxes: jnp.ndarray  # [B, D, 4] stage-1 proposals (r)
    classes: jnp.ndarray         # [B, D] int32, 0-based
    confidence: jnp.ndarray      # [B, D] probability (exp of log-softmax)
    fg_score: jnp.ndarray        # [B, D] stage-1 P(fg)
    valid: jnp.ndarray           # [B, D] bool
    # The FULL stage-1 NMS survivor set (independent of the classifier and
    # the confidence gate), for recall attribution: does a missed GT lack
    # proposal coverage (stage-1 problem) or did the classifier/conf gate
    # reject a covering proposal (stage-2 problem)? Costs [B, D, 5] extra
    # output bytes; detect/evaluation.py::proposal_coverage consumes it.
    proposals: jnp.ndarray       # [B, D, 4] all NMS survivors
    proposals_valid: jnp.ndarray  # [B, D] bool


def _cut_sum(*arrays):
    """Full-array f32 sum over every intermediate a profiling cut returns:
    forces materialization of the whole stage output (a sliced read would
    let XLA dead-code-eliminate most of the elementwise work), at the cost
    of one cheap HBM-bound reduce per array. Non-finite entries (e.g. the
    -inf padding in masked score rows) are zeroed so the checksum stays
    finite — the profiler feeds it back into the input as a loop carry."""
    tot = jnp.float32(0.0)
    for a in arrays:
        af = a.astype(jnp.float32)
        tot = tot + jnp.sum(jnp.where(jnp.isfinite(af), af, 0.0))
    return tot


def compute_s2d_block0(cfg: Config, pnet, pnet_params, lum4, chroma,
                       allow_quant_out: bool = True):
    """Fused Pallas block0 from a packed, normalized s2d input pair ->
    [B, H/2, W/2, F] first-block output (ops/pallas_block0.py layouts).

    With an s8-pooled int8s adapter (``pnet.pool_s8`` + calibrated
    ``block1_conv0`` scale) and ``allow_quant_out``, the kernel quantizes
    its output in-register and this returns an ``(int8 NHWC, scale)``
    tuple that block1's conv consumes directly — the inter-block bf16
    round-trip + standalone quantize pass never exists. Calibration passes
    ``allow_quant_out=False`` so scale recording always sees float
    activations.

    Factored out of ``build_detect_fn`` so static int8 calibration
    (:func:`calibrate_quantized_pnet`) records downstream activation scales
    from the SAME block0 producer the serving program uses. Round-3 parity
    bug: calibrating through the int8 qconv block0 while inference consumed
    the fused-kernel output cost -0.020 mAP at the photo scale
    (docs/accuracy/photo_12500_quant_parity.json; bisected to the
    int8-static x s2d combination in runs/acc_photo/quant_parity_bisect.json
    — s2d alone +0.0013, int8+pallas alone +0.0009 vs bf16).
    """
    from frcnn_tpu.models.factory import compute_dtype as _cdt
    from frcnn_tpu.ops.pallas_block0 import (
        block0_weights_jnp,
        fused_block0,
        views_from_s2d,
    )

    spec0 = cfg.model.layers[0]
    interpret = cfg.pallas_mode == "interpret"
    cdt = _cdt(cfg)
    p0 = pnet_params
    wt, bias = block0_weights_jnp(
        p0["block0_conv0"]["kernel"], p0["block0_conv0"]["bias"]
    )
    cviews, lviews = views_from_s2d(lum4, chroma, out_dtype=cdt)
    # s8-chain serving: quantize the block output in-kernel at block1's
    # calibrated input scale and hand the next conv the int8 directly
    out_scale = None
    if allow_quant_out and getattr(pnet, "pool_s8", False):
        out_scale = (getattr(pnet, "act_scales", None) or {}).get(
            "block1_conv0"
        )
    if spec0.conv_steps == 2:
        # vgg_large-style 2-conv first block: the fused 2-conv
        # kernel keeps BOTH full-resolution activations out of HBM
        from frcnn_tpu.ops.pallas_block0_2conv import (
            block0_2conv_weights_jnp,
            block0_2conv_weights_q_jnp,
            fused_block0_2conv,
        )

        # int8 conv1 inside the kernel when serving the int8s
        # path (QuantizedPNetAdapter with calibrated act scales):
        # same models/quant.py quantization, int8 MXU rate
        q1 = (getattr(pnet, "qparams", None) or {}).get("block0_conv1")
        s_y = (getattr(pnet, "act_scales", None) or {}).get("block0_conv1")
        quant_kw = {}
        if (q1 is not None and s_y is not None
                and getattr(cfg, "s2d_block0_int8", True)):
            w1t = block0_2conv_weights_q_jnp(q1["w_int8"])
            conv1_bias = q1["bias"]
            quant_kw = dict(w1_scales=q1["scale"], act_scale=s_y)
        else:
            w1t = block0_2conv_weights_jnp(
                p0["block0_conv1"]["kernel"].astype(jnp.float32)
            )
            conv1_bias = p0["block0_conv1"]["bias"]
        b0 = fused_block0_2conv(
            cviews, lviews, wt, bias,
            p0["block0_prelu0"]["slope"].reshape(()),
            w1t, conv1_bias,
            p0["block0_prelu1"]["slope"].reshape(()),
            interpret=interpret, compute_dtype=cdt,
            layout=getattr(cfg, "s2d_block0_layout", "zg"),
            out_scale=out_scale,
            **quant_kw,
        )
    else:
        b0 = fused_block0(
            cviews, lviews, wt, bias,
            p0["block0_prelu0"]["slope"].reshape(()),
            interpret=interpret, compute_dtype=cdt,
            out_scale=out_scale,
        )
    b0 = b0.transpose(0, 1, 3, 2)
    return (b0, out_scale) if out_scale is not None else b0


def calibrate_quantized_pnet(cfg: Config, pnet, params, calib_images):
    """Record static int8 activation scales through the cfg's OWN serving
    path, so the calibration distribution matches what inference feeds each
    conv. ``calib_images``: [N, H, W, 3] already-normalized images.

    - nhwc layout: the plain dynamic-forward recording
      (``models/quant.py::calibrate_pnet_scales``) — block0 runs int8 in
      both calibration and inference, consistent.
    - s2d layout: block0 at inference comes from the fused Pallas kernel
      and is SKIPPED in the quant forward, so calibration packs the batch,
      computes ``block0_out`` with the same kernel, and records downstream
      scales from that. For 2-conv first blocks, ``block0_conv1``'s scale
      (which the kernel uses to quantize its in-kernel conv1 input) is
      recorded from the conv0+PReLU activation computed in XLA — the same
      values the kernel sees modulo bf16 rounding. The kernel runs its
      bf16 conv1 during this calibration pass (scales don't exist yet);
      the int8-conv1 inference output differs only by quantization error,
      second-order for the downstream scales.
    """
    if getattr(cfg, "input_layout", "nhwc") != "s2d":
        pnet.calibrate(calib_images)
        return

    from frcnn_tpu.ops.pallas_block0 import pack_s2d_np

    calib = np.asarray(jax.device_get(calib_images), np.float32)
    lum4, chroma = pack_s2d_np(calib)
    b0 = jax.jit(
        lambda l, c: compute_s2d_block0(cfg, pnet, params["pnet"], l, c,
                                    allow_quant_out=False)
    )(jnp.asarray(lum4), jnp.asarray(chroma))
    extra = {}
    spec0 = cfg.model.layers[0]
    if spec0.conv_steps == 2:
        from frcnn_tpu.models.factory import compute_dtype as _cdt

        p0 = params["pnet"]
        cdt = _cdt(cfg)
        x = jnp.asarray(calib).astype(cdt)
        y = jax.lax.conv_general_dilated(
            x, p0["block0_conv0"]["kernel"].astype(cdt), (1, 1),
            [(spec0.padH, spec0.padH), (spec0.padW, spec0.padW)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p0["block0_conv0"]["bias"].astype(cdt)
        slope = p0["block0_prelu0"]["slope"].reshape(()).astype(cdt)
        y = jnp.where(y >= 0, y, slope * y)
        extra["block0_conv1"] = jnp.maximum(
            jnp.max(jnp.abs(y)).astype(jnp.float32) / 127.0, 1e-12
        )
    pnet.calibrate(calib_images, block0_out=b0, extra_scales=extra)


def build_detect_fn(cfg: Config, gen: AnchorGenerator,
                    pnet: ProposalNet, cnet: ClassificationNet,
                    normalize_inputs: bool = True,
                    stop_after: str | None = None):
    """Returns jittable ``detect(params, batch_stats, images, true_hw)``.

    ``images``: [B, H, W, 3] in the configured color space (padded bucket);
    ``true_hw``: [B, 2]. Set ``normalize_inputs=False`` if images are
    already normalized.

    ``stop_after`` (profiling only): one of ``fwd | decode | select | nms |
    pool | cnet`` truncates the program after that stage and returns a
    scalar checksum of its outputs, so ``scripts/profile_detect.py
    tailparts`` can time cumulative prefixes of the REAL program —
    including relayouts/fusion boundaries that isolated stage benchmarks
    with synthetic inputs do not see.
    """
    s = cfg.shapes
    kh, kw = cfg.roi_pooling.kh, cfg.roi_pooling.kw
    # anchor tables permuted to the maps' native flat order (y, x, aspect)
    # so flattening needs no per-map relayout (see AnchorGenerator
    # .detect_order); host-side numpy, free at build time
    perm = gen.detect_order()
    anchor_boxes = jnp.asarray(gen.boxes[perm])
    fy_d, fx_d = gen.fy[perm], gen.fx[perm]
    K = s.max_proposals
    D = s.max_detections
    fm_loc = gen.fm_localizer
    bg = cfg.class_count
    conf_gate = getattr(cfg, "detect_confidence", CONFIDENCE_THRESHOLD)
    fg_gate = getattr(cfg, "detect_fg_threshold", FG_THRESHOLD)
    use_pallas = cfg.pallas_mode in ("on", "interpret")
    interpret = cfg.pallas_mode == "interpret"
    s2d = getattr(cfg, "input_layout", "nhwc") == "s2d"
    if s2d:
        spec0 = cfg.model.layers[0]
        assert use_pallas, "input_layout='s2d' needs pallas_mode on/interpret"
        assert spec0.conv_steps in (1, 2) and (
            spec0.kH, spec0.kW, spec0.padH, spec0.padW
        ) == (3, 3, 1, 1), (
            "fused s2d block0 covers 1- or 2-conv 3x3/1/1 first blocks"
        )
        # the gen's bucket (not cfg.shapes.image_hw) is what this program
        # compiles for — portrait buckets must be even-sized too
        assert gen.image_hw[0] % 2 == 0 and gen.image_hw[1] % 2 == 0

    def batched_nms(boxes_b, scores_b, valid_b, thr, max_out):
        if use_pallas:
            from frcnn_tpu.ops.pallas_nms import pallas_nms

            return pallas_nms(boxes_b, scores_b, valid_b, thr, max_out,
                              interpret=interpret)
        return jax.vmap(lambda b, sc, v: nms(b, sc, v, thr, max_out))(
            boxes_b, scores_b, valid_b
        )

    def batched_pool(fm_b, rects_b, valid_b):
        if use_pallas:
            # per-roi skip of padded NMS slots (zero cotangent-free fwd
            # analog: every consumer masks by prop_valid, so their pooled
            # rows are dead). Worst-case scenes (all D survivors valid,
            # the bench's stress mode) are unaffected; sparse real scenes
            # pool only what stage-1 NMS actually kept.
            from frcnn_tpu.ops.pallas_roi_pool import (
                pallas_adaptive_max_pool_valid,
            )

            return pallas_adaptive_max_pool_valid(
                fm_b, rects_b, valid_b, kh, kw, interpret
            )
        return jax.vmap(lambda f, r: adaptive_max_pool(f, r, kh, kw))(
            fm_b, rects_b
        )

    def detect(params, batch_stats, images, true_hw):
        """``images``: [B, H, W, 3] for the NHWC layout; for
        ``input_layout='s2d'`` the host-packed pair (lum4 [B,4,Hc,Wc],
        chroma [B,Hc,8,Wc]) — see ops/pallas_block0.py::pack_s2d."""
        norm_kw = dict(
            method=cfg.normalization.method,
            width=cfg.normalization.width,
            centering=cfg.normalization.centering,
            scaling=cfg.normalization.scaling,
        )
        if s2d:
            from frcnn_tpu.ops.normalization import normalize_s2d

            lum4, chroma = images
            if normalize_inputs:
                lum4, chroma = jax.vmap(
                    lambda l, ch, hw: normalize_s2d(l, ch, hw[0], hw[1],
                                                    **norm_kw)
                )(lum4, chroma, true_hw)
            b0 = compute_s2d_block0(cfg, pnet, params["pnet"], lum4, chroma)
            if stop_after == "b0":
                return _cut_sum(b0[0] if isinstance(b0, tuple) else b0)
            anchor_maps, fm = pnet.apply(
                {"params": params["pnet"]}, None, train=False, block0_out=b0
            )
        else:
            # uint8 wire format (Config.uint8_wire): /255 + host color
            # space on device; no-op for float32 inputs
            images = unwire_uint8(images, cfg.color_space)
            if normalize_inputs:
                images = jax.vmap(
                    lambda img, hw: normalize_image(img, hw[0], hw[1],
                                                    **norm_kw)
                )(images, true_hw)
            anchor_maps, fm = pnet.apply(
                {"params": params["pnet"]}, images, train=False
            )
        if stop_after == "fwd":
            return _cut_sum(*anchor_maps, fm)
        # transpose-free flatten: [B, Hi, Wi, 18] -> [B, Hi*Wi*3, 6] per
        # map; anchor tables above are permuted to this native order
        bsz = anchor_maps[0].shape[0]
        pred = jnp.concatenate(
            [m.reshape(bsz, -1, 6) for m in anchor_maps], axis=1
        ).astype(jnp.float32)  # [B, A, 6]

        h = true_hw[:, 0]
        w = true_hw[:, 1]
        logp = jax.nn.log_softmax(pred[..., 0:2], axis=-1)
        score = logp[..., 0]                      # log P(fg), the NMS score
        p_fg = jnp.exp(score)
        decoded = B.decode(anchor_boxes[None], pred[..., 2:6])  # [B, A, 4]
        img_rect = jnp.stack(
            [jnp.zeros_like(w, jnp.float32), jnp.zeros_like(w, jnp.float32),
             w.astype(jnp.float32), h.astype(jnp.float32)], axis=-1
        )  # [B, 4]
        keep = (
            (p_fg > fg_gate)
            & B.overlaps(decoded, img_rect[:, None, :])
            & jax.vmap(
                lambda th, tw: gen.fm_valid_mask(th, tw, fy=fy_d, fx=fx_d)
            )(h, w)
        )

        if stop_after == "decode":
            return _cut_sum(decoded, score, keep)
        top_idx, top_valid = select_proposals(keep, score, K)
        safe_top = jnp.maximum(top_idx, 0)
        top_boxes = jnp.take_along_axis(decoded, safe_top[:, :, None], axis=1)
        top_scores = jnp.where(
            top_valid, jnp.take_along_axis(score, safe_top, axis=1), -jnp.inf
        )

        if stop_after == "select":
            return _cut_sum(top_boxes, top_scores, top_idx)
        # Stage-1 NMS. The reference pools ALL NMS survivors
        # (Detector.lua:92-101); we cap at D = max_detections. NMS picks are
        # emitted in descending score order, so when more than D survive the
        # cap keeps exactly the top-D survivors by score — the same prefix
        # the reference's pick list starts with.
        nms_idx, prop_valid = batched_nms(
            top_boxes, top_scores, top_valid, PROPOSAL_NMS_IOU, D
        )
        cand = jnp.take_along_axis(top_idx, jnp.maximum(nms_idx, 0), axis=1)
        cand = jnp.maximum(cand, 0)
        prop_boxes = jnp.take_along_axis(decoded, cand[:, :, None], axis=1)
        prop_score = jnp.take_along_axis(p_fg, cand, axis=1)

        if stop_after == "nms":
            return _cut_sum(prop_boxes, prop_score, nms_idx, prop_valid)
        # ROI pool proposals on the true-size feature map
        fw, fh = fm_loc.feature_map_size_jax(w, h)          # [B], [B]
        fr = prepare_roi_rects(
            fm_loc.input_to_feature_rect_jax(prop_boxes),
            fw[:, None].astype(jnp.float32), fh[:, None].astype(jnp.float32),
        )
        pooled = batched_pool(fm, fr, prop_valid).reshape(fm.shape[0], D, -1)

        if stop_after == "pool":
            return _cut_sum(pooled)
        # one cnet batch over B x D candidates (eval: running stats)
        creg, clogp = cnet.apply(
            {"params": params["cnet"], "batch_stats": batch_stats["cnet"]},
            pooled, prop_valid, train=False,
        )
        if stop_after == "cnet":
            return _cut_sum(creg, clogp)

        refined = B.decode(prop_boxes, creg)        # r2 = anchorToInput(r, reg)
        cls = jnp.argmax(clogp, axis=-1)            # [B, D]
        conf = jnp.exp(jnp.max(clogp, axis=-1))
        accept = prop_valid & (cls != bg) & (conf > conf_gate)

        # per-class NMS via the coordinate-offset trick, batched
        shifted = class_offset_boxes(refined, cls, accept)
        fin_idx, f_valid = batched_nms(
            shifted, jnp.log(jnp.maximum(conf, 1e-20)), accept,
            CLASS_NMS_IOU, D,
        )
        f_src = jnp.maximum(fin_idx, 0)
        f_boxes = jnp.take_along_axis(refined, f_src[:, :, None], axis=1)
        f_cls = jnp.take_along_axis(cls, f_src, axis=1)
        f_conf = jnp.take_along_axis(conf, f_src, axis=1)
        f_prop = jnp.take_along_axis(prop_boxes, f_src[:, :, None], axis=1)
        f_fg = jnp.take_along_axis(prop_score, f_src, axis=1)

        # Padded output slots gather row 0 (f_src clamps -1 -> 0), whose
        # contents depend on the kernel implementation (the Pallas pool
        # zero-fills invalid rois, the XLA path pools garbage windows).
        # Zero every invalid row so the padded region is deterministic and
        # implementation-independent — parity tests may then compare whole
        # arrays. Costs a handful of fused selects on [B, D(,4)] tensors.
        vb = f_valid[:, :, None]
        return DetectionResult(
            boxes=jnp.where(vb, f_boxes, 0.0),
            proposal_boxes=jnp.where(vb, f_prop, 0.0),
            classes=jnp.where(f_valid, f_cls, 0).astype(jnp.int32),
            confidence=jnp.where(f_valid, f_conf, 0.0),
            fg_score=jnp.where(f_valid, f_fg, 0.0),
            valid=f_valid,
            proposals=jnp.where(prop_valid[:, :, None], prop_boxes, 0.0),
            proposals_valid=prop_valid,
        )

    return detect


class Detector:
    """Convenience wrapper holding jitted detect for a fixed config."""

    def __init__(self, cfg: Config, params, batch_stats, gen=None,
                 pnet=None, cnet=None, quantized: bool = False,
                 quant_calibration=None):
        """``quantized=True`` swaps the backbone for the int8 serving path
        (models/quant.py) — weights quantized once from the same params.
        ``quant_calibration``: optional [N, H, W, 3] normalized images; if
        given, static activation scales are calibrated from them (faster
        serving: no per-conv dynamic abs-max)."""
        from frcnn_tpu.models.factory import create_models

        self.cfg = cfg
        self.gen = gen or AnchorGenerator(cfg)
        if pnet is None or cnet is None:
            pnet, cnet = create_models(cfg)
        if quantized:
            from frcnn_tpu.models.factory import compute_dtype
            from frcnn_tpu.models.quant import (
                QuantizedPNetAdapter,
                quantize_pnet_params,
            )

            qparams = quantize_pnet_params(params, cfg.model)
            pnet = QuantizedPNetAdapter(
                cfg.model, qparams, act_dtype=compute_dtype(cfg),
                pool_s8=cfg.quant_pool_s8,
            )
            if quant_calibration is not None:
                calibrate_quantized_pnet(cfg, pnet, params, quant_calibration)
        self.pnet, self.cnet = pnet, cnet
        self.params = params
        self.batch_stats = batch_stats
        self._detect = jax.jit(build_detect_fn(cfg, self.gen, pnet, cnet))
        # one compiled program per compile bucket; the primary bucket's is
        # eager, a portrait bucket's (cfg.shapes.portrait_hw) builds lazily
        self._programs = {tuple(self.gen.image_hw): self._detect}

    def _program_for(self, image_hw):
        hw = tuple(int(x) for x in image_hw)
        if hw not in self._programs:
            assert hw in {tuple(b) for b in self.cfg.shapes.buckets()}, (
                f"image bucket {hw} not in configured buckets"
            )
            gen = AnchorGenerator(self.cfg, image_hw=hw)
            self._programs[hw] = jax.jit(
                build_detect_fn(self.cfg, gen, self.pnet, self.cnet)
            )
        return self._programs[hw]

    def detect(self, images, true_hw) -> DetectionResult:
        """``images``: [B, H, W, 3] NHWC. With ``cfg.input_layout='s2d'``
        the space-to-depth pack runs host-side (numpy) before the device
        transfer; callers may also pass an already-packed (lum4, chroma)
        pair directly."""
        if getattr(self.cfg, "input_layout", "nhwc") == "s2d":
            if isinstance(images, (tuple, list)):
                lum4, chroma = images
                hc, wc = chroma.shape[1], chroma.shape[3]
                hw = ((hc - 1) * 2, (wc - 1) * 2)
            else:
                from frcnn_tpu.data import native
                from frcnn_tpu.ops.pallas_block0 import pack_s2d_np

                hw = images.shape[1:3]
                # uint8 wire (Config.uint8_wire): the s2d pack wants
                # float canvases in the target color space — unwire
                # host-side (the pack itself is the device transfer)
                images = unwire_uint8(np.asarray(images),
                                      self.cfg.color_space)
                packed = native.pack_s2d_batch(images)
                lum4, chroma = (packed if packed is not None
                                else pack_s2d_np(images))
            fn = self._program_for(hw)
            return fn(self.params, self.batch_stats, (lum4, chroma), true_hw)
        fn = self._program_for(images.shape[1:3])
        return fn(self.params, self.batch_stats, images, true_hw)
