"""Joint two-stage training objective.

A single jitted function replacing ``create_objective``'s
``lossAndGradient`` closure (``objective.lua:15-221``) — but where the
reference runs three host loops (per image, per positive anchor, per
negative anchor) issuing tiny device ops, everything here is one batched,
fixed-shape device program:

per image (vectorized over the batch):
  1. on-device input normalization (masked; ``BatchIterator.lua:142-161``),
  2. pnet forward -> 4 anchor maps + shared feature map,
  3. device-side anchor labeling: positive matching with best-match
     fallback, random negatives, nearby-aversion negatives
     (``BatchIterator.lua:198-225``) — the reference does this on the host
     with per-anchor Lua loops,
  4. proposal losses at the gathered anchor cells: 2-class CE (fg/bg) +
     10x sum-reduced SmoothL1 on the corner-offset regression vs
     ``inputToAnchor`` targets (``objective.lua:91-140``),
  5. ROI adaptive max-pool of the GROUND-TRUTH rect for positives / the
     anchor rect for negatives (``objective.lua:117-119, 137-139``),
  6. cnet forward on all pooled examples; detection losses: 10x SmoothL1 on
     refinement vs a target encoded against the (stop-gradient) decoded
     proposal (``objective.lua:109, 166-170``; negative rows masked like the
     reference's ``crout[...]:zero()``), class NLL with background class
     (mean per image, ``objective.lua:174``).

Total objective = (pcls_sum + 10*preg_sum + 10*dreg_sum + sum_img dcls_mean)
/ cls_count — reproducing the reference's single ``gradient:div(cls_count)``
(``objective.lua:200``), which scales the gradients of ALL four losses by
the total RPN example count. Reported metrics are the four normalized
series pcls/preg/dcls/dreg (``objective.lua:202-214``); the returned scalar
"loss" follows the reference in being pcls + preg only (``objective.lua:216``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from frcnn_tpu.config import Config
from frcnn_tpu.geometry import boxes as B
from frcnn_tpu.geometry import matching as M
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.cnet import ClassificationNet
from frcnn_tpu.models.pnet import ProposalNet
from frcnn_tpu.ops.color import unwire_uint8
from frcnn_tpu.ops.normalization import normalize_image
from frcnn_tpu.ops.roi_pool import adaptive_max_pool, prepare_roi_rects
from frcnn_tpu.train.losses import cross_entropy_fg_bg, nll_loss, smooth_l1


class TrainBatch(NamedTuple):
    """One fixed-shape training batch (host pipeline output)."""

    image: jnp.ndarray        # [B, H, W, 3] float32, color-converted+augmented
    true_hw: jnp.ndarray      # [B, 2] int32 (h, w) of real content
    gt_boxes: jnp.ndarray     # [B, G, 4] float32
    gt_classes: jnp.ndarray   # [B, G] int32, 0-based (bg NOT included)
    gt_mask: jnp.ndarray      # [B, G] bool
    is_background: jnp.ndarray  # [B] bool — background-only image slots


class LabeledExamples(NamedTuple):
    """Per-image fixed-size example sets (anchors indices into the flat
    anchor field)."""

    pos_anchor: jnp.ndarray   # [P] int32
    pos_gt: jnp.ndarray       # [P] int32
    pos_valid: jnp.ndarray    # [P] bool
    neg_anchor: jnp.ndarray   # [N + NB] int32 (random + nearby concatenated)
    neg_valid: jnp.ndarray    # [N + NB] bool


def label_one_image(cfg: Config, gen: AnchorGenerator, rng, true_hw,
                    gt_boxes, gt_mask, is_background) -> LabeledExamples:
    """Device-side anchor labeling for a single image."""
    s = cfg.shapes
    h = true_hw[0]
    w = true_hw[1]
    anchor_boxes = jnp.asarray(gen.boxes)
    fm_mask = gen.fm_valid_mask(h, w)
    cand = fm_mask & gen.inside_image_mask(h, w)

    r_pos, r_neg, r_near = jax.random.split(rng, 3)

    # one [G, A] IoU matrix shared by matching and negative sampling
    iou_ga = B.iou_matrix(gt_boxes, anchor_boxes)

    # positives (none on background-only slots: gt_mask is all-false there)
    pos_matrix = M.match_positives(
        anchor_boxes, cand, gt_boxes, gt_mask,
        cfg.positive_threshold, cfg.negative_threshold, cfg.best_match,
        iou=iou_ga,
    )
    sel = M.select_positive_pairs(pos_matrix, s.max_positives)

    # random negatives: 16 per foreground image (BatchIterator.lua:203),
    # floor(0.05 * batch_size) at threshold 0 for the background slot
    # (BatchIterator.lua:259)
    bg_count = int(0.05 * cfg.batch_size)
    requested = jnp.where(is_background, bg_count, 16)
    neg_thr = jnp.where(is_background, 0.0, cfg.negative_threshold)
    range_id = jnp.asarray(gen.tap * 3 + gen.aspect)
    neg_idx, neg_valid = M.sample_negatives(
        r_neg, anchor_boxes, cand, range_id, 3 * len(cfg.scales),
        gt_boxes, gt_mask, neg_thr, s.max_negatives, requested, iou=iou_ga,
    )

    if cfg.nearby_aversion:
        near_idx, near_valid = M.nearby_negatives(
            r_near, anchor_boxes,
            jnp.asarray(gen.bin_x), jnp.asarray(gen.bin_y),
            fm_mask, sel.anchor_idx, sel.valid,
            cfg.negative_threshold, s.max_nearby, sel.count,
        )
        neg_anchor = jnp.concatenate([neg_idx, near_idx])
        neg_valid_all = jnp.concatenate([neg_valid, near_valid])
    else:
        pad_i = jnp.zeros((s.max_nearby,), jnp.int32)
        pad_v = jnp.zeros((s.max_nearby,), bool)
        neg_anchor = jnp.concatenate([neg_idx, pad_i])
        neg_valid_all = jnp.concatenate([neg_valid, pad_v])

    return LabeledExamples(
        pos_anchor=sel.anchor_idx,
        pos_gt=sel.gt_idx,
        pos_valid=sel.valid,
        neg_anchor=neg_anchor,
        neg_valid=neg_valid_all,
    )


def build_objective(cfg: Config, gen: AnchorGenerator,
                    pnet: ProposalNet, cnet: ClassificationNet,
                    bwd_cut: tuple = ()):
    """Returns ``loss_fn(params, batch_stats, batch, rng) ->
    (total_objective, aux)`` with aux = (new_batch_stats, metrics).

    ``bwd_cut`` is a profiling-only knob (the training analog of
    ``build_detect_fn(stop_after=...)``): stop_gradient barriers that
    truncate the backward pass so its stages can be timed by difference.
    "fm" cuts the ROI-pool path into the feature map (kills the pool
    backward kernel; the anchor-map losses still drive the full conv
    backward), "maps" additionally cuts the anchor-map losses (no pnet
    backward at all). Forward values are identical in every mode."""

    s = cfg.shapes
    kh, kw = cfg.roi_pooling.kh, cfg.roi_pooling.kw
    anchor_boxes_np = jnp.asarray(gen.boxes)
    R = s.max_positives + s.max_negatives + s.max_nearby
    fm_loc = gen.fm_localizer

    def loss_fn(params, batch_stats, batch: TrainBatch, rng):
        Bsz = batch.image.shape[0]
        rng_label, rng_pdrop, rng_cdrop = jax.random.split(rng, 3)

        # 0. uint8 wire format: /255 + host color space on device
        # (Config.uint8_wire; XLA fuses this into the normalize stage;
        # no-op for float32 batches)
        image = unwire_uint8(batch.image, cfg.color_space)

        # 1. masked on-device normalization (vmapped per image)
        norm = jax.vmap(
            lambda img, hw: normalize_image(
                img, hw[0], hw[1],
                method=cfg.normalization.method,
                width=cfg.normalization.width,
                centering=cfg.normalization.centering,
                scaling=cfg.normalization.scaling,
            )
        )(image, batch.true_hw)

        # 2. pnet forward (optionally rematerialized in the backward pass —
        # the backbone activations dominate train-step HBM at large buckets)
        def pnet_fwd(pnet_params, imgs, drop_rng):
            return pnet.apply(
                {"params": pnet_params}, imgs, train=True,
                rngs={"dropout": drop_rng},
            )

        if cfg.remat:
            pnet_fwd = jax.checkpoint(pnet_fwd)
        anchor_maps, fm = pnet_fwd(params["pnet"], norm, rng_pdrop)
        if "fm" in bwd_cut:
            fm = jax.lax.stop_gradient(fm)
        if "maps" in bwd_cut:
            anchor_maps = jax.tree_util.tree_map(
                jax.lax.stop_gradient, anchor_maps)
        pred = _flatten_batched(gen, anchor_maps)  # [B, A, 6]

        # 3. labeling (vmapped; per-image rng)
        label_rngs = jax.random.split(rng_label, Bsz)
        labels = jax.vmap(
            lambda r, hw, gb, gm, bg: label_one_image(cfg, gen, r, hw, gb, gm, bg)
        )(label_rngs, batch.true_hw, batch.gt_boxes, batch.gt_mask,
          batch.is_background)

        # 4. proposal-stage losses ------------------------------------------
        pos_pred = jnp.take_along_axis(
            pred, labels.pos_anchor[:, :, None], axis=1
        )  # [B, P, 6]
        neg_pred = jnp.take_along_axis(
            pred, labels.neg_anchor[:, :, None], axis=1
        )  # [B, N+NB, 6]

        pos_a_boxes = anchor_boxes_np[labels.pos_anchor]       # [B, P, 4]
        neg_a_boxes = anchor_boxes_np[labels.neg_anchor]       # [B, N+NB, 4]
        pos_gt_boxes = jnp.take_along_axis(
            batch.gt_boxes, labels.pos_gt[:, :, None], axis=1
        )  # [B, P, 4]
        pos_gt_cls = jnp.take_along_axis(
            batch.gt_classes, labels.pos_gt, axis=1
        )  # [B, P]

        pv = labels.pos_valid.astype(jnp.float32)
        nv = labels.neg_valid.astype(jnp.float32)

        pcls_sum = (
            jnp.sum(cross_entropy_fg_bg(pos_pred[..., 0:2], True) * pv)
            + jnp.sum(cross_entropy_fg_bg(neg_pred[..., 0:2], False) * nv)
        )
        reg_target = B.encode(pos_a_boxes, pos_gt_boxes)
        preg_sum = jnp.sum(
            jnp.sum(smooth_l1(pos_pred[..., 2:6], reg_target), axis=-1) * pv
        )

        cls_count = jnp.sum(pv) + jnp.sum(nv)
        reg_count = jnp.sum(pv)

        # 5. ROI pooling ------------------------------------------------------
        # positives pool the ground-truth rect; negatives their anchor rect
        roi_rects = jnp.concatenate([pos_gt_boxes, neg_a_boxes], axis=1)  # [B, R, 4]
        roi_valid = jnp.concatenate([labels.pos_valid, labels.neg_valid], axis=1)

        feat_rects = fm_loc.input_to_feature_rect_jax(roi_rects)

        if cfg.pallas_mode in ("on", "interpret"):
            # VMEM-resident Pallas pool; its custom VJP is a real Pallas
            # backward kernel (ops/pallas_roi_pool.py), so training takes
            # the fast path in BOTH passes
            from frcnn_tpu.ops.pallas_roi_pool import (
                pallas_adaptive_max_pool_valid,
            )

            fw, fh = fm_loc.feature_map_size_jax(
                batch.true_hw[:, 1], batch.true_hw[:, 0]
            )
            pr = prepare_roi_rects(
                feat_rects, fw[:, None].astype(jnp.float32),
                fh[:, None].astype(jnp.float32),
            )
            # padded roi slots (most of R in practice) are skipped inside
            # the kernel in both passes; exact because every loss below is
            # masked by roi_valid/pv, so their cotangent is already zero
            pooled = pallas_adaptive_max_pool_valid(
                fm, pr, roi_valid, kh, kw, cfg.pallas_mode == "interpret"
            )
        else:
            def pool_one(fm_i, fr_i, hw):
                fw, fh = fm_loc.feature_map_size_jax(hw[1], hw[0])
                pr = prepare_roi_rects(fr_i, fw, fh)
                return adaptive_max_pool(fm_i, pr, kh, kw)

            pooled = jax.vmap(pool_one)(fm, feat_rects, batch.true_hw)
        pooled = pooled.reshape(Bsz, R, kh * kw * fm.shape[-1])

        # 6. cnet + detection losses -----------------------------------------
        (creg, clogp), new_cvars = cnet.apply(
            {"params": params["cnet"], "batch_stats": batch_stats["cnet"]},
            pooled, roi_valid, train=True,
            rngs={"dropout": rng_cdrop},
            mutable=["batch_stats"],
        )

        # refinement target: encode GT against the decoded (frozen) proposal.
        # Overflow guard on the frozen deltas: an untrained head can emit
        # log-size deltas past ~88, whose exp() is inf in fp32; that infects
        # dreg -> total and the NaN-guarded train step then skips EVERY
        # update (deadlock, observed at the 800x450 scale at step 1).
        # +-20 never binds on a real box (exp(20) ~ 5e8 px): a pure
        # finiteness clamp, not a behavior change vs objective.lua:109.
        frozen = jnp.clip(jax.lax.stop_gradient(pos_pred[..., 2:6]), -20.0, 20.0)
        reg_proposal = B.decode(pos_a_boxes, frozen)
        # Floor the encode base's size at 1px: an untrained head can emit
        # wh deltas at the -20 clamp, and exp(-20)*anchor_w ~ 3e-8 px
        # UNDERFLOWS TO EXACTLY 0 in the corner representation
        # (x + 3e-8 == x in fp32), so encode() below divides by zero ->
        # inf targets -> non-finite grads -> the guarded train step skips
        # every subsequent update (observed deadlock at the duplo scale,
        # 2026-08-17). The reference survives the same math because torch
        # targets are plain data and SmoothL1's backward is clamped
        # (objective.lua:109); a 1-px floor never binds on a meaningful
        # proposal and keeps targets finite and smooth_l1-bounded.
        reg_proposal = B.from_xywh(
            reg_proposal[..., 0], reg_proposal[..., 1],
            jnp.maximum(B.width(reg_proposal), 1.0),
            jnp.maximum(B.height(reg_proposal), 1.0),
        )
        dreg_target = B.encode(reg_proposal, pos_gt_boxes)
        dreg_sum = jnp.sum(
            jnp.sum(smooth_l1(creg[:, : s.max_positives, :], dreg_target), axis=-1)
            * pv
        )
        creg_count = reg_count  # one refinement row per positive

        # classification: positives -> gt class, negatives -> background (=C)
        bg = cfg.class_count
        targets = jnp.concatenate(
            [pos_gt_cls, jnp.full(labels.neg_anchor.shape, bg, jnp.int32)], axis=1
        )
        nll = nll_loss(clogp, targets) * roi_valid.astype(jnp.float32)
        rows_per_img = jnp.sum(roi_valid.astype(jnp.float32), axis=1)
        dcls_per_img = jnp.sum(nll, axis=1) / jnp.maximum(rows_per_img, 1.0)
        dcls_sum = jnp.sum(dcls_per_img)
        ccls_count = jnp.asarray(Bsz, jnp.float32)

        # total objective: single division by cls_count like gradient:div
        denom = jnp.maximum(cls_count, 1.0)
        total = (
            pcls_sum + 10.0 * preg_sum + 10.0 * dreg_sum + dcls_sum
        ) / denom

        metrics = {
            "pcls": pcls_sum / denom,
            "preg": 10.0 * preg_sum / jnp.maximum(reg_count, 1.0),
            "dcls": dcls_sum / ccls_count,
            "dreg": 10.0 * dreg_sum / jnp.maximum(creg_count, 1.0),
            "loss": pcls_sum / denom + 10.0 * preg_sum / jnp.maximum(reg_count, 1.0),
            "cls_count": cls_count,
            "reg_count": reg_count,
        }
        return total, ({"cnet": new_cvars["batch_stats"]}, metrics)

    return loss_fn


def _flatten_batched(gen: AnchorGenerator, anchor_maps):
    """[B, Hi, Wi, 18] x4 -> [B, A, 6] in canonical anchor order."""
    flats = []
    for m, (h, w) in zip(anchor_maps, gen.tap_dims):
        bsz = m.shape[0]
        x = m.reshape(bsz, h, w, 3, 6)
        x = jnp.transpose(x, (0, 3, 1, 2, 4))
        flats.append(x.reshape(bsz, 3 * h * w, 6))
    # fp32 for box decode/loss math regardless of conv compute dtype
    return jnp.concatenate(flats, axis=1).astype(jnp.float32)
