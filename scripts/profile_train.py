"""Training-step throughput on the current default device.

Times N data-dependent train steps inside one XLA program (same fetch-based
method as profile_detect.py). Reports steps/sec and images/sec.

Usage: python scripts/profile_train.py [images_per_step] [loop_iters] [stage...]
Stages (default: step): loss (objective fwd only), grad (value_and_grad,
no update), step (grad + optimizer apply), objparts (cumulative forward
breakdown: norm / +pnet / labeling / +pool). loss vs grad isolates the
backward pass; grad vs step isolates the rmsprop update. Adding 'pallas'
switches the objective's ROI pool to the Pallas fwd+bwd kernels.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# smoke-test knobs (the sitecustomize force-registers the remote TPU
# backend; env vars alone are ignored — must set config after import):
#   FRCNN_TPU_PLATFORM=cpu      run on CPU
#   FRCNN_PROFILE_HW=128x160    shrink the compile bucket
if os.environ.get("FRCNN_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FRCNN_TPU_PLATFORM"])
from frcnn_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from frcnn_tpu.config import duplo_config
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.factory import create_models, init_params
from frcnn_tpu.train.objective import TrainBatch, build_objective
from frcnn_tpu.train.optim import make_optimizer

import optax


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    stages = set(sys.argv[3:]) or {"step"}
    use_pallas = "pallas" in stages     # Pallas ROI pool fwd+bwd kernels
    use_remat = "remat" in stages       # rematerialize pnet in the backward
    stages -= {"pallas", "remat"}
    stages = stages or {"step"}

    import dataclasses as _dc

    # profile at the north-star 800x450 bucket (duplo default is the
    # full 450x1000 wide-image envelope)
    hw = (450, 800)
    if os.environ.get("FRCNN_PROFILE_HW"):
        h, w = os.environ["FRCNN_PROFILE_HW"].split("x")
        hw = (int(h), int(w))
    cfg = duplo_config()
    cfg = cfg.replace(shapes=_dc.replace(cfg.shapes, image_hw=hw))
    cfg = cfg.replace(shapes=dataclasses.replace(cfg.shapes, images_per_step=B))
    if use_pallas:
        # CPU smoke tests run the kernels in interpreter mode
        cfg = cfg.replace(pallas_mode=(
            "interpret" if os.environ.get("FRCNN_TPU_PLATFORM") == "cpu"
            else "on"))
    if use_remat:
        cfg = cfg.replace(remat=True)
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    loss_fn = build_objective(cfg, gen, pnet, cnet)

    H, W = cfg.shapes.image_hw
    G = cfg.shapes.max_gt
    rng = np.random.default_rng(0)
    gt = np.zeros((B, G, 4), np.float32)
    gt_m = np.zeros((B, G), bool)
    box_hi = min(130, H // 2, W // 2)   # stays valid at smoke-test buckets
    box_lo = min(40, box_hi - 1)
    for b in range(B):
        for g in range(4):
            x0 = rng.uniform(5, W - box_hi - 10)
            y0 = rng.uniform(5, H - box_hi - 10)
            gt[b, g] = [x0, y0, x0 + rng.uniform(box_lo, box_hi),
                        y0 + rng.uniform(box_lo, box_hi)]
            gt_m[b, g] = True
    batch = TrainBatch(
        image=jnp.asarray(rng.normal(0.3, 0.2, (B, H, W, 3)).astype(np.float32)),
        true_hw=jnp.tile(jnp.asarray([[H, W]], jnp.int32), (B, 1)),
        gt_boxes=jnp.asarray(gt),
        gt_classes=jnp.zeros((B, G), jnp.int32),
        gt_mask=jnp.asarray(gt_m),
        is_background=jnp.zeros((B,), bool),
    )

    def step(params, stats, opt_state, batch, rng):
        (total, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, stats, batch, rng)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, total

    def measure(label, body_step):
        @jax.jit
        def run(k, params, stats, opt_state, batch):
            def body(i, carry):
                p, s, o, acc = carry
                rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
                # fresh-ish data each iteration: with loop-invariant
                # gt_boxes XLA hoists the rng-independent labeling work
                # (IoU matrix + matching scans) out of the loop and the
                # profile under-counts what real training (new batch
                # every step) pays
                b = batch._replace(gt_boxes=batch.gt_boxes + acc * 1e-30)
                p, s, o, total = body_step(p, s, o, b, rng)
                return p, s, o, acc + total * 1e-20
            p, s, o, acc = jax.lax.fori_loop(
                0, k, body, (params, stats, opt_state, jnp.float32(0.0))
            )
            return acc

        t0 = time.perf_counter()
        _ = float(run(1, params, stats, opt_state, batch))
        print(f"# {label} compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

        def timed(k, trials=3):
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(k, params, stats, opt_state, batch))
                best = min(best, time.perf_counter() - t0)
            return best

        small, big = 1 + n // 4, 1 + n
        per = (timed(big) - timed(small)) / (big - small)
        print(f"{label} ({B} img): {per*1e3:.1f} ms -> {1/per:.2f}/s, "
              f"{B/per:.1f} img/s")

    if "objparts" in stages:
        # cumulative forward breakdown of the objective: where the
        # non-conv time goes. Each body folds its scalar back into the
        # params so the fori_loop iterations stay data-dependent
        # (LICM-safe under XLA).
        from frcnn_tpu.ops.normalization import normalize_image
        from frcnn_tpu.train.objective import label_one_image

        nc = cfg.normalization

        def norm_of(image, true_hw):
            return jax.vmap(
                lambda img, hw: normalize_image(
                    img, hw[0], hw[1], method=nc.method, width=nc.width,
                    centering=nc.centering, scaling=nc.scaling,
                )
            )(image, true_hw)

        def labels_of(rng, batch):
            label_rngs = jax.random.split(rng, B)
            return jax.vmap(
                lambda r, hw, gb, gm, bg: label_one_image(
                    cfg, gen, r, hw, gb, gm, bg)
            )(label_rngs, batch.true_hw, batch.gt_boxes, batch.gt_mask,
              batch.is_background)

        def fold(p, x):
            return jax.tree_util.tree_map(lambda a: a + x * 1e-30, p)

        def eps_of(p):
            # carry-dependent epsilon: stages whose compute does not
            # consume the params (norm, labeling) must still depend on
            # the loop carry, or XLA hoists them out of the fori_loop
            # (LICM) and they time at ~0
            return jax.tree_util.tree_leaves(p)[0].ravel()[0] * 1e-30

        def norm_only(p, s, o, batch, rng):
            img = batch.image + eps_of(p)
            x = jnp.sum(norm_of(img, batch.true_hw)[:, ::64, ::64])
            return fold(p, x), s, o, x * 1e-20

        def upto_pnet(p, s, o, batch, rng):
            norm = norm_of(batch.image + eps_of(p), batch.true_hw)
            maps, fm = pnet.apply(
                {"params": p["pnet"]}, norm, train=True,
                rngs={"dropout": rng},
            )
            x = (jnp.sum(fm[:, ::16, ::16].astype(jnp.float32))
                 + sum(jnp.sum(m[..., 0].astype(jnp.float32)) for m in maps))
            return fold(p, x), s, o, x * 1e-20

        def label_only(p, s, o, batch, rng):
            labels = labels_of(rng, batch._replace(
                gt_boxes=batch.gt_boxes + eps_of(p)))
            x = (jnp.sum(labels.pos_anchor) + jnp.sum(labels.neg_anchor)
                 ).astype(jnp.float32)
            return fold(p, x), s, o, x * 1e-20

        def upto_pool(p, s, o, batch, rng):
            from frcnn_tpu.ops.roi_pool import (
                adaptive_max_pool, prepare_roi_rects)

            norm = norm_of(batch.image + eps_of(p), batch.true_hw)
            maps, fm = pnet.apply(
                {"params": p["pnet"]}, norm, train=True,
                rngs={"dropout": rng},
            )
            labels = labels_of(rng, batch._replace(
                gt_boxes=batch.gt_boxes + eps_of(p)))
            pos_gt_boxes = jnp.take_along_axis(
                batch.gt_boxes, labels.pos_gt[:, :, None], axis=1)
            neg_a_boxes = jnp.asarray(gen.boxes)[labels.neg_anchor]
            roi_rects = jnp.concatenate([pos_gt_boxes, neg_a_boxes], axis=1)
            fm_loc = gen.fm_localizer
            feat_rects = fm_loc.input_to_feature_rect_jax(roi_rects)
            kh, kw = cfg.roi_pooling.kh, cfg.roi_pooling.kw
            if use_pallas:
                from frcnn_tpu.ops.pallas_roi_pool import (
                    pallas_adaptive_max_pool)

                fw, fh = fm_loc.feature_map_size_jax(
                    batch.true_hw[:, 1], batch.true_hw[:, 0])
                pr = prepare_roi_rects(
                    feat_rects, fw[:, None].astype(jnp.float32),
                    fh[:, None].astype(jnp.float32))
                pooled = pallas_adaptive_max_pool(
                    fm, pr, kh, kw, cfg.pallas_mode == "interpret")
            else:
                def pool_one(fm_i, fr_i, hw):
                    fw, fh = fm_loc.feature_map_size_jax(hw[1], hw[0])
                    pr = prepare_roi_rects(fr_i, fw, fh)
                    return adaptive_max_pool(fm_i, pr, kh, kw)

                pooled = jax.vmap(pool_one)(fm, feat_rects, batch.true_hw)
            x = jnp.sum(pooled[..., 0].astype(jnp.float32))
            return fold(p, x), s, o, x * 1e-20

        measure("norm", norm_only)
        measure("norm+pnet", upto_pnet)
        measure("label", label_only)
        measure("norm+pnet+label+pool", upto_pool)

    if "labelparts" in stages:
        # sub-breakdown of the labeling stage (objparts showed labeling
        # dominates the train forward): IoU matrix / positive matching /
        # negative sampling / nearby-aversion, each vmapped over the
        # batch like the objective does
        from frcnn_tpu.geometry import boxes as GB
        from frcnn_tpu.geometry import matching as GM

        anchors = jnp.asarray(gen.boxes)
        range_id = jnp.asarray(gen.tap * 3 + gen.aspect)
        bin_x = jnp.asarray(gen.bin_x)
        bin_y = jnp.asarray(gen.bin_y)
        s = cfg.shapes

        def eps_of(p):
            return jax.tree_util.tree_leaves(p)[0].ravel()[0] * 1e-30

        def fold(p, x):
            return jax.tree_util.tree_map(lambda a: a + x * 1e-30, p)

        def masks_of(hw):
            return (gen.fm_valid_mask(hw[0], hw[1]),
                    gen.inside_image_mask(hw[0], hw[1]))

        def iou_only(p, s_, o, batch, rng):
            gb = batch.gt_boxes + eps_of(p)
            x = jnp.sum(jax.vmap(
                lambda g: GB.iou_matrix(g, anchors))(gb)[:, :, ::64])
            return fold(p, x), s_, o, x * 1e-20

        def pos_only(p, s_, o, batch, rng):
            gb = batch.gt_boxes + eps_of(p)

            def one(g, gm, hw):
                fm, inside = masks_of(hw)
                pos = GM.match_positives(
                    anchors, fm & inside, g, gm,
                    cfg.positive_threshold, cfg.negative_threshold,
                    cfg.best_match)
                sel = GM.select_positive_pairs(pos, s.max_positives)
                return jnp.sum(sel.anchor_idx)

            x = jnp.sum(jax.vmap(one)(
                gb, batch.gt_mask, batch.true_hw)).astype(jnp.float32)
            return fold(p, x), s_, o, x * 1e-20

        def neg_only(p, s_, o, batch, rng):
            gb = batch.gt_boxes + eps_of(p)

            def one(r, g, gm, hw, bg):
                fm, inside = masks_of(hw)
                req = jnp.where(bg, int(0.05 * cfg.batch_size), 16)
                thr = jnp.where(bg, 0.0, cfg.negative_threshold)
                idx, val = GM.sample_negatives(
                    r, anchors, fm & inside, range_id,
                    3 * len(cfg.scales), g, gm, thr,
                    s.max_negatives, req)
                return jnp.sum(idx)

            rngs = jax.random.split(rng, B)
            x = jnp.sum(jax.vmap(one)(
                rngs, gb, batch.gt_mask, batch.true_hw,
                batch.is_background)).astype(jnp.float32)
            return fold(p, x), s_, o, x * 1e-20

        def near_only(p, s_, o, batch, rng):
            gb = batch.gt_boxes + eps_of(p)

            def one(r, g, gm, hw):
                fm, inside = masks_of(hw)
                pos = GM.match_positives(
                    anchors, fm & inside, g, gm,
                    cfg.positive_threshold, cfg.negative_threshold,
                    cfg.best_match)
                sel = GM.select_positive_pairs(pos, s.max_positives)
                idx, val = GM.nearby_negatives(
                    r, anchors, bin_x, bin_y, fm,
                    sel.anchor_idx, sel.valid,
                    cfg.negative_threshold, s.max_nearby, sel.count)
                return jnp.sum(idx)

            rngs = jax.random.split(rng, B)
            x = jnp.sum(jax.vmap(one)(
                rngs, gb, batch.gt_mask, batch.true_hw)).astype(jnp.float32)
            return fold(p, x), s_, o, x * 1e-20

        measure("iou[GxA]", iou_only)
        measure("pos(match+select)", pos_only)
        measure("neg(sample)", neg_only)
        measure("near(pos+nearby)", near_only)

    if "bwdparts" in stages:
        # backward-pass breakdown by stop_gradient truncation (timed by
        # difference against the full grad):
        #   grad[sg fm+maps]  = fwd + cnet/loss backward only
        #   grad[sg fm]       - above  = pnet (conv) backward
        #   grad[full]        - sg fm  = ROI-pool backward path
        from frcnn_tpu.train.objective import build_objective as _bo

        def grad_of(fn):
            def body(p, s, o, batch, rng):
                (total, (new_bs, _)), grads = jax.value_and_grad(
                    fn, has_aux=True)(p, s, batch, rng)
                newp = jax.tree_util.tree_map(
                    lambda a, g: a - 1e-30 * g, p, grads)
                return newp, new_bs, o, total
            return body

        measure("grad[sg fm+maps]",
                grad_of(_bo(cfg, gen, pnet, cnet, bwd_cut=("fm", "maps"))))
        measure("grad[sg fm]",
                grad_of(_bo(cfg, gen, pnet, cnet, bwd_cut=("fm",))))
        measure("grad[full]", grad_of(loss_fn))

    if "loss" in stages:
        # forward objective only: fold the loss back into the params so
        # iterations stay data-dependent (sequential under XLA)
        def loss_only(p, s, o, batch, rng):
            total, (new_bs, _) = loss_fn(p, s, batch, rng)
            newp = jax.tree_util.tree_map(lambda a: a + total * 1e-30, p)
            return newp, new_bs, o, total
        measure("objective fwd", loss_only)

    if "grad" in stages:
        def grad_only(p, s, o, batch, rng):
            (total, (new_bs, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p, s, batch, rng)
            newp = jax.tree_util.tree_map(lambda a, g: a - 1e-30 * g, p, grads)
            return newp, new_bs, o, total
        measure("fwd+bwd", grad_only)

    if "step" in stages:
        measure("train step", step)


if __name__ == "__main__":
    main()
