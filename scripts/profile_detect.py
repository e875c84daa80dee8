"""Stage-by-stage timing of the detect path.

This environment's remote TPU platform makes ``block_until_ready`` a no-op
and per-launch round trips expensive, so each stage is timed by running N
data-dependent iterations INSIDE one XLA program (lax.fori_loop with a
carry that feeds back into the input) and fetching one scalar at the end:
  t_stage ~= (t_total - t_launch) / N.

Usage: python scripts/profile_detect.py [batch] [loop_iters] [stage...]
Stages: norm fwd decode select nms pool cnet full  (default: all)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/frcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from frcnn_tpu.config import duplo_config
from frcnn_tpu.detect.detector import (
    FG_THRESHOLD,
    PROPOSAL_NMS_IOU,
    build_detect_fn,
)
from frcnn_tpu.geometry import boxes as B
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.factory import create_models, init_params
from frcnn_tpu.ops.nms import nms
from frcnn_tpu.ops.normalization import normalize_image
from frcnn_tpu.ops.roi_pool import adaptive_max_pool, prepare_roi_rects
from frcnn_tpu.train.objective import _flatten_batched


def loop_time(make_body, n, label):
    """make_body() -> (body_fn(carry)->carry: scalar f32, init).
    Times n in-program iterations; returns seconds per iteration."""

    @jax.jit
    def run(n_steps, init):
        def body(i, c):
            return make_body(c)
        return jax.lax.fori_loop(0, n_steps, body, init)

    def timed(k, trials=3):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            _ = float(run(k, jnp.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        return best

    _ = float(run(1, jnp.float32(0.0)))  # compile
    t_small = timed(1 + n // 4)
    t_big = timed(1 + n)
    per = (t_big - t_small) / (n - n // 4)
    print(f"{label:18s} {per*1e3:9.3f} ms/iter   (n={n}, base {t_small*1e3:.0f} ms)")
    return per


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    stages = set(sys.argv[3:]) or {
        "norm", "fwd", "decode", "select", "nms", "pool", "cnet", "full"
    }

    import dataclasses as _dc

    # profile at the north-star 800x450 bucket (duplo default is the
    # full 450x1000 wide-image envelope)
    cfg = duplo_config()
    cfg = cfg.replace(shapes=_dc.replace(cfg.shapes, image_hw=(450, 800)))
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0.3, 0.2, (bs, H, W, 3)).astype(np.float32))
    hw = jnp.tile(jnp.asarray([[H, W]], jnp.int32), (bs, 1))
    s = cfg.shapes
    K, D = s.max_proposals, s.max_detections
    kh, kw = cfg.roi_pooling.kh, cfg.roi_pooling.kw
    anchor_boxes = jnp.asarray(gen.boxes)

    print(f"batch={bs} loop={n}")

    if "norm" in stages:
        def body(c):
            out = jax.vmap(lambda im, h: normalize_image(im + c, h[0], h[1]))(images, hw)
            return (jnp.sum(out[0, :2, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "normalize")

    if "fwd" in stages:
        def body(c):
            amaps, fm = pnet.apply({"params": params["pnet"]}, images + c, train=False)
            return (jnp.sum(fm[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "pnet_fwd")

    if "decode" in stages:
        def body(c):
            amaps, fm = pnet.apply({"params": params["pnet"]}, images + c, train=False)
            pred = _flatten_batched(gen, amaps)

            def one(pred_i, hw_i):
                h, w = hw_i[0], hw_i[1]
                logp = jax.nn.log_softmax(pred_i[:, 0:2], axis=-1)
                score = logp[:, 0]
                dec = B.decode(anchor_boxes, pred_i[:, 2:6])
                img_rect = jnp.stack(
                    [0.0 * w, 0.0 * w, w * 1.0, h * 1.0]
                ).astype(jnp.float32)
                keep = (
                    (jnp.exp(score) > FG_THRESHOLD)
                    & B.overlaps(dec, img_rect)
                    & gen.fm_valid_mask(h, w)
                )
                sc = jnp.where(keep, score, -jnp.inf)
                ts, ti = jax.lax.top_k(sc, K)
                return dec[ti], ts

            (tb, tsc) = jax.vmap(one)(pred, hw)
            return jnp.sum(tb[0, 0]) * 1e-20
        loop_time(body, n, "fwd+decode+topk")

    if "select" in stages:
        # top_k (overflow branch) vs O(A) compaction (real-scene branch)
        from frcnn_tpu.geometry.matching import compact_mask

        A = gen.num_anchors
        sc0 = jnp.asarray(rng.normal(size=(bs, A)).astype(np.float32))
        keep0 = jnp.asarray(rng.random((bs, A)) < 0.01)

        def body_topk(c):
            masked = jnp.where(keep0, sc0 + c, -jnp.inf)
            ts, ti = jax.lax.top_k(masked, K)
            return jnp.sum(ts[0, :2]) * 0.0

        loop_time(body_topk, n, f"select:top_k(A={A})")

        def body_compact(c):
            m = keep0 & (sc0 + c > -1e9)
            idx, val, _ = jax.vmap(lambda mm: compact_mask(mm, K))(m)
            return jnp.sum(idx[0, :2].astype(jnp.float32)) * 1e-20

        loop_time(body_compact, n, f"select:compact(A={A})")

    if "nms" in stages:
        rngk = np.random.default_rng(1)
        tb = jnp.asarray(
            np.concatenate(
                [rngk.uniform(0, 700, (bs, K, 2)), rngk.uniform(20, 120, (bs, K, 2))],
                axis=2,
            ).astype(np.float32)
        )
        tb = tb.at[:, :, 2:].add(tb[:, :, :2])
        tsc = jnp.asarray(rngk.uniform(-1, 0, (bs, K)).astype(np.float32))

        def body(c):
            idx, ok = jax.vmap(
                lambda b, sc: nms(b + c, sc, jnp.ones((K,), bool), PROPOSAL_NMS_IOU, D)
            )(tb, tsc)
            return jnp.sum(idx[0, :2].astype(jnp.float32)) * 1e-20
        loop_time(body, n, "nms(K->D)")

    if "pool" in stages:
        fm = jnp.asarray(rng.normal(size=(bs, gen.fm_hw[0], gen.fm_hw[1],
                                           cfg.model.layers[-1].filters)).astype(np.float32))
        rects = jnp.asarray(
            np.concatenate(
                [rng.uniform(0, 600, (bs, D, 2)), rng.uniform(30, 200, (bs, D, 2))],
                axis=2,
            ).astype(np.float32)
        )
        rects = rects.at[:, :, 2:].add(rects[:, :, :2])

        def body(c):
            def one(fm_i, r_i, hw_i):
                fw, fh = gen.fm_localizer.feature_map_size_jax(hw_i[1], hw_i[0])
                pr = prepare_roi_rects(
                    gen.fm_localizer.input_to_feature_rect_jax(r_i + c), fw, fh
                )
                return adaptive_max_pool(fm_i, pr, kh, kw)
            out = jax.vmap(one)(fm, rects, hw)
            return (jnp.sum(out[0, 0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, f"roi_pool({D})")

    if "cnet" in stages:
        Dcn = kh * kw * cfg.model.layers[-1].filters
        x = jnp.asarray(rng.normal(size=(bs, D, Dcn)).astype(np.float32))

        def body(c):
            reg, logp = cnet.apply(
                {"params": params["cnet"], "batch_stats": stats["cnet"]},
                x + c, jnp.ones((bs, D), bool), train=False,
            )
            return (jnp.sum(reg[0, 0]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "cnet")

    if "full" in stages:
        detect = build_detect_fn(cfg, gen, pnet, cnet)

        def body(c):
            out = detect(params, stats, images + c, hw)
            return jnp.sum(out.boxes[0, 0]) * 1e-20
        per = loop_time(body, n, "FULL")
        print(f"full-detect throughput ~= {bs/per:.1f} img/s")


if __name__ == "__main__":
    main()
