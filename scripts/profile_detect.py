"""Stage-by-stage timing of the detect path.

This environment's remote TPU platform makes ``block_until_ready`` a no-op
and per-launch round trips expensive, so each stage is timed by running N
data-dependent iterations INSIDE one XLA program (lax.fori_loop with a
carry that feeds back into the input) and fetching one scalar at the end:
  t_stage ~= (t_total - t_launch) / N.

Usage: python scripts/profile_detect.py [batch] [loop_iters] [stage...] [mode=MODE]
Stages: norm fwd decode select nms pool cnet full  (default: all)
MODE: any bench.py mode string, e.g. mode=int8s+pallas — int8[s] swaps the
backbone for the quantized path ([s] = static calibrated act scales);
pallas swaps NMS/ROI-pool for the Pallas kernels (incl. the isolated
nms/pool stages).
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# smoke-test knobs, same as profile_train.py: FRCNN_TPU_PLATFORM=cpu,
# FRCNN_PROFILE_HW=128x160 (set config after import — the sitecustomize
# force-registers the remote backend and ignores env vars)
if os.environ.get("FRCNN_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FRCNN_TPU_PLATFORM"])
from frcnn_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

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
    rest = sys.argv[3:]
    mode = "bf16"
    for a in list(rest):
        if a.startswith("mode="):
            mode = a[5:]
            rest.remove(a)
    if "large" in rest:  # accept bare 'large' too (it is a model choice,
        rest.remove("large")  # not a stage): same as putting it in mode=
        mode += "+large"
    stages = set(rest) or {
        "norm", "fwd", "decode", "select", "nms", "pool", "cnet", "full"
    }

    import dataclasses as _dc

    # profile at the north-star 800x450 bucket (duplo default is the
    # full 450x1000 wide-image envelope)
    hw_prof = (450, 800)
    if os.environ.get("FRCNN_PROFILE_HW"):
        h_, w_ = os.environ["FRCNN_PROFILE_HW"].split("x")
        hw_prof = (int(h_), int(w_))
    cfg = duplo_config()
    cfg = cfg.replace(shapes=_dc.replace(cfg.shapes, image_hw=hw_prof))
    if "large" in mode:
        from frcnn_tpu.config import vgg_large_model

        cfg = cfg.replace(model=vgg_large_model())
    if "pallas" in mode:
        cfg = cfg.replace(pallas_mode="on")
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0.3, 0.2, (bs, H, W, 3)).astype(np.float32))
    hw = jnp.tile(jnp.asarray([[H, W]], jnp.int32), (bs, 1))

    if "int8" in mode:
        from frcnn_tpu.models.factory import compute_dtype
        from frcnn_tpu.models.quant import (
            QuantizedPNetAdapter,
            quantize_pnet_params,
        )

        qparams = quantize_pnet_params(params, cfg.model)
        pnet = QuantizedPNetAdapter(cfg.model, qparams,
                                    act_dtype=compute_dtype(cfg),
                                    pool_s8="s8p" in mode)
        if "int8s" in mode:
            pnet.calibrate(images)
    print(f"mode={mode}")
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

    if "s2dstages" in stages:
        from frcnn_tpu.ops.normalization import normalize_s2d
        from frcnn_tpu.ops.pallas_block0 import (
            block0_weights_jnp,
            fused_block0,
            pack_s2d,
            views_from_s2d,
        )

        lum4, chroma = pack_s2d(images)

        def body_norm(c):
            # perturb BOTH arrays: a loop-invariant chroma input would let
            # XLA hoist the whole chroma half out of the timed loop
            ol, oc = jax.vmap(
                lambda l, p, h: normalize_s2d(l + c, p + c, h[0], h[1])
            )(lum4, chroma, hw)
            return ((jnp.sum(ol[0, 0, :2, 0]) + jnp.sum(oc[0, 0, :2, 0]))
                    * 1e-20).astype(jnp.float32)
        loop_time(body_norm, n, "normalize[s2d]")

        w0 = params["pnet"]["block0_conv0"]["kernel"]
        b0p = params["pnet"]["block0_conv0"]["bias"]
        sl = params["pnet"]["block0_prelu0"]["slope"]

        def body_b0(c):
            wt, bias = block0_weights_jnp(w0, b0p)
            cv, lv = views_from_s2d(lum4 + c, chroma + c)
            out = fused_block0(cv, lv, wt, bias, sl.reshape(()))
            return (jnp.sum(out[0, 0, :2, 0].astype(jnp.float32))
                    * 1e-20).astype(jnp.float32)
        loop_time(body_b0, n, "views+block0[s2d]")

        def body_b0t(c):
            wt, bias = block0_weights_jnp(w0, b0p)
            cv, lv = views_from_s2d(lum4 + c, chroma + c)
            out = fused_block0(cv, lv, wt, bias,
                               sl.reshape(())).transpose(0, 1, 3, 2)
            return (jnp.sum(out[0, 0, 0, :2].astype(jnp.float32))
                    * 1e-20).astype(jnp.float32)
        loop_time(body_b0t, n, "views+block0+T[s2d]")

        def body_b0n(c):
            wt, bias = block0_weights_jnp(w0, b0p)
            cv, lv = views_from_s2d(lum4 + c, chroma + c)
            out = fused_block0(cv, lv, wt, bias, sl.reshape(()),
                               out_layout="nhwc")
            return (jnp.sum(out[0, 0, 0, :2].astype(jnp.float32))
                    * 1e-20).astype(jnp.float32)
        loop_time(body_b0n, n, "views+block0(nhwc)[s2d]")

        def body_front(c):
            nl, nc = jax.vmap(
                lambda l, p, h: normalize_s2d(l + c, p + c, h[0], h[1])
            )(lum4, chroma, hw)
            wt, bias = block0_weights_jnp(w0, b0p)
            cv, lv = views_from_s2d(nl, nc)
            out = fused_block0(cv, lv, wt, bias,
                               sl.reshape(())).transpose(0, 1, 3, 2)
            return (jnp.sum(out[0, 0, 0, :2].astype(jnp.float32))
                    * 1e-20).astype(jnp.float32)
        loop_time(body_front, n, "frontend[s2d]")

    if "fwd" in stages:
        def body(c):
            amaps, fm = pnet.apply({"params": params["pnet"]}, images + c, train=False)
            return (jnp.sum(fm[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "pnet_fwd")

    if "fwdparts" in stages:
        # cumulative timing of the backbone blocks, then + anchor heads:
        # where inside the forward do the milliseconds go?
        from frcnn_tpu.models.quant import quant_pnet_apply

        def partial_fwd(x, n_blocks, n_heads):
            if "int8" in mode:
                qp, scales = pnet.qparams, pnet.act_scales
                from frcnn_tpu.models.quant import _prelu, _qconv

                def qconv(x, name, pad):
                    s = None if scales is None else scales.get(name)
                    return _qconv(x, qp[name], pad, pnet.act_dtype, s_x=s)
            else:
                raise SystemExit("fwdparts: use with mode=int8[s][+...]")
            x = x.astype(pnet.act_dtype)
            from frcnn_tpu.models.layers import ceil_max_pool_2x2
            outs = []
            for bi, spec in enumerate(cfg.model.layers[:n_blocks]):
                for si in range(spec.conv_steps):
                    pad = [(spec.padH, spec.padH), (spec.padW, spec.padW)]
                    x = qconv(x, f"block{bi}_conv{si}", pad)
                    x = _prelu(x, qp[f"block{bi}_prelu{si}"]["slope"])
                x = ceil_max_pool_2x2(x)
                outs.append(x)
            acc = jnp.sum(x[0, 0, 0, :2]).astype(jnp.float32)
            for ai, aspec in enumerate(cfg.model.anchor_nets[:n_heads]):
                h = outs[aspec.input - 1]
                h = qconv(h, f"anchor{ai}_conv", "VALID")
                h = _prelu(h, qp[f"anchor{ai}_prelu"]["slope"])
                h = qconv(h, f"anchor{ai}_out", "VALID")
                acc = acc + jnp.sum(h[0, 0, 0, :2]).astype(jnp.float32)
            return acc * 1e-20

        nb = len(cfg.model.layers)
        for cut in range(1, nb + 1):
            def body(c, cut=cut):
                return partial_fwd(images + c, cut, 0)
            loop_time(body, n, f"blocks[0:{cut}]")
        for heads in range(1, len(cfg.model.anchor_nets) + 1):
            def body(c, heads=heads):
                return partial_fwd(images + c, nb, heads)
            loop_time(body, n, f"blocks+heads[0:{heads}]")

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
            # * 1e-20, NOT * 0.0: a mul-by-zero fold would break the
            # loop-carry dependence and let XLA hoist the top_k
            return jnp.sum(ts[0, :2]) * 1e-20

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

        if "pallas" in mode:
            from frcnn_tpu.ops.pallas_nms import pallas_nms

            def body(c):
                idx, ok = pallas_nms(tb + c, tsc, jnp.ones((bs, K), bool),
                                     PROPOSAL_NMS_IOU, D)
                return jnp.sum(idx[0, :2].astype(jnp.float32)) * 1e-20
            loop_time(body, n, "nms(K->D)[pallas]")
        else:
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

        def feature_rects(r, c):
            fw, fh = gen.fm_localizer.feature_map_size_jax(
                hw[:, 1], hw[:, 0]
            )
            return prepare_roi_rects(
                gen.fm_localizer.input_to_feature_rect_jax(r + c),
                fw[:, None].astype(jnp.float32),
                fh[:, None].astype(jnp.float32),
            )

        if "pallas" in mode:
            from frcnn_tpu.ops.pallas_roi_pool import pallas_adaptive_max_pool

            def body(c):
                out = pallas_adaptive_max_pool(fm, feature_rects(rects, c), kh, kw)
                return (jnp.sum(out[0, 0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
            loop_time(body, n, f"roi_pool({D})[pallas]")
        else:
            def body(c):
                pr = feature_rects(rects, c)
                out = jax.vmap(
                    lambda f, r: adaptive_max_pool(f, r, kh, kw)
                )(fm, pr)
                return (jnp.sum(out[0, 0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
            loop_time(body, n, f"roi_pool({D})")

    if "poolparts" in stages:
        # Why is the in-situ pool delta (tailparts) ~2.4x the isolated pool
        # stage? Candidates: bf16 kernel arithmetic (in situ fm is the
        # backbone's bf16, isolated bench feeds f32), the [B,H,W,C] ->
        # [B,W,H,C] transpose relayout of the 70 MB feature map, and the
        # output reshape boundary into cnet. Time each in isolation.
        from frcnn_tpu.ops.pallas_roi_pool import pallas_adaptive_max_pool

        fmp = jnp.asarray(rng.normal(size=(bs, gen.fm_hw[0], gen.fm_hw[1],
                                           cfg.model.layers[-1].filters))
                          .astype(np.float32))
        fmp16 = fmp.astype(jnp.bfloat16)
        rects = jnp.asarray(
            np.concatenate(
                [rng.uniform(0, 600, (bs, D, 2)), rng.uniform(30, 200, (bs, D, 2))],
                axis=2,
            ).astype(np.float32)
        )
        rects = rects.at[:, :, 2:].add(rects[:, :, :2])

        def feature_rects_p(r, c):
            fw, fh = gen.fm_localizer.feature_map_size_jax(hw[:, 1], hw[:, 0])
            return prepare_roi_rects(
                gen.fm_localizer.input_to_feature_rect_jax(r + c),
                fw[:, None].astype(jnp.float32),
                fh[:, None].astype(jnp.float32),
            )

        def body_t(c):
            ft = jnp.transpose(fmp16 + c.astype(jnp.bfloat16), (0, 2, 1, 3))
            return (jnp.sum(ft[0, 0, 0, :2].astype(jnp.float32))
                    * 1e-20).astype(jnp.float32)
        loop_time(body_t, n, "transpose(fm bf16)")

        def body_f32(c):
            out = pallas_adaptive_max_pool(fmp + c, feature_rects_p(rects, c),
                                           kh, kw)
            return (jnp.sum(out[0, 0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body_f32, n, f"pool({D})[f32]")

        def body_bf16(c):
            out = pallas_adaptive_max_pool(fmp16 + c.astype(jnp.bfloat16),
                                           feature_rects_p(rects, c), kh, kw)
            return (jnp.sum(out[0, 0, 0, 0, :2].astype(jnp.float32))
                    * 1e-20).astype(jnp.float32)
        loop_time(body_bf16, n, f"pool({D})[bf16]")

        def body_bf16_rs(c):
            out = pallas_adaptive_max_pool(fmp16 + c.astype(jnp.bfloat16),
                                           feature_rects_p(rects, c), kh, kw)
            flat = out.reshape(bs, D, -1)
            # full-sum forces the reshape/relayout to materialize
            return (jnp.sum(flat.astype(jnp.float32)) * 1e-23).astype(
                jnp.float32)
        loop_time(body_bf16_rs, n, f"pool({D})[bf16]+reshape")

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

    if "tailparts" in stages:
        # cumulative prefixes of the REAL detect program (stop_after cuts in
        # build_detect_fn): unlike the isolated stage bodies above, the
        # deltas here include every relayout/fusion boundary between stages,
        # so they account for the full-program milliseconds exactly.
        cfg2 = cfg
        imgs_in = images
        if "s2d" in mode:
            from frcnn_tpu.ops.pallas_block0 import pack_s2d

            cfg2 = cfg.replace(input_layout="s2d")
            imgs_in = pack_s2d(images)
        prev = 0.0
        cuts = ["fwd", "decode", "select", "nms", "pool", "cnet", None]
        if "s2d" in mode:
            cuts = ["b0"] + cuts  # frontend (normalize+views+block0+T) in situ
        for cut in cuts:
            det = build_detect_fn(cfg2, gen, pnet, cnet, stop_after=cut)

            def body(c, det=det, cut=cut):
                perturbed = jax.tree_util.tree_map(lambda a: a + c, imgs_in)
                out = det(params, stats, perturbed, hw)
                if cut is None:
                    return jnp.sum(out.boxes[0, 0]) * 1e-20
                return out * 1e-20

            per = loop_time(body, n, f"cum[{cut or 'FULL'}]")
            print(f"   delta[{cut or 'tail'}] {max(per - prev, 0.0)*1e3:9.3f} ms")
            prev = per

    if "full" in stages:
        imgs_full = images
        cfg_full = cfg
        if "s2d" in mode:
            from frcnn_tpu.ops.pallas_block0 import pack_s2d

            cfg_full = cfg.replace(input_layout="s2d")
            imgs_full = pack_s2d(images)
        detect = build_detect_fn(cfg_full, gen, pnet, cnet)

        def body(c):
            perturbed = jax.tree_util.tree_map(lambda a: a + c, imgs_full)
            out = detect(params, stats, perturbed, hw)
            return jnp.sum(out.boxes[0, 0]) * 1e-20
        per = loop_time(body, n, "FULL")
        print(f"full-detect throughput ~= {bs/per:.1f} img/s")


if __name__ == "__main__":
    main()
