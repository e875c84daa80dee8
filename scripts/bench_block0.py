"""Microbenchmark of block0 (conv 3->64 k=3 @450x800 + PReLU + 2x2 ceil
max-pool) — the measured hot spot of the detect forward (5.8 ms of the
12.2 ms int8s forward at batch 16, ~1% MXU).

Why it is slow in the naive form: C_in=3 occupies 3 of 128 lanes on the
conv's contraction dim, and the pre-pool activation ([B,450,800,64]) is a
737 MB HBM round-trip at batch 16.

Variants (argv selects any subset):
  int8    current quantized path (dynamic or static scale irrelevant here)
  bf16    plain lax.conv in bf16 + prelu + pool
  pad8    bf16 conv with channels zero-padded 3->8
  im2col  9 shifted slices -> [B,H,W,27] @ [27,64] dot + prelu + pool
  s2d     space-to-depth: pool(conv3x3(x)) == per-phase conv on [B,225,400,12]
          reformulated as one conv 4x4/valid on the s2d layout? (approx:
          measures the phase-conv max form)

Usage: python scripts/bench_block0.py [batch] [iters] [variant...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from frcnn_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from frcnn_tpu.models.layers import ceil_max_pool_2x2


def loop_time(make_body, n, label):
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

    _ = float(run(1, jnp.float32(0.0)))
    t_small = timed(1 + n // 4)
    t_big = timed(1 + n)
    per = (t_big - t_small) / (n - n // 4)
    print(f"{label:14s} {per*1e3:9.3f} ms/iter")
    return per


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    variants = set(sys.argv[3:]) or {"int8", "bf16", "pad8", "im2col"}
    H, W = 450, 800
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, H, W, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (64,)).astype(np.float32))
    slope = jnp.float32(0.25)

    def prelu(v):
        return jnp.where(v >= 0, v, slope * v)

    if "int8" in variants:
        wq = jnp.clip(jnp.round(w / 0.01), -127, 127).astype(jnp.int8)

        def body(c):
            xx = x + c
            s = jnp.maximum(jnp.max(jnp.abs(xx)) / 127.0, 1e-12)
            xq = jnp.clip(jnp.round(xx / s), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * (s * 0.01) + b).astype(jnp.bfloat16)
            out = ceil_max_pool_2x2(prelu(y))
            return (jnp.sum(out[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "int8")

    if "bf16" in variants:
        wb = w.astype(jnp.bfloat16)

        def body(c):
            y = jax.lax.conv_general_dilated(
                (x + c).astype(jnp.bfloat16), wb, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            out = ceil_max_pool_2x2(prelu((y + b).astype(jnp.bfloat16)))
            return (jnp.sum(out[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "bf16")

    if "pad8" in variants:
        w8 = jnp.pad(w, [(0, 0), (0, 0), (0, 5), (0, 0)]).astype(jnp.bfloat16)

        def body(c):
            x8 = jnp.pad((x + c).astype(jnp.bfloat16),
                         [(0, 0), (0, 0), (0, 0), (0, 5)])
            y = jax.lax.conv_general_dilated(
                x8, w8, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            out = ceil_max_pool_2x2(prelu((y + b).astype(jnp.bfloat16)))
            return (jnp.sum(out[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "pad8")

    if "im2col" in variants:
        wm = w.reshape(27, 64).astype(jnp.bfloat16)  # (ky,kx,c) x 64

        def body(c):
            xb = (x + c).astype(jnp.bfloat16)
            xp = jnp.pad(xb, [(0, 0), (1, 1), (1, 1), (0, 0)])
            cols = jnp.concatenate(
                [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3)
                 for dx in range(3)], axis=-1,
            )  # [B, H, W, 27]
            y = jnp.einsum("bhwk,kf->bhwf", cols, wm,
                           preferred_element_type=jnp.float32)
            out = ceil_max_pool_2x2(prelu((y + b).astype(jnp.bfloat16)))
            return (jnp.sum(out[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "im2col")


    if "s2d" in variants:
        # pool(prelu(conv3x3_same(x))) == groupmax_4(prelu(conv2x2_valid(
        #   s2d(pad(x,1)), W2))) where the 4 output-channel groups are the
        # 2x2 pooling phases. Contraction dim 2*2*12=48 (vs 27 with C=3),
        # and the conv output is stride-2 (4x fewer pixels pre-pool).
        W2 = np.zeros((2, 2, 12, 4 * 64), np.float32)
        wn = np.asarray(w)
        for ry in range(2):
            for rx in range(2):
                p = 2 * ry + rx
                for ky in range(3):
                    for kx in range(3):
                        cy, qy = divmod(ry + ky, 2)
                        cx, qx = divmod(rx + kx, 2)
                        for c in range(3):
                            ch = (qy * 2 + qx) * 3 + c
                            W2[cy, cx, ch, 64 * p:64 * (p + 1)] += wn[ky, kx, c]
        W2j = jnp.asarray(W2).astype(jnp.bfloat16)

        def s2d_block0(xx):
            xp = jnp.pad(xx.astype(jnp.bfloat16),
                         [(0, 0), (1, 1), (1, 1), (0, 0)])
            Bs, Hp, Wp, _ = xp.shape
            xs = xp.reshape(Bs, Hp // 2, 2, Wp // 2, 2, 3)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(Bs, Hp // 2, Wp // 2, 12)
            y = jax.lax.conv_general_dilated(
                xs, W2j, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            y = prelu((y + jnp.tile(b, 4)).astype(jnp.bfloat16))
            Bo, Ho, Wo, _ = y.shape
            return jnp.max(y.reshape(Bo, Ho, Wo, 4, 64), axis=3)

        # parity vs the straightforward formulation
        ref = ceil_max_pool_2x2(prelu(
            (jax.lax.conv_general_dilated(
                x.astype(jnp.float32), w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b)
        ))
        got = s2d_block0(x).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"s2d parity: max|diff|={err:.4f} (max|ref|={scale:.2f}, bf16 path)")

        def body(c):
            out = s2d_block0(x + c)
            return (jnp.sum(out[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "s2d")

    if "s2dsplit" in variants:
        # decompose the s2d variant: packing transpose vs conv+max, to see
        # whether host-side packing (free) would make the conv path viable
        W2j = jnp.asarray(np.zeros((2, 2, 12, 256), np.float32) + 0.01
                          ).astype(jnp.bfloat16)
        xp = jnp.pad(x.astype(jnp.bfloat16), [(0, 0), (1, 1), (1, 1), (0, 0)])
        Bs, Hp, Wp, _ = xp.shape
        xs_pre = xp.reshape(Bs, Hp // 2, 2, Wp // 2, 2, 3).transpose(
            0, 1, 3, 2, 4, 5).reshape(Bs, Hp // 2, Wp // 2, 12)

        def body_pack(c):
            xpp = jnp.pad((x + c).astype(jnp.bfloat16),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
            xs = xpp.reshape(Bs, Hp // 2, 2, Wp // 2, 2, 3).transpose(
                0, 1, 3, 2, 4, 5).reshape(Bs, Hp // 2, Wp // 2, 12)
            return (jnp.sum(xs[0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body_pack, n, "s2d:pack")

        def body_conv(c):
            y = jax.lax.conv_general_dilated(
                xs_pre + c.astype(jnp.bfloat16), W2j, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            y = prelu((y + jnp.tile(b, 4)).astype(jnp.bfloat16))
            Bo, Ho, Wo, _ = y.shape
            out = jnp.max(y.reshape(Bo, Ho, Wo, 4, 64), axis=3)
            return (jnp.sum(out[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body_conv, n, "s2d:conv+max")

        # same math as an explicit im2col matmul: XLA's MXU matmul path
        # instead of its (bad) small-C conv path
        Wmm = W2j.reshape(48, 256)

        def body_mm(c):
            xs = xs_pre + c.astype(jnp.bfloat16)
            cols = jnp.concatenate(
                [xs[:, dy:dy + 225, dx:dx + 400, :] for dy in range(2)
                 for dx in range(2)], axis=-1,
            )  # [B, 225, 400, 48]
            y = jnp.einsum("bhwk,kf->bhwf", cols, Wmm,
                           preferred_element_type=jnp.float32)
            y = prelu((y + jnp.tile(b, 4)).astype(jnp.bfloat16))
            Bo, Ho, Wo, _ = y.shape
            out = jnp.max(y.reshape(Bo, Ho, Wo, 4, 64), axis=3)
            return (jnp.sum(out[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body_mm, n, "s2d:mm+max")


    if "kernel" in variants:
        from frcnn_tpu.ops.pallas_block0 import (
            block0_weights,
            fused_block0,
            pack_s2d,
            views_from_s2d,
        )

        lum4, chroma = pack_s2d(x)
        cviews, lviews = views_from_s2d(lum4, chroma)
        wt, bias = block0_weights(np.asarray(w), np.asarray(b))

        # parity on TPU (hardware Mosaic path, not interpret)
        from frcnn_tpu.models.layers import ceil_max_pool_2x2 as _pool
        ref = _pool(prelu(jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b))
        got = fused_block0(cviews, lviews, wt, bias, 0.25).transpose(0, 1, 3, 2)
        err = float(jnp.max(jnp.abs(ref - got.astype(jnp.float32))))
        print(f"kernel parity: max|diff|={err:.4f}")

        def body(c):
            cb = c.astype(jnp.bfloat16)
            out = fused_block0([v + cb for v in cviews],
                               [v + cb for v in lviews], wt, bias, 0.25)
            return (jnp.sum(out[0, 0, :2, 0]) * 1e-20).astype(jnp.float32)
        loop_time(body, n, "kernel")

        def body3(c):
            l4, ch = pack_s2d(x + c)
            cv, lv = views_from_s2d(l4, ch)
            out = fused_block0(cv, lv, wt, bias, 0.25).transpose(0, 1, 3, 2)
            return (jnp.sum(out[0, 0, 0, :2]) * 1e-20).astype(jnp.float32)
        loop_time(body3, n, "pack+kernel+T")


def norm_parts():
    """Decompose normalize_s2d cost (the interleaved-layout predecessor
    measured 3.39 ms/batch16, of which 1.26 ms was luminance
    extract/reinsert relayouts — the split phase-major layout removes
    them). Usage: python scripts/bench_block0.py normparts [batch] [iters]"""
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    import numpy as np
    from frcnn_tpu.ops.normalization import (
        _smooth_phased, gaussian1d, normalize_s2d, phase_masks,
    )
    from frcnn_tpu.ops.pallas_block0 import pack_s2d

    H, W = 450, 800
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.3, 0.2, (bs, H, W, 3)).astype(np.float32))
    hw = jnp.tile(jnp.asarray([[H, W]], jnp.int32), (bs, 1))
    lum4, chroma = pack_s2d(x)
    Hc, Wc = chroma.shape[1], chroma.shape[3]
    k = jnp.asarray(gaussian1d(7))

    def t(label, fn):
        def body(c):
            out = fn(c)
            return (jnp.sum(out.astype(jnp.float32).ravel()[:2])
                    * 1e-20).astype(jnp.float32)
        loop_time(body, n, label)

    t("full", lambda c: jax.vmap(
        lambda l, p, h: normalize_s2d(l + c, p + c, h[0], h[1])
    )(lum4, chroma, hw)[0])
    t("statsonly", lambda c: jax.vmap(
        lambda l, p, h: normalize_s2d(l + c, p + c, h[0], h[1],
                                      method="none")
    )(lum4, chroma, hw)[0])

    m4 = jax.vmap(lambda h: phase_masks(Hc, Wc, h[0], h[1]))(hw)

    t("smooth1", lambda c: jax.vmap(
        lambda z: _smooth_phased(z, k))(lum4 + c))
    t("smooth3", lambda c: jax.vmap(lambda z, m: _smooth_phased(
        _smooth_phased(z, k) * m, k) + _smooth_phased(z * z, k)
    )(lum4 + c, m4))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "normparts":
        norm_parts()
    else:
        main()
