"""Detection throughput benchmark.

Measures batched end-to-end detect (pnet + dense decode + proposal NMS +
ROI pool + cnet + per-class NMS) at the duplo 450x800 bucket on the default
device (TPU under the driver). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
Baseline: BASELINE.json north star = 1000 images/sec/chip.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMAGES_PER_SEC = 1000.0


def main():
    # persistent compile cache: repeated bench invocations skip XLA compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/frcnn_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from frcnn_tpu.config import duplo_config
    from frcnn_tpu.detect.detector import build_detect_fn
    from frcnn_tpu.geometry.anchors import AnchorGenerator
    from frcnn_tpu.models.factory import create_models, init_params

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mode = sys.argv[3] if len(sys.argv) > 3 else "bf16"  # bf16 | int8 | pallas

    cfg = duplo_config()
    if mode == "pallas":
        cfg = cfg.replace(pallas_mode="on")
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))

    # Stress the data-dependent stages honestly: bias the anchor heads so
    # every cell proposes (random init would propose nothing at the 0.95
    # gate, letting the early-exit NMS skip its work). This is a heavier
    # proposal load than any real scene.
    pp = jax.tree.map(lambda x: x, params)
    for ai in range(4):
        b = np.zeros(18, np.float32)
        for j in range(3):
            b[6 * j] = 6.0
        pp["pnet"][f"anchor{ai}_out"]["bias"] = jnp.asarray(b)
    params = pp

    detect = jax.jit(build_detect_fn(cfg, gen, pnet, cnet))

    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0.3, 0.2, size=(batch_size, H, W, 3)).astype(np.float32)
    )
    true_hw = jnp.tile(jnp.asarray([[H, W]], jnp.int32), (batch_size, 1))

    pnet_for_detect = pnet
    if mode == "int8":
        from frcnn_tpu.models.factory import compute_dtype
        from frcnn_tpu.models.quant import (
            QuantizedPNetAdapter,
            quantize_pnet_params,
        )

        qparams = quantize_pnet_params(params, cfg.model)
        pnet_for_detect = QuantizedPNetAdapter(
            cfg.model, qparams, act_dtype=compute_dtype(cfg)
        )

    # block_until_ready does not block on this remote platform, so time N
    # data-dependent detect iterations inside ONE XLA program and fetch a
    # scalar; difference two loop lengths to cancel launch overhead.
    detect_fn = build_detect_fn(cfg, gen, pnet_for_detect, cnet)

    @jax.jit
    def run(n, p, st, imgs, hw):
        def body(i, c):
            out = detect_fn(p, st, imgs + c, hw)
            return jnp.sum(out.boxes[0, 0]) * 1e-20

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    _ = float(run(1, params, stats, images, true_hw))
    print(f"# compile+first-run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def timed(k, trials=3):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            _ = float(run(k, params, stats, images, true_hw))
            best = min(best, time.perf_counter() - t0)
        return best

    n_small = 1 + iters // 4
    n_big = 1 + iters
    dt = timed(n_big) - timed(n_small)
    ips = batch_size * (n_big - n_small) / dt
    suffix = "" if mode == "bf16" else f" [{mode}]"
    print(
        json.dumps(
            {
                "metric": "batched detect images/sec/chip @800x450 "
                          f"(vgg_small/duplo){suffix}",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
