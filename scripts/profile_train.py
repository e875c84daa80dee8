"""Training-step throughput on the current default device.

Times N data-dependent train steps inside one XLA program (same fetch-based
method as profile_detect.py). Reports steps/sec and images/sec.

Usage: python scripts/profile_train.py [images_per_step] [loop_iters] [stage...]
Stages (default: step): loss (objective fwd only), grad (value_and_grad,
no update), step (grad + optimizer apply). loss vs grad isolates the
backward pass; grad vs step isolates the rmsprop update. Adding 'pallas'
switches the objective's ROI pool to the Pallas fwd+bwd kernels.
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/frcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    cfg = duplo_config()
    cfg = cfg.replace(shapes=_dc.replace(cfg.shapes, image_hw=(450, 800)))
    cfg = cfg.replace(shapes=dataclasses.replace(cfg.shapes, images_per_step=B))
    if use_pallas:
        cfg = cfg.replace(pallas_mode="on")
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
    for b in range(B):
        for g in range(4):
            x0 = rng.uniform(5, W - 140)
            y0 = rng.uniform(5, H - 140)
            gt[b, g] = [x0, y0, x0 + rng.uniform(40, 130), y0 + rng.uniform(40, 130)]
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
                p, s, o, total = body_step(p, s, o, batch, rng)
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
