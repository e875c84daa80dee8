"""Isolated 2x2 ceil-pool backward: Pallas first-max kernel vs XLA
SelectAndScatter, per backbone shape.

The round-3 in-situ train profile regressed with the first-max kernel on
(train8 49.7 -> 55.8 ms, train16 95.8 -> 106.0): this isolates where.
Times each implementation on the four vgg_small duplo @450x800 pre-pool
shapes with in-program fori_loop iterations and one scalar fetch
(jax.block_until_ready is a no-op on the remote platform).

Usage: python scripts/bench_pool_bwd.py [iters] [batch]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# FRCNN_TPU_PLATFORM=cpu: smoke-test mode (kernel runs interpreted)
INTERP = os.environ.get("FRCNN_TPU_PLATFORM") == "cpu"
if os.environ.get("FRCNN_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FRCNN_TPU_PLATFORM"])
from frcnn_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from frcnn_tpu.models.layers import ceil_max_pool_2x2
from frcnn_tpu.ops.pallas_pool_bwd import _pool_bwd_pallas

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

# pre-pool activations of the four vgg_small blocks (duplo @450x800)
SHAPES = [
    (B, 450, 800, 64),
    (B, 225, 400, 128),
    (B, 113, 200, 256),
    (B, 57, 100, 384),
]


def timed(label, fn, x, g):
    @jax.jit
    def run(k, x, g):
        def body(i, acc):
            # data dependence: perturb g so nothing hoists out of the loop
            dx = fn(x, g + acc.astype(g.dtype))
            return acc + dx[0, 0, 0, 0].astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    _ = float(run(1, x, g))
    print(f"# {label} compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(ITERS, x, g))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{label}: {best * 1e3:.3f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    total = {"ss": 0.0, "pallas": 0.0}
    for shape in SHAPES:
        Bs, H, W, C = shape
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32),
                        dtype=jnp.bfloat16)
        Hc, Wc = (H + 1) // 2, (W + 1) // 2
        g = jnp.asarray(rng.normal(size=(Bs, Hc, Wc, C)).astype(np.float32),
                        dtype=jnp.bfloat16)

        def ss_bwd(x, g):
            _, vjp = jax.vjp(ceil_max_pool_2x2, x)
            return vjp(g)[0]

        def pk_bwd(x, g):
            return _pool_bwd_pallas(x, g, interpret=INTERP)

        name = f"[{Bs},{H},{W},{C}]"
        total["ss"] += timed(f"ss     {name}", ss_bwd, x, g)
        total["pallas"] += timed(f"pallas {name}", pk_bwd, x, g)
    print(f"TOTAL ss: {total['ss'] * 1e3:.3f} ms  "
          f"pallas: {total['pallas'] * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
