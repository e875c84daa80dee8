"""Mosaic int8 ``dot`` viability + speed probe (run on the real TPU).

docs/perf_ceiling.md parks two items on "Mosaic int8 dot support
unverified here": custom int8 conv kernels with fused requantize
epilogues (vgg_small blocks 1-3, ~1.1 ms available) and an int8 variant
of the 2-conv block0 kernel (vgg_large's 64->64 conv1 is MXU-width
capped, so int8's doubled per-pass throughput would halve its in-kernel
floor). This probe answers, on the actual backend:

  1. does ``lax.dot_general`` on s8 x s8 -> s32 compile inside a Pallas
     TPU kernel at all,
  2. is it numerically exact vs the XLA int8 matmul,
  3. what effective TOPS does it reach vs the same kernel in bf16.

Timing methodology per CLAUDE.md: N data-dependent iterations inside one
jitted fori_loop, fetch one scalar (block_until_ready is a no-op here).

Usage: python scripts/probe_int8_dot.py [M] [K] [N] [iters]
Prints one JSON line per experiment.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from frcnn_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def _mm_kernel(a_ref, b_ref, o_ref, *, acc_dtype):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )


def pallas_mm(a, b, acc_dtype, interpret=False):
    M, K = a.shape
    K2, N = b.shape
    assert K == K2
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        interpret=interpret,
    )(a, b)


def timed_loop(fn, a, b, iters):
    """Chained data-dependent matmuls inside one program; returns seconds
    per call (launch overhead cancelled by differencing two loop lengths)."""

    @jax.jit
    def run(n, a, b):
        def body(i, c):
            out = fn(a, b)
            # fold a data-dependent scalar back into the next iteration
            return c + out[0, 0].astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(1, a, b))  # compile
    best = float("inf")
    n_small, n_big = 1 + iters // 4, 1 + iters
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(n_big, a, b))
        t_big = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(n_small, a, b))
        t_small = time.perf_counter() - t0
        best = min(best, (t_big - t_small) / (n_big - n_small))
    return best


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    flops = 2.0 * M * K * N

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    # 1+2: compile + exactness of the s8 x s8 -> s32 Pallas kernel
    rec = {"probe": "mosaic_int8_dot", "M": M, "K": K, "N": N}
    try:
        got = pallas_mm(a8, b8, jnp.int32)
        want = jax.lax.dot_general(
            a8, b8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        exact = bool(jnp.all(got == want))
        rec.update(compiles=True, exact=exact)
    except Exception as e:  # noqa: BLE001 — Mosaic verification errors
        rec.update(compiles=False, error=f"{type(e).__name__}: {e}"[-400:])
        print(json.dumps(rec))
        return
    print(json.dumps(rec))

    # 3: in-kernel throughput, int8 vs bf16, same shapes
    for name, fn, a, b in (
        ("pallas_s8s8s32", lambda x, y: pallas_mm(x, y, jnp.int32), a8, b8),
        ("pallas_bf16", lambda x, y: pallas_mm(x, y, jnp.float32), abf, bbf),
        ("xla_s8s8s32",
         lambda x, y: jax.lax.dot_general(
             x, y, (((1,), (0,)), ((), ())),
             preferred_element_type=jnp.int32), a8, b8),
        ("xla_bf16",
         lambda x, y: jax.lax.dot_general(
             x, y, (((1,), (0,)), ((), ())),
             preferred_element_type=jnp.float32), abf, bbf),
    ):
        try:
            sec = timed_loop(fn, a, b, iters)
            print(json.dumps({"probe": name, "ms": round(sec * 1e3, 4),
                              "tops": round(flops / sec / 1e12, 1)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": name,
                              "error": f"{type(e).__name__}: {e}"[-300:]}))


if __name__ == "__main__":
    main()
