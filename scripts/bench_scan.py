"""Micro-benchmark: cumulative scan formulations on TPU.

The anchor-labeling profile (profile_train.py labelparts) showed
match_positives + select_positive_pairs at ~45 ms/batch-8 — entirely in
cumulative ops over the anchor axis ([G=32, A=26544] row scans and one
flat 850k cumsum). This compares formulations so the matching code can
use the fastest exact one:

  assoc   jax.lax.associative_scan (current implementation)
  lax     lax.cummax / lax.cumsum primitives
  hillis  manual Hillis-Steele doubling (contiguous pad+slice shifts)
  matmul  blocked lower-triangular matmul for cumsum (MXU; f32)

Usage: python scripts/bench_scan.py [iters]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from frcnn_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

G, A = 32, 26544
BATCH = 8


def hillis_cummax(x, axis=-1):
    n = x.shape[axis]
    shift = 1
    while shift < n:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (shift, 0)
        shifted = jnp.pad(x, pad, constant_values=-np.inf)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
        x = jnp.maximum(x, shifted[tuple(sl)])
        shift *= 2
    return x


def hillis_cumsum_i32(x, axis=-1):
    n = x.shape[axis]
    shift = 1
    while shift < n:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (shift, 0)
        shifted = jnp.pad(x, pad, constant_values=0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
        x = x + shifted[tuple(sl)]
        shift *= 2
    return x


def matmul_cumsum_flat(x, block=2048):
    """Exact cumsum of a flat f32 vector via blocked triangular matmul."""
    n = x.shape[0]
    nb = -(-n // block)
    xp = jnp.pad(x, (0, nb * block - n)).reshape(nb, block)
    tri = jnp.tril(jnp.ones((block, block), jnp.float32))
    within = xp @ tri.T                       # [nb, block] row-wise cumsum
    chunk_tot = within[:, -1]
    carry = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                             jnp.cumsum(chunk_tot)[:-1]])
    return (within + carry[:, None]).reshape(-1)[:n]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(BATCH, G, A)).astype(np.float32))
    flat = jnp.asarray(
        (rng.random((BATCH, G * A)) < 0.01).astype(np.float32))

    cases = {
        "rowmax assoc": lambda x, f: jnp.sum(
            jax.lax.associative_scan(jnp.maximum, x, axis=2)[..., ::64]),
        "rowmax lax.cummax": lambda x, f: jnp.sum(
            jax.lax.cummax(x, axis=2)[..., ::64]),
        "rowmax hillis": lambda x, f: jnp.sum(
            hillis_cummax(x, axis=2)[..., ::64]),
        "rowsum lax.cumsum(i32)": lambda x, f: jnp.sum(
            jax.lax.cumsum((x > 0).astype(jnp.int32), axis=2)[..., ::64]
        ).astype(jnp.float32),
        "rowsum hillis(i32)": lambda x, f: jnp.sum(
            hillis_cumsum_i32((x > 0).astype(jnp.int32), axis=2)[..., ::64]
        ).astype(jnp.float32),
        "flatsum lax.cumsum": lambda x, f: jnp.sum(
            jax.vmap(lambda v: jax.lax.cumsum(v))(f)[..., ::64]),
        "flatsum matmul": lambda x, f: jnp.sum(
            jax.vmap(matmul_cumsum_flat)(f)[..., ::64]),
    }

    for label, fn in cases.items():
        @jax.jit
        def run(k, x, f):
            def body(i, c):
                return fn(x + c * 1e-30, f + c * 1e-30) * 1e-20
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        _ = float(run(1, rows, flat))
        print(f"# {label} compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

        def timed(k, trials=3):
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(k, rows, flat))
                best = min(best, time.perf_counter() - t0)
            return best

        small, big = 1 + iters // 4, 1 + iters
        per = (timed(big) - timed(small)) / (big - small)
        print(f"{label:26s} {per*1e3:8.3f} ms/iter (batch {BATCH})")


if __name__ == "__main__":
    main()
