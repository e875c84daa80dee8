"""Pallas ROI pool (interpret mode on CPU) vs the XLA formulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.ops.pallas_roi_pool import pallas_adaptive_max_pool
from frcnn_tpu.ops.roi_pool import adaptive_max_pool


def random_rects(rng, n, W, H):
    out = []
    for _ in range(n):
        x0 = int(rng.integers(0, W - 1))
        y0 = int(rng.integers(0, H - 1))
        out.append([x0, y0, int(rng.integers(x0 + 1, W + 1)),
                    int(rng.integers(y0 + 1, H + 1))])
    return np.array(out, np.float32)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_pool_matches_xla(seed):
    rng = np.random.default_rng(seed)
    B, H, W, C = 2, 29, 50, 128
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    rects = np.stack([random_rects(rng, 16, W, H) for _ in range(B)])
    got = np.asarray(
        pallas_adaptive_max_pool(jnp.asarray(fm), jnp.asarray(rects), 6, 6, True)
    )
    expect = np.asarray(
        jax.vmap(lambda f, r: adaptive_max_pool(f, r, 6, 6))(
            jnp.asarray(fm), jnp.asarray(rects)
        )
    )
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_pallas_pool_small_regions():
    rng = np.random.default_rng(3)
    B, H, W, C = 1, 20, 24, 128
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    rects = np.array([[[3, 4, 5, 6], [0, 0, 1, 1], [10, 10, 24, 20]]],
                     np.float32)
    got = np.asarray(
        pallas_adaptive_max_pool(jnp.asarray(fm), jnp.asarray(rects), 6, 6, True)
    )
    expect = np.asarray(
        jax.vmap(lambda f, r: adaptive_max_pool(f, r, 6, 6))(
            jnp.asarray(fm), jnp.asarray(rects)
        )
    )
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    assert np.isfinite(got).all()


def test_pallas_pool_gradient():
    rng = np.random.default_rng(4)
    B, H, W, C = 1, 12, 16, 128
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    rects = np.array([[[2, 2, 14, 10]]], np.float32)

    def f_pallas(x):
        return jnp.sum(
            pallas_adaptive_max_pool(x, jnp.asarray(rects), 3, 3, True) ** 2
        )

    def f_xla(x):
        return jnp.sum(
            jax.vmap(lambda f, r: adaptive_max_pool(f, r, 3, 3))(
                x, jnp.asarray(rects)
            ) ** 2
        )

    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(fm)))
    g2 = np.asarray(jax.grad(f_xla)(jnp.asarray(fm)))
    np.testing.assert_allclose(g1, g2, rtol=1e-5)


def test_pallas_pool_gradient_ties_and_overlap():
    """Backward kernel vs XLA autodiff on the hard cases: quantized values
    (deliberate in-window ties -> even split among tied maxima),
    overlapping rois accumulating into the same cells, multiple images,
    roi blocks > 1, and a degenerate 1x1 roi."""
    rng = np.random.default_rng(9)
    B, H, W, C = 2, 11, 15, 128
    # values on a coarse grid force exact ties inside pooling windows
    fm = (rng.integers(0, 4, size=(B, H, W, C)) * 0.5).astype(np.float32)
    rects = np.asarray(
        [
            [[0, 0, 9, 8], [2, 1, 13, 9], [4, 4, 5, 5], [0, 0, 15, 11]],
            [[1, 1, 14, 10], [1, 1, 14, 10], [7, 3, 12, 11], [0, 2, 3, 9]],
        ],
        np.float32,
    )

    def f_pallas(x):
        return jnp.sum(
            pallas_adaptive_max_pool(x, jnp.asarray(rects), 3, 3, True)
            * jnp.arange(1.0, 5.0)[None, :, None, None, None]
        )

    def f_xla(x):
        return jnp.sum(
            jax.vmap(lambda f, r: adaptive_max_pool(f, r, 3, 3))(
                x, jnp.asarray(rects)
            ) * jnp.arange(1.0, 5.0)[None, :, None, None, None]
        )

    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(fm)))
    g2 = np.asarray(jax.grad(f_xla)(jnp.asarray(fm)))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_pallas_pool_gradient_bf16():
    """bf16 feature map (the train step's compute dtype). The backward
    kernel recomputes/compares/accumulates in f32 internally (Mosaic
    rejects bf16 cmpf in its layouts; f32 also avoids per-add rounding),
    so its gradient does NOT bit-match XLA's bf16 autodiff — instead both
    are compared against the exact f32 reference gradient on the same
    (bf16-valued) data: the kernel must be at least as close."""
    rng = np.random.default_rng(7)
    B, H, W, C = 2, 12, 16, 128
    fm = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    rects = jnp.asarray(np.stack(
        [random_rects(rng, 8, W, H) for _ in range(B)]))
    g = jnp.asarray(rng.normal(size=(B, 8, 6, 6, C)), jnp.bfloat16)

    def f_pallas(x):
        return jnp.sum(
            pallas_adaptive_max_pool(x, rects, 6, 6, True)
            .astype(jnp.float32) * g.astype(jnp.float32))

    def f_xla(x):
        return jnp.sum(
            jax.vmap(lambda f, r: adaptive_max_pool(f, r, 6, 6))(x, rects)
            .astype(jnp.float32) * g.astype(jnp.float32))

    gp = np.asarray(jax.grad(f_pallas)(fm), np.float32)
    gx = np.asarray(jax.grad(f_xla)(fm), np.float32)
    # exact reference: same bf16 VALUES, f32 arithmetic throughout
    gt = np.asarray(
        jax.grad(f_xla)(fm.astype(jnp.float32)), np.float32)
    err_pallas = np.abs(gp - gt).max()
    err_xla = np.abs(gx - gt).max()
    # kernel gradient within bf16 output-rounding of the true gradient,
    # and statistically no further from it than the bf16 XLA autodiff it
    # replaces (20% max-norm slack: individual extremes are rounding noise)
    assert err_pallas <= max(err_xla * 1.2, 0.02), (err_pallas, err_xla)
    assert np.abs(gp - gt).mean() <= np.abs(gx - gt).mean() * 1.05
    # structure: bf16 rounding can collide distinct values into ties that
    # the f32 reference does not have, re-splitting gradient mass on a few
    # elements — the kernel must not disagree with the reference more
    # often than the bf16 XLA path it replaces does
    dis_p = int((np.abs(gp - gt) > 0.02 + 0.03 * np.abs(gt)).sum())
    dis_x = int((np.abs(gx - gt) > 0.02 + 0.03 * np.abs(gt)).sum())
    assert dis_p <= max(dis_x, 8), (dis_p, dis_x)


def test_aligned_column_window_covers_every_bin():
    """Invariants of the v2 kernel's aligned column slicing: for every
    feature-map width W and every possible bin [lo, hi) of every rect,
    the 8-aligned window start lo_a = 8*clip(lo//8, 0, wal) is in bounds
    and the mask window [shift, shift + hi - lo) fits inside maxw8."""
    from frcnn_tpu.ops.pallas_roi_pool import _cdiv

    for W in list(range(1, 40)) + [50, 57, 100, 125, 200, 256]:
        for kw in (1, 2, 6, 7):
            maxw = min(W, _cdiv(W, kw) + 1)
            m0 = min(W, maxw + 7)
            maxw8 = W - 8 * ((W - m0) // 8)
            wal = (W - maxw8) // 8
            assert maxw8 >= maxw and maxw8 <= W and (W - maxw8) % 8 == 0
            for x0 in range(W):
                for x1 in range(x0 + 1, W + 1):
                    w = x1 - x0
                    for cb in range(kw):
                        lo = x0 + (cb * w) // kw
                        hi = x0 + -((-(cb + 1) * w) // kw)
                        lo_a = 8 * min(max(lo // 8, 0), wal)
                        assert 0 <= lo_a <= W - maxw8
                        shift = lo - lo_a
                        assert shift >= 0
                        assert shift + (hi - lo) <= maxw8, (
                            W, kw, x0, x1, cb, lo, hi, lo_a, maxw8)


def test_pallas_pool_valid_skip_fwd_and_grad():
    """pallas_adaptive_max_pool_valid: invalid rois yield zero pooled rows
    and contribute nothing to the fm gradient; valid rois match the
    unmasked kernel and the XLA formulation exactly. The gradient
    comparison masks invalid rois in the loss — the variant's contract
    (objective.py masks every roi-dependent loss term by roi_valid)."""
    from frcnn_tpu.ops.pallas_roi_pool import pallas_adaptive_max_pool_valid

    rng = np.random.default_rng(11)
    B, H, W, C = 2, 11, 15, 128
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    rects = np.asarray(
        [
            [[0, 0, 9, 8], [2, 1, 13, 9], [4, 4, 5, 5], [0, 0, 15, 11]],
            [[1, 1, 14, 10], [3, 2, 8, 7], [7, 3, 12, 11], [0, 2, 3, 9]],
        ],
        np.float32,
    )
    valid = np.asarray([[1, 0, 1, 0], [0, 1, 1, 1]], np.int32)

    pooled_m = np.asarray(
        pallas_adaptive_max_pool_valid(
            jnp.asarray(fm), jnp.asarray(rects), jnp.asarray(valid), 3, 3, True
        )
    )
    pooled_u = np.asarray(
        pallas_adaptive_max_pool(jnp.asarray(fm), jnp.asarray(rects), 3, 3, True)
    )
    for b in range(B):
        for r in range(valid.shape[1]):
            if valid[b, r]:
                np.testing.assert_array_equal(pooled_m[b, r], pooled_u[b, r])
            else:
                assert np.all(pooled_m[b, r] == 0.0)

    vmask = jnp.asarray(valid, jnp.float32)[:, :, None, None, None]

    def f_masked(x):
        p = pallas_adaptive_max_pool_valid(
            x, jnp.asarray(rects), jnp.asarray(valid), 3, 3, True
        )
        return jnp.sum((p * vmask) ** 2)

    def f_xla(x):
        p = jax.vmap(lambda f, r: adaptive_max_pool(f, r, 3, 3))(
            x, jnp.asarray(rects)
        )
        return jnp.sum((p * vmask) ** 2)

    g1 = np.asarray(jax.grad(f_masked)(jnp.asarray(fm)))
    g2 = np.asarray(jax.grad(f_xla)(jnp.asarray(fm)))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)
