"""Cross-framework parity: our ops vs PyTorch's implementations of the
same operators the Torch7 reference uses (AdaptiveMaxPool2d, SmoothL1,
CrossEntropy/NLL, PReLU, Conv2d, MaxPool2d(ceil), BatchNorm1d, RMSprop).
PyTorch shares these operator semantics with Torch7's nn/optim, so this is
independent numerical evidence beyond our own loop oracles."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_adaptive_max_pool_vs_torch():
    from frcnn_tpu.ops.roi_pool import adaptive_max_pool

    rng = np.random.default_rng(0)
    for (H, W) in [(29, 50), (7, 9), (3, 4), (13, 31)]:
        x = rng.normal(size=(H, W, 8)).astype(np.float32)
        ours = np.asarray(
            adaptive_max_pool(
                jnp.asarray(x), jnp.asarray([[0.0, 0.0, W, H]]), 6, 6
            )
        )[0]
        t = torch.nn.AdaptiveMaxPool2d((6, 6))(
            torch.from_numpy(x.transpose(2, 0, 1))
        ).numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours, t, rtol=1e-6, err_msg=f"{H}x{W}")


def test_smooth_l1_vs_torch():
    from frcnn_tpu.train.losses import smooth_l1

    rng = np.random.default_rng(1)
    a = rng.normal(0, 2, size=(64, 4)).astype(np.float32)
    b = rng.normal(0, 2, size=(64, 4)).astype(np.float32)
    ours = float(jnp.sum(smooth_l1(jnp.asarray(a), jnp.asarray(b))))
    theirs = float(
        torch.nn.functional.smooth_l1_loss(
            torch.from_numpy(a), torch.from_numpy(b), reduction="sum"
        )
    )
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_cross_entropy_vs_torch():
    from frcnn_tpu.train.losses import cross_entropy_fg_bg, nll_loss

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(32, 2)).astype(np.float32)
    is_fg = rng.integers(0, 2, 32).astype(bool)
    ours = np.asarray(cross_entropy_fg_bg(jnp.asarray(logits), jnp.asarray(is_fg)))
    targets = torch.from_numpy(np.where(is_fg, 0, 1))
    theirs = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), targets, reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    logp = rng.normal(size=(16, 5)).astype(np.float32)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    tg = rng.integers(0, 5, 16)
    ours2 = np.asarray(nll_loss(jnp.asarray(logp), jnp.asarray(tg)))
    theirs2 = torch.nn.functional.nll_loss(
        torch.from_numpy(logp), torch.from_numpy(tg), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours2, theirs2, rtol=1e-5)


def test_conv_block_vs_torch():
    """One ConvPReLU + ceil pool with identical weights: NHWC flax vs NCHW
    torch to 1e-4."""
    from frcnn_tpu.models.layers import PReLU, ceil_max_pool_2x2
    from flax import linen as nn

    rng = np.random.default_rng(3)
    Cin, Cout, H, W = 3, 8, 21, 27  # odd dims exercise ceil pooling
    x = rng.normal(size=(1, H, W, Cin)).astype(np.float32)
    w = rng.normal(0, 0.1, size=(3, 3, Cin, Cout)).astype(np.float32)
    b = rng.normal(0, 0.1, size=(Cout,)).astype(np.float32)
    slope = 0.25

    conv = nn.Conv(Cout, (3, 3), padding=[(1, 1), (1, 1)], name="c")
    prelu = PReLU()
    y = conv.apply({"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}},
                   jnp.asarray(x))
    y = prelu.apply({"params": {"slope": jnp.asarray([slope])}}, y)
    y = np.asarray(ceil_max_pool_2x2(y))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tconv = torch.nn.Conv2d(Cin, Cout, 3, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(b))
        ty = tconv(tx)
        ty = torch.nn.functional.prelu(ty, torch.tensor([slope]))
        ty = torch.nn.MaxPool2d(2, 2, ceil_mode=True)(ty)
    np.testing.assert_allclose(
        y, ty.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_batchnorm_vs_torch():
    from frcnn_tpu.models.layers import MaskedBatchNorm

    rng = np.random.default_rng(4)
    x = rng.normal(3, 2, size=(1, 40, 6)).astype(np.float32)
    bn = MaskedBatchNorm(features=6)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.ones((1, 40), bool), False)
    y, newv = bn.apply(v, jnp.asarray(x), jnp.ones((1, 40), bool), False,
                       mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm1d(6, eps=1e-5, momentum=0.1)
    tbn.train()
    ty = tbn(torch.from_numpy(x[0]))
    np.testing.assert_allclose(np.asarray(y)[0], ty.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    # running stats after one step match too
    np.testing.assert_allclose(
        np.asarray(newv["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(newv["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-5,
    )


def test_rmsprop_vs_torch():
    """Our torch-semantics RMSprop tracks torch.optim.RMSprop trajectories
    (eps OUTSIDE the sqrt — optax's native rmsprop differs)."""
    from frcnn_tpu.train.optim import torch_rmsprop

    rng = np.random.default_rng(5)
    w0 = rng.normal(size=(7,)).astype(np.float32)
    grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(5)]

    tx = torch_rmsprop(1e-2, alpha=0.9)
    state = tx.init({"w": jnp.asarray(w0)})
    params = {"w": jnp.asarray(w0)}
    for g in grads:
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + upd["w"]}

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.RMSprop([tw], lr=1e-2, alpha=0.9, eps=1e-8)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6
    )
