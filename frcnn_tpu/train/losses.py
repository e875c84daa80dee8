"""Loss primitives matching the Torch criterions used by the reference
(``objective.lua:24-27``): CrossEntropyCriterion on the 2-logit fg/bg head,
SmoothL1Criterion with sizeAverage=false (sum reduction), and
ClassNLLCriterion (mean reduction) on cnet's log-softmax output."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred, target):
    """Elementwise Huber with delta=1 (torch SmoothL1): 0.5 d^2 if |d| < 1
    else |d| - 0.5. No reduction — callers mask and sum."""
    d = pred - target
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


def cross_entropy_fg_bg(logits2, is_fg):
    """Per-example 2-class cross entropy: logits2 [..., 2] (channel 0 = fg,
    ``objective.lua:104-106, 131-133``); is_fg [...] bool selects the target
    class (fg=0, bg=1)."""
    logp = jax.nn.log_softmax(logits2, axis=-1)
    return jnp.where(is_fg, -logp[..., 0], -logp[..., 1])


def nll_loss(log_probs, targets):
    """Per-example negative log likelihood from log-probabilities:
    log_probs [..., C], targets [...] int."""
    return -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
