"""Optimizers and the learning-rate schedule.

``optim.rmsprop`` semantics (the reference's default, ``main.lua:133``):
  m <- alpha * m + (1 - alpha) * g^2
  p <- p - lr * g / (sqrt(m) + eps)        (eps OUTSIDE the sqrt, 1e-8)
which differs from optax's scale_by_rms (eps inside the sqrt), so it is
implemented directly. ``sgd`` (weight decay 5e-4, momentum 0.9) and ``nag``
match the reference's commented-out alternatives (``main.lua:122-124``).

Schedule: the reference *intends* to halve the lr every 5000 steps
(``main.lua:127-130``) but writes the wrong state key, so it actually runs
at constant lr. ``halve5k`` implements the intent; ``constant`` the actual
behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from frcnn_tpu.config import Config


def lr_schedule(cfg: Config):
    base = cfg.learning_rate
    if cfg.lr_schedule == "constant":
        return lambda step: jnp.asarray(base, jnp.float32)

    def halve5k(step):
        return base * jnp.power(0.5, jnp.floor(step / 5000.0))

    return halve5k


class RmsPropState(NamedTuple):
    step: jnp.ndarray
    m: optax.Updates


def torch_rmsprop(learning_rate, alpha: float = 0.9, eps: float = 1e-8):
    """GradientTransformation matching torch optim.rmsprop."""

    def init(params):
        return RmsPropState(
            step=jnp.zeros((), jnp.int32),
            m=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        m = jax.tree.map(
            lambda mi, g: alpha * mi + (1 - alpha) * (g * g), state.m, grads
        )
        lr = learning_rate(state.step) if callable(learning_rate) else learning_rate
        updates = jax.tree.map(lambda g, mi: -lr * g / (jnp.sqrt(mi) + eps), grads, m)
        return updates, RmsPropState(step=state.step + 1, m=m)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)
    if cfg.optimizer == "rmsprop":
        return torch_rmsprop(sched, alpha=cfg.rms_decay)
    if cfg.optimizer == "sgd":
        return optax.chain(
            optax.add_decayed_weights(5e-4),
            optax.sgd(sched, momentum=0.9),
        )
    if cfg.optimizer == "nag":
        return optax.sgd(sched, momentum=cfg.rms_decay, nesterov=True)
    raise ValueError(f"unknown optimizer {cfg.optimizer}")
