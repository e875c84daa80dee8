"""Model construction — ``create_model`` equivalent
(``models/model_utilities.lua:126-136``): builds pnet + cnet from the
declarative config; cnet input size = roi kh * kw * last block filters.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from frcnn_tpu.config import Config
from frcnn_tpu.models.cnet import ClassificationNet
from frcnn_tpu.models.pnet import ProposalNet


def compute_dtype(cfg: Config):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


def cnet_input_dim(cfg: Config) -> int:
    return cfg.roi_pooling.kh * cfg.roi_pooling.kw * cfg.model.layers[-1].filters


def create_models(cfg: Config) -> Tuple[ProposalNet, ClassificationNet]:
    dt = compute_dtype(cfg)
    # Pool BACKWARD implementation. The first-max Pallas kernel
    # (ops/pallas_pool_bwd.py) wins its isolated bench (7.6 vs 8.2 ms) but
    # LOSES in-situ — custom-call boundary relayouts cost more than the
    # kernel saves: full train step 49.5 ms/b8 (XLA SelectAndScatter) vs
    # 55.9 ms/b8 (Pallas), 95.6 vs 105.2 ms/b16, measured round 3
    # (scripts/round3_followup.log). XLA is therefore the default on EVERY
    # pallas_mode; the kernel stays available behind the override below.
    pool_vjp = "xla"
    # Profiling override: FRCNN_POOL_VJP=xla|pallas|pallas_interpret forces
    # the pool-backward implementation independently of pallas_mode, so the
    # first-max kernel can be A/B-timed against SelectAndScatter in an
    # otherwise-identical train step (scripts/round3_followup_queue.sh).
    env_vjp = os.environ.get("FRCNN_POOL_VJP")
    if env_vjp:
        if env_vjp not in ("xla", "pallas", "pallas_interpret"):
            raise ValueError(
                f"FRCNN_POOL_VJP={env_vjp!r}: expected one of "
                "xla | pallas | pallas_interpret"
            )
        pool_vjp = env_vjp
    pnet = ProposalNet(model_cfg=cfg.model, dtype=dt, pool_vjp=pool_vjp)
    cnet = ClassificationNet(
        model_cfg=cfg.model, num_classes_with_bg=cfg.num_classes_with_bg, dtype=dt
    )
    return pnet, cnet


def init_params(cfg: Config, rng: jax.Array):
    """Initialize both networks. Returns (params, batch_stats) pytrees with
    top-level keys 'pnet' and 'cnet'."""
    pnet, cnet = create_models(cfg)
    H, W = cfg.shapes.image_hw
    k1, k2 = jax.random.split(rng)
    pvars = pnet.init({"params": k1}, jnp.zeros((1, H, W, 3)), train=False)
    dummy = jnp.zeros((1, 2, cnet_input_dim(cfg)))
    cvars = cnet.init({"params": k2}, dummy, jnp.ones((1, 2), bool), train=False)
    params = {"pnet": pvars["params"], "cnet": cvars["params"]}
    batch_stats = {"cnet": cvars.get("batch_stats", {})}
    return params, batch_stats
