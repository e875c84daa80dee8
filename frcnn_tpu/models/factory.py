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
    # pallas_mode also selects the pool BACKWARD kernel (first-max routing
    # in VMEM, ops/pallas_pool_bwd.py). Forward programs are identical, so
    # detect-only consumers are unaffected by the choice.
    pool_vjp = {"on": "pallas", "interpret": "pallas_interpret"}.get(
        cfg.pallas_mode, "xla"
    )
    # Profiling override: FRCNN_POOL_VJP=xla|pallas|pallas_interpret forces
    # the pool-backward implementation independently of pallas_mode, so the
    # first-max kernel can be A/B-timed against SelectAndScatter in an
    # otherwise-identical train step (scripts/round3_followup_queue.sh).
    pool_vjp = os.environ.get("FRCNN_POOL_VJP", pool_vjp)
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
