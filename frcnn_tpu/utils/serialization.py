"""Checkpoint (de)serialization.

Replaces the reference's t7 snapshots (``save_model``/``load_obj``,
``utilities.lua:113-134``): msgpack files containing params, batch stats,
optimizer state, step, the four-loss history, run options, and the full
config JSON. Schema field ``version`` mirrors the reference's version tag.

Unlike the reference, optimizer state IS saved (the reference silently
drops RMSprop moving averages across restarts, SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization as fser

CHECKPOINT_VERSION = 1


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, params, batch_stats, opt_state=None,
                    step: int = 0, stats: Optional[dict] = None,
                    options: Optional[dict] = None,
                    config_json: str = "") -> None:
    payload = {
        "version": CHECKPOINT_VERSION,
        "params": _to_numpy_tree(params),
        "batch_stats": _to_numpy_tree(batch_stats),
        "opt_state": (
            [np.asarray(x) for x in jax.tree.leaves(opt_state)]
            if opt_state is not None else None
        ),
        "step": int(step),
        "stats": stats or {},
        "options": options or {},
        "config_json": config_json,
    }
    blob = fser.msgpack_serialize(payload)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = fser.msgpack_restore(f.read())
    if payload.get("version") != CHECKPOINT_VERSION:
        raise ValueError(f"unsupported checkpoint version {payload.get('version')}")
    return payload
