"""Persistent XLA compile cache under the repository root.

Compiles on this setup go through a remote compile service (minutes per
new program), so every benchmark/profile/eval script enables the
persistent cache. It must live under the repo — /tmp is wiped on box
restarts, which cost a multi-thousand-step training partial in round 3.
The path is derived from the package location so clones at other paths
keep working (a hardcoded /root/repo silently wrote elsewhere).
"""

from __future__ import annotations

import os

# frcnn_tpu/utils/compile_cache.py -> repo root is two levels up from
# the package directory
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_compile_cache(min_compile_secs: float = 1.0) -> str | None:
    """Point jax's persistent compilation cache at <repo>/.jax_cache.

    Returns the cache dir, or None if the running jax doesn't support the
    config knobs (older versions) — callers treat that as best-effort.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        return None
    return CACHE_DIR
