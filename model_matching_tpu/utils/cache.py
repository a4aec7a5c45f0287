"""Persistent XLA compilation cache setup.

First compiles through the TPU tunnel cost tens of seconds to minutes; the
persistent cache makes every later process reuse them. Shared by the CLI,
bench and any embedding application.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/mm_tpu_xla_cache"


def enable_compilation_cache(path: str | None = None) -> None:
    """TPU backends only: the cache exists to amortize the slow tunnel
    compiles. On the CPU backend it is actively harmful — XLA:CPU
    executable serialization ABORTS the process on some large shard_map
    programs, and entries AOT-compiled on another machine-feature set
    warn about SIGILL on load — so CPU runs (tests, local work) never
    get it. Callers must have completed any jax.distributed bootstrap
    first (this touches the backend)."""
    try:
        import jax

        if jax.default_backend() != "tpu":
            return
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("MM_TPU_CACHE", DEFAULT_DIR),
        )
        # 0: cache EVERY program. A one-shot CLI invocation executes
        # ~112 tiny eager ops (take_along_axis, where, ... outside any
        # jit) whose compiles each fall under the previous 1.0 s
        # threshold and therefore recompiled THROUGH THE TUNNEL in
        # every process — measured ~30 s of the stocs-single wall
        # (docs/RESULTS.md round 5, JAX_LOG_COMPILES diagnostic).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # never block startup over a cache
