"""Persistent XLA compilation cache setup.

First compiles through the TPU tunnel cost tens of seconds to minutes; the
persistent cache makes every later process reuse them. Shared by the CLI,
bench and any embedding application.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/mm_tpu_xla_cache"


def enable_compilation_cache(path: str | None = None) -> None:
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("MM_TPU_CACHE", DEFAULT_DIR),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # never block startup over a cache
