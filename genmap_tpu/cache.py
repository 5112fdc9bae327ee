"""Persistent XLA compilation cache.

The block mapper compiles one program per (K, e, overlap, tier, B)
configuration; on the remote-TPU backend a cold compile costs minutes.  The
persistent cache makes repeat invocations (CLI runs, bench rounds) fast.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        path = os.environ.get(
            "GENMAP_TPU_CACHE",
            os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "genmap_tpu",
                "jax",
            ),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
