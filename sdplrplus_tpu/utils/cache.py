"""Persistent XLA compilation cache setup.

Server-side compilation of the big fused programs (solver/major.py) takes
tens of seconds to minutes at benchmark sizes (n >= 20k) over the remote
TPU tunnel; JAX's persistent compilation cache makes every re-run of the
same (program, shapes) pair near-instant. The cache is keyed on the HLO,
so it is safe across problems — only identical programs hit.

Called by every CLI driver (exps/run.py, exps/sweep.py, bench.py,
__graft_entry__.py). Library imports never touch global JAX config.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_cache``, overridable via JAX_COMPILATION_CACHE_DIR).

    Idempotent; returns the cache directory in use."""
    import jax

    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
