"""Persistent XLA compilation cache for package entry points.

Tunnel compiles of the frame programs run 40-380 s cold (CLAUDE.md);
they are fully deterministic, so a disk cache amortizes them across
PROCESSES — a fresh `python bench.py` / CLI run warm-starts from the
previous one's executables instead of recompiling. The reference has no
analogue (its one-time cost is a GL context, SURVEY.md §4.1); for this
rebuild the jit compile IS the load-time cost, so caching it is part of
the production story.

Entry points (cli, benchmarks, __graft_entry__, scripts/*) call
`enable_compilation_cache()` once before building programs. Library
imports do NOT enable it implicitly: a cache directory is process-global
state a host application may want to own.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "icra20_hand_object_pose_tpu", "xla"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Respects an explicit JAX_COMPILATION_CACHE_DIR / already-configured
    cache (never overrides the user). Returns the directory in effect,
    or None if the cache could not be enabled (old jax, read-only home).
    """
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:
        return None
    if current:
        return current
    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that takes real time; the default 1 s floor is
        # fine, but make the policy explicit where supported
        try:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    except Exception:
        return None
    return cache_dir
