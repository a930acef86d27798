"""Persistent XLA compile cache.

Every jit compile on the tunneled-TPU backend goes through a remote-compile
relay (minutes for the full model graph) and the relay has no server-side
cache, so repeat runs of the same entry point pay the full cost again.
JAX's persistent compilation cache serializes the compiled executable to
disk and is verified to round-trip with this backend, turning process
restarts (train -> infer -> bench on the same geometry) into ~ms cache
hits.

Enabled by every CLI script and by bench.py; tests use their own dir (see
tests/conftest.py).
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's compilation cache at ``cache_dir`` (created if needed).

    Returns the directory used.  Safe to call more than once.
    """
    import jax

    d = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        or DEFAULT_DIR
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # persist EVERYTHING: on the remote-compile relay even a sub-second
    # compile costs seconds of round-trip, and a process start dispatches
    # dozens of small init graphs (~8 min observed when not cached)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d
