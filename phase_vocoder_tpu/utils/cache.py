"""Persistent XLA compilation cache.

TPU compiles for this pipeline take tens of seconds to minutes (the whole
analysis->modify->synthesis chain is one program). The reference pays its
(much smaller) cuFFT plan + nvcc cost once per build; our equivalent is the
JAX persistent compilation cache, which makes every repeat CLI/bench
invocation start in milliseconds. Enabled by every entry point
(cli.py, bench.py, __graft_entry__.py); opt out with PVOC_NO_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/pvoc_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("PVOC_NO_CACHE"):
        return
    import jax

    path = cache_dir or os.environ.get("PVOC_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything nontrivial; the default threshold skips fast compiles
    # but here even "fast" recompiles cost seconds through the device tunnel.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
