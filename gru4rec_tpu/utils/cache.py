"""Persistent XLA compilation cache for the CLI, bench, and paropt.

First compiles of the training/eval programs are expensive (tens of seconds
per distinct shape on a remote-compiled TPU backend); the programs themselves
rarely change between runs. JAX's persistent compilation cache stores the
serialized executables on disk keyed by program hash, so repeat runs of the
same config skip compilation entirely.

Resolution order for the cache directory:

1. ``JAX_COMPILATION_CACHE_DIR`` (standard JAX env var) if set;
2. ``GRU4REC_TPU_CACHE_DIR`` if set (empty string disables caching);
3. ``~/.cache/gru4rec_tpu/xla`` (default).

The test harness sets its own cache (tests/conftest.py); this module is for
the production entry points (cli/run.py, cli/paropt.py children, bench.py).
"""

from __future__ import annotations

import os


def resolve_cache_dir() -> str | None:
    """Resolve the persistent-cache directory per the order above; None when
    caching is disabled (GRU4REC_TPU_CACHE_DIR=''). Pure resolution — no
    side effects — so subprocess drivers (cli/paropt.py) can export the SAME
    directory into child environments."""
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        path = os.environ.get(
            "GRU4REC_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "gru4rec_tpu", "xla"),
        )
    return path or None


def enable_persistent_compilation_cache() -> str | None:
    """Point JAX's persistent compile cache at a durable directory.

    Returns the directory used, or None when disabled. Must be called before
    the first compilation (safe any time; earlier is better). Never raises:
    backends that cannot serialize executables simply skip the cache.
    """
    path = resolve_cache_dir()
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # sub-second compiles are cheaper to redo than to round-trip to disk
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as exc:  # pragma: no cover - depends on backend/build
        print(f"[gru4rec_tpu] persistent compile cache disabled: {exc}")
        return None
    return path
