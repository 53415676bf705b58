"""Persistent XLA compilation-cache helper (serving/training cold start).

The reference has no warm-start story: every process pays the full
CUDA/cuDNN build+autotune cost again on its first iteration
(train_ppg2mel.py:230-236 times it; inference.py:33 pays it per run).
The TPU analogue is XLA compilation of the big programs — ~4 min for the
autoregressive-decode while_loop and ~3 min for the 12-flow WaveGlow
(first compile; CLAUDE.md).  JAX's persistent compilation cache removes
that from every process after the first by memoizing serialized
executables keyed on (HLO, compile options, backend/runtime version), so
a serving replica restarts in seconds instead of minutes.

Measured caveat (docs/PERF.md "Persistent compilation cache"): over this
environment's axon *tunnel* the cache does not help — compilation runs
in the remote helper, and a cached local executable still pays the
remote round trip (239.6 s cached vs 67–328 s uncached for the same tiny
probe program; the helper's variance dwarfs any local saving).  On a
real TPU host compilation is local and the cache hit is the standard
fix.  Hence: off by default, opt-in via ``--compilation_cache_dir`` on
the serving CLIs, ``hparams.compilation_cache_dir`` in the trainers, or
the ``FACPPG_COMPILATION_CACHE`` environment variable.
"""

from __future__ import annotations

import os
from typing import Optional

_ENV_VAR = "FACPPG_COMPILATION_CACHE"


def enable_compilation_cache(
    cache_dir: Optional[str] = None,
    *,
    min_compile_time_secs: float = 1.0,
) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    ``cache_dir`` falls back to ``$FACPPG_COMPILATION_CACHE``; if neither
    is set this is a no-op returning None.  Otherwise the directory is
    created, the cache is enabled for every compilation taking longer
    than ``min_compile_time_secs`` (0 caches everything — useful only in
    tests; real programs here compile in 10s-100s of seconds and the
    default keeps trivial host programs out of the cache), and the
    resolved absolute path is returned.

    Safe to call before or after backend initialization, and idempotent.
    """
    cache_dir = cache_dir or os.environ.get(_ENV_VAR) or None
    if not cache_dir:
        return None
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_time_secs),
    )
    # cache even small executables: the gate is compile *time*, above
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def disable_compilation_cache() -> None:
    """Turn the persistent cache back off (tests use this to un-leak)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
