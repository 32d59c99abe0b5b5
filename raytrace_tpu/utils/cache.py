"""Persistent XLA compilation cache.

The tunneled TPU pays 20-40 s per program compile (and a cold
`python -m raytrace_tpu ensemble10k_production` run pays ~345 s across
its bucket programs). JAX's persistent compilation cache keys on the
serialized HLO + compile options + backend, so it is exact across
processes; measured on this tunnel: a 13.7 s compile replays in 0.27 s
from a fresh interpreter.

Enabled by the CLI (`run.py`), `bench.py`, and the benchmark harness.
Library users opt in by calling enable_compilation_cache() before the
first jit execution. Cache location: $RAYTRACE_TPU_COMPILE_CACHE, else
~/.cache/raytrace_tpu/xla. JAX's default entry thresholds (compile time
>= 1 s) are kept, so only the expensive tracer programs are persisted.
"""

import os

_ENABLED = False


def enable_compilation_cache(path=None):
    """Idempotently point JAX's persistent compilation cache at `path`.

    Must run before the first compilation to cover it; later calls are
    no-ops. Returns the cache directory (or None if jax is too old)."""
    global _ENABLED
    import jax

    if path is None:
        path = os.environ.get("RAYTRACE_TPU_COMPILE_CACHE") or os.path.join(
            os.path.expanduser("~"), ".cache", "raytrace_tpu", "xla"
        )
    if _ENABLED:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the rounds tracer's small-bucket programs compile in under
        # JAX's default 1 s threshold but still cost a tunnel round-trip
        # each; persist anything over 0.1 s (entries are ~0.1-1 MB)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except (AttributeError, OSError):
        return None
    _ENABLED = True
    return path
