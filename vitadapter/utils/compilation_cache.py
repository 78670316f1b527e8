"""Persistent XLA compilation cache.

The flagship graphs take minutes to compile through the axon tunnel; the
persistent cache makes re-runs (bench retries, repeated CLI invocations,
profiling sweeps) near-instant. Mirrors the role of torch's CUDA kernel
cache in the reference workflow (the reference pre-builds its CUDA ops
once — `detection/ops/make.sh`).

Safe to call unconditionally: failures (read-only fs, old jax) degrade to
no cache.
"""

import os

_DEFAULT_DIR = os.environ.get(
    "VITADAPTER_XLA_CACHE", os.path.expanduser("~/.cache/vitadapter_xla"))


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> bool:
    """Enable JAX's persistent compilation cache at `cache_dir`.

    Returns True if the cache was enabled. Set VITADAPTER_XLA_CACHE=0 to
    disable.
    """
    if cache_dir in ("0", "", "none"):
        return False
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, even fast compiles: tunnel dispatch dominates
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # noqa: BLE001 — optional feature, never fatal
        return False
