"""Persistent XLA compilation cache.

The flagship graphs take minutes to compile through the axon tunnel; the
persistent cache makes re-runs (bench retries, repeated CLI invocations,
profiling sweeps) near-instant. Mirrors the role of torch's CUDA kernel
cache in the reference workflow (the reference pre-builds its CUDA ops
once — `detection/ops/make.sh`).

Safe to call unconditionally: failures (read-only fs, old jax) degrade to
no cache. The cache directory is bounded only by the optional
`jax_compilation_cache_max_size` knob (jax >= 0.4.26); on older jax it may
grow across bench/profiling sweeps and can be cleared with
`rm -rf ~/.cache/vitadapter_xla`.
"""

import os

_DEFAULT_DIR = os.environ.get(
    "VITADAPTER_XLA_CACHE", os.path.expanduser("~/.cache/vitadapter_xla"))
_DISABLE_SENTINELS = ("0", "", "none", "off", "false", "no")

# ~4 GiB LRU bound where supported; far above any one sweep's footprint.
_MAX_CACHE_BYTES = 4 << 30


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> bool:
    """Enable JAX's persistent compilation cache at `cache_dir`.

    Returns True iff the cache directory was enabled. Set
    VITADAPTER_XLA_CACHE to 0/none/off/false to disable.
    """
    if cache_dir is None or cache_dir.strip().lower() in _DISABLE_SENTINELS:
        return False
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # noqa: BLE001 — optional feature, never fatal
        return False
    # Optional threshold knobs: cache everything, even fast/small compiles
    # (tunnel dispatch dominates). Kept separate from the dir update so a
    # missing flag on an older jax can't silently disable the cache.
    for flag, value in (
        ("jax_persistent_cache_min_compile_time_secs", 0.0),
        # -1 disables the size restriction (0 only restores the
        # backend-specific default minimum)
        ("jax_persistent_cache_min_entry_size_bytes", -1),
        ("jax_compilation_cache_max_size", _MAX_CACHE_BYTES),
    ):
        try:
            jax.config.update(flag, value)
        except Exception:  # noqa: BLE001 — flag absent on this jax version
            pass
    return True
