

def bucket(n: int, minimum: int = 8) -> int:
    """Smallest power-of-two >= n (>= minimum) — the shared padding/window
    bucketing policy; it bounds how many shapes ever get compiled."""
    b = minimum
    while b < n:
        b *= 2
    return b


_seen_fallbacks: set = set()


def log_fallback(site: str, detail: str):
    """Log ONCE per (site, detail) when a hot path silently drops from a
    Pallas kernel to the XLA fallback (VERDICT r2 #6: phi2-shaped models
    used to decode on the fallback with nothing logged). Runs at trace
    time, so it fires once per compiled shape, not per step."""
    key = (site, detail)
    if key in _seen_fallbacks:
        return
    _seen_fallbacks.add(key)
    import logging

    logging.getLogger("crabml_tpu").warning(
        "pallas fallback at %s: %s (XLA path used)", site, detail
    )


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: kills the cold-start recompile.

    The reference starts in milliseconds because it runs no compiler
    (mmap + madvise, gguf.rs:795-827); a jitted 7B decode step costs
    minutes of XLA time on first compile. Caching the compiled
    executables on disk makes every restart after the first warm.
    Default location: <repo>/.cache/jax (override with $CRABML_JAX_CACHE).
    """
    import os

    import jax

    path = path or os.environ.get("CRABML_JAX_CACHE")
    if path in ("off", "0", "none"):
        # opt-out (tests set this): a pytest process that drives the CLI /
        # tool mains would otherwise write CPU executables into the same
        # cache dir a concurrent TPU bench is writing — observed to
        # segfault inside the zstd cache-write path under contention
        return None
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", "..", ".cache", "jax")
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
