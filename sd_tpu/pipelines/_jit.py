"""Per-pipeline compiled-program cache.

The samplers are eager ``lax.scan`` programs whose closures capture fresh
constants (schedule tables, conditioning) on every call — without caching,
every pipeline invocation recompiles end-to-end (~15 s/request through the
TPU tunnel, measured via scripts/serve.py before the fix; 0.38 s after).
``cached_jit(obj, key, builder)`` stores jitted callables on the pipeline
instance keyed by the static configuration; jax.jit's own cache then
handles input-shape variation per callable.
"""

from __future__ import annotations

__all__ = ["cached_jit"]


def cached_jit(obj, key, builder):
    """Return ``builder()`` memoized on ``obj`` under ``key``."""
    cache = obj.__dict__.setdefault("_jit_cache", {})
    if key not in cache:
        cache[key] = builder()
    return cache[key]
