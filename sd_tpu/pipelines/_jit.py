"""Per-pipeline compiled-program cache.

The samplers are eager ``lax.scan`` programs whose closures capture fresh
constants (schedule tables, conditioning) on every call — without caching,
every pipeline invocation recompiles end-to-end (~15 s/request through the
TPU tunnel, measured via scripts/serve.py before the fix; 0.38 s after).
``cached_jit(obj, key, builder)`` stores jitted callables on the pipeline
instance keyed by the static configuration; jax.jit's own cache then
handles input-shape variation per callable.

Retention: entries live as long as the pipeline instance (each distinct
steps/scale/resolution combination pins one compiled program). That is the
point for a pinned-config server, but a caller sweeping parameters on one
long-lived pipeline accumulates programs — the cache is bounded to
``_MAX_ENTRIES`` (LRU eviction; an evicted program recompiles on reuse) and
``clear_jit_cache(pipe)`` drops everything eagerly.
"""

from __future__ import annotations

from collections import OrderedDict

__all__ = ["cached_jit", "clear_jit_cache"]

# Generous for serving (a handful of resolution/steps buckets) while keeping
# a parameter sweep from pinning hundreds of compiled programs.
_MAX_ENTRIES = 32


def cached_jit(obj, key, builder):
    """Return ``builder()`` memoized on ``obj`` under ``key`` (LRU-bounded)."""
    cache = obj.__dict__.setdefault("_jit_cache", OrderedDict())
    if key in cache:
        cache.move_to_end(key)
    else:
        cache[key] = builder()
        while len(cache) > _MAX_ENTRIES:
            cache.popitem(last=False)
    return cache[key]


def clear_jit_cache(obj) -> None:
    """Drop every compiled program cached on ``obj``."""
    obj.__dict__.pop("_jit_cache", None)
