"""Probed localCheckpoint memoization — one registry, two consumers.

A deterministic expensive frame (a drained stream, the report family's
canonical legs superset) is built once per (application, name,
cache_key) and pinned with ``localCheckpoint``. Reuse is PROBED — one
cached-block ``take(1)`` — because localCheckpoint is non-reliable:
after an executor loss the blocks are gone and every consumer would
fail for the rest of the application; the probe turns that into a
transparent rebuild. Entries from dead SparkSessions are evicted so the
registry stays bounded to the live application's keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CHECKPOINT_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def memoize_checkpoint(spark, name: str, cache_key: str, build) -> DataFrame:
    """Run ``build()`` once per (application, name, cache_key); return
    the pinned (eager ``localCheckpoint``) result on every later call,
    probing validity and rebuilding on block loss."""
    key = (spark.sparkContext.applicationId, name, cache_key)
    for stale in [k for k in _CHECKPOINT_CACHE if k[0] != key[0]]:
        _CHECKPOINT_CACHE.pop(stale, None)
    hit = _CHECKPOINT_CACHE.get(key)
    if hit is not None:
        try:
            hit.take(1)
            return hit
        except Exception:
            _CHECKPOINT_CACHE.pop(key, None)
    out = build().localCheckpoint(eager=True)
    _CHECKPOINT_CACHE[key] = out
    return out
