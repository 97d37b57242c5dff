"""Probed localCheckpoint memoization — one registry, two consumers.

A deterministic expensive frame (a drained stream, the report family's
canonical legs superset) is built once per (application, name,
cache_key) and pinned with ``localCheckpoint``. Reuse is PROBED with a
FULL scan — ``count()`` touches every cached partition — because
localCheckpoint is non-reliable: after an executor loss some or all
blocks are gone and every consumer would fail for the rest of the
application. A first-block-only probe (``take(1)``) passes on PARTIAL
block loss (possible on any multi-executor cluster; invisible on
single-executor local where loss is all-or-nothing), which is exactly
the failure the probe exists to prevent — so the probe is the full
no-Python-worker scan. Entries from dead SparkSessions are evicted so
the registry stays bounded to the live application's keys.

The registry is shared by concurrent callers (the streaming family
prefetches six drains from daemon threads), so every read/evict/insert
holds a module lock; ``build()`` and the probe run OUTSIDE the lock
(they launch Spark jobs), and per-key in-flight events make concurrent
misses on the SAME key build once and share the result.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_CHECKPOINT_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_INFLIGHT: dict[tuple[str, str, str], threading.Event] = {}
# per-name invalidation generation: a build records the generation when
# it starts; an insert is skipped when invalidate_name bumped it since,
# so a build that raced an input rewrite cannot pin its stale frame
_NAME_GEN: dict[str, int] = {}
_LOCK = threading.Lock()


def _probe(df: DataFrame) -> bool:
    """True iff EVERY cached partition is still alive. ``count()`` is a
    JVM-only full scan of the checkpointed blocks (no Python workers),
    cheap on local blocks, and fails on partial loss where ``take(1)``
    would pass."""
    try:
        df.count()
        return True
    except Exception:
        return False


def invalidate_name(name: str) -> None:
    """Drop every cached entry for ``name`` across applications and cache
    keys — for callers whose inputs changed under a live session (e.g. a
    test regenerating the parquet a memoized frame was derived from).
    Also FENCES in-flight builds: a build that started before the
    invalidation (and so may have read the old inputs) finds the
    generation bumped and skips its cache insert — its waiters re-enter,
    miss, and rebuild against the new inputs."""
    with _LOCK:
        _NAME_GEN[name] = _NAME_GEN.get(name, 0) + 1
        for k in [k for k in _CHECKPOINT_CACHE if k[1] == name]:
            _CHECKPOINT_CACHE.pop(k, None)


def memoize_checkpoint(spark, name: str, cache_key: str, build) -> DataFrame:
    """Run ``build()`` once per (application, name, cache_key); return
    the pinned (eager ``localCheckpoint``) result on every later call,
    probing validity (full scan) and rebuilding on any block loss."""
    key = (spark.sparkContext.applicationId, name, cache_key)
    while True:
        with _LOCK:
            for stale in [k for k in _CHECKPOINT_CACHE if k[0] != key[0]]:
                _CHECKPOINT_CACHE.pop(stale, None)
            hit = _CHECKPOINT_CACHE.get(key)
            pending = None if hit is not None else _INFLIGHT.get(key)
            if hit is None and pending is None:
                pending = threading.Event()
                _INFLIGHT[key] = pending
                gen = _NAME_GEN.get(name, 0)
                break  # this thread builds
        if hit is not None:
            if _probe(hit):
                return hit
            with _LOCK:  # blocks lost: drop only if nobody replaced it
                if _CHECKPOINT_CACHE.get(key) is hit:
                    _CHECKPOINT_CACHE.pop(key, None)
            continue
        pending.wait()
        continue  # builder finished (or failed) — re-read the registry
    try:
        out = build().localCheckpoint(eager=True)
        with _LOCK:
            # skip the insert when invalidate_name fenced this build:
            # the frame may derive from since-rewritten inputs. The
            # builder still returns it (the race resolves as if the
            # invalidation happened a moment later), but nothing pins it.
            if _NAME_GEN.get(name, 0) == gen:
                _CHECKPOINT_CACHE[key] = out
        return out
    finally:
        with _LOCK:
            _INFLIGHT.pop(key, None)
        pending.set()
