"""Cache/broadcast lifecycle tracking (VERDICT r2 item 6).

Several operators cache UDF-computed intermediates (minhash/simhash block
tables, normalized record tables) or create Spark broadcasts (record
lookups for the broadcast-gather scoring strategy). Each is correct and
cheap in isolation, but a long-lived session running the whole registered
query suite accumulates every one of them in executor storage memory —
none of the builders can safely unpersist what the caller has not yet
consumed (the returned DataFrames are lazy).

The contract here makes the leak bounded and explicit:

- builders register every call-local cache/broadcast via :func:`track`;
- harnesses (bench.py, tests/oracle_check.py, the driver-facing registry
  in queries.py) call :func:`release_session_storage` *between* top-level
  queries — i.e. at a point where the previous query's result has been
  fully consumed, which is exactly the driver's build→collect→next loop;
- long-lived owners (e.g. ``Deduper``'s record lookup, reused across an
  active-learning session) manage their own objects and simply don't
  track them.

``release_session_storage`` also unpersists any remaining persistent RDDs
(``localCheckpoint`` blocks pin storage the same way caches do) and clears
the SQL cache — safe only under the between-queries contract above, since
a localCheckpoint RDD cannot be recomputed once its blocks are dropped.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
_TRACKED: list[Any] = []
# stack of active scope() frames (thread-shared by design: a scope
# protects its objects from ANY interleaved release_tracked call)
_SCOPES: list[list[Any]] = []


def track(obj: Any) -> Any:
    """Register a call-local cached DataFrame / Broadcast / RecordLookup
    for release at the next :func:`release_session_storage` — or, inside a
    :func:`scope` block, at scope exit. Returns the object so call sites
    stay one-liners (``track(df.cache())``)."""
    with _LOCK:
        (_SCOPES[-1] if _SCOPES else _TRACKED).append(obj)
    return obj


@contextlib.contextmanager
def scope():
    """Isolate lifecycle tracking for one builder.

    Objects ``track()``-ed inside the block are released at block exit and
    are invisible to the global :func:`release_tracked` /
    :func:`release_session_storage` sweep — so a builder that must
    interleave two lazy pipelines (build A, build B, collect A, collect B)
    can wrap each build and no longer depends on the release-at-next-
    query-entry convention destroying another builder's live broadcasts
    (ADVICE r3: the global list's convention-only semantics).
    Note ``release_session_storage`` still clears ALL persistent RDDs and
    the SQL cache — scopes shield tracked objects, not localCheckpoints.
    """
    mine: list[Any] = []
    with _LOCK:
        _SCOPES.append(mine)
    try:
        yield mine
    finally:
        with _LOCK:
            if mine in _SCOPES:
                _SCOPES.remove(mine)
        _release_list(mine)


def tracked_count() -> int:
    return len(_TRACKED)


def _release_list(objs: list[Any]) -> int:
    n = 0
    while objs:
        obj = objs.pop()
        try:
            if isinstance(obj, DataFrame):
                obj.unpersist()
            else:  # Broadcast or RecordLookup — both expose destroy()
                obj.destroy()
            n += 1
        except Exception:
            pass
    return n


def release_tracked() -> int:
    """Unpersist/destroy every globally tracked object (active
    :func:`scope` frames are untouched). Never raises (a released
    SparkContext or an already-destroyed broadcast is not an error at
    cleanup time)."""
    return _release_list(_TRACKED)


def release_session_storage(spark: SparkSession) -> dict:
    """Release tracked objects AND all persistent RDDs + SQL cache.

    Call ONLY between top-level queries (previous results fully consumed):
    dropping a localCheckpoint RDD that a pending DataFrame still needs is
    unrecoverable. bench.py, tests/oracle_check.py and the queries.py
    registry honor this; ad-hoc sessions interleaving lazy pipelines
    should call :func:`release_tracked` only.
    """
    released = release_tracked()
    n_rdd = 0
    try:
        # py4j exposes the Java map as a Python mapping; snapshot the values
        # first — unpersist mutates the underlying persistentRdds map
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            try:
                jrdd.unpersist()
                n_rdd += 1
            except Exception:
                pass
        spark.catalog.clearCache()
    except Exception:
        pass
    return {"tracked_released": released, "rdds_unpersisted": n_rdd}
