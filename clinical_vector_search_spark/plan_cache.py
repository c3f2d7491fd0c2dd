"""Cache-handle registry for prepared plans (see pipeline/modes.py).

A mode build may ``.cache()`` sub-frames several layers down (e.g. the
BM25 postings index inside ``rag_pipeline``). Whoever owns the prepared
plan must also own those handles so eviction can ``unpersist()`` them —
otherwise MEMORY_AND_DISK blocks evicted from storage memory spill to
executor disk and live until app exit. ``tracked_cache`` is the one
cache-point used by plan-building code: inside a registered build it
appends the handle to the active registry; outside one it is a plain
``.cache()`` whose lifecycle the caller owns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_BUILD_CACHES: list[DataFrame] | None = None


def tracked_cache(df: DataFrame) -> DataFrame:
    df = df.cache()
    if _BUILD_CACHES is not None:
        _BUILD_CACHES.append(df)
    return df


def begin_build() -> None:
    global _BUILD_CACHES
    _BUILD_CACHES = []


def end_build() -> list[DataFrame]:
    global _BUILD_CACHES
    handles = _BUILD_CACHES or []
    _BUILD_CACHES = None
    return handles
