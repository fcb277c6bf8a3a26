"""Tracked persist() — bounded cache lifetime for a long-lived
interactive session.

Several pipelines persist intermediates that feed a self-join (LSH
band tables, bucketed projections, ranked distinct sets): without the
persist each join side would recompute the whole upstream DAG. But a
resident analytics service answering many queries would otherwise
accumulate those cached partitions until storage eviction. Every
internal persist therefore goes through :func:`persist`, which
registers the DataFrame so a session loop (bench.py, the oracle gate,
an API server's per-request teardown) can call :func:`release_all`
once results are materialized.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist + register for later release_all()."""
    _TRACKED.append(df)
    return df.persist(level)


def release(df: DataFrame) -> DataFrame:
    """Unpersist one tracked DataFrame (no-op if untracked)."""
    try:
        _TRACKED.remove(df)
    except ValueError:
        pass
    return df.unpersist()


def release_all() -> int:
    """Unpersist every tracked DataFrame; returns how many."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
    _TRACKED.clear()
    return n
