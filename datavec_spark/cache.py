"""Tracked persists: release correctness-required caches deterministically.

Several operators persist() an intermediate relation because the plan
would otherwise be re-executed nondeterministically across the jobs that
consume it (repartitionByRange samples its range boundaries PER JOB — see
operators/sequence.py), or because re-deriving it would rescan the corpus
(LSH signature/shingle relations). Those caches must outlive the function
that created them — the caller materializes the returned DataFrame later —
so the creator cannot unpersist them. Left alone they leak cached blocks
for the session lifetime (round-3 advice item).

The contract here: creators register such DataFrames with track(); any
point that KNOWS the downstream results are materialized (bench.py after
timing a query, a long-lived driver between pipeline stages, tests'
teardown) calls release_tracked() to unpersist them all. Releasing after
materialization is safe even if the caller re-collects the result later —
the plan recomputes, it is only the range-partition *reuse across jobs
within one logical result* that required the cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for deferred release; returns it."""
    _TRACKED.append(df)
    return df


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many were released."""
    global _TRACKED
    released = 0
    for df in _TRACKED:
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED = []
    return released
