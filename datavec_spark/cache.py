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
teardown) calls release_tracked() to unpersist them all.

CAUTION — release is safe only if the consumer never RE-materializes a
result it already collected (round-4 advice item #2): rank_scalable /
cumsum_scalable bake partition offsets collected from the persisted
repartitionByRange plan into the returned DataFrame as literals. After
release_tracked(), a re-collection re-samples range boundaries, partition
ids shift, and the stale literal offsets would produce silently wrong
global ranks/cumsums — the exact defect the persist prevents. Collect
once, release, and treat the returned DataFrame as consumed; if you need
the result again, re-run the op (or write the first result out).
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
