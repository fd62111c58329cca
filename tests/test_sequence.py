"""Sequence/window op parity tests (FIXTURES.md §B3 shape: key, time, value)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from datavec_spark.operators.transforms import TransformProcess
from datavec_spark.operators.sequence import rank_scalable


def ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s, tzinfo=timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def seqdf(spark):
    rows = [
        ("k1", ts(0), 1.0), ("k1", ts(1), 2.0), ("k1", ts(2), 4.0), ("k1", ts(30), 8.0),
        ("k2", ts(0), 10.0), ("k2", ts(5), 20.0),
    ]
    return spark.createDataFrame(rows, "key string, t timestamp, v double")


def test_moving_window_reduce(spark, seqdf):
    out = TransformProcess().add(
        "moving_window_reduce", keys=["key"], order="t", column="v",
        window_size=2, reduce_op="Mean", out="ma",
    )(seqdf)
    got = {(r["key"], r["t"].minute): r["ma"] for r in out.collect()}
    assert got[("k1", 0)] == 1.0 and got[("k1", 1)] == 1.5 and got[("k1", 2)] == 3.0
    assert got[("k2", 5)] == 15.0


def test_sequence_difference_and_offset(spark, seqdf):
    out = TransformProcess().add(
        "sequence_difference", keys=["key"], order="t", column="v", out="d",
    )(seqdf)
    got = {(r["key"], r["t"].minute): r["d"] for r in out.collect()}
    assert got[("k1", 0)] == 0.0 and got[("k1", 1)] == 1.0 and got[("k1", 30)] == 4.0

    lagged = TransformProcess().add(
        "sequence_offset", keys=["key"], order="t", columns=["v"], offset=1,
        mode="NewColumn", edge_mode="SpecifiedValue", edge_value=-1.0,
    )(seqdf)
    got = {(r["key"], r["t"].minute): r["v_offset"] for r in lagged.collect()}
    assert got[("k1", 0)] == -1.0 and got[("k1", 2)] == 2.0

    trimmed = TransformProcess().add(
        "sequence_offset", keys=["key"], order="t", columns=["v"], offset=1,
        mode="InPlace", edge_mode="TrimSequence",
    )(seqdf)
    assert trimmed.count() == 4  # first step of each sequence trimmed


def test_sequence_trim(spark, seqdf):
    head = TransformProcess().add("sequence_trim", keys=["key"], order="t", n=1)(seqdf)
    assert head.count() == 4
    tail = TransformProcess().add("sequence_trim", keys=["key"], order="t", n=1, from_start=False)(seqdf)
    got = {r["key"] for r in tail.collect()}
    assert tail.count() == 4 and got == {"k1", "k2"}


def test_sessionize_gap_split(spark, seqdf):
    # SequenceSplitTimeSeparation.java:43: new session where gap > threshold
    out = TransformProcess().add("sessionize", keys=["key"], ts_col="t", gap_seconds=600)(seqdf)
    got = {(r["key"], r["t"].minute): r["session_id"] for r in out.collect()}
    assert got[("k1", 0)] == got[("k1", 1)] == got[("k1", 2)] == 0
    assert got[("k1", 30)] == 1  # 28-minute gap > 10-minute threshold
    assert got[("k2", 0)] == got[("k2", 5)] == 0


def test_split_max_length(spark, seqdf):
    out = TransformProcess().add("split_max_length", keys=["key"], order="t", max_length=2)(seqdf)
    got = {(r["key"], r["t"].minute): r["chunk_id"] for r in out.collect()}
    assert got[("k1", 0)] == 0 and got[("k1", 1)] == 0 and got[("k1", 2)] == 1 and got[("k1", 30)] == 1


def test_tumbling_and_sliding_windows(spark, seqdf):
    # TimeWindowFunction.java:44 / OverlappingTimeWindowFunction.java:56
    out = TransformProcess().add(
        "reduce_sequence_by_window", keys=["key"], ts_col="t",
        window_duration="10 minutes", ops={"v": ["Sum", "Count"]},
    )(seqdf)
    k1 = {r["window"]["start"].minute: (r["sum(v)"], r["count(v)"])
          for r in out.where(F.col("key") == "k1").collect()}
    assert k1[0] == (7.0, 3) and k1[30] == (8.0, 1)

    sliding = TransformProcess().add(
        "reduce_sequence_by_window", keys=["key"], ts_col="t",
        window_duration="10 minutes", slide_duration="5 minutes", ops={"v": "Sum"},
    )(seqdf)
    # each event lands in 2 overlapping windows
    assert sliding.where(F.col("key") == "k2").count() == 3


def test_sorted_rank_and_scalable_rank(spark, seqdf):
    out = TransformProcess().add("sorted_rank", column="v", out="rank")(seqdf)
    got = {r["v"]: r["rank"] for r in out.collect()}
    assert got[1.0] == 0 and got[20.0] == 5

    out2 = rank_scalable(seqdf, "v", "rank")
    got2 = {r["v"]: r["rank"] for r in out2.collect()}
    assert got2 == got


def test_cumsum_and_pack_sequences(spark):
    """Two-phase cumsum equals a single-partition reference; packing bins
    by starting offset; rank/cumsum must be stable across repeated jobs
    (the repartitionByRange per-job resampling defect)."""
    from pyspark.sql import functions as F

    from datavec_spark.operators.sequence import cumsum_scalable, pack_sequences

    df = spark.range(1, 1001).select(
        F.col("id").alias("doc_id"), (F.pmod(F.col("id") * 37, F.lit(90)) + 10).alias("w"))
    c = cumsum_scalable(df, "doc_id", "w")
    rows = {r["doc_id"]: r["cumsum"] for r in c.collect()}
    expected, acc = {}, 0
    for r in sorted(df.collect(), key=lambda r: r["doc_id"]):
        acc += r["w"]
        expected[r["doc_id"]] = acc
    assert rows == expected
    # repeated evaluation is stable (persist pins the partitioning)
    assert {r["doc_id"]: r["cumsum"] for r in c.collect()} == expected

    p = pack_sequences(df, "doc_id", "w", budget=500)
    got = {r["doc_id"]: r["bin_id"] for r in p.collect()}
    for did, cum in expected.items():
        w = cum - (expected.get(did - 1, 0) if did > 1 else 0)
        assert got[did] == (cum - w) // 500
