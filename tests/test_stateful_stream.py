"""applyInPandasWithState operators: streaming gap-sessionization must equal
the batch sessionize op for in-order input; running counters must accumulate
across triggers; session state must be emitted+evicted by event-time
timeout, not retained forever."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from datavec_spark.streaming.stateful import running_counts_stream, sessionize_stream

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)
GAP = 600  # seconds


def _ev(user, offset_s):
    return (user, T0 + dt.timedelta(seconds=offset_s))


@pytest.fixture(scope="module")
def chunked_events(spark, tmp_path_factory):
    """3 users, known session structure, split into 3 in-order files plus a
    far-future sentinel per user that forces every real session closed."""
    chunks = [
        # chunk 0: u1 session A (3 events), u2 session A starts
        [_ev(1, 0), _ev(1, 100), _ev(1, 200), _ev(2, 50)],
        # chunk 1: u1 session B (gap > 600 from 200), u2 session A continues,
        # u3 single-event session
        [_ev(1, 1000), _ev(1, 1050), _ev(2, 400), _ev(3, 0)],
        # chunk 2: u2 session B, u1 session B continues
        [_ev(2, 1500), _ev(1, 1600)],
        # sentinel chunk: far future, closes everything open
        [_ev(1, 100000), _ev(2, 100000), _ev(3, 100000)],
    ]
    d = tmp_path_factory.mktemp("stateful_events")
    for i, rows in enumerate(chunks):
        spark.createDataFrame(rows, "user_id long, ts timestamp") \
            .coalesce(1).write.parquet(str(d / f"chunk-{i:02d}"))
    # one directory of files; the file source orders by MODIFICATION TIME,
    # so stamp strictly increasing mtimes (copies land within the same
    # clock tick otherwise and the trigger order becomes nondeterministic)
    files = sorted(str(p) for p in d.glob("chunk-*/*.parquet"))
    flat = d / "flat"
    flat.mkdir()
    now = time.time()
    for i, f in enumerate(files):
        dst = flat / f"{i:02d}.parquet"
        dst.write_bytes(open(f, "rb").read())
        os.utime(dst, (now + i, now + i))
    return str(flat)


def _run_stream(spark, df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def test_sessionize_stream_matches_batch(spark, chunked_events):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(chunked_events)
    )
    out = _run_stream(
        spark, sessionize_stream(stream, gap_seconds=GAP, watermark_delay="0 seconds"),
        "sessions_out",
    )
    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
           for r in out.collect()}

    # batch reference: the registered sessionize op over the same events,
    # minus each user's final (sentinel, still-open) session
    from datavec_spark.operators.transforms import TransformProcess

    events = spark.read.parquet(chunked_events)
    tp = TransformProcess().add("sessionize", keys=["user_id"], ts_col="ts",
                                gap_seconds=GAP)
    sess = (
        tp.apply(events)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
    )
    last = sess.groupBy("user_id").agg(F.max("session_id").alias("session_id"))
    expected = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                for r in sess.join(last, ["user_id", "session_id"], "left_anti").collect()}
    assert expected, "fixture must produce closed sessions"
    assert got == expected


def test_sessionize_emits_via_timeout(spark, tmp_path):
    """Without any closing event, the open session must still be emitted by
    the event-time timeout once a LATER key's events push the watermark past
    the gap horizon — and its state evicted (bounded state store)."""
    d = tmp_path / "ev"
    spark.createDataFrame([_ev(7, 0), _ev(7, 60)], "user_id long, ts timestamp") \
        .coalesce(1).write.parquet(str(d / "00"))
    spark.createDataFrame([_ev(8, 5000)], "user_id long, ts timestamp") \
        .coalesce(1).write.parquet(str(d / "01"))
    flat = tmp_path / "flat"
    flat.mkdir()
    now = time.time()
    for i, f in enumerate(sorted(str(p) for p in d.glob("*/*.parquet"))):
        dst = flat / f"{i:02d}.parquet"
        dst.write_bytes(open(f, "rb").read())
        os.utime(dst, (now + i, now + i))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(str(flat))
    )
    out = _run_stream(
        spark, sessionize_stream(stream, gap_seconds=GAP, watermark_delay="0 seconds"),
        "timeout_out",
    )
    rows = {r["user_id"]: r for r in out.collect()}
    # user 7's session closed by timeout (watermark reached 5000 > 60 + 600)
    assert 7 in rows
    assert rows[7]["n_events"] == 2
    assert rows[7]["session_end"] == T0 + dt.timedelta(seconds=60)


def test_running_counts_accumulate(spark, chunked_events):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(chunked_events)
    )
    out = _run_stream(
        spark, running_counts_stream(stream, key_col="user_id"), "counts_out",
    )
    rows = out.collect()
    events = spark.read.parquet(chunked_events)
    true_counts = {str(r["user_id"]): r["n"] for r in
                   events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    # the max total per key equals the true count; per-batch increments sum to it
    for key, n in true_counts.items():
        per_key = [r for r in rows if r["key"] == key]
        assert max(r["total_events"] for r in per_key) == n
        assert sum(r["batch_events"] for r in per_key) == n
