"""Focused tests for the round-7 optimization changes: shingle/minhash
formulation equivalence, interval parsing, the merge_cdc pruning-set
guard, and lineage schema migration. Each pins a changed operator's
internals to its pre-change semantics."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from datavec_spark.functions.dedup import minhash_signatures
from datavec_spark.functions.text import char_shingles, word_shingles
from datavec_spark.streaming.replay import _delay_to_seconds


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "ab"),          # shorter than any k: must vanish from char k=5
    (3, "one two"),     # < 3 words: must vanish from word k=3
    (4, "aaaaaaa"),     # degenerate: one distinct char-5 shingle
    (5, ""),            # empty
]


def _py_word_shingles(text, k=3):
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _py_char_shingles(text, k=5):
    return {text[i:i + k] for i in range(len(text) - k + 1)}


def test_word_shingles_match_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in word_shingles(df, "text", "doc_id", 3).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    expect = {i: _py_word_shingles(t) for i, t in DOCS if len(t.split()) >= 3}
    assert got == {k: v for k, v in expect.items() if v}


def test_char_shingles_match_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in char_shingles(df, "text", "doc_id", 5).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    expect = {i: _py_char_shingles(t) for i, t in DOCS if len(t) >= 5}
    assert got == {k: v for k, v in expect.items() if v}


def test_minhash_explode_form_matches_narrow_array_form(spark):
    """The explode + groupBy(min) signatures must be value-identical to a
    per-row array_min over the in-row shingle set (min over a set is
    materialization-independent) — pins the r7 A/B conclusion that the two
    formulations are interchangeable on values, so the faster one can be
    chosen freely."""
    from datavec_spark.functions.text import char_shingle_array

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    k, num_hashes = 5, 8
    got = {r["doc_id"]: [r[f"h{i}"] for i in range(num_hashes)]
           for r in minhash_signatures(df, k=k, num_hashes=num_hashes).collect()}
    with_arr = df.where(F.length("text") >= k).select(
        F.col("doc_id"), char_shingle_array("text", k).alias("_sh"))
    def slot(i):
        # NB: a two-parameter lambda in F.transform would receive
        # (element, index) — bind the seed via closure instead
        return F.array_min(
            F.transform(F.col("_sh"), lambda s: F.xxhash64(s, F.lit(i))))

    narrow_df = with_arr.select(
        "doc_id", *[slot(i).alias(f"h{i}") for i in range(num_hashes)])
    narrow = {r["doc_id"]: [r[f"h{i}"] for i in range(num_hashes)]
              for r in narrow_df.collect()}
    assert got == narrow


def test_delay_to_seconds_interval_forms():
    assert _delay_to_seconds("600 seconds") == 600
    assert _delay_to_seconds("120 minutes") == 7200
    assert _delay_to_seconds("2 hours") == 7200
    assert _delay_to_seconds("1 day") == 86400
    # previously-crashing Spark-valid forms (r6 advice #1)
    assert _delay_to_seconds("500 milliseconds") == 0
    assert _delay_to_seconds("1500 milliseconds") == 1
    assert _delay_to_seconds("1 week") == 604800
    assert _delay_to_seconds("1 hour 30 minutes") == 5400
    with pytest.raises(ValueError, match="unsupported interval unit"):
        _delay_to_seconds("3 fortnights")
    with pytest.raises(ValueError, match="unsupported interval"):
        _delay_to_seconds("90")


def test_merge_cdc_pruning_guard_catches_stray_buckets(spark):
    """A touched_buckets set that does not cover every change bucket must
    fail loudly (r6 advice #2: silent duplicate key versions otherwise)."""
    from pyspark.sql import types as T

    from datavec_spark.sources.icelite import IceliteTable

    tmp = tempfile.mkdtemp(prefix="icelite_guard_")
    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
        T.StructField("_seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ])
    t = IceliteTable.create(os.path.join(tmp, "t"), schema, key_cols=["k"],
                            num_buckets=8)
    base = spark.createDataFrame(
        [(f"k{i}", "v0", 0, False) for i in range(20)], schema)
    t.overwrite(base)
    changes = spark.createDataFrame(
        [(f"k{i}", "v1", 1, False) for i in range(20)], schema) \
        .withColumn("_op", F.lit("upsert"))
    # correct full set works
    t.merge_cdc(spark, changes, epoch=0, touched_buckets=list(range(8)))
    # a deliberately short set must raise, not silently commit
    with pytest.raises(RuntimeError, match="outside the supplied touched_buckets"):
        t.merge_cdc(spark, changes.withColumn("_seq", F.lit(2).cast("long")),
                    epoch=1, touched_buckets=[0])


def test_read_lineage_null_fills_pre_upgrade_schema(spark):
    """A lineage table written before LINEAGE_SCHEMA gained dropped_late
    must stay readable: missing columns come back null-filled and the drop
    totals resolve (r6 advice #4)."""
    from pyspark.sql import types as T

    from datavec_spark.sources.icelite import IceliteTable
    from datavec_spark.streaming.replay import LINEAGE_SCHEMA, CdcEngine

    tmp = tempfile.mkdtemp(prefix="cdc_lineage_mig_")
    old_fields = [f for f in LINEAGE_SCHEMA.fields if f.name != "dropped_late"]
    lin = IceliteTable.create(
        os.path.join(tmp, "repos_lineage"), T.StructType(old_fields),
        key_cols=["epoch", "partition"], num_buckets=1,
        properties={"lineage.last-epoch": "-1"},
    )
    lin.append_rows_local(
        [{"epoch": 0, "partition": 3, "event_count": 10, "min_seq": 1,
          "max_seq": 10, "late_count": 2, "snapshot_id": 1}],
        properties_update={"lineage.last-epoch": "0"},
    )
    eng = CdcEngine(os.path.join(tmp, "repos"))
    df = eng.read_lineage(spark)
    assert "dropped_late" in df.columns
    row = df.collect()[0]
    assert row["event_count"] == 10 and row["dropped_late"] is None
    totals = eng.lineage_drop_totals(spark)
    assert totals == {"rows_dropped_late": 0, "rows_late": 2, "rows_arrived": 10}
