"""Tests for the NLP expansions, TF-IDF, geo ops, and sequence additions.

Mirrors reference tests:
- TextToCharacterIndexTransform / TextToTermIndexSequenceTransform
  (datavec-api/.../transform/TestTransforms-family)
- TfidfVectorizer (datavec-data-nlp/.../TfidfRecordReaderTest.java)
- TestGeoTransforms.java / TestGeoReduction.java
"""

import math

import pytest
from pyspark.sql import functions as F

from datavec_spark.functions.nlp import term_counts, tfidf, tfidf_vectors
from datavec_spark.operators.geo import ip_lookup, ipv4_to_long
from datavec_spark.operators.sequence import analyze_sequence, sequence_merge
from datavec_spark.operators.transforms import OPS, TransformProcess


# ---------------------------------------------------------------------------
# text → index expansions
# ---------------------------------------------------------------------------


def test_text_to_char_index(spark):
    df = spark.createDataFrame([(0, "abc"), (1, "cab")], "i int, txt string")
    cmap = {"a": 1, "b": 2, "c": 3}
    tp = TransformProcess().add("text_to_char_index", column="txt",
                                new_column="cidx", char_index_map=cmap)
    out = tp(df).orderBy("i", "_exp_idx").collect()
    assert [(r["i"], r["_exp_idx"], r["cidx"]) for r in out] == [
        (0, 0, 1), (0, 1, 2), (0, 2, 3), (1, 0, 3), (1, 1, 1), (1, 2, 2)]
    assert "txt" not in tp(df).columns  # text column replaced by expansion


def test_text_to_char_index_unknown_skipped(spark):
    df = spark.createDataFrame([(0, "axb")], "i int, txt string")
    tp = TransformProcess().add("text_to_char_index", column="txt",
                                new_column="cidx", char_index_map={"a": 0, "b": 1})
    out = tp(df).orderBy("_exp_idx").collect()
    # 'x' skipped (exceptionOnUnknown=false path); positions keep original offsets
    assert [(r["_exp_idx"], r["cidx"]) for r in out] == [(0, 0), (2, 1)]


def test_text_to_char_index_unknown_fails(spark):
    df = spark.createDataFrame([(0, "ax")], "i int, txt string")
    tp = TransformProcess().add("text_to_char_index", column="txt",
                                new_column="cidx", char_index_map={"a": 0},
                                on_unknown="fail")
    with pytest.raises(Exception, match="unknown token"):
        tp(df).collect()


def test_text_to_term_index(spark):
    df = spark.createDataFrame([(7, "zero one two")], "i int, txt string")
    vocab = {"zero": 0, "one": 1, "two": 2}
    tp = TransformProcess().add("text_to_term_index", column="txt",
                                new_column="tidx", word_index_map=vocab)
    out = tp(df).orderBy("_exp_idx").collect()
    # "zero one two" → [0, 1, 2] (TextToTermIndexSequenceTransform.java:34 javadoc)
    assert [r["tidx"] for r in out] == [0, 1, 2]
    assert all(r["i"] == 7 for r in out)  # other columns duplicated


def test_expansion_json_roundtrip(spark):
    tp = TransformProcess().add("text_to_term_index", column="txt",
                                new_column="tidx", word_index_map={"a": 0},
                                delimiter=",")
    tp2 = TransformProcess.from_json(tp.to_json())
    df = spark.createDataFrame([(0, "a,a")], "i int, txt string")
    assert tp2(df).count() == 2


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def _docs(spark):
    return spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry"), (2, "cherry cherry date")],
        "doc_id int, text string")


def test_term_counts(spark):
    tc = {(r["doc_id"], r["term"]): r["tf_count"]
          for r in term_counts(_docs(spark)).collect()}
    assert tc[(0, "apple")] == 2 and tc[(0, "banana")] == 1 and tc[(2, "cherry")] == 2


def test_tfidf_reference_formula(spark):
    # tf = 1 + log10(count); idf = log10(N/df); tfidf = tf*idf (MathUtils.java:263-286)
    rows = {(r["doc_id"], r["term"]): r for r in tfidf(_docs(spark)).collect()}
    apple = rows[(0, "apple")]
    assert apple["tf"] == pytest.approx(1 + math.log10(2))
    assert apple["idf"] == pytest.approx(math.log10(3 / 1))
    assert apple["tfidf"] == pytest.approx((1 + math.log10(2)) * math.log10(3))
    banana = rows[(1, "banana")]  # df=2
    assert banana["idf"] == pytest.approx(math.log10(3 / 2))


def test_tfidf_min_df(spark):
    out = tfidf(_docs(spark), min_df=2)
    terms = {r["term"] for r in out.collect()}
    assert terms == {"banana", "cherry"}  # apple/date appear in only 1 doc


def test_tfidf_vectors(spark):
    vocab = ["apple", "banana", "cherry"]
    vecs = {r["doc_id"]: r["tfidf_vec"] for r in
            tfidf_vectors(_docs(spark), vocab).collect()}
    assert len(vecs) == 3 and len(vecs[0]) == 3
    assert vecs[0][0] == pytest.approx((1 + math.log10(2)) * math.log10(3))
    assert vecs[0][2] == 0.0  # cherry absent from doc 0
    assert vecs[2][0] == 0.0  # apple absent from doc 2


# ---------------------------------------------------------------------------
# geo
# ---------------------------------------------------------------------------

_LOOKUP_ROWS = [
    # 10.0.0.0/24 → Springfield, US ; 192.168.1.0/24 → Lyon, FR
    {"lo_ip": 167772160, "hi_ip": 167772415, "city": "Springfield",
     "country": "United States", "latitude": 39.8, "longitude": -89.6},
    {"lo_ip": 3232235776, "hi_ip": 3232236031, "city": "Lyon",
     "country": "France", "latitude": 45.76, "longitude": 4.84},
]


def test_ipv4_to_long(spark):
    df = spark.createDataFrame([("10.0.0.1",), ("192.168.1.5",)], "ip string")
    got = [r["v"] for r in df.select(ipv4_to_long(F.col("ip")).alias("v")).collect()]
    assert got == [167772161, 3232235781]


def test_ip_to_location_city_and_country(spark):
    df = spark.createDataFrame(
        [(0, "10.0.0.77"), (1, "192.168.1.200"), (2, "8.8.8.8")], "i int, ip string")
    out = {r["i"]: r["loc"] for r in
           ip_lookup(df, "ip", _LOOKUP_ROWS, "CITY", out="loc").collect()}
    assert out == {0: "Springfield", 1: "Lyon", 2: None}
    cc = {r["i"]: r["ip"] for r in
          ip_lookup(df, "ip", _LOOKUP_ROWS, "COUNTRY").collect()}  # in-place
    assert cc[1] == "France"


def test_ip_to_coordinates(spark):
    df = spark.createDataFrame([(0, "10.0.0.1")], "i int, ip string")
    out = OPS["ip_to_coordinates"](df, column="ip", lookup=_LOOKUP_ROWS).collect()
    assert out[0]["ip"] == "39.8:-89.6"


def test_coordinates_reduction_matches_reference(spark):
    # TestGeoReduction.java: Sum over 1#5, 2#6, 3#7, 4#8 → "10.0#26.0"
    df = spark.createDataFrame(
        [("someKey", "1#5"), ("someKey", "2#6"), ("someKey", "3#7"), ("someKey", "4#8")],
        "key string, coord string")
    out = OPS["coordinates_reduction"](
        df, key_columns=["key"], column="coord", reduce_ops="Sum",
        out_names="coordSum", delimiter="#").collect()
    assert out[0]["key"] == "someKey" and out[0]["coordSum"] == "10.0#26.0"


def test_coordinates_reduction_multi_op(spark):
    df = spark.createDataFrame([("k", "1:10"), ("k", "3:30")], "key string, coord string")
    out = OPS["coordinates_reduction"](
        df, key_columns=["key"], column="coord",
        reduce_ops=["Min", "Max"], out_names=["cmin", "cmax"]).collect()
    assert out[0]["cmin"] == "1.0:10.0" and out[0]["cmax"] == "3.0:30.0"


# ---------------------------------------------------------------------------
# sequence additions
# ---------------------------------------------------------------------------


def test_sequence_merge(spark):
    a = spark.createDataFrame([("s1", 1, 10.0), ("s1", 3, 30.0)], "k string, t int, v double")
    b = spark.createDataFrame([("s1", 2, 20.0), ("s2", 1, 1.0)], "k string, t int, v double")
    merged = sequence_merge([a, b])
    got = [(r["k"], r["t"]) for r in merged.orderBy("k", "t").collect()]
    assert got == [("s1", 1), ("s1", 2), ("s1", 3), ("s2", 1)]


def test_sequence_length_filter(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 1)], "k string, t int")
    out = OPS["sequence_length_filter"](df, keys=["k"], op=">=", value=2)
    assert {r["k"] for r in out.collect()} == {"a"}
    out2 = OPS["sequence_length_filter"](df, keys=["k"], op="==", value=1)
    assert {r["k"] for r in out2.collect()} == {"b"}


def test_analyze_sequence(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", i) for i in range(3)], "k string, t int")
    stats = analyze_sequence(df, keys=["k"])
    assert stats["n_sequences"] == 2
    assert stats["min_length"] == 3 and stats["max_length"] == 5
    assert stats["mean_length"] == pytest.approx(4.0)
    assert stats["total_steps"] == 8
    assert sum(b["n"] for b in stats["length_histogram"]) == 2


def test_coordinates_distance_matches_reference(spark):
    # TestGeoTransforms.testCoordinatesDistanceTransform exact cases
    import math

    df = spark.createDataFrame(
        [("-30", "20", "10"), ("50|40", "10|-20", "10|5")],
        "point string, mean string, stddev string")
    out = OPS["coordinates_distance"](
        df, out="dist", col_a="point", col_b="mean",
        stddev_col="stddev", delimiter=r"\|").collect()
    got = sorted(r["dist"] for r in out)
    assert got[0] == pytest.approx(5.0)
    assert got[1] == pytest.approx(math.sqrt(160))


def test_coordinates_distance_plain_euclidean(spark):
    df = spark.createDataFrame([("0:0", "3:4")], "a string, b string")
    out = OPS["coordinates_distance"](df, out="d", col_a="a", col_b="b").collect()
    assert out[0]["d"] == pytest.approx(5.0)
