"""Reader/writer round-trips (mirrors records/reader/impl/*Test.java)."""

import os

from pyspark.sql import functions as F

from datavec_spark.plans.schema import EngineSchema
from datavec_spark.sources.readers import (
    compose_readers,
    from_collection,
    read_csv,
    read_csv_sequence,
    read_jsonl,
    read_libsvm,
    read_lines,
    read_regex_lines,
    read_whole_files,
)
from datavec_spark.sources.writers import write_csv, write_libsvm, write_lines, write_parquet_sorted


def schema3():
    return (EngineSchema.builder().add_integer("a").add_string("b").add_double("c").build())


def test_csv_roundtrip_with_skip_and_delim(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "f1.csv").write_text("#skip me\n1;x;0.5\n2;y;1.5\n")
    df = read_csv(spark, str(src), schema3(), delimiter=";", skip_lines=1)
    assert sorted(tuple(r) for r in df.collect()) == [(1, "x", 0.5), (2, "y", 1.5)]
    out = str(tmp_path / "out")
    write_csv(df, out, delimiter="|")
    back = read_csv(spark, out, schema3(), delimiter="|")
    assert back.count() == 2


def test_csv_sequence_per_file(spark, tmp_path):
    # csvsequence fixture shape: 3 files = 3 sequences (FIXTURES.md §B3)
    src = tmp_path / "seqs"
    src.mkdir()
    for i in range(3):
        (src / f"s{i}.csv").write_text("\n".join(f"{i},{j},{i + j}.0" for j in range(4)))
    sch = EngineSchema.builder().add_integer("sid").add_integer("step").add_double("v").build()
    df = read_csv_sequence(spark, str(src), sch)
    assert df.count() == 12
    per_file = df.groupBy("_seq_file").agg(F.count(F.lit(1)).alias("n"), F.max("_seq_idx").alias("mx"))
    assert all(r["n"] == 4 and r["mx"] == 3 for r in per_file.collect())


def test_regex_lines(spark, tmp_path):
    # logtestdata shape (RegexLineRecordReader.java:48)
    src = tmp_path / "logs"
    src.mkdir()
    (src / "a.log").write_text(
        "2024-01-01 12:00:00 INFO start\n2024-01-01 12:00:01 WARN slow\ngarbage line\n")
    df = read_regex_lines(spark, str(src), r"(\S+ \S+) (\w+) (.*)", ["ts", "level", "msg"])
    rows = sorted((r["level"], r["msg"]) for r in df.collect())
    assert rows == [("INFO", "start"), ("WARN", "slow")]  # bad line skipped
    import pytest

    with pytest.raises(ValueError):
        read_regex_lines(spark, str(src), r"(\S+ \S+) (\w+) (.*)", ["t", "l", "m"], mode="fail")


def test_whole_files_with_label(spark, tmp_path):
    for label in ("cat", "dog"):
        d = tmp_path / "data" / label
        d.mkdir(parents=True)
        (d / "x.txt").write_text(f"I am a {label}")
    df = read_whole_files(spark, str(tmp_path / "data" / "*" / "*"), label_from_dir=True)
    got = {r["label"]: r["text"] for r in df.collect()}
    assert got == {"cat": "I am a cat", "dog": "I am a dog"}


def test_jsonl_field_selection(spark, tmp_path):
    src = tmp_path / "j"
    src.mkdir()
    (src / "d.jsonl").write_text(
        '{"a": {"b": 1}, "tags": ["x", "y"], "name": "n1"}\n'
        '{"a": {"b": 2}, "tags": ["z"], "name": "n2"}\n')
    df = read_jsonl(spark, str(src), field_paths={"b": "a.b", "first_tag": "tags[0]", "name": "name"})
    got = sorted(tuple(r) for r in df.collect())
    assert got == [(1, "x", "n1"), (2, "z", "n2")]


def test_libsvm_roundtrip(spark, tmp_path):
    df = from_collection(spark, [(1.0, 0.0, 2.5), (0.0, 3.0, 0.0)], "label double, f1 double, f2 double")
    out = str(tmp_path / "svm")
    write_libsvm(df, out, "label", ["f1", "f2"])
    lines = set()
    for fn in os.listdir(out):
        if fn.startswith("part"):
            lines |= set(open(os.path.join(out, fn)).read().splitlines())
    assert lines == {"1.0 2:2.5", "0.0 1:3.0"}
    back = read_libsvm(spark, out, num_features=2)
    assert back.count() == 2 and set(back.columns) == {"label", "features"}


def test_lines_and_compose(spark, tmp_path):
    src = tmp_path / "t"
    src.mkdir()
    (src / "a.txt").write_text("l1\nl2\n")
    left = read_lines(spark, str(src)).withColumnRenamed("value", "l")
    right = from_collection(spark, [("r1",), ("r2",)], "r string")
    both = compose_readers(left.orderBy("l"), right.orderBy("r"))
    assert sorted(tuple(r) for r in both.collect()) == [("l1", "r1"), ("l2", "r2")]


def test_write_parquet_sorted_prunes(spark, tmp_path):
    df = from_collection(spark, [(i, f"v{i}") for i in range(1000)], "k int, v string")
    out = str(tmp_path / "sorted")
    write_parquet_sorted(df, out, ["k"])
    back = spark.read.parquet(out).where(F.col("k") == 500)
    assert back.count() == 1


def test_matlab_roundtrip(spark, tmp_path):
    # MatlabRecordReader.java:37 format: whitespace-separated doubles,
    # '%' comments, blank lines skipped
    src = tmp_path / "mat"
    src.mkdir()
    (src / "a.txt").write_text(
        "% a comment line\n1.0 2.0 3.0\n\n4.0\t5.0 6.0  % trailing comment\n")
    from datavec_spark.sources.readers import read_matlab
    from datavec_spark.sources.writers import write_matlab

    df = read_matlab(spark, str(src), num_cols=3)
    rows = sorted([(r["c0"], r["c1"], r["c2"]) for r in df.collect()])
    assert rows == [(1.0, 2.0, 3.0), (4.0, 5.0, 6.0)]

    arr = read_matlab(spark, str(src))
    assert sorted(r["values"] for r in arr.collect()) == [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]

    out = str(tmp_path / "out")
    write_matlab(df.select("c0", "c1", "c2"), out)
    back = read_matlab(spark, out, num_cols=3)
    assert sorted((r["c0"], r["c1"], r["c2"]) for r in back.collect()) == rows


def test_voc_annotations(spark, tmp_path):
    # Pascal-VOC annotation shape (VocLabelProvider.java:47 parity)
    ann = tmp_path / "Annotations"
    ann.mkdir()
    (ann / "000005.xml").write_text("""<annotation>
  <filename>000005.jpg</filename>
  <object>
    <name>chair</name>
    <bndbox><xmin>263</xmin><ymin>211</ymin><xmax>324</xmax><ymax>339</ymax></bndbox>
  </object>
  <object>
    <name>sofa</name>
    <bndbox>
      <xmin>4</xmin>
      <ymin>244</ymin>
      <xmax>66</xmax>
      <ymax>373</ymax>
    </bndbox>
  </object>
</annotation>""")
    (ann / "000007.xml").write_text("""<annotation>
  <object><name>car</name>
    <bndbox><xmin>141</xmin><ymin>50</ymin><xmax>500</xmax><ymax>330</ymax></bndbox>
  </object>
</annotation>""")
    from datavec_spark.sources.readers import read_voc_annotations

    out = read_voc_annotations(spark, str(ann))
    rows = {(r["image_id"], r["name"]): (r["xmin"], r["ymin"], r["xmax"], r["ymax"])
            for r in out.collect()}
    assert rows[("000005", "chair")] == (263, 211, 324, 339)
    assert rows[("000005", "sofa")] == (4, 244, 66, 373)
    assert rows[("000007", "car")] == (141, 50, 500, 330)


def test_compose_readers_zip(spark, tmp_path):
    # two identically-laid-out parquet datasets zip positionally with no
    # shuffle (RDD zip — the distributed ComposableRecordReader path)
    import pyspark.sql.functions as F

    base = spark.range(0, 1000, 1, 4)
    base.select(F.col("id").alias("a")).write.parquet(str(tmp_path / "l"))
    base.select((F.col("id") * 2).alias("b")).write.parquet(str(tmp_path / "r"))
    from datavec_spark.sources.readers import compose_readers_zip

    l = spark.read.parquet(str(tmp_path / "l"))
    r = spark.read.parquet(str(tmp_path / "r"))
    out = compose_readers_zip(l, r)
    assert out.count() == 1000
    assert out.where(F.col("b") != F.col("a") * 2).count() == 0


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    # JDBCRecordReader parity, executed for real: Spark's distribution
    # bundles Derby, so write a table through Spark's JDBC sink into an
    # embedded database and read it back through read_jdbc with a
    # source-side query (projection + predicate run in the database,
    # like the reference reader shipping its SQL to the driver).
    import pyspark.sql.functions as F

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.range(0, 100, 1, 2).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("double").alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("name"),
    )
    try:
        df.write.format("jdbc").option("url", url) \
            .option("dbtable", "t").options(**drv).save()
    except Exception as e:  # pragma: no cover - driver genuinely absent
        if "ClassNotFound" in str(e) or "No suitable driver" in str(e):
            pytest.skip("no Derby driver on this Spark classpath")
        raise

    from datavec_spark.sources.readers import read_jdbc

    # Spark's JDBC sink quotes COLUMN identifiers (case-exact "k") but
    # passes the dbtable name through verbatim (Derby folds it to T), so
    # the source-side SQL quotes columns and leaves the table unquoted
    out = read_jdbc(spark, url, 'SELECT "k", "v" FROM t WHERE "k" < 10', **drv)
    rows = sorted((r["k"], r["v"]) for r in out.collect())
    assert rows == [(i, float(i * 2)) for i in range(10)]
    assert len(out.columns) == 2  # projection happened source-side
