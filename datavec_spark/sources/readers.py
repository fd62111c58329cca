"""Sources: DataVec RecordReader parity on spark.read (SURVEY.md §2.1).

Every reader returns a DataFrame; schema comes from an EngineSchema (typed,
with restrictions) or inference. The reference's per-record readers
(records/reader/impl/*) become declarative scans — splits, globbing and
parallelism are Spark's; invalid-row policies map to parse modes
(PERMISSIVE / DROPMALFORMED / FAILFAST, mirroring RegexSequenceRecordReader
error modes FailOnInvalid/SkipInvalid, regex/RegexSequenceRecordReader.java:60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datavec_spark.plans.schema import EngineSchema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: EngineSchema | None = None,
    delimiter: str = ",",
    quote: str = '"',
    skip_lines: int = 0,
    header: bool = False,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSVRecordReader parity (csv/CSVRecordReader.java:42): custom
    delimiter/quote, skipNumLines, invalid-row policy."""
    reader = (
        spark.read.option("sep", delimiter).option("quote", quote)
        .option("header", str(header).lower()).option("mode", mode)
    )
    if skip_lines > 0:
        # skipNumLines semantics are per-file: drop the first N rows of each
        # input file. monotonically_increasing_id is only contractual within
        # ONE split — multiLine=true makes the CSV parser non-splittable
        # (one file = one split, rows in file order), which makes the
        # per-file window ordering below a real contract, at the cost of
        # file-level (not split-level) parallelism — acceptable: per-file
        # prefix skipping is inherently a per-file sequential notion.
        reader = reader.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema.to_struct())
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if skip_lines > 0:
        from pyspark.sql import Window

        w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
        df = df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") > skip_lines).drop("_rn")
    return df


def read_csv_sequence(spark: SparkSession, path: str, schema: EngineSchema | None = None,
                      **kw) -> DataFrame:
    """CSVSequenceRecordReader parity (csv/CSVSequenceRecordReader.java:40):
    one file = one sequence → sequence key column `_seq_file` + step index."""
    from pyspark.sql import Window

    df = read_csv(spark, path, schema, **kw).withColumn("_seq_file", F.input_file_name())
    w = Window.partitionBy("_seq_file").orderBy(F.monotonically_increasing_id())
    return df.withColumn("_seq_idx", F.row_number().over(w) - 1)


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """LineRecordReader (impl/LineRecordReader.java:46): one line = one row."""
    return spark.read.text(path)


def read_regex_lines(spark: SparkSession, path: str, pattern: str,
                     column_names: list[str], mode: str = "skip") -> DataFrame:
    """RegexLineRecordReader (regex/RegexLineRecordReader.java:48): regex
    capture groups → typed columns; non-matching lines dropped ('skip') or
    failed ('fail') — RegexSequenceRecordReader.java:70 error modes."""
    df = spark.read.text(path)
    matched = df.withColumn("_m", F.regexp_extract_all(F.col("value"), F.lit(f"^{pattern}$"), 0))
    ok = F.col("value").rlike(f"^{pattern}$")
    if mode == "fail":
        bad = df.where(~ok).limit(1).collect()
        if bad:
            raise ValueError(f"line does not match pattern: {bad[0]['value'][:200]}")
    out = df.where(ok)
    cols = [F.regexp_extract(F.col("value"), f"^{pattern}$", i + 1).alias(n)
            for i, n in enumerate(column_names)]
    return out.select(*cols)


def read_whole_files(spark: SparkSession, path: str, label_from_dir: bool = False) -> DataFrame:
    """FileRecordReader (impl/FileRecordReader.java:42): one file = one
    record; optional label = parent directory name (the image-classification
    layout, ImageRecordReader.java:33)."""
    df = spark.read.format("binaryFile").load(path)
    out = df.select(
        F.col("path"), F.col("content"),
        F.col("content").cast("string").alias("text"),
    )
    if label_from_dir:
        out = out.withColumn("label", F.element_at(F.split(F.col("path"), "/"), -2))
    return out


def read_jsonl(spark: SparkSession, path: str, schema: EngineSchema | None = None,
               field_paths: dict[str, str] | None = None) -> DataFrame:
    """JacksonRecordReader parity (jackson/JacksonRecordReader.java:60):
    JSON records with FieldSelection paths (FieldSelection.java:36) →
    select nested paths into flat typed columns."""
    reader = spark.read
    if schema is not None and field_paths is None:
        reader = reader.schema(schema.to_struct())
    df = reader.json(path)
    if field_paths:
        df = df.select(*[F.expr(expr).alias(name) for name, expr in field_paths.items()])
    return df


def read_libsvm(spark: SparkSession, path: str, num_features: int | None = None) -> DataFrame:
    """SVMLight/LibSvm reader (misc/SVMLightRecordReader.java:53) via the
    builtin libsvm source → (label double, features vector)."""
    reader = spark.read.format("libsvm")
    if num_features:
        reader = reader.option("numFeatures", str(num_features))
    return reader.load(path)


def from_collection(spark: SparkSession, rows: list, schema: EngineSchema | str) -> DataFrame:
    """CollectionRecordReader / InMemoryRecordReader parity
    (collection/CollectionRecordReader.java:39)."""
    struct = schema.to_struct() if isinstance(schema, EngineSchema) else schema
    return spark.createDataFrame(rows, struct)


def compose_readers(left: DataFrame, right: DataFrame) -> DataFrame:
    """ComposableRecordReader (impl/ComposableRecordReader.java:43): zip two
    readers' records positionally — join on per-partition-stable row index.
    Parity-only: the global window serializes through one task; for the
    distributed path see compose_readers_zip."""
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    l = left.withColumn("_idx", F.row_number().over(w))
    r = right.withColumn("_idx", F.row_number().over(w))
    return l.join(r, "_idx").drop("_idx")


def compose_readers_zip(left: DataFrame, right: DataFrame,
                        file_ordinal: str = r"part-(\d+)") -> DataFrame:
    """Distributed positional zip of two identically-laid-out file datasets
    (features/labels pairs written by the same job): align on (file ordinal
    extracted from the filename, row position WITHIN the file). Parallel
    across files, shuffle only on the tiny (ordinal, position) key — no
    global single-partition window (that's compose_readers, parity-only),
    and robust to Spark reordering input splits by size (which silently
    misaligns a naive RDD zip). Contract: matching filenames on both sides
    and files small enough to read as one split each (row position within a
    multi-split file is not contractual)."""
    from pyspark.sql import Window

    def idx(df: DataFrame) -> DataFrame:
        f = F.regexp_extract(F.input_file_name(), file_ordinal, 1).cast("int")
        out = df.withColumn("_f", f)
        w = Window.partitionBy("_f").orderBy(F.monotonically_increasing_id())
        return out.withColumn("_rn", F.row_number().over(w))

    l, r = idx(left), idx(right)
    return l.join(r, ["_f", "_rn"]).drop("_f", "_rn")


def read_matlab(spark: SparkSession, path: str, num_cols: int | None = None) -> DataFrame:
    """MatlabRecordReader parity (misc/MatlabRecordReader.java:37): Matlab
    ASCII matrix files — whitespace/tab-separated doubles, '%' starts a
    comment that runs to end-of-line, blank lines skipped. Declarative:
    text scan → strip comments → split → cast, no per-row Python.

    With num_cols, values expand to columns c0..c{n-1}; otherwise each row
    is an array<double> column `values`."""
    df = spark.read.text(path)
    clean = F.trim(F.regexp_replace(F.col("value"), r"%.*$", ""))
    # drop empty split pieces before casting: blank/comment-only lines split
    # to [""], and ANSI cast of "" would fail even on rows the length filter
    # below discards (expression evaluation order is not the filter order)
    vals = F.transform(
        F.filter(F.split(clean, r"[\t ]+"), lambda s: s != ""),
        lambda s: s.cast("double"),
    )
    rows = (
        df.select(F.input_file_name().alias("_file"), clean.alias("_c"), vals.alias("values"))
        .where(F.length("_c") > 0)
        .drop("_c")
    )
    if num_cols is None:
        return rows.select("_file", "values")
    return rows.select(
        "_file", *[F.element_at("values", i + 1).alias(f"c{i}") for i in range(num_cols)]
    )


def read_voc_annotations(spark: SparkSession, annotations_dir: str) -> DataFrame:
    """VocLabelProvider parity (datavec-data-image/.../objdetect/impl/
    VocLabelProvider.java:47): parse Pascal-VOC XML annotation files into
    one row per labeled object: (image_id, name, xmin, ymin, xmax, ymax).
    The reference string-scans the XML (its own comment: Jackson can't
    handle repeated elements); here the scan is declarative —
    regexp_extract_all over wholetext files, all JVM-side."""
    df = spark.read.text(annotations_dir, wholetext=True)
    obj = F.regexp_extract_all(F.col("value"), F.lit(r"(?s)<object>(.*?)</object>"), 1)
    image_id = F.regexp_extract(F.input_file_name(), r"([^/]+)\.xml$", 1)
    rows = df.select(image_id.alias("image_id"), F.explode(obj).alias("_o"))
    tag = lambda t: F.regexp_extract(F.col("_o"), rf"<{t}>\s*([^<]*?)\s*</{t}>", 1)
    return rows.select(
        "image_id",
        tag("name").alias("name"),
        tag("xmin").cast("int").alias("xmin"),
        tag("ymin").cast("int").alias("ymin"),
        tag("xmax").cast("int").alias("xmax"),
        tag("ymax").cast("int").alias("ymax"),
    )


def read_jdbc(spark: SparkSession, url: str, query: str, **options) -> DataFrame:
    """JDBCRecordReader parity (datavec-jdbc/.../JDBCRecordReader.java:37)
    — requires a JDBC driver jar on the classpath. Spark's distribution
    bundles Derby (metastore dependency), so the embedded-Derby form
    (`jdbc:derby:<path>;create=true` + driver
    org.apache.derby.jdbc.EmbeddedDriver) is executable and round-trip
    tested here; any other engine needs its driver jar added via
    spark.jars. Predicates in `query` run source-side (the reference
    reader likewise ships the SQL to the database)."""
    return spark.read.format("jdbc").option("url", url).option("query", query) \
        .options(**options).load()
