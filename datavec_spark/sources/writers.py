"""Sinks: DataVec RecordWriter parity on df.write (SURVEY.md §2.2).

CSVRecordWriter / LineRecordWriter / SVMLightRecordWriter / SparkExport →
declarative writes; the MapFile/SequenceFile storage layer
(SparkStorageUtils.java:76-364) is superseded by icelite snapshots
(sources/icelite.py) — columnar, transactional, indexed by bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, delimiter: str = ",", header: bool = False,
              mode: str = "overwrite") -> None:
    """CSVRecordWriter (writer/impl/csv/CSVRecordWriter.java:35) /
    SparkExport.exportCSVLocal (utils/SparkExport.java:36)."""
    df.write.option("sep", delimiter).option("header", str(header).lower()).mode(mode).csv(path)


def write_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """LineRecordWriter (impl/LineRecordWriter.java:33): single string column."""
    col = df.columns[0] if len(df.columns) == 1 else None
    out = df if col else df.select(F.concat_ws(",", *df.columns).alias("value"))
    out.write.mode(mode).text(path)


def write_libsvm(df: DataFrame, path: str, label_col: str, feature_cols: list[str],
                 mode: str = "overwrite") -> None:
    """SVMLightRecordWriter (misc/SVMLightRecordWriter.java:63): sparse
    `label idx:val ...` lines, 1-based indices, zeros omitted."""
    parts = [F.col(label_col).cast("string")]
    pieces = []
    for i, c in enumerate(feature_cols):
        v = F.col(c)
        pieces.append(F.when(v.isNotNull() & (v != 0),
                             F.concat(F.lit(f"{i + 1}:"), v.cast("string"))))
    line = F.concat_ws(" ", *parts, *pieces)
    df.select(line.alias("value")).write.mode(mode).text(path)


def write_matlab(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """MatlabRecordWriter (misc/MatlabRecordWriter.java:34): one record per
    line, values space-separated (the reference writes ' ' — its `tabs`
    flag is hard-coded false)."""
    df.select(F.concat_ws(" ", *[F.col(c).cast("string") for c in df.columns])
              .alias("value")).write.mode(mode).text(path)


def write_parquet_sorted(df: DataFrame, path: str, sort_cols: list[str],
                         mode: str = "overwrite") -> None:
    """saveMapFile parity (SparkStorageUtils.java:190-364): sorted, splittable,
    key-ordered storage — range-partitioned sorted parquet gives the same
    random-access-by-key property via min/max pruning."""
    n = df.sparkSession.sparkContext.defaultParallelism
    df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols) \
        .write.mode(mode).parquet(path)
