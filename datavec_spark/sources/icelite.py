"""icelite — a minimal transactional snapshot table format on Parquet.

The sandbox ships no Iceberg runtime jar, so this module provides the
Iceberg *semantics* the CDC engine needs, behind a small API a real Iceberg
catalog could replace 1:1:

- **Atomic commits / snapshot isolation**: every commit writes a new
  immutable metadata JSON `metadata/v{N}.json` created with O_EXCL
  (optimistic concurrency — a concurrent committer loses and retries) and
  then atomically swings `metadata/version-hint.text` via os.replace.
  Readers resolve the hint to one metadata file → a consistent snapshot.
- **Snapshot summary properties + table properties**: carry the
  exactly-once epoch fence (`cdc.last-epoch`) so a retried foreachBatch
  epoch is a no-op (Iceberg: snapshot summary / table properties).
- **Schema evolution by field id**: columns have stable integer ids;
  rename changes only the display name, widen (int→long, float→double)
  casts old files on read, add fills nulls. Old data files remain valid
  (Iceberg: schema-id per data file + name mapping).
- **Bucket-partitioned copy-on-write MERGE**: the table is hash-bucketed
  on its key columns; a merge rewrites only the buckets containing
  changed keys and carries every other data file forward untouched.
  At 100 TB this is the difference between rewriting the world per batch
  and rewriting ~(touched buckets / total buckets) of it (Iceberg COW with
  `bucket(N, key)` partitioning behaves the same way).
- **Time travel**: `read(snapshot_id=...)` reads any retained snapshot.

Semantics modeled on the Iceberg spec (public) and the needs in
SURVEY.md §7; the DataVec reference's closest analog is the sorted/indexed
MapFile storage (`datavec-hadoop/.../MapFileRecordWriter.java:35`,
`datavec-spark/.../storage/SparkStorageUtils.java:190-364`) which this
supersedes with columnar snapshots.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# type registry (icelite type string <-> Spark type)
# ---------------------------------------------------------------------------

_PRIMITIVES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
}

# legal widening promotions (Iceberg spec: int→long, float→double)
_WIDEN_OK = {("int", "long"), ("float", "double"), ("int", "double")}


def type_to_spark(s: str) -> T.DataType:
    if s in _PRIMITIVES:
        return _PRIMITIVES[s]
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(type_to_spark(s[6:-1]))
    raise ValueError(f"unsupported icelite type: {s}")


def spark_to_type(dt: T.DataType) -> str:
    for name, t in _PRIMITIVES.items():
        if dt == t:
            return name
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_to_type(dt.elementType)}>"
    raise ValueError(f"unsupported spark type for icelite: {dt}")


def schema_to_struct(fields: list[dict]) -> T.StructType:
    return T.StructType(
        [T.StructField(f["name"], type_to_spark(f["type"]), f.get("nullable", True)) for f in fields]
    )


# ---------------------------------------------------------------------------
# table
# ---------------------------------------------------------------------------

BUCKET_COL = "__bucket"
SLOT_COL = "__slot"


class CommitConflict(Exception):
    """Another writer committed the same version first."""


class IceliteTable:
    def __init__(self, location: str):
        self.location = location
        self._meta_dir = os.path.join(location, "metadata")
        self._data_dir = os.path.join(location, "data")

    # -- lifecycle -----------------------------------------------------------

    @classmethod
    def create(
        cls,
        location: str,
        schema: T.StructType,
        key_cols: list[str] | None = None,
        num_buckets: int = 16,
        properties: dict[str, str] | None = None,
        sub_splits: int = 1,
    ) -> "IceliteTable":
        """sub_splits > 1 splits every bucket's data into that many FILES,
        by a second, independent hash of the key (deterministic slots). A
        merge then rewrites only the slot files whose hash space the
        changed keys actually occupy — copy-on-write amplification drops
        from (bucket size) to (bucket size / sub_splits) per changed key.
        This is the file-level pruning step between bucket-COW and full
        merge-on-read: at 100 TB, num_buckets fixes shuffle/task
        parallelism while num_buckets x sub_splits fixes the rewrite unit
        and target file size. Static by design — slot assignment must be
        stable across batches or pruning would miss files (the same
        reason bucket counts are fixed at creation)."""
        t = cls(location)
        os.makedirs(t._meta_dir, exist_ok=True)
        os.makedirs(t._data_dir, exist_ok=True)
        fields = [
            {"id": i + 1, "name": f.name, "type": spark_to_type(f.dataType), "nullable": f.nullable}
            for i, f in enumerate(schema.fields)
        ]
        key_cols = key_cols or []
        key_ids = [fields[[f["name"] for f in fields].index(c)]["id"] for c in key_cols]
        meta = {
            "format_version": 1,
            "table_uuid": str(uuid.uuid4()),
            "current_schema_id": 0,
            "schemas": [{"schema_id": 0, "fields": fields}],
            "partition_spec": {"key_field_ids": key_ids, "num_buckets": num_buckets,
                               "sub_splits": int(sub_splits)},
            "properties": dict(properties or {}),
            "current_snapshot_id": None,
            "snapshots": [],
            "last_field_id": len(fields),
            "last_snapshot_id": 0,
        }
        t._write_metadata(meta, expected_version=0)
        return t

    @classmethod
    def load(cls, location: str) -> "IceliteTable":
        t = cls(location)
        t.metadata()  # raises if absent
        return t

    @staticmethod
    def exists(location: str) -> bool:
        return os.path.exists(os.path.join(location, "metadata", "version-hint.text"))

    # -- metadata ------------------------------------------------------------

    def _version(self) -> int:
        with open(os.path.join(self._meta_dir, "version-hint.text")) as fh:
            return int(fh.read().strip())

    def metadata(self) -> dict:
        return self._load()[0]

    def _load(self) -> tuple[dict, int]:
        """Atomically consistent (metadata, version) pair: read the version
        hint ONCE and load exactly that v{N}.json. Commit sites must use
        this (not separate metadata()/_version() calls) — a concurrent
        commit landing between the two reads would otherwise let a writer
        publish STALE metadata at the NEWER version, silently dropping the
        other writer's snapshot past the O_EXCL same-version guard."""
        v = self._version()
        with open(os.path.join(self._meta_dir, f"v{v}.json")) as fh:
            return json.load(fh), v

    def _write_metadata(self, meta: dict, expected_version: int) -> None:
        new_v = expected_version + 1
        path = os.path.join(self._meta_dir, f"v{new_v}.json")
        try:
            # O_EXCL create = the optimistic-concurrency commit point
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflict(f"metadata v{new_v} already exists") from e
        with os.fdopen(fd, "w") as fh:
            json.dump(meta, fh)
        tmp = os.path.join(self._meta_dir, f".hint.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(new_v))
        os.replace(tmp, os.path.join(self._meta_dir, "version-hint.text"))

    def schema_struct(self, schema_id: int | None = None) -> T.StructType:
        meta = self.metadata()
        sid = meta["current_schema_id"] if schema_id is None else schema_id
        fields = next(s["fields"] for s in meta["schemas"] if s["schema_id"] == sid)
        return schema_to_struct(fields)

    def properties(self) -> dict[str, str]:
        return self.metadata()["properties"]

    def current_snapshot(self) -> dict | None:
        meta = self.metadata()
        if meta["current_snapshot_id"] is None:
            return None
        return next(s for s in meta["snapshots"] if s["snapshot_id"] == meta["current_snapshot_id"])

    def snapshots(self) -> list[dict]:
        return self.metadata()["snapshots"]

    def key_cols(self, meta: dict | None = None) -> list[str]:
        meta = meta or self.metadata()
        fields = self._fields(meta)
        by_id = {f["id"]: f["name"] for f in fields}
        return [by_id[i] for i in meta["partition_spec"]["key_field_ids"]]

    def _fields(self, meta: dict, schema_id: int | None = None) -> list[dict]:
        sid = meta["current_schema_id"] if schema_id is None else schema_id
        return next(s["fields"] for s in meta["schemas"] if s["schema_id"] == sid)

    # -- read ----------------------------------------------------------------

    @staticmethod
    def _select_files(files: list[dict], bucket_slots) -> tuple[list[dict], list[dict]]:
        """Partition manifest entries into (selected, rest) by a set of
        touched (bucket, slot) pairs. An entry with no slot (written by an
        unsplit table or before splitting) covers its bucket's whole hash
        space, so it matches whenever its bucket is touched at all."""
        pairs = set(bucket_slots)
        touched_buckets = {b for b, _ in pairs}
        sel, rest = [], []
        for f in files:
            hit = (f["bucket"] in touched_buckets
                   if f.get("slot") is None
                   else (f["bucket"], f["slot"]) in pairs)
            (sel if hit else rest).append(f)
        return sel, rest

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        buckets: list[int] | None = None,
        bucket_slots=None,
    ) -> DataFrame:
        """Current (or time-travel) snapshot as a DataFrame in the current
        schema. Old-schema files are projected by field id: renamed columns
        aliased, widened columns cast, added columns null-filled. With
        `buckets`, only data files of those buckets are read; with
        `bucket_slots` (a collection of (bucket, slot) pairs), only the
        matching slot FILES within those buckets (file-level pruning at
        the manifest — the scale path for merges)."""
        meta = self.metadata()
        if snapshot_id is None:
            snap = self.current_snapshot()
        else:
            snap = next(s for s in meta["snapshots"] if s["snapshot_id"] == snapshot_id)
        cur_fields = self._fields(meta)
        cur_struct = schema_to_struct(cur_fields)
        if snap is None or not snap["files"]:
            return spark.createDataFrame([], cur_struct)

        files = snap["files"]
        if bucket_slots is not None:
            files, _ = self._select_files(files, bucket_slots)
        elif buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f["bucket"] in bset]
        if not files:
            return spark.createDataFrame([], cur_struct)
        return self._read_resolved(spark, meta, files)

    def read_changes(
        self,
        spark: SparkSession,
        from_snapshot_id: int | None = None,
        to_snapshot_id: int | None = None,
        change_col: str = "_change_type",
        deleted_col: str = "_deleted",
    ) -> DataFrame:
        """Incremental changelog — "what changed since snapshot X" — for
        downstream CDC consumers (the read-side half of an ingest engine:
        audit, cache invalidation, derived-table refresh). Emits UPSERT
        form: one row per key whose visible newest version differs between
        the two snapshots, in the current schema plus `change_col` ∈
        {'upsert', 'delete'} — upserts carry the new image, deletes the
        last visible old image (Kafka-compacted-topic semantics; an
        update is an upsert, not a delete+insert pair).

        Scale path: a key's versions never leave its bucket, so the diff
        is pruned to CANDIDATE BUCKETS — buckets of manifest entries added
        or removed between the snapshots (COW merges rewrite only touched
        files; MOR epochs append delta files only for changed keys;
        rollback removes files). Both snapshot reads scan only those
        buckets and the diff is ONE full-outer shuffle over them —
        O(touched-bucket bytes), not O(table), per poll. Compaction
        rewrites are content-neutral: their buckets enter the candidate
        set and diff to nothing.

        from_snapshot_id=None means "initial load": every visible row of
        the target snapshot as an upsert. Schema-only evolution commits no
        snapshot and therefore emits no change rows (a schema change is
        not a row change). Raises ValueError on snapshot ids that are
        unknown (e.g. expired)."""
        from functools import reduce as _reduce

        meta = self.metadata()
        snaps = {s["snapshot_id"]: s for s in meta["snapshots"]}
        if to_snapshot_id is None:
            to_snapshot_id = meta["current_snapshot_id"]
        if to_snapshot_id not in snaps:
            raise ValueError(f"unknown to_snapshot_id {to_snapshot_id} (expired?)")
        cols = [f["name"] for f in self._fields(meta)]
        keys = self.key_cols(meta)
        out_struct = T.StructType(
            schema_to_struct(self._fields(meta)).fields
            + [T.StructField(change_col, T.StringType())]
        )

        def visible(df: DataFrame) -> DataFrame:
            if deleted_col in cols:
                return df.where(~F.coalesce(F.col(deleted_col), F.lit(False)))
            return df

        if from_snapshot_id is None:
            return visible(self.read(spark, snapshot_id=to_snapshot_id)) \
                .withColumn(change_col, F.lit("upsert"))
        if from_snapshot_id not in snaps:
            raise ValueError(f"unknown from_snapshot_id {from_snapshot_id} (expired?)")
        if from_snapshot_id == to_snapshot_id:
            return spark.createDataFrame([], out_struct)

        old_files = snaps[from_snapshot_id]["files"]
        new_files = snaps[to_snapshot_id]["files"]
        old_paths = {f["path"] for f in old_files}
        new_paths = {f["path"] for f in new_files}
        candidates = sorted(
            {f["bucket"] for f in new_files if f["path"] not in old_paths}
            | {f["bucket"] for f in old_files if f["path"] not in new_paths}
        )
        if not candidates:
            return spark.createDataFrame([], out_struct)

        old_df = visible(self.read(spark, snapshot_id=from_snapshot_id,
                                   buckets=candidates)) \
            .withColumn("_o_present", F.lit(True))
        new_df = visible(self.read(spark, snapshot_id=to_snapshot_id,
                                   buckets=candidates)) \
            .withColumn("_n_present", F.lit(True))
        non_keys = [c for c in cols if c not in keys]
        j = new_df.alias("n").join(old_df.alias("o"), on=keys, how="full_outer")
        o_present = F.col("o._o_present").isNotNull()
        n_present = F.col("n._n_present").isNotNull()
        same = _reduce(
            lambda a, b: a & b,
            [F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}")) for c in non_keys],
            F.lit(True),
        )
        ct = (
            F.when(n_present & (~o_present | ~same), F.lit("upsert"))
            .when(o_present & ~n_present, F.lit("delete"))
        )
        # single pass: change type + conditional image in one projection —
        # no union of two filters re-evaluating the join
        img = [
            F.when(ct == F.lit("delete"), F.col(f"o.{c}"))
            .otherwise(F.col(f"n.{c}")).alias(c)
            for c in non_keys
        ]
        return (
            j.withColumn(change_col, ct)
            .where(F.col(change_col).isNotNull())
            .select(*keys, *img, change_col)
            .select(*[f.name for f in out_struct.fields])
        )

    def _read_resolved(self, spark: SparkSession, meta: dict, files: list[dict]) -> DataFrame:
        """Read manifest entries with merge-on-read resolution: when the
        file set contains DELTA files (appended by merge_cdc(mode='mor')),
        a key may have several versions across base + delta files — keep
        only the newest by the table's seq column (LWW, the read-time half
        of merge-on-read). The resolution window runs ONLY over buckets
        that actually hold a delta file: a key's versions all live in its
        bucket, so delta-free buckets are final and stream through as
        plain scans — at scale the read amplification is bounded by the
        HOT bucket set × compaction cadence, not the table size. Tombstone
        rows survive resolution like any other newest version
        (read_current-style callers filter them). Zero overhead when no
        delta file is present. Ties on (key, seq) are identical
        re-delivered rows — either copy is the same row."""
        delta_buckets = {f["bucket"] for f in files if f.get("delta")}
        if not delta_buckets:
            return self._read_entries(spark, meta, files)
        keys = self.key_cols(meta)
        seq_col = meta["properties"].get("mor.seq-col", "_seq")
        from pyspark.sql import Window

        hot = [f for f in files if f["bucket"] in delta_buckets]
        clean = [f for f in files if f["bucket"] not in delta_buckets]
        w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(seq_col).desc())
        resolved = (
            self._read_entries(spark, meta, hot)
            .withColumn("_mor_rn", F.row_number().over(w))
            .where(F.col("_mor_rn") == 1).drop("_mor_rn")
        )
        if not clean:
            return resolved
        return self._read_entries(spark, meta, clean).unionByName(resolved)

    def _read_entries(self, spark: SparkSession, meta: dict, files: list[dict]) -> DataFrame:
        """Read specific manifest entries projected to the current schema
        (empty entry list -> empty DataFrame). Files are grouped by the
        schema they were written with; each group is projected by field id
        (rename aliased, widen cast, added null-filled), then unioned."""
        cur_fields = self._fields(meta)
        if not files:
            return spark.createDataFrame([], schema_to_struct(cur_fields))
        by_sid: dict[int, list[str]] = {}
        for f in files:
            by_sid.setdefault(f["schema_id"], []).append(os.path.join(self.location, f["path"]))
        parts: list[DataFrame] = []
        for sid, paths in by_sid.items():
            df = spark.read.parquet(*paths)
            old_fields = {f["id"]: f for f in self._fields(meta, sid)}
            cols = []
            for cf in cur_fields:
                of = old_fields.get(cf["id"])
                if of is None:  # column added after these files were written
                    cols.append(F.lit(None).cast(type_to_spark(cf["type"])).alias(cf["name"]))
                else:
                    c = F.col(of["name"])
                    if of["type"] != cf["type"]:
                        c = c.cast(type_to_spark(cf["type"]))
                    cols.append(c.alias(cf["name"]))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- write ---------------------------------------------------------------

    def _bucket_expr(self, meta: dict) -> F.Column:
        keys = self.key_cols(meta)
        n = meta["partition_spec"]["num_buckets"]
        if not keys:
            return F.lit(0)
        # xxhash64 over ALL key columns (not a string-concatenated key — the
        # reference's string keys, MapToPairForReducerFunction.java:30-53, are
        # a collision + skew hazard this avoids); pmod keeps it non-negative
        return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n)).cast("int")

    @staticmethod
    def sub_splits(meta: dict) -> int:
        # .get: metadata written before sub_splits existed means 1
        return int(meta["partition_spec"].get("sub_splits", 1))

    def _slot_expr(self, meta: dict) -> F.Column:
        """File slot WITHIN a bucket: a second key hash, independent of the
        bucket hash (leading literal salt), so slots subdivide each
        bucket's key population uniformly. Deterministic and computable on
        raw key values — the CDC fused stats pass derives touched
        (bucket, slot) pairs in the same aggregation that derives buckets,
        with no extra job (mirror of the _bucket_expr parity contract)."""
        keys = self.key_cols(meta)
        s = self.sub_splits(meta)
        if not keys or s <= 1:
            return F.lit(0)
        return F.pmod(F.xxhash64(F.lit(1), *[F.col(k) for k in keys]), F.lit(s)).cast("int")

    def _write_data_files(self, df: DataFrame, meta: dict) -> list[dict]:
        """Write df (current schema) as bucket-partitioned parquet (one
        hive dir per bucket, split into sub_splits slot files); return
        manifest entries. One Spark write job."""
        write_id = uuid.uuid4().hex
        out_dir = os.path.join(self._data_dir, write_id)
        n = meta["partition_spec"]["num_buckets"]
        s = self.sub_splits(meta)
        keys = self.key_cols(meta)
        staged = df.withColumn(BUCKET_COL, self._bucket_expr(meta))
        if s > 1:
            staged = staged.withColumn(SLOT_COL, self._slot_expr(meta))
        if keys:
            # co-locate each (bucket, slot) into one task → one file each
            part_cols = [F.col(BUCKET_COL)] + ([F.col(SLOT_COL)] if s > 1 else [])
            staged = staged.repartition(n * s, *part_cols)
        part_by = [BUCKET_COL] + ([SLOT_COL] if s > 1 else [])
        staged.write.partitionBy(*part_by).parquet(out_dir)
        entries: list[dict] = []
        for bucket_dir in sorted(os.listdir(out_dir)):
            if not bucket_dir.startswith(f"{BUCKET_COL}="):
                continue
            bucket = int(bucket_dir.split("=", 1)[1])
            bpath = os.path.join(out_dir, bucket_dir)
            slot_dirs = sorted(d for d in os.listdir(bpath) if d.startswith(f"{SLOT_COL}="))
            for slot_dir, slot in ([(None, None)] if not slot_dirs
                                   else [(d, int(d.split("=", 1)[1])) for d in slot_dirs]):
                spath = bpath if slot_dir is None else os.path.join(bpath, slot_dir)
                for fn in sorted(os.listdir(spath)):
                    if fn.endswith(".parquet"):
                        rel = os.path.relpath(os.path.join(spath, fn), self.location)
                        e = {"path": rel, "bucket": bucket, "schema_id": meta["current_schema_id"]}
                        if slot is not None:
                            e["slot"] = slot
                        entries.append(e)
        return entries

    def _commit_snapshot(
        self,
        meta: dict,
        version: int,
        files: list[dict],
        summary: dict[str, Any],
        properties_update: dict[str, str] | None = None,
    ) -> int:
        snap_id = meta["last_snapshot_id"] + 1
        snap = {
            "snapshot_id": snap_id,
            "parent_id": meta["current_snapshot_id"],
            "timestamp_ms": int(time.time() * 1000),
            "schema_id": meta["current_schema_id"],
            "summary": summary,
            "files": files,
        }
        meta["snapshots"].append(snap)
        meta["current_snapshot_id"] = snap_id
        meta["last_snapshot_id"] = snap_id
        if properties_update:
            meta["properties"].update(properties_update)
        self._write_metadata(meta, expected_version=version)
        return snap_id

    def append(
        self,
        df: DataFrame,
        summary: dict[str, Any] | None = None,
        properties_update: dict[str, str] | None = None,
    ) -> int:
        meta, version = self._load()
        cur = self.current_snapshot()
        new_files = self._write_data_files(self._conform(df, meta), meta)
        files = (cur["files"] if cur else []) + new_files
        return self._commit_snapshot(
            meta, version, files, {"operation": "append", **(summary or {})},
            properties_update=properties_update,
        )

    def append_rows_local(
        self,
        rows: list[dict],
        summary: dict[str, Any] | None = None,
        properties_update: dict[str, str] | None = None,
    ) -> int:
        """Driver-side append of a tiny row set (e.g. per-epoch lineage,
        ≤num_buckets rows) via pyarrow — no Spark job, same atomic commit.
        Only valid for unbucketed tables (num_buckets == 1)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        meta, version = self._load()
        assert meta["partition_spec"]["num_buckets"] == 1, "local append needs num_buckets=1"
        fields = self._fields(meta)
        arrow_types = {
            "boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
            "float": pa.float32(), "double": pa.float64(), "string": pa.string(),
            "binary": pa.binary(), "timestamp": pa.timestamp("us"), "date": pa.date32(),
        }
        arrays, names = [], []
        for f in fields:
            names.append(f["name"])
            arrays.append(pa.array([r.get(f["name"]) for r in rows], type=arrow_types[f["type"]]))
        rel_dir = os.path.join("data", uuid.uuid4().hex)
        os.makedirs(os.path.join(self.location, rel_dir), exist_ok=True)
        rel = os.path.join(rel_dir, f"{BUCKET_COL}=0", "local.parquet")
        os.makedirs(os.path.dirname(os.path.join(self.location, rel)), exist_ok=True)
        pq.write_table(pa.Table.from_arrays(arrays, names=names), os.path.join(self.location, rel))
        entry = {"path": rel, "bucket": 0, "schema_id": meta["current_schema_id"]}
        cur = None
        if meta["current_snapshot_id"] is not None:
            cur = next(s for s in meta["snapshots"]
                       if s["snapshot_id"] == meta["current_snapshot_id"])
        files = (cur["files"] if cur else []) + [entry]
        return self._commit_snapshot(
            meta, version, files, {"operation": "append", **(summary or {})},
            properties_update=properties_update,
        )

    def overwrite(self, df: DataFrame, summary: dict[str, Any] | None = None) -> int:
        meta, version = self._load()
        new_files = self._write_data_files(self._conform(df, meta), meta)
        return self._commit_snapshot(
            meta, version, new_files, {"operation": "overwrite", **(summary or {})}
        )

    def _conform(self, df: DataFrame, meta: dict) -> DataFrame:
        cur = self._fields(meta)
        cols = []
        for f in cur:
            if f["name"] in df.columns:
                cols.append(F.col(f["name"]).cast(type_to_spark(f["type"])).alias(f["name"]))
            else:
                cols.append(F.lit(None).cast(type_to_spark(f["type"])).alias(f["name"]))
        return df.select(*cols)

    # -- CDC merge (epoch-fenced, bucket copy-on-write) -----------------------

    def last_epoch(self) -> int:
        return int(self.properties().get("cdc.last-epoch", "-1"))

    def merge_cdc(
        self,
        spark: SparkSession,
        changes: DataFrame,
        seq_col: str = "_seq",
        op_col: str = "_op",
        epoch: int | None = None,
        extra_summary: dict[str, Any] | None = None,
        extra_properties: dict[str, str] | None = None,
        touched_buckets: list[int] | None = None,
        touched_bucket_slots=None,
        mode: str = "cow",
    ) -> dict:
        """Apply per-key winners (one row per key: op ∈ {upsert, delete},
        payload in current schema + seq_col) with last-writer-wins by
        seq_col against the stored `_seq`. Copy-on-write at bucket
        granularity: only buckets containing changed keys are rewritten.

        Exactly-once: with `epoch`, the merge is fenced — if
        epoch <= properties['cdc.last-epoch'] the call is a no-op (the
        retried foreachBatch case), and the property advances atomically
        with the snapshot commit.

        touched_buckets: callers that already know which buckets the change
        keys hash to (the CDC apply stage computes them in its fused stats
        pass) pass them here — the merge then runs as ONE Spark job (the
        write), with no pruning collect and no persist of the change set.
        Must be a superset of `_bucket_expr` over the change keys; a bucket
        with no actual changes is rewritten identically (correct, wasteful).
        Without it, the merge derives the set itself (persist + distinct —
        a second job).

        touched_bucket_slots: FILE-level pruning for sub_splits tables — a
        collection of (bucket, slot) pairs (from _bucket_expr/_slot_expr
        over the change keys; the CDC stats pass computes both in its one
        aggregation). Only the matching slot files are read and rewritten;
        every other file — including other slots of a touched bucket —
        carries forward untouched. Rewrite amplification per changed key
        drops from (bucket size) to (bucket size / sub_splits).

        mode: 'cow' (default) rewrites the touched files with changes
        folded in — reads stay plain scans. 'mor' (merge-on-read) APPENDS
        the change winners as bucket-partitioned DELTA files: per-epoch
        write cost is proportional to the CHANGES alone (no target read,
        no join, no rewrite — the full-table COW amplification disappears
        from the ingest path), and reads pay a per-key max-seq window
        until compact() folds the deltas back into plain files. At 10^10
        events with hot tables this is the standard Iceberg/Hudi
        write-optimized mode; a later COW-mode merge (or compact) on the
        same table acts as compaction because the target read resolves
        deltas first. Requires a `_deleted` tombstone column so deletes
        are representable as rows.

        Returns {"applied": bool, "snapshot_id": int|None}.
        """
        meta, version = self._load()
        if epoch is not None and epoch <= int(meta["properties"].get("cdc.last-epoch", "-1")):
            return {"applied": False, "snapshot_id": None, "reason": "epoch-fenced"}
        keys = self.key_cols(meta)
        assert keys, "merge_cdc requires key columns"
        if mode == "mor":
            return self._merge_mor(
                meta, version, changes, seq_col, op_col, epoch,
                extra_summary, extra_properties,
            )
        subs = self.sub_splits(meta)
        cur = None
        if meta["current_snapshot_id"] is not None:
            cur = next(s for s in meta["snapshots"]
                       if s["snapshot_id"] == meta["current_snapshot_id"])
        cur_files = cur["files"] if cur else []

        changes = changes.withColumn(BUCKET_COL, self._bucket_expr(meta))
        persisted = False
        if touched_bucket_slots is not None:
            pairs = sorted({(int(b), int(sl)) for b, sl in touched_bucket_slots})
            touched = sorted({b for b, _ in pairs})
            selected, untouched = self._select_files(cur_files, pairs)
        elif touched_buckets is not None:
            touched = sorted(set(touched_buckets))
            tset = set(touched)
            selected = [f for f in cur_files if f["bucket"] in tset]
            untouched = [f for f in cur_files if f["bucket"] not in tset]
        else:
            # persist: the change set is consumed twice (pruning + merge
            # write) and is typically the output of an aggregation
            persisted = True
            changes = changes.persist()
            if subs > 1:
                changes = changes.withColumn(SLOT_COL, self._slot_expr(meta))
                pairs = sorted({(r[0], r[1]) for r in
                                changes.select(BUCKET_COL, SLOT_COL).distinct().collect()})
                touched = sorted({b for b, _ in pairs})
                selected, untouched = self._select_files(cur_files, pairs)
            else:
                touched = sorted(r[0] for r in changes.select(BUCKET_COL).distinct().collect())
                tset = set(touched)
                selected = [f for f in cur_files if f["bucket"] in tset]
                untouched = [f for f in cur_files if f["bucket"] not in tset]
        # resolve deltas on the target if a prior mor-mode merge appended
        # any (a cow merge on such a table doubles as compaction of the
        # touched files)
        target = self._read_resolved(spark, meta, selected)

        data_cols = [f["name"] for f in self._fields(meta)]
        # resolve: keep target rows whose key is absent from changes or whose
        # stored seq wins; take change rows that are upserts and win.
        # Changes are full-row images: current-schema columns absent from the
        # change stream (e.g. just-added columns) are null on upsert.
        fields_by_name = {f["name"]: f for f in self._fields(meta)}
        ch = changes.select(
            *[
                (F.col(c) if c in changes.columns
                 else F.lit(None).cast(type_to_spark(fields_by_name[c]["type"]))).alias(c)
                for c in data_cols
                if c != seq_col
            ],
            F.col(seq_col),
            F.col(op_col),
        )
        joined = target.alias("t").join(ch.alias("c"), on=keys, how="full_outer")
        has_change = F.col(f"c.{op_col}").isNotNull()
        change_wins = has_change & (
            F.col(f"t.{seq_col}").isNull() | (F.col(f"c.{seq_col}") > F.col(f"t.{seq_col}"))
        )
        keep_target = (~has_change) | (~change_wins)
        is_upsert = F.col(f"c.{op_col}") != F.lit("delete")

        def pick(col: str) -> F.Column:
            if col in keys:
                return F.col(col)
            return F.when(change_wins, F.col(f"c.{col}")).otherwise(F.col(f"t.{col}"))

        merged = (
            joined.where((keep_target & F.col(f"t.{seq_col}").isNotNull()) | (change_wins & is_upsert))
            .select(*[pick(c).alias(c) for c in data_cols])
        )

        try:
            new_files = self._write_data_files(merged, meta)
        finally:
            if persisted:
                changes.unpersist()
        # PRUNING-SET GUARD (r6 advice #2): when the caller supplied the
        # touched set (derived from a separate stats pass over a
        # non-persisted batch), a non-deterministic change plan can
        # recompute rows into buckets/slots OUTSIDE that set — the merge
        # would then commit the stray rows into a new file while the stale
        # file holding their old versions is carried forward untouched:
        # silent duplicate key versions. The written manifest entries carry
        # each output file's true (bucket, slot), so the violation is
        # detectable here for free (driver-side set check, no extra job) —
        # fail the commit loudly instead.
        if touched_bucket_slots is not None:
            allowed = set(pairs)
            stray = sorted({(e["bucket"], e.get("slot")) for e in new_files}
                           - {(b, s) for b, s in allowed})
            if stray:
                raise RuntimeError(
                    f"merge_cdc: changes materialized into (bucket, slot) "
                    f"pairs {stray[:10]} outside the supplied "
                    f"touched_bucket_slots — the change plan recomputed "
                    f"differently than the stats pass that derived the "
                    f"pruning set (non-deterministic upstream?); pass "
                    f"persist_batch=True or drop the pruning hint")
        elif touched_buckets is not None:
            stray = sorted({e["bucket"] for e in new_files} - set(touched))
            if stray:
                raise RuntimeError(
                    f"merge_cdc: changes materialized into buckets "
                    f"{stray[:10]} outside the supplied touched_buckets — "
                    f"the change plan recomputed differently than the stats "
                    f"pass that derived the pruning set (non-deterministic "
                    f"upstream?); pass persist_batch=True or drop the "
                    f"pruning hint")
        # `untouched` was partitioned off the snapshot of the metadata
        # ALREADY loaded for the commit CAS — no fresh read (serial-path
        # trim); every selected file was consumed into `merged` above and
        # is replaced by new_files
        props = dict(extra_properties or {})
        if epoch is not None:
            props["cdc.last-epoch"] = str(epoch)
        props = props or None
        snap_id = self._commit_snapshot(
            meta,
            version,
            untouched + new_files,
            {"operation": "merge", "touched-buckets": len(touched),
             "rewritten-files": len(selected), "carried-files": len(untouched),
             **(extra_summary or {})},
            properties_update=props,
        )
        return {"applied": True, "snapshot_id": snap_id}

    def _merge_mor(
        self,
        meta: dict,
        version: int,
        changes: DataFrame,
        seq_col: str,
        op_col: str,
        epoch: int | None,
        extra_summary: dict[str, Any] | None,
        extra_properties: dict[str, str] | None,
    ) -> dict:
        """merge_cdc's merge-on-read arm: append change winners as delta
        files (see merge_cdc docstring). ONE Spark job — the bucket-
        partitioned delta write of the changes themselves."""
        data_cols = [f["name"] for f in self._fields(meta)]
        fields_by_name = {f["name"]: f for f in self._fields(meta)}
        keys = self.key_cols(meta)
        if "_deleted" not in data_cols:
            raise ValueError("mor merge requires a `_deleted` tombstone column")
        is_del = F.col(op_col) == F.lit("delete")
        sel = []
        for c in data_cols:
            src = (F.col(c) if c in changes.columns
                   else F.lit(None).cast(type_to_spark(fields_by_name[c]["type"])))
            if c == "_deleted":
                # delete ops become tombstone rows; upserts default to live
                src = F.when(is_del, F.lit(True)).otherwise(F.coalesce(src, F.lit(False)))
            elif c not in keys and c != seq_col:
                src = F.when(is_del, F.lit(None).cast(
                    type_to_spark(fields_by_name[c]["type"]))).otherwise(src)
            sel.append(src.alias(c))
        rows = changes.select(*sel)
        new_files = self._write_data_files(rows, meta)
        for e in new_files:
            e["delta"] = True
        cur = None
        if meta["current_snapshot_id"] is not None:
            cur = next(s for s in meta["snapshots"]
                       if s["snapshot_id"] == meta["current_snapshot_id"])
        props = dict(extra_properties or {})
        props["mor.seq-col"] = seq_col
        if epoch is not None:
            props["cdc.last-epoch"] = str(epoch)
        snap_id = self._commit_snapshot(
            meta,
            version,
            (cur["files"] if cur else []) + new_files,
            {"operation": "merge-mor", "delta-files": len(new_files),
             **(extra_summary or {})},
            properties_update=props,
        )
        return {"applied": True, "snapshot_id": snap_id}

    # -- schema evolution ------------------------------------------------------

    def _evolve(self, mutate, properties_update: dict[str, str] | None = None) -> int:
        meta, version = self._load()
        fields = [dict(f) for f in self._fields(meta)]
        fields = mutate(meta, fields)
        # allocate past the HIGHEST schema id ever used, not current+1:
        # rollback_to() legitimately sets current_schema_id back to an older
        # id, and current+1 would then collide with an existing schema —
        # _fields resolves the first match, silently shadowing the new schema.
        new_sid = max(s["schema_id"] for s in meta["schemas"]) + 1
        meta["schemas"].append({"schema_id": new_sid, "fields": fields})
        meta["current_schema_id"] = new_sid
        if properties_update:
            meta["properties"].update(properties_update)
        self._write_metadata(meta, expected_version=version)
        return new_sid

    def add_column(self, name: str, type_str: str, properties_update: dict[str, str] | None = None) -> int:
        type_to_spark(type_str)  # validate

        def mutate(meta, fields):
            if any(f["name"] == name for f in fields):
                raise ValueError(f"column exists: {name}")
            meta["last_field_id"] += 1
            return fields + [{"id": meta["last_field_id"], "name": name, "type": type_str, "nullable": True}]

        return self._evolve(mutate, properties_update)

    def rename_column(self, name: str, new_name: str, properties_update: dict[str, str] | None = None) -> int:
        def mutate(meta, fields):
            hit = [f for f in fields if f["name"] == name]
            if not hit:
                raise ValueError(f"no such column: {name}")
            hit[0]["name"] = new_name
            return fields

        return self._evolve(mutate, properties_update)

    def widen_column(self, name: str, new_type: str, properties_update: dict[str, str] | None = None) -> int:
        def mutate(meta, fields):
            hit = [f for f in fields if f["name"] == name]
            if not hit:
                raise ValueError(f"no such column: {name}")
            if hit[0]["id"] in meta["partition_spec"]["key_field_ids"]:
                # ENFORCED, not just documented (round-5 advice): bucket
                # assignment hashes key values with their CURRENT types, and
                # xxhash64(int) != xxhash64(long) for the same value — a
                # widened key would silently re-bucket rows away from the
                # stale files that still hold their old versions (duplicate
                # keys, no error). Renames are safe (values unchanged);
                # widening a key requires a full table rewrite, which this
                # format does not implement.
                raise ValueError(
                    f"cannot widen partition-key column {name!r}: the bucket "
                    "hash is type-sensitive and existing files would keep "
                    "rows in stale buckets")
            if (hit[0]["type"], new_type) not in _WIDEN_OK:
                raise ValueError(f"illegal widen {hit[0]['type']} -> {new_type}")
            hit[0]["type"] = new_type
            return fields

        return self._evolve(mutate, properties_update)

    # -- maintenance -----------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        drop_tombstones_below_seq: int | None = None,
        deleted_col: str = "_deleted",
        seq_col: str = "_seq",
    ) -> dict:
        """Rewrite the table's current snapshot: coalesce each bucket's file
        set to one file and physically drop tombstones whose seq is below
        the given horizon (safe once the horizon is older than any event the
        stream can still deliver — i.e. below the watermark's seq frontier).
        The Iceberg analog is rewrite_data_files + a delete-cleanup pass.
        At 10^10 events this is the job that keeps merge target reads
        proportional to live data rather than to delete history."""
        meta, version = self._load()
        df = self.read(spark)
        dropped_expr = None
        if drop_tombstones_below_seq is not None and deleted_col in df.columns:
            dropped_expr = F.col(deleted_col) & (F.col(seq_col) < drop_tombstones_below_seq)
            df = df.where(~dropped_expr)
        new_files = self._write_data_files(df, meta)
        snap_id = self._commit_snapshot(
            meta, version, new_files,
            {"operation": "compact", "tombstone-horizon": drop_tombstones_below_seq},
        )
        return {"snapshot_id": snap_id, "files": len(new_files)}

    def rollback_to(self, snapshot_id: int) -> int:
        """Make a retained older snapshot current again (Iceberg:
        rollback_to_snapshot). Implemented as a NEW snapshot commit whose
        file list and schema are the target's — history is preserved, time
        travel still reaches the rolled-back-over snapshots, and a
        concurrent commit conflicts normally via the version CAS."""
        meta, version = self._load()
        target = next((s for s in meta["snapshots"] if s["snapshot_id"] == snapshot_id), None)
        if target is None:
            raise ValueError(f"snapshot {snapshot_id} not found (expired?)")
        snap_id = meta["last_snapshot_id"] + 1
        snap = {
            "snapshot_id": snap_id,
            "parent_id": meta["current_snapshot_id"],
            "timestamp_ms": int(time.time() * 1000),
            "schema_id": target["schema_id"],
            "summary": {"operation": "rollback", "rollback-to": snapshot_id},
            "files": list(target["files"]),
        }
        meta["snapshots"].append(snap)
        meta["current_snapshot_id"] = snap_id
        meta["last_snapshot_id"] = snap_id
        # reads resolve columns via the schema id carried by the snapshot
        meta["current_schema_id"] = target["schema_id"]
        self._write_metadata(meta, expected_version=version)
        return snap_id

    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Drop old snapshots' metadata entries and garbage-collect data files
        referenced only by them (Iceberg: expire_snapshots)."""
        meta, version = self._load()
        snaps = meta["snapshots"]
        if len(snaps) <= keep_last:
            return 0
        keep = snaps[-keep_last:]
        live = {f["path"] for s in keep for f in s["files"]}
        dead = {f["path"] for s in snaps[:-keep_last] for f in s["files"]} - live
        for rel in dead:
            p = os.path.join(self.location, rel)
            if os.path.exists(p):
                os.remove(p)
            d = os.path.dirname(p)
            # prune empty bucket dirs best-effort
            try:
                os.removedirs(d)
            except OSError:
                pass
        meta["snapshots"] = keep
        self._write_metadata(meta, expected_version=version)
        return len(dead)

    def drop(self) -> None:
        shutil.rmtree(self.location, ignore_errors=True)
