import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datavec_spark.sources.icelite import CommitConflict, IceliteTable


SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("_seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)


def make(spark, tmp_path, rows, **kw):
    t = IceliteTable.create(str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=4, **kw)
    if rows:
        t.overwrite(spark.createDataFrame(rows, SCHEMA))
    return t


def test_create_read_roundtrip(spark, tmp_path):
    t = make(spark, tmp_path, [("a", 1, 0, False), ("b", 2, 0, False)])
    got = sorted(tuple(r) for r in t.read(spark).collect())
    assert got == [("a", 1, 0, False), ("b", 2, 0, False)]


def test_append_and_time_travel(spark, tmp_path):
    t = make(spark, tmp_path, [("a", 1, 0, False)])
    s1 = t.current_snapshot()["snapshot_id"]
    t.append(spark.createDataFrame([("c", 3, 1, False)], SCHEMA))
    assert t.read(spark).count() == 2
    assert t.read(spark, snapshot_id=s1).count() == 1  # time travel


def test_merge_lww_and_tombstones(spark, tmp_path):
    t = make(spark, tmp_path, [("a", 1, 5, False), ("b", 2, 5, False)])
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("_op", T.StringType())])
    changes = spark.createDataFrame(
        [
            ("a", 10, 9, False, "upsert"),   # newer seq → wins
            ("b", 99, 3, False, "upsert"),   # older seq → loses
            ("c", 7, 8, True, "upsert"),     # tombstone insert
        ],
        ch_schema,
    )
    res = t.merge_cdc(spark, changes, epoch=0)
    assert res["applied"]
    rows = {r["k"]: (r["v"], r["_seq"], r["_deleted"]) for r in t.read(spark).collect()}
    assert rows == {"a": (10, 9, False), "b": (2, 5, False), "c": (7, 8, True)}
    # epoch fence: same epoch again is a no-op
    res2 = t.merge_cdc(spark, changes, epoch=0)
    assert not res2["applied"]
    # bucket copy-on-write: only touched buckets rewritten
    snap = t.current_snapshot()
    assert snap["summary"]["touched-buckets"] <= 4


def test_schema_evolution_by_field_id(spark, tmp_path):
    t = make(spark, tmp_path, [("a", 1, 0, False)])
    t.add_column("stars", "int")
    t.rename_column("stars", "stargazers")
    t.widen_column("stargazers", "long")
    t.rename_column("v", "value")
    df = t.read(spark)
    assert [f.name for f in df.schema.fields] == ["k", "value", "_seq", "_deleted", "stargazers"]
    assert dict(df.dtypes)["stargazers"] == "bigint"
    row = df.collect()[0]
    assert row["value"] == 1 and row["stargazers"] is None  # old file read through rename+add
    t.append(spark.createDataFrame([("b", 2, 1, False, 77)], t.schema_struct()))
    got = {r["k"]: r["stargazers"] for r in t.read(spark).collect()}
    assert got == {"a": None, "b": 77}


def test_illegal_widen_rejected(spark, tmp_path):
    t = make(spark, tmp_path, [])
    with pytest.raises(ValueError):
        t.widen_column("v", "string")


def test_commit_conflict_detection(spark, tmp_path):
    t = make(spark, tmp_path, [("a", 1, 0, False)])
    meta, version = t.metadata(), t._version()
    t.append(spark.createDataFrame([("b", 2, 1, False)], SCHEMA))  # someone else commits
    with pytest.raises(CommitConflict):
        t._write_metadata(meta, expected_version=version)


def test_expire_snapshots_gc(spark, tmp_path):
    t = make(spark, tmp_path, [("a", 1, 0, False)])
    for i in range(3):
        t.overwrite(spark.createDataFrame([("a", i, i + 1, False)], SCHEMA))
    removed = t.expire_snapshots(keep_last=1)
    assert removed > 0
    assert t.read(spark).collect()[0]["v"] == 2


def test_compact_drops_old_tombstones_and_coalesces(spark, tmp_path):
    t = make(spark, tmp_path, [("a", 1, 5, False), ("b", 2, 6, True), ("c", 3, 90, True)])
    t.append(spark.createDataFrame([("d", 4, 7, False)], SCHEMA))
    n_files_before = len(t.current_snapshot()["files"])
    res = t.compact(spark, drop_tombstones_below_seq=50)
    rows = {r["k"]: (r["_seq"], r["_deleted"]) for r in t.read(spark).collect()}
    # b's tombstone (seq 6 < 50) physically dropped; c's (seq 90) retained
    assert rows == {"a": (5, False), "c": (90, True), "d": (7, False)}
    assert len(t.current_snapshot()["files"]) <= n_files_before
    # time travel to the pre-compaction snapshot still sees b's tombstone
    snaps = t.snapshots()
    prev = snaps[-2]["snapshot_id"]
    assert t.read(spark, snapshot_id=prev).count() == 4


def test_load_returns_consistent_pair(spark, tmp_path):
    """Regression for the round-1 commit race: metadata() and _version()
    read separately could pair STALE metadata with a NEWER version. _load()
    reads the hint once and loads exactly that v{N}.json, so a commit
    landing between a writer's read and its commit always surfaces as
    CommitConflict — never as silent snapshot loss."""
    t = make(spark, tmp_path, [("a", 1, 0, False)])
    meta1, v1 = t._load()
    # concurrent committer lands AFTER this writer read its (meta, version)
    t.append(spark.createDataFrame([("b", 2, 1, False)], SCHEMA))
    meta2, v2 = t._load()
    assert v2 == v1 + 1
    # the pair is internally consistent: the files listed belong to v2's
    # snapshot, not a mix
    assert meta2["current_snapshot_id"] != meta1["current_snapshot_id"]
    with pytest.raises(CommitConflict):
        t._write_metadata(meta1, expected_version=v1)
    # and committing with the FRESH pair succeeds
    t._write_metadata(meta2, expected_version=v2)
    assert t._version() == v2 + 1


def test_rollback_to_snapshot(spark, tmp_path):
    t = make(spark, tmp_path, [("a", 1, 0, False)])
    s1 = t.current_snapshot()["snapshot_id"]
    t.append(spark.createDataFrame([("b", 2, 1, False)], SCHEMA))
    assert t.read(spark).count() == 2
    rb = t.rollback_to(s1)
    # current state is the old snapshot's content, via a NEW snapshot
    assert t.read(spark).count() == 1
    assert t.current_snapshot()["snapshot_id"] == rb
    assert t.current_snapshot()["summary"]["operation"] == "rollback"
    # history preserved: time travel still reaches the rolled-over snapshot
    assert t.read(spark, snapshot_id=s1 + 1).count() == 2
    # the table keeps working after rollback
    t.append(spark.createDataFrame([("c", 3, 2, False)], SCHEMA))
    assert t.read(spark).count() == 2


def test_rollback_then_evolve_unique_schema_ids(spark, tmp_path):
    """Regression: rollback_to sets current_schema_id back to an older id;
    _evolve must allocate past the HIGHEST id ever used (max+1), not
    current+1 — otherwise the new schema duplicates an existing schema_id
    and _fields silently resolves the stale first match."""
    t = make(spark, tmp_path, [("a", 1, 0, False)])
    s1 = t.current_snapshot()["snapshot_id"]
    t.add_column("stars", "int")          # schema_id 1
    t.append(spark.createDataFrame([("b", 2, 1, False, 9)], t.schema_struct()))
    t.rollback_to(s1)                     # current_schema_id back to 0
    t.add_column("forks", "int")          # must become schema_id 2, not 1
    sids = [s["schema_id"] for s in t.metadata()["schemas"]]
    assert sids == sorted(set(sids)), f"duplicate schema ids: {sids}"
    names = [f["name"] for f in t._fields(t.metadata())]
    assert "forks" in names and "stars" not in names
    # the evolved table reads and writes through the NEW schema
    t.append(spark.createDataFrame([("c", 3, 2, False, 4)], t.schema_struct()))
    got = {r["k"]: r["forks"] for r in t.read(spark).collect()}
    assert got == {"a": None, "c": 4}


def test_concurrent_merge_conflict_retry_exactly_once(spark, tmp_path):
    """Two writers race a merge: the loser's optimistic commit raises
    CommitConflict (stale version CAS); a plain retry through the public
    API then lands its epoch, and BOTH epochs' rows are present exactly
    once — no lost update, no double-apply."""
    t = make(spark, tmp_path, [("a", 1, 0, False)])
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("_op", T.StringType())])
    ch1 = spark.createDataFrame([("x", 10, 5, False, "upsert")], ch_schema)
    ch2 = spark.createDataFrame([("y", 20, 6, False, "upsert")], ch_schema)

    loser = IceliteTable(t.location)
    stale = loser._load()                    # loser reads (meta, version) first
    orig_load = IceliteTable._load
    IceliteTable._load = lambda self: (stale[0], stale[1]) if self is loser else orig_load(self)
    try:
        t.merge_cdc(spark, ch1, epoch=0)     # winner commits in between
        with pytest.raises(CommitConflict):
            loser.merge_cdc(spark, ch2, epoch=1)
    finally:
        IceliteTable._load = orig_load
    # retry with a fresh read — the normal foreachBatch retry path
    res = loser.merge_cdc(spark, ch2, epoch=1)
    assert res["applied"]
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {"a": 1, "x": 10, "y": 20}
    assert t.last_epoch() == 1


def test_concurrent_appends_threaded_retry(tmp_path):
    """Thread-level race on the metadata CAS: two writers append disjoint
    row sets concurrently with a retry-on-conflict loop (pyarrow local
    appends — pure metadata contention, no Spark jobs). Every row must land
    exactly once and the version history must be a clean linear chain."""
    import threading

    import duckdb

    loc = str(tmp_path / "lineage")
    schema = T.StructType([T.StructField("writer", T.StringType()),
                           T.StructField("i", T.IntegerType())])
    IceliteTable.create(loc, schema, key_cols=[], num_buckets=1)
    barrier = threading.Barrier(2)
    errors = []

    def writer(name):
        try:
            t = IceliteTable(loc)
            barrier.wait()
            for i in range(10):
                while True:
                    try:
                        t.append_rows_local([{"writer": name, "i": i}])
                        break
                    except CommitConflict:
                        continue  # reload happens inside append_rows_local
        except Exception as e:  # pragma: no cover
            errors.append(e)

    th = [threading.Thread(target=writer, args=(n,)) for n in ("w1", "w2")]
    [x.start() for x in th]
    [x.join() for x in th]
    assert not errors
    t = IceliteTable(loc)
    files = [os.path.join(loc, f["path"]) for f in t.current_snapshot()["files"]]
    rows = duckdb.execute(
        f"SELECT writer, i FROM read_parquet({files!r}) ORDER BY writer, i"
    ).fetchall()
    assert rows == [(w, i) for w in ("w1", "w2") for i in range(10)]
    assert len(t.snapshots()) == 20  # one snapshot per successful append


def test_widen_partition_key_rejected(spark, tmp_path):
    """Bucket assignment hashes key values with their CURRENT types and
    xxhash64(int) != xxhash64(long) for the same value: widening a key
    column would silently strand existing rows in stale buckets (duplicate
    keys on the next merge). The contract is now enforced, not just
    documented (round-5 advice item #1)."""
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
            T.StructField("_seq", T.LongType()),
            T.StructField("_deleted", T.BooleanType()),
        ]
    )
    t = IceliteTable.create(str(tmp_path / "kt"), schema, key_cols=["id"], num_buckets=4)
    with pytest.raises(ValueError, match="partition-key"):
        t.widen_column("id", "long")
    t.widen_column("v", "long")  # non-key widen unaffected
    assert dict(t.read(spark).dtypes)["v"] == "bigint"


def test_sub_splits_file_level_merge_pruning(spark, tmp_path):
    """sub_splits tables: a small delta rewrites a STRICT SUBSET of a
    bucket's files (only the slot files its keys hash into) and carries
    every other file forward byte-identically, with the final state equal
    to an unsplit table's merge of the same delta (round-5 verdict #4 —
    the first step from bucket-COW toward MOR+compact)."""
    rows = [(f"k{i}", i, 0, False) for i in range(200)]
    split = IceliteTable.create(str(tmp_path / "split"), SCHEMA,
                                key_cols=["k"], num_buckets=2, sub_splits=4)
    split.overwrite(spark.createDataFrame(rows, SCHEMA))
    plain = IceliteTable.create(str(tmp_path / "plain"), SCHEMA,
                                key_cols=["k"], num_buckets=2)
    plain.overwrite(spark.createDataFrame(rows, SCHEMA))

    files_before = {f["path"]: f for f in split.current_snapshot()["files"]}
    assert len(files_before) == 8  # 2 buckets x 4 slots
    assert all(f.get("slot") is not None for f in files_before.values())

    # one-key delta -> exactly ONE (bucket, slot) pair is touched
    ch_schema = "k string, v int, _seq long, _deleted boolean, _op string"
    change = spark.createDataFrame([("k7", 777, 5, False, "upsert")], ch_schema)
    bucket = split.read(spark).sparkSession.createDataFrame([("k7",)], "k string") \
        .select(split._bucket_expr(split.metadata()).alias("b")).collect()[0]["b"]
    slot = spark.createDataFrame([("k7",)], "k string") \
        .select(split._slot_expr(split.metadata()).alias("s")).collect()[0]["s"]
    res = split.merge_cdc(spark, change, epoch=0,
                          touched_bucket_slots=[(bucket, slot)])
    assert res["applied"]
    plain.merge_cdc(spark, change, epoch=0)

    snap = split.current_snapshot()
    files_after = {f["path"]: f for f in snap["files"]}
    carried = set(files_before) & set(files_after)
    rewritten_old = set(files_before) - set(files_after)
    # strict subset: exactly the one touched slot file was replaced;
    # the bucket's other 3 slot files AND the other bucket carried forward
    assert len(rewritten_old) == 1
    assert len(carried) == 7
    assert snap["summary"]["rewritten-files"] == 1
    assert snap["summary"]["carried-files"] == 7
    old_entry = files_before[next(iter(rewritten_old))]
    assert (old_entry["bucket"], old_entry["slot"]) == (bucket, slot)

    # final state identical to the unsplit table's merge (values AND rows)
    got = sorted(tuple(r) for r in split.read(spark).collect())
    want = sorted(tuple(r) for r in plain.read(spark).collect())
    assert got == want
    assert ("k7", 777, 5, False) in got


def test_sub_splits_self_derived_pruning_and_legacy_files(spark, tmp_path):
    """Without caller-supplied pairs the merge derives (bucket, slot)
    itself; slot-less manifest entries (written before splitting / by
    append_rows-style paths) cover their whole bucket and are consumed
    whenever the bucket is touched."""
    t = IceliteTable.create(str(tmp_path / "t2"), SCHEMA,
                            key_cols=["k"], num_buckets=2, sub_splits=3)
    t.overwrite(spark.createDataFrame([(f"k{i}", i, 0, False) for i in range(60)], SCHEMA))
    n_files = len(t.current_snapshot()["files"])
    assert n_files == 6
    ch_schema = "k string, v int, _seq long, _deleted boolean, _op string"
    t.merge_cdc(spark, spark.createDataFrame([("k3", 33, 4, False, "upsert")], ch_schema), epoch=0)
    snap = t.current_snapshot()
    assert snap["summary"]["rewritten-files"] == 1 and snap["summary"]["carried-files"] == 5
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got["k3"] == 33 and len(got) == 60

    # legacy (slot-less) entry: simulate by stripping the slot from one
    # touched-bucket file's manifest entry, then merge a key in that bucket
    meta, version = t._load()
    cur = next(s for s in meta["snapshots"] if s["snapshot_id"] == meta["current_snapshot_id"])
    victim = next(f for f in cur["files"])
    victim_bucket = victim["bucket"]
    victim.pop("slot", None)
    t._write_metadata(meta, expected_version=version)
    kmeta = t.metadata()
    keys_in_bucket = [
        r["k"] for r in t.read(spark)
        .withColumn("_b", t._bucket_expr(kmeta)).where(F.col("_b") == victim_bucket)
        .collect()
    ]
    ch = spark.createDataFrame([(keys_in_bucket[0], 999, 9, False, "upsert")], ch_schema)
    t.merge_cdc(spark, ch, epoch=1)
    snap2 = t.current_snapshot()
    # the slot-less file must have been consumed (bucket matched), along
    # with the touched slot file if distinct
    assert victim["path"] not in {f["path"] for f in snap2["files"]}
    got2 = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got2[keys_in_bucket[0]] == 999 and len(got2) == 60


def test_merge_on_read_mode(spark, tmp_path):
    """merge_cdc(mode='mor'): epochs append winner-delta files (base files
    untouched — per-epoch write cost proportional to the CHANGES, the
    write-optimized Iceberg/Hudi shape); reads resolve LWW by max-seq at
    read time, tombstones included; compact() folds deltas into plain
    files with identical content; a COW merge on a delta-bearing table
    resolves first (doubles as compaction of touched files)."""
    t = make(spark, tmp_path, [("a", 1, 5, False), ("b", 2, 5, False)])
    base_paths = {f["path"] for f in t.current_snapshot()["files"]}
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("_op", T.StringType())])
    ch1 = spark.createDataFrame(
        [("a", 10, 9, False, "upsert"),   # newer -> wins at read
         ("b", 99, 3, False, "upsert"),   # older -> loses at read
         ("c", 7, 8, False, "upsert")],
        ch_schema)
    res = t.merge_cdc(spark, ch1, epoch=0, mode="mor")
    assert res["applied"]
    snap1 = t.current_snapshot()
    assert snap1["summary"]["operation"] == "merge-mor"
    # base files carried untouched; only delta files added
    assert base_paths <= {f["path"] for f in snap1["files"]}
    assert all(f.get("delta") for f in snap1["files"] if f["path"] not in base_paths)

    rows = {r["k"]: (r["v"], r["_seq"], r["_deleted"]) for r in t.read(spark).collect()}
    assert rows == {"a": (10, 9, False), "b": (2, 5, False), "c": (7, 8, False)}

    # second mor epoch: a delete arrives as an op (tombstone row appended)
    ch2 = spark.createDataFrame([("c", None, 11, None, "delete")], ch_schema)
    t.merge_cdc(spark, ch2, epoch=1, mode="mor")
    rows = {r["k"]: (r["_seq"], r["_deleted"]) for r in t.read(spark).collect()}
    assert rows["c"] == (11, True)  # tombstone is the newest version
    # epoch fence holds across modes
    assert not t.merge_cdc(spark, ch2, epoch=1, mode="mor")["applied"]

    # compact folds deltas: same resolved content, no delta entries left
    before = sorted((r["k"], r["v"], r["_seq"], r["_deleted"])
                    for r in t.read(spark).collect())
    t.compact(spark)
    snap2 = t.current_snapshot()
    assert not any(f.get("delta") for f in snap2["files"])
    after = sorted((r["k"], r["v"], r["_seq"], r["_deleted"])
                   for r in t.read(spark).collect())
    assert before == after

    # cow merge on a fresh mor table resolves deltas in its target read
    t2 = make(spark, tmp_path / "two", [("x", 1, 0, False)])
    t2.merge_cdc(spark, spark.createDataFrame(
        [("x", 5, 2, False, "upsert")], ch_schema), epoch=0, mode="mor")
    t2.merge_cdc(spark, spark.createDataFrame(
        [("x", 9, 4, False, "upsert")], ch_schema), epoch=1)  # cow
    got = {r["k"]: (r["v"], r["_seq"]) for r in t2.read(spark).collect()}
    assert got == {"x": (9, 4)}
    assert not any(f.get("delta") for f in t2.current_snapshot()["files"])


def test_mor_resolution_prunes_to_delta_buckets(spark, tmp_path):
    """The mor read-side window runs only over buckets holding a delta
    file; delta-free buckets stream through as plain scans. Pin via the
    executed plan: with ONE hot bucket, exactly one Window operator and
    a union with the plain side appear, and the result equals a full
    resolution."""
    t = make(spark, tmp_path, [(f"k{i}", i, 0, False) for i in range(80)])
    meta = t.metadata()
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("_op", T.StringType())])
    # pick a key, find its bucket; delta lands only there
    b7 = spark.createDataFrame([("k7",)], "k string") \
        .select(t._bucket_expr(meta).alias("b")).collect()[0]["b"]
    t.merge_cdc(spark, spark.createDataFrame(
        [("k7", 700, 3, False, "upsert")], ch_schema), epoch=0, mode="mor")
    df = t.read(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "Union" in plan
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got["k7"] == 700 and len(got) == 80
    # the hot side reads only the delta bucket's files
    hot_files = [f for f in t.current_snapshot()["files"]
                 if f["bucket"] == b7]
    assert any(f.get("delta") for f in hot_files)


def test_read_changes_cow_diff(spark, tmp_path):
    """Incremental changelog over COW merges: upsert/update/delete between
    two snapshots, unchanged keys silent, initial-load mode, and the
    no-change / same-snapshot edges."""
    t = make(spark, tmp_path, [("a", 1, 5, False), ("b", 2, 5, False),
                               ("z", 9, 5, False)])
    s0 = t.current_snapshot()["snapshot_id"]

    # initial load: everything as upsert
    init = {r["k"]: r["_change_type"]
            for r in t.read_changes(spark, from_snapshot_id=None).collect()}
    assert init == {"a": "upsert", "b": "upsert", "z": "upsert"}

    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("_op", T.StringType())])
    t.merge_cdc(spark, spark.createDataFrame(
        [("a", 10, 9, False, "upsert"),      # update
         ("b", 0, 8, False, "delete"),       # delete
         ("c", 7, 8, False, "upsert"),       # insert
         ("z", 9, 4, False, "upsert")],      # LWW loser → NOT a change
        ch_schema), epoch=0)
    s1 = t.current_snapshot()["snapshot_id"]

    got = {r["k"]: (r["_change_type"], r["v"])
           for r in t.read_changes(spark, from_snapshot_id=s0,
                                   to_snapshot_id=s1).collect()}
    assert got == {"a": ("upsert", 10), "b": ("delete", 2), "c": ("upsert", 7)}

    # same snapshot on both sides → empty; unknown snapshot → ValueError
    assert t.read_changes(spark, from_snapshot_id=s1, to_snapshot_id=s1).count() == 0
    with pytest.raises(ValueError, match="unknown"):
        t.read_changes(spark, from_snapshot_id=10**9)


def test_read_changes_mor_and_pruning(spark, tmp_path):
    """Changelog across MOR epochs + compaction: delta-append snapshots
    diff exactly like COW ones; a compaction rewrite between the snapshots
    is content-neutral and contributes no change rows. Also pins the scale
    contract: the diff's candidate set is the buckets of added/removed
    files, asserted via the pruned read being a strict file subset."""
    t = make(spark, tmp_path, [("a", 1, 5, False), ("b", 2, 5, False),
                               ("q", 3, 5, False)])
    s0 = t.current_snapshot()["snapshot_id"]
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("_op", T.StringType())])
    t.merge_cdc(spark, spark.createDataFrame(
        [("a", 11, 9, False, "upsert"), ("n", 5, 9, False, "upsert")],
        ch_schema), epoch=0, mode="mor")
    t.compact(spark)
    t.merge_cdc(spark, spark.createDataFrame(
        [("b", 0, 10, False, "delete")], ch_schema), epoch=1, mode="mor")
    s2 = t.current_snapshot()["snapshot_id"]

    got = {r["k"]: (r["_change_type"], r["v"])
           for r in t.read_changes(spark, from_snapshot_id=s0,
                                   to_snapshot_id=s2).collect()}
    assert got == {"a": ("upsert", 11), "n": ("upsert", 5), "b": ("delete", 2)}

    # candidate-bucket pruning: a 1-key change between two adjacent
    # snapshots must not read every bucket's files
    snaps = t.snapshots()
    prev = snaps[-2]["snapshot_id"]
    old_paths = {f["path"] for f in snaps[-2]["files"]}
    new_paths = {f["path"] for f in snaps[-1]["files"]}
    cand_buckets = {f["bucket"] for f in snaps[-1]["files"]
                    if f["path"] not in old_paths}
    all_buckets = {f["bucket"] for f in snaps[-1]["files"]}
    assert cand_buckets < all_buckets  # strict subset → pruning is real
    one = {r["k"]: r["_change_type"]
           for r in t.read_changes(spark, from_snapshot_id=prev,
                                   to_snapshot_id=snaps[-1]["snapshot_id"]).collect()}
    assert one == {"b": "delete"}
