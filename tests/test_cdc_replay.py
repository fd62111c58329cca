"""End-to-end CDC replay vs the pure-Python oracle (FIXTURES.md §A).

Asserts set-equality of (repo, path, sha256(content)) plus final schema —
the BASELINE.json per-row invariant — for batch replay, chunked epoch
replay (exactly-once fencing), and Structured Streaming replay with
checkpoint resume.
"""

import os

import pytest
from pyspark.sql import functions as F

from datavec_spark.streaming.datagen import (
    EVENT_SCHEMA,
    generate_base_rows,
    generate_events,
    events_to_table,
    write_event_chunks,
)
from datavec_spark.streaming.oracle import replay as oracle_replay, expected_key_hashes
from datavec_spark.streaming.replay import EVENT_SPARK_SCHEMA, CdcEngine, content_expr

N_EVENTS = 2500


@pytest.fixture(scope="module")
def fixture():
    base = generate_base_rows(150, n_repos=30, paths_per_repo=25)
    events = generate_events(N_EVENTS, n_repos=30, paths_per_repo=25)
    state, schema = oracle_replay(base, events)
    return base, events, state, schema


def base_df(spark, base):
    return spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in base],
        "repo string, path string, commit string, lang string, content string",
    )


def events_df(spark, events):
    import pandas as pd

    pdf = events_to_table(events).to_pandas()
    return spark.createDataFrame(pdf, EVENT_SPARK_SCHEMA)


def assert_final_state(spark, engine, state, schema):
    got = {
        (r["repo"], r["path"], r["content_sha"])
        for r in engine.final_state_hashes(spark).collect()
    }
    assert got == expected_key_hashes(state)
    # final schema (user view) matches the oracle's evolved schema
    user = engine.read_current(spark)
    got_schema = [(f.name, f.dataType.simpleString()) for f in user.schema.fields]
    want = [(n, {"string": "string", "int": "int", "long": "bigint"}[t]) for n, t in schema]
    assert got_schema == want


def test_batch_replay_matches_oracle(spark, tmp_path, fixture):
    base, events, state, schema = fixture
    eng = CdcEngine(str(tmp_path / "repos"), num_buckets=8)
    eng.bootstrap(spark, base_df(spark, base))
    res = eng.replay_batch(spark, events_df(spark, events))
    assert res["applied"]
    assert_final_state(spark, eng, state, schema)


def test_chunked_epochs_and_fence(spark, tmp_path, fixture):
    base, events, state, schema = fixture
    eng = CdcEngine(str(tmp_path / "repos"), num_buckets=8)
    eng.bootstrap(spark, base_df(spark, base))
    n_chunks = 5
    n = len(events)
    for c in range(n_chunks):
        chunk = events[c * n // n_chunks : (c + 1) * n // n_chunks]
        eng.apply_batch(spark, events_df(spark, chunk), epoch=c)
    # retried epoch (foreachBatch redelivery) must be a no-op
    res = eng.apply_batch(spark, events_df(spark, events[3 * n // 5 : 4 * n // 5]), epoch=3)
    assert not res["applied"] and res["reason"] == "epoch-fenced"
    assert_final_state(spark, eng, state, schema)
    # lineage: one row set per epoch, counts sum to total events applied
    lin = eng.lineage_table().read(spark)
    per_epoch = {r["epoch"]: r["total"] for r in
                 lin.groupBy("epoch").agg(F.sum("event_count").alias("total")).collect()}
    assert set(per_epoch) == set(range(n_chunks))
    n_data_events = sum(1 for e in events if e["op"] not in
                        ("add_column", "rename_column", "widen_column"))
    assert sum(per_epoch.values()) == n_data_events  # incl. duplicate deliveries
    assert lin.where(F.col("snapshot_id").isNull()).count() == 0


def test_streaming_replay_with_resume(spark, tmp_path, fixture):
    base, events, state, schema = fixture
    events_dir = str(tmp_path / "events")
    write_event_chunks(events, events_dir, n_chunks=6)
    eng = CdcEngine(str(tmp_path / "repos"), num_buckets=8)
    eng.bootstrap(spark, base_df(spark, base))
    ckpt = str(tmp_path / "ckpt")

    # first run: only half the files exist → stream drains, then "crashes"
    q = eng.run_stream(spark, events_dir, ckpt, max_files_per_trigger=2)
    q.awaitTermination()
    # more of the binlog arrives; resume from checkpoint
    q2 = eng.run_stream(spark, events_dir, ckpt, max_files_per_trigger=2)
    q2.awaitTermination()
    # re-run once more: everything already processed → no state change
    snap_before = eng.table().current_snapshot()["snapshot_id"]
    q3 = eng.run_stream(spark, events_dir, ckpt)
    q3.awaitTermination()
    assert_final_state(spark, eng, state, schema)
    lin = eng.lineage_table().read(spark)
    assert lin.count() > 0


def test_content_expr_matches_python(spark):
    from datavec_spark.streaming.datagen import content_for

    df = spark.createDataFrame(
        [("org1/p1", "src/a.py", 7), ("org2/p9", "src/b.rs", 123456)],
        "repo string, path string, seq long",
    )
    got = df.select(content_expr(F.col("repo"), F.col("path"), F.col("seq")).alias("c")).collect()
    want = [content_for("org1/p1", "src/a.py", 7), content_for("org2/p9", "src/b.rs", 123456)]
    assert [r["c"] for r in got] == want


def test_streaming_dedup_state_bounded(spark, tmp_path):
    """dropDuplicatesWithinWatermark evicts dedup state as the watermark
    advances: over 3+ triggers the state-store row count must stay far
    below the total number of distinct seqs processed (plain
    dropDuplicates would retain every seq ever seen — the round-1
    100x-scale killer). The watermark delay must cover the stream's
    lateness bound (here ±1 s jitter, no stragglers) while being far
    smaller than the stream's event-time span (~2 min), so eviction is
    observable WITHOUT dropping any real data."""
    base = generate_base_rows(150, n_repos=30, paths_per_repo=25)
    events = generate_events(N_EVENTS, n_repos=30, paths_per_repo=25,
                             delay_us=2_000_000, straggler_frac=0.0)
    state, schema = oracle_replay(base, events)
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    write_event_chunks(events, events_dir, n_chunks=8)

    eng = CdcEngine(str(tmp_path / "repos"), num_buckets=4)
    eng.bootstrap(spark, base_df(spark, base))
    q = eng.run_stream(spark, events_dir, ckpt, watermark_delay="10 seconds",
                       max_files_per_trigger=1)
    q.awaitTermination()
    # late-drop accounting is surfaced, and with delay >= the stream's
    # lateness bound nothing real was dropped while state WAS evicted
    metrics = CdcEngine.stream_drop_metrics(q)
    assert metrics["rows_dropped_late"] == 0, metrics
    assert metrics["state_rows_evicted"] > 0, metrics
    progress = q.recentProgress
    state_rows = [
        op["numRowsTotal"]
        for p in progress for op in p["stateOperators"] if op.get("numRowsTotal") is not None
    ]
    assert len(progress) >= 3
    # the final trigger's state must hold far fewer rows than the distinct
    # seqs seen (eviction happened); a leak would approach N_EVENTS
    assert state_rows, "no stateOperators metrics reported"
    assert state_rows[-1] < N_EVENTS / 2, state_rows
    # and the replay is still correct end-to-end despite evictions
    assert_final_state(spark, eng, state, schema)


def test_run_stream_df_rate_shaped_source(spark, tmp_path):
    """Source-agnostic streaming entry: a rate-source stream mapped into
    the event schema (the Kafka-shaped path — any stream of change events
    works, not just the file tail). Events synthesized JVM-side with
    content_expr; final state must equal the same events replayed in
    batch."""
    from datavec_spark.streaming.replay import content_expr

    def event_cols(df):
        seq = (F.col("value") + 1).alias("seq")
        repo = F.concat(F.lit("org0/project"), (F.col("value") % 5).cast("string"))
        path = F.concat(F.lit("src/f_"), (F.col("value") % 7).cast("string"), F.lit(".py"))
        return df.select(
            seq,
            F.col("timestamp").alias("ts"),
            F.lit("insert").alias("op"),
            repo.alias("repo"), path.alias("path"),
            F.substring(F.sha2(F.concat_ws("|", repo, path), 256), 1, 40).alias("commit"),
            F.lit("python").alias("lang"),
            content_expr(repo, path, F.col("value") + 1).alias("content"),
            F.lit(None).cast(
                "struct<col_name:string,new_name:string,new_type:string>"
            ).alias("schema_change"),
        )

    # streaming run from the rate source
    eng = CdcEngine(str(tmp_path / "repos_stream"), num_buckets=4)
    eng.bootstrap(spark)
    rate = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
    q = eng.run_stream_df(spark, event_cols(rate), str(tmp_path / "ckpt"),
                          available_now=False)
    try:
        import time as _t
        deadline = _t.time() + 60
        while _t.time() < deadline:
            if int(eng.table().properties().get("cdc.last-epoch", "-1")) >= 1:
                break
            _t.sleep(1)
    finally:
        q.stop()
    got = {(r["repo"], r["path"], r["content_sha"])
           for r in eng.final_state_hashes(spark).collect()}
    assert len(got) > 0

    # batch replay of the SAME seq range must produce a superset-consistent
    # state: every streamed key's final content matches the batch replay
    max_seq = int(eng.table().read(spark).agg(F.max("_seq")).collect()[0][0])
    batch_events = event_cols(
        spark.range(0, max_seq).select(
            F.col("id").alias("value"),
            F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("id")).alias("timestamp"),
        )
    )
    eng2 = CdcEngine(str(tmp_path / "repos_batch"), num_buckets=4)
    eng2.bootstrap(spark)
    eng2.replay_batch(spark, batch_events)
    want = {(r["repo"], r["path"], r["content_sha"])
            for r in eng2.final_state_hashes(spark).collect()}
    assert got == want


def test_streaming_schema_evolution_across_restart(spark, tmp_path, fixture):
    """Round-3 verdict item #8: the schema-evolution chain must survive a
    checkpoint restart placed BETWEEN evolution events. Run 1 sees the
    binlog only through add_column + the stars→stargazers rename (chunks
    0-2 of 6); the engine is then stopped, the rest of the log (widen to
    long + lang→language rename) arrives, and a fresh run_stream resumes
    from the same checkpoint. Final schema AND per-row content sha256 must
    match the pure-Python oracle."""
    import shutil

    base, events, state, schema = fixture
    staging = str(tmp_path / "staging")
    files = write_event_chunks(events, staging, n_chunks=6)
    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)

    def arrive(fs, t0):
        # shutil.copy stamps NOW as mtime — near-identical for files copied
        # in a tight loop, and the file source orders triggers by mtime, so
        # chunk order (add before rename before widen) could flip; restamp
        # with strictly increasing mtimes in chunk order
        for i, f in enumerate(fs):
            dst = shutil.copy(f, events_dir)
            os.utime(dst, (t0 + i, t0 + i))

    arrive(files[:3], 1_600_000_000)

    eng = CdcEngine(str(tmp_path / "repos"), num_buckets=8)
    eng.bootstrap(spark, base_df(spark, base))
    ckpt = str(tmp_path / "ckpt")
    q = eng.run_stream(spark, events_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination()

    # mid-log checkpointed state: add + rename applied, widen NOT yet
    mid = {f.name: f.dataType.simpleString()
           for f in eng.read_current(spark).schema.fields}
    assert "stargazers" in mid and mid["stargazers"] == "int"
    assert "stars" not in mid and "lang" in mid

    # the rest of the binlog arrives; resume from the same checkpoint
    arrive(files[3:], 1_600_000_100)
    q2 = eng.run_stream(spark, events_dir, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    assert_final_state(spark, eng, state, schema)


def test_fused_stats_bucket_hash_matches_merge_bucket_expr(spark, tmp_path, fixture):
    """apply_batch's fused stats pass hashes RAW event key fields and hands
    the resulting bucket set to merge_cdc as the pruning set — that is only
    sound if the hash is value- and type-identical to icelite._bucket_expr
    over the bound (current-schema) columns. Pin the parity, including
    after a key-column RENAME (values unchanged -> hash unchanged)."""
    import pandas as pd  # noqa: F401

    base, events, _state, _schema = fixture
    eng = CdcEngine(str(tmp_path / "parity"), num_buckets=16)
    table = eng.bootstrap(spark, base_df(spark, base))
    meta = table.metadata()
    ev = events_df(spark, events)
    data = ev.where(F.col("op").isin("insert", "update", "delete"))
    raw_hash = F.pmod(F.xxhash64(F.col("repo").cast("string"),
                                 F.col("path").cast("string")), F.lit(16)).cast("int")
    raw_buckets = {r[0] for r in data.select(raw_hash).distinct().collect()}
    bound = data.select(F.col("repo"), F.col("path"))
    merge_buckets = {r[0] for r in bound.select(table._bucket_expr(meta)).distinct().collect()}
    assert raw_buckets == merge_buckets
    # rename a key column: current-schema name changes, values don't
    table.rename_column("repo", "repository")
    meta2 = table.metadata()
    bound2 = data.select(F.col("repo").alias("repository"), F.col("path"))
    merge_buckets2 = {r[0] for r in bound2.select(table._bucket_expr(meta2)).distinct().collect()}
    assert raw_buckets == merge_buckets2


def test_stateless_stream_exactly_once_with_resume(spark, tmp_path, fixture):
    """dedup=False: NO stateful operator in the stream — exactly-once must
    hold from the epoch fence + seq-idempotent merge alone (the verdict's
    'measure whether the fence alone holds' experiment). The fixture has
    ~2% duplicate re-deliveries, stragglers 50 min late, and delete/
    reinsert chains; at a 120-minute SLA nothing is droppable, so the
    final state must equal the full LWW oracle exactly — across a crash/
    resume (checkpoint redelivery) and a third no-op run."""
    base, events, state, schema = fixture
    events_dir = str(tmp_path / "events")
    write_event_chunks(events, events_dir, n_chunks=6)
    eng = CdcEngine(str(tmp_path / "repos"), num_buckets=8)
    eng.bootstrap(spark, base_df(spark, base))
    ckpt = str(tmp_path / "ckpt")

    q = eng.run_stream(spark, events_dir, ckpt, max_files_per_trigger=2,
                       dedup=False)
    q.awaitTermination()
    q2 = eng.run_stream(spark, events_dir, ckpt, max_files_per_trigger=2,
                        dedup=False)
    q2.awaitTermination()
    snap_before = eng.table().current_snapshot()["snapshot_id"]
    q3 = eng.run_stream(spark, events_dir, ckpt, dedup=False)
    q3.awaitTermination()
    assert eng.table().current_snapshot()["snapshot_id"] == snap_before
    assert_final_state(spark, eng, state, schema)
    # nothing was droppable at this SLA — exact accounting agrees
    assert eng.lineage_drop_totals(spark)["rows_dropped_late"] == 0


def test_stateless_stream_drops_far_late_dups_into_lineage(spark, tmp_path):
    """dedup=False with a tight SLA: far-late duplicate re-deliveries are
    dropped by the APPLY stage and the exact count lands in lineage's
    dropped_late column (per epoch/bucket — the stateful path can only
    report query-scoped totals). The drops are lossless: every dropped row
    is a re-delivery whose original already committed, so the final state
    still equals the full LWW oracle."""
    base = generate_base_rows(150, n_repos=30, paths_per_repo=25)
    events = generate_events(N_EVENTS, n_repos=30, paths_per_repo=25,
                             delay_us=2_000_000, straggler_frac=0.0,
                             dup_frac=0.0)
    # re-deliver the first 50 data events at the very END of the stream:
    # their event time is ~2 min older than the stream max — far beyond
    # the 10 s SLA — so all 50 must be dropped (and only them: jitter is
    # ±1 s and chunk-boundary skew ~2 s, both inside 10 s)
    redelivered = [e for e in events[:60]
                   if e["op"] in ("insert", "update", "delete")][:50]
    emission = events + redelivered
    state, schema = oracle_replay(base, events)

    events_dir = str(tmp_path / "events")
    write_event_chunks(emission, events_dir, n_chunks=6)
    eng = CdcEngine(str(tmp_path / "repos"), num_buckets=4)
    eng.bootstrap(spark, base_df(spark, base))
    q = eng.run_stream(spark, events_dir, str(tmp_path / "ckpt"),
                       watermark_delay="10 seconds", max_files_per_trigger=1,
                       dedup=False)
    q.awaitTermination()

    drops = eng.lineage_drop_totals(spark)
    assert drops["rows_dropped_late"] == len(redelivered), drops
    lin = eng.read_lineage(spark)
    # dropped_late == late_count on every lineage row (the stateless path
    # drops exactly what it counts late), concentrated in the last epoch
    bad = lin.where(F.col("dropped_late") != F.col("late_count")).count()
    assert bad == 0
    assert_final_state(spark, eng, state, schema)


def test_sub_splits_replay_matches_oracle_and_prunes_files(spark, tmp_path, fixture):
    """End-to-end CDC replay on a sub_splits=4 table: (a) the final state
    still equals the LWW oracle (file-level COW changes WHICH files are
    rewritten, never the result), (b) the fused stats pass's raw-field slot
    hash is value-identical to icelite._slot_expr over bound columns (the
    parity that makes zero-extra-job file pruning sound), and (c) a
    single-key delta epoch rewrites a strict subset of its bucket's files."""
    base, events, state, schema = fixture
    eng = CdcEngine(str(tmp_path / "split_repos"), num_buckets=4, sub_splits=4)
    table = eng.bootstrap(spark, base_df(spark, base))
    meta = table.metadata()

    # (b) slot-hash parity, raw event fields vs bound columns
    data = events_df(spark, events).where(F.col("op").isin("insert", "update", "delete"))
    raw_slot = F.pmod(F.xxhash64(F.lit(1), F.col("repo").cast("string"),
                                 F.col("path").cast("string")), F.lit(4)).cast("int")
    raw = {(r[0], r[1]) for r in data.select(
        F.pmod(F.xxhash64("repo", "path"), F.lit(4)).cast("int"), raw_slot).distinct().collect()}
    bound = {(r[0], r[1]) for r in data.select(
        table._bucket_expr(meta), table._slot_expr(meta)).distinct().collect()}
    assert raw == bound

    # (a) chunked replay -> oracle equality
    n = len(events)
    for c in range(4):
        eng.apply_batch(spark, events_df(spark, events[c * n // 4:(c + 1) * n // 4]), epoch=c)
    assert_final_state(spark, eng, state, schema)

    # (c) small-delta epoch: strict-subset rewrite, carried files identical
    files_before = {f["path"] for f in eng.table().current_snapshot()["files"]}
    one = [e for e in events if e["op"] == "update"][0]
    delta = dict(one)
    delta["seq"] = n + 100
    delta["content"] = "new content after the replay"
    eng.apply_batch(spark, events_df(spark, [delta]), epoch=4)
    snap = eng.table().current_snapshot()
    files_after = {f["path"] for f in snap["files"]}
    assert snap["summary"]["rewritten-files"] == 1
    assert files_before - files_after == set() or len(files_before - files_after) == 1
    # every file except (at most) the one touched slot file carried forward
    assert len(files_before & files_after) >= len(files_before) - 1
    got = {(r["repo"], r["path"]): r for r in eng.read_current(spark).collect()}
    assert got[(delta["repo"], delta["path"])]["content"] == "new content after the replay"


def test_mor_engine_replay_matches_oracle(spark, tmp_path, fixture):
    """CdcEngine(merge_mode='mor'): the full chunked replay — schema
    evolution, tombstones, duplicates, late events — must converge to the
    same final state as the COW engine and the pure-Python oracle, while
    every epoch only APPENDS delta files (write cost ∝ changes: the
    10^10-event hot-table shape). compact() then folds the deltas with the
    state unchanged."""
    base, events, state, schema = fixture
    eng = CdcEngine(str(tmp_path / "mor_repos"), num_buckets=8, merge_mode="mor")
    eng.bootstrap(spark, base_df(spark, base))
    base_files = {f["path"] for f in eng.table().current_snapshot()["files"]}
    n = len(events)
    for c in range(4):
        eng.apply_batch(spark, events_df(spark, events[c * n // 4:(c + 1) * n // 4]), epoch=c)
    snap = eng.table().current_snapshot()
    # every original base file still present: nothing was ever rewritten
    assert base_files <= {f["path"] for f in snap["files"]}
    n_delta = sum(1 for f in snap["files"] if f.get("delta"))
    assert n_delta >= 4 * 8  # >= one delta file per touched bucket per epoch
    assert_final_state(spark, eng, state, schema)

    eng.table().compact(spark)
    assert not any(f.get("delta") for f in eng.table().current_snapshot()["files"])
    assert_final_state(spark, eng, state, schema)


def test_mor_auto_compaction_cadence(spark, tmp_path, fixture):
    """compact_every=2 on a mor engine: deltas fold every second epoch, so
    the snapshot never accumulates more than ~2 epochs of delta files and
    the final state still matches the oracle."""
    base, events, state, schema = fixture
    eng = CdcEngine(str(tmp_path / "morc"), num_buckets=8,
                    merge_mode="mor", compact_every=2)
    eng.bootstrap(spark, base_df(spark, base))
    n = len(events)
    for c in range(4):
        eng.apply_batch(spark, events_df(spark, events[c * n // 4:(c + 1) * n // 4]), epoch=c)
    snap = eng.table().current_snapshot()
    # epoch 3 compacted (epochs 0-1 folded at epoch 1, 2-3 at epoch 3)
    assert snap["summary"]["operation"] == "compact"
    assert not any(f.get("delta") for f in snap["files"])
    assert_final_state(spark, eng, state, schema)
