"""Jar-free Iceberg v2 layer (vector_spark/iceberg.py + functions/avro_ocf.py).

Covers: generic Avro/OCF roundtrips (nested records, unions, maps,
deflate), the snapshot commit protocol (append, time travel, conflict),
scan planning (partition pruning + column-stat pruning, counted via
plan_files), and full read-back equality against the parquet Spark wrote.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_spark.functions.avro_ocf import decode, encode, read_ocf, write_ocf
from vector_spark.iceberg import IcebergTable, deser_bound, ser_bound

NESTED = {
    "type": "record",
    "name": "outer",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "tag", "type": ["null", "string"], "default": None},
        {
            "name": "inner",
            "type": {
                "type": "record",
                "name": "pt",
                "fields": [
                    {"name": "x", "type": "double"},
                    {"name": "ys", "type": {"type": "array", "items": "int"}},
                ],
            },
        },
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "raw", "type": "bytes"},
        # second use of a named type must be a by-name reference
        {"name": "inner2", "type": ["null", "pt"], "default": None},
    ],
}

ROWS = [
    {
        "id": 1,
        "tag": "a",
        "inner": {"x": 1.5, "ys": [1, 2, 3]},
        "props": {"k": 9},
        "raw": b"\x00\xff",
        "inner2": {"x": -2.0, "ys": []},
    },
    {"id": 2, "tag": None, "inner": {"x": 0.0, "ys": []}, "props": {}, "raw": b"", "inner2": None},
]


def test_avro_datum_roundtrip_nested():
    for row in ROWS:
        buf = encode(row, NESTED, named={})
        out, pos = decode(buf, 0, NESTED, named={})
        assert pos == len(buf)
        assert out == row


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(tmp_path, codec):
    path = str(tmp_path / f"t_{codec}.avro")
    n = write_ocf(path, NESTED, ROWS, metadata={"who": "test"}, codec=codec)
    assert n == os.path.getsize(path)
    schema, meta, records = read_ocf(path)
    assert schema["name"] == "outer"
    assert meta["who"] == b"test"
    assert records == ROWS


def test_single_value_serialization_roundtrip():
    for t, v in [("int", -7), ("long", 1 << 40), ("double", 3.25), ("string", "zed"),
                 ("timestamptz", 1_700_000_000_000_000)]:
        assert deser_bound(ser_bound(v, t), t) == v


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """events-like table partitioned by source, two appends."""
    loc = str(tmp_path_factory.mktemp("ice") / "tbl")
    df = spark.range(1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.sequence(F.lit(1), (F.col("id") % 5 + 1).cast("int")).alias("tokens"),
        (F.col("id") % 5 + 1).cast("int").alias("n_tok"),
        F.element_at(F.array(F.lit("app"), F.lit("db"), F.lit("web")), (F.col("id") % 3 + 1).cast("int")).alias("source"),
        F.col("id").cast("long").alias("seq"),
    )
    t = IcebergTable.create(loc, df.schema, partition_by=["source"], commit_ts_ms=1)
    t.append_df(df.filter("seq < 600"), subdir="a1", commit_ts_ms=2)
    t.append_df(df.filter("seq >= 600"), subdir="a2", commit_ts_ms=3)
    return t, df


def test_append_snapshots_and_total_rows(table):
    t, _ = table
    snaps = t.snapshots()
    assert [s["snapshot-id"] for s in snaps] == [1, 2]
    assert t.meta["current-snapshot-id"] == 2
    assert t.total_rows() == 1000
    assert t.total_rows(snapshot_id=1) == 600


def test_scan_full_equality(table, spark):
    t, df = table
    got = t.scan(spark).select("doc_id", "n_tok", "source", "seq", F.col("tokens").cast("string").alias("tk"))
    want = df.select("doc_id", "n_tok", "source", "seq", F.col("tokens").cast("string").alias("tk"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_partition_pruning(table, spark):
    t, df = table
    all_files = t.plan_files()
    app_files = t.plan_files([("source", "=", "app")])
    assert 0 < len(app_files) < len(all_files)
    assert all(f["partition"]["source"] == "app" for f in app_files)
    got = t.scan(spark, [("source", "=", "app")]).count()
    assert got == df.filter("source = 'app'").count()


def test_stats_pruning_on_seq(table, spark):
    t, df = table
    # the two appends split at seq 600 → a seq<100 filter must drop a2 files
    lo_files = t.plan_files([("seq", "<", 100)])
    assert all("/a1/" in f["file_path"] for f in lo_files)
    assert t.scan(spark, [("seq", "<", 100)]).count() == df.filter("seq < 100").count()


def test_time_travel(table, spark):
    t, df = table
    assert t.scan(spark, snapshot_id=1).count() == 600
    # reload from disk: hint file points at latest committed version
    t2 = IcebergTable(t.location)
    assert t2.meta["current-snapshot-id"] == 2
    assert t2.scan(spark, snapshot_id=1).count() == 600


def test_commit_conflict_detected(table, spark):
    t, _ = table
    stale = IcebergTable(t.location)
    stale.meta["_version"] -= 1  # simulate a concurrent committer's stale view
    with pytest.raises(FileExistsError):
        stale._write_metadata(stale.meta["_version"] + 1)


def test_unpartitioned_table_stats_prune(spark, tmp_path):
    loc = str(tmp_path / "u")
    df = spark.range(500).select(F.col("id").alias("n"), F.lit("x").alias("s"))
    t = IcebergTable.create(loc, df.schema, commit_ts_ms=1)
    t.append_df(df.repartitionByRange(4, "n"), subdir="a", commit_ts_ms=2)
    few = t.plan_files([("n", ">=", 450)])
    assert 0 < len(few) < len(t.plan_files())
    assert t.scan(spark, [("n", ">=", 450)]).count() == 50


def test_pipeline_iceberg_source_and_sinks(spark, tmp_path):
    """Batch-over-Iceberg end-to-end: corpus read from the Iceberg table,
    route fan-out registered as per-route Iceberg sink tables (add_files —
    no rewrite), re-run resume-idempotent (same snapshots, same counts)."""
    from vector_spark.iceberg import IcebergTable
    from vector_spark.pipeline import run_pipeline

    out = str(tmp_path / "ice_out")
    r1 = run_pipeline(spark, 0.001, out_dir=out, run_id="I",
                      source_format="iceberg", sink_format="iceberg")
    assert r1["routed_rows"] > 0
    assert set(r1["iceberg_sinks"]) >= {"errors", "warnings", "_unmatched"}
    assert sum(r1["iceberg_sinks"].values()) == r1["routed_rows"]
    # each sink table's manifest row count == rows actually in the table
    for route, n in r1["iceberg_sinks"].items():
        t = IcebergTable(os.path.join(out, "iceberg_sinks", route))
        assert t.total_rows() == n
        assert t.scan(spark).count() == n
        assert len(t.snapshots()) == 1
    r2 = run_pipeline(spark, 0.001, out_dir=out, run_id="I",
                      source_format="iceberg", sink_format="iceberg")
    assert r2["skipped_sinks"]  # resumed
    assert r2["iceberg_sinks"] == r1["iceberg_sinks"]
    for route in r1["iceberg_sinks"]:
        t = IcebergTable(os.path.join(out, "iceberg_sinks", route))
        assert len(t.snapshots()) == 1  # no duplicate append on resume


def test_schema_evolution_add_column(spark, tmp_path):
    """Spec "Schema Evolution": new optional column under a fresh field-id;
    pre-existing files scan as NULL, post-evolution appends carry values."""
    loc = str(tmp_path / "evo")
    df1 = spark.range(10).select(F.col("id").alias("n"))
    t = IcebergTable.create(loc, df1.schema, commit_ts_ms=1)
    t.append_df(df1, subdir="a", commit_ts_ms=2)
    t.add_column("label", "string", commit_ts_ms=3)
    assert t.meta["last-column-id"] == 2
    df2 = spark.range(10, 20).select(
        F.col("id").alias("n"), F.concat(F.lit("L"), F.col("id")).alias("label")
    )
    t.append_df(df2, subdir="b", commit_ts_ms=4)
    got = {(r["n"], r["label"]) for r in t.scan(spark).collect()}
    assert got == {(i, None) for i in range(10)} | {(i, f"L{i}") for i in range(10, 20)}
    # reload from disk sees the evolved schema; ids never reused
    t2 = IcebergTable(loc)
    assert [f["id"] for f in t2.schema["fields"]] == [1, 2]
    with pytest.raises(ValueError):
        t2.add_column("label", "string")


def test_stream_iceberg_sink_exactly_once(spark, tmp_path):
    """Streaming append into the Iceberg table: multi-batch run commits one
    snapshot per micro-batch (batch id stamped in the summary), and a
    checkpoint replay of the same source is a no-op — no duplicate rows."""
    from vector_spark.streaming import stream_from_directory, stream_iceberg_sink

    src = tmp_path / "stream_in"
    df = spark.range(200).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.sequence(F.lit(1), (F.col("id") % 4 + 1).cast("int")).alias("tokens"),
        (F.col("id") % 4 + 1).cast("int").alias("n_tok"),
        F.element_at(
            F.array(F.lit("app"), F.lit("db")), (F.col("id") % 2 + 1).cast("int")
        ).alias("source"),
    )
    # several input files so maxFilesPerTrigger yields >1 micro-batch
    df.repartition(4).write.parquet(str(src))

    loc = str(tmp_path / "ice_sink")
    t = IcebergTable.create(loc, df.schema, partition_by=["source"], commit_ts_ms=1)

    def run(checkpoint):
        stream = stream_from_directory(
            spark,
            str(src),
            "doc_id string, tokens array<int>, n_tok int, source string",
            maxFilesPerTrigger=2,
        )
        q = (
            stream_iceberg_sink(stream, t, checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    ckpt = str(tmp_path / "ckpt")
    run(ckpt)
    n_snaps = len(t.snapshots())
    assert n_snaps >= 2  # multi-batch
    batch_ids = [
        s["summary"].get("streaming-batch-id") for s in t.snapshots()
    ]
    assert all(b is not None for b in batch_ids)
    assert len(set(batch_ids)) == len(batch_ids)
    assert t.total_rows() == 200
    # read-back equality through scan planning
    got = t.scan(spark).select("doc_id", "n_tok").orderBy("doc_id")
    exp = df.select("doc_id", "n_tok").orderBy("doc_id")
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in exp.collect()]

    # same checkpoint -> availableNow reprocesses nothing; FRESH checkpoint
    # replays every batch -> the summary dedup must skip all of them
    run(ckpt)
    assert t.total_rows() == 200
    reloaded = IcebergTable(loc)  # durable-metadata view, as after a restart
    assert len(reloaded.snapshots()) == n_snaps

    run(str(tmp_path / "ckpt2"))
    assert t.total_rows() == 200
    assert len(t.snapshots()) == n_snaps


@pytest.fixture()
def fresh_table(spark, tmp_path):
    """Function-scoped copy of the 1000-row table (delete/compact mutate)."""
    loc = str(tmp_path / "mor")
    df = spark.range(1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.sequence(F.lit(1), (F.col("id") % 5 + 1).cast("int")).alias("tokens"),
        (F.col("id") % 5 + 1).cast("int").alias("n_tok"),
        F.element_at(F.array(F.lit("app"), F.lit("db"), F.lit("web")), (F.col("id") % 3 + 1).cast("int")).alias("source"),
        F.col("id").cast("long").alias("seq"),
    )
    t = IcebergTable.create(loc, df.schema, partition_by=["source"], commit_ts_ms=1)
    t.append_df(df.filter("seq < 600"), subdir="a1", commit_ts_ms=2)
    t.append_df(df.filter("seq >= 600"), subdir="a2", commit_ts_ms=3)
    return t, df


def test_positional_delete_merge_on_read(fresh_table, spark):
    """delete_where commits a content=1 manifest of (file_path, pos) rows;
    the scan anti-joins them out without touching a data file; time travel
    to the pre-delete snapshot still sees every row (spec "Position Delete
    Files" + "Row-level deletes")."""
    t, df = fresh_table
    n_data_before = len(t.plan_files())
    snap = t.delete_where(spark, [("seq", ">=", 900)], commit_ts_ms=4)
    assert snap["summary"]["operation"] == "delete"
    assert snap["summary"]["added-position-deletes"] == "100"
    assert len(t.plan_files()) == n_data_before          # zero data files rewritten
    assert len(t.plan_delete_files()) >= 1
    got = t.scan(spark)
    assert got.count() == 900
    assert got.agg(F.max("seq")).first()[0] == 899
    # rows that survive are bit-identical to the source
    want = df.filter("seq < 900").select("doc_id", F.col("tokens").cast("string").alias("tk"))
    have = got.select("doc_id", F.col("tokens").cast("string").alias("tk"))
    assert have.exceptAll(want).count() == 0 and want.exceptAll(have).count() == 0
    # snapshot isolation: the pre-delete snapshots are untouched
    assert t.scan(spark, snapshot_id=1).count() == 600
    assert t.scan(spark, snapshot_id=2).count() == 1000
    # the delete snapshot itself reads 900 via its delete manifest
    assert t.scan(spark, snapshot_id=snap["snapshot-id"]).count() == 900


def test_delete_compounds_and_is_idempotent(fresh_table, spark):
    t, _ = fresh_table
    t.delete_where(spark, [("seq", ">=", 900)], commit_ts_ms=4)
    # re-deleting already-deleted rows matches nothing -> no empty snapshot
    assert t.delete_where(spark, [("seq", ">=", 900)], commit_ts_ms=5) is None
    snap2 = t.delete_where(spark, [("source", "=", "app"), ("seq", "<", 30)], commit_ts_ms=6)
    assert snap2["summary"]["added-position-deletes"] == "10"
    assert t.scan(spark).count() == 890
    # deletes are path-scoped: rows appended AFTER the delete, even in the
    # deleted key range, are untouched
    extra = t.scan(spark, snapshot_id=2, apply_deletes=False).filter("seq >= 990") \
        .withColumn("doc_id", F.concat(F.lit("new_"), F.col("doc_id")))
    t.append_df(extra, subdir="a3", commit_ts_ms=7)
    assert t.scan(spark).filter("seq >= 990").count() == 10


def test_rewrite_data_files_compaction(fresh_table, spark):
    """Compaction: live row set identical, delete files gone, old snapshot
    still reconstructs the pre-compaction view via its own manifests."""
    t, _ = fresh_table
    t.delete_where(spark, [("seq", ">=", 900)], commit_ts_ms=4)
    before = sorted(r[0] for r in t.scan(spark).select("doc_id").collect())
    snap = t.rewrite_data_files(spark, commit_ts_ms=5)
    assert snap["summary"]["operation"] == "replace"
    assert len(t.plan_delete_files()) == 0
    after = sorted(r[0] for r in t.scan(spark).select("doc_id").collect())
    assert before == after
    # pre-compaction snapshot: still 900 live rows through its delete files
    pre = snap["parent-snapshot-id"]
    assert t.scan(spark, snapshot_id=pre).count() == 900
    assert t.total_rows() == 900  # metadata row count now matches live


def test_expire_snapshots(fresh_table, spark):
    t, _ = fresh_table
    t.delete_where(spark, [("seq", ">=", 900)], commit_ts_ms=4)
    t.rewrite_data_files(spark, commit_ts_ms=5)
    old_lists = [s["manifest-list"] for s in t.snapshots()[:-1]]
    stats = t.expire_snapshots(keep_last=1)
    assert stats["expired"] == 3
    assert all(not os.path.exists(p) for p in old_lists)
    # replaced data files + delete files are orphans and were removed
    assert stats["files_deleted"] > 0
    # current snapshot unaffected; expired ids no longer resolvable
    assert t.scan(spark).count() == 900
    with pytest.raises(KeyError):
        t.scan(spark, snapshot_id=2)
    # reload from disk agrees
    t2 = IcebergTable(t.location)
    assert len(t2.snapshots()) == 1
    assert t2.scan(spark).count() == 900


def test_equality_delete_by_key(fresh_table, spark):
    """Equality deletes (spec "Equality Delete Files"): O(keys) commit, no
    data read; applies only to STRICTLY older sequence numbers."""
    t, df = fresh_table
    n_data = len(t.plan_files())
    keys = spark.createDataFrame([(f"d{i}",) for i in range(10)], "doc_id string")
    snap = t.delete_by_key(spark, keys, commit_ts_ms=4)
    assert snap["summary"]["added-equality-deletes"] == "10"
    assert len(t.plan_files()) == n_data       # no data file touched
    assert t.scan(spark).count() == 990
    assert t.scan(spark).filter("doc_id = 'd3'").count() == 0
    # strictly-newer data with the same key survives the older delete
    t.append_df(
        df.filter("doc_id = 'd3'").withColumn("n_tok", F.lit(99)),
        subdir="re", commit_ts_ms=5,
    )
    got = t.scan(spark).filter("doc_id = 'd3'").collect()
    assert [(r["doc_id"], r["n_tok"]) for r in got] == [("d3", 99)]


def test_upsert_same_sequence_semantics(fresh_table, spark):
    """UPSERT = data manifest + equality-delete manifest in ONE snapshot at
    one sequence number: old rows with matching keys hidden, the commit's
    own rows (same seq, strict rule) survive, new keys inserted."""
    t, df = fresh_table
    up = df.filter("seq IN (10, 11)").withColumn("n_tok", F.lit(777))
    new = spark.createDataFrame(
        [("zz1", [1, 2], 2, "app", 5000), ("zz2", [3], 1, "db", 5001)],
        "doc_id string, tokens array<int>, n_tok int, source string, seq long",
    )
    snap = t.upsert(spark, up.unionByName(new), ["doc_id"], commit_ts_ms=4)
    assert snap["summary"]["operation"] == "overwrite"
    cur = t.scan(spark)
    assert cur.count() == 1002  # 1000 - 2 replaced + 2 replacements + 2 new
    assert {r["n_tok"] for r in cur.filter("doc_id IN ('d10','d11')").collect()} == {777}
    assert cur.filter("doc_id IN ('zz1','zz2')").count() == 2
    # upserts stack: a second upsert of the same key wins
    up2 = up.filter("doc_id = 'd10'").withColumn("n_tok", F.lit(888))
    t.upsert(spark, up2, ["doc_id"], commit_ts_ms=5)
    assert t.scan(spark).filter("doc_id = 'd10'").first()["n_tok"] == 888
    # positional + equality deletes compose; compaction clears both
    t.delete_where(spark, [("seq", ">=", 5000)], commit_ts_ms=6)
    assert t.scan(spark).count() == 1000
    t.rewrite_data_files(spark, commit_ts_ms=7)
    assert len(t.plan_delete_files()) == 0
    assert t.scan(spark).count() == 1000
    assert t.scan(spark).filter("doc_id = 'd10'").first()["n_tok"] == 888


def test_sorted_compaction_improves_pruning(spark, tmp_path):
    """sort_by rewrite: interleaved appends give every file full-range
    min/max bounds (no file prunes); after a sorted compaction each file
    covers a narrow range and point/range predicates prune most files."""
    loc = str(tmp_path / "sorted")
    df = spark.range(4000).select(
        F.col("id").alias("n"),
        # interleave so every written file spans ~the full n range
        (F.col("id") % 8).alias("shard"),
    )
    t = IcebergTable.create(loc, df.schema, commit_ts_ms=1)
    t.append_df(df.repartition(8, "shard"), subdir="a", commit_ts_ms=2)
    assert len(t.plan_files([("n", ">=", 3900)])) == len(t.plan_files())  # nothing prunes
    t.rewrite_data_files(spark, commit_ts_ms=3, sort_by=["n"], files_per_partition=8)
    assert t.meta["default-sort-order-id"] == 1
    pruned = t.plan_files([("n", ">=", 3900)])
    assert 0 < len(pruned) < len(t.plan_files()) / 2
    # correctness unchanged
    assert t.scan(spark, [("n", ">=", 3900)]).count() == 100
    assert t.scan(spark).count() == 4000


def test_stream_iceberg_upsert_sink(spark, tmp_path):
    """CDC/upsert streaming sink: each micro-batch commits rows + their
    equality-delete keys at one sequence number, so the latest batch wins
    per key; the batch-id replay protocol still guarantees exactly-once."""
    from vector_spark.streaming import stream_from_directory, stream_iceberg_sink

    src = tmp_path / "cdc_in"
    ddl = "doc_id string, val int, source string"
    wave1 = spark.range(100).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit(1).alias("val"),
        F.element_at(
            F.array(F.lit("app"), F.lit("db")), (F.col("id") % 2 + 1).cast("int")
        ).alias("source"),
    )
    wave1.coalesce(2).write.parquet(str(src))
    loc = str(tmp_path / "cdc_tbl")
    t = IcebergTable.create(loc, wave1.schema, partition_by=["source"], commit_ts_ms=1)

    def run(checkpoint):
        stream = stream_from_directory(spark, str(src), ddl, maxFilesPerTrigger=2)
        q = (
            stream_iceberg_sink(stream, t, checkpoint, key_cols=["doc_id"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    ckpt = str(tmp_path / "cdc_ckpt")
    run(ckpt)
    assert t.scan(spark).count() == 100
    assert t.scan(spark).agg(F.max("val")).first()[0] == 1

    # second wave: UPDATE d0..d49 (val=2), INSERT d100..d149
    wave2 = spark.range(50).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit(2).alias("val"),
        F.element_at(
            F.array(F.lit("app"), F.lit("db")), (F.col("id") % 2 + 1).cast("int")
        ).alias("source"),
    ).unionByName(
        spark.range(100, 150).select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.lit(1).alias("val"),
            F.lit("app").alias("source"),
        )
    )
    wave2.coalesce(1).write.mode("append").parquet(str(src))
    run(ckpt)  # same checkpoint: only the new files process
    cur = t.scan(spark)
    assert cur.count() == 150
    assert cur.filter("val = 2").count() == 50
    assert cur.filter("doc_id = 'd3'").first()["val"] == 2
    assert cur.filter("doc_id = 'd73'").first()["val"] == 1
    n_snaps = len(t.snapshots())

    # fresh checkpoint replays every batch -> batch-id dedup skips them all
    run(str(tmp_path / "cdc_ckpt2"))
    assert t.scan(spark).count() == 150
    assert len(t.snapshots()) == n_snaps
    # compaction materializes the CDC view and retires the delete files
    t.rewrite_data_files(spark)
    assert t.scan(spark).count() == 150
    assert t.scan(spark).filter("doc_id = 'd3'").first()["val"] == 2
    assert len(t.plan_delete_files()) == 0


def test_bucket_transform_partitioning(spark, tmp_path):
    """bucket(col, N) per the Iceberg spec's partition transforms: the
    derived field never appears in the table schema, a point lookup on the
    source column prunes to its one bucket by metadata alone, and the row
    residual still applies the original predicate."""
    from vector_spark.hashing import portable_bucket_py

    loc = str(tmp_path / "bkt")
    df = spark.range(400).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.col("id").cast("long").alias("seq"),
    ).repartition(8)
    t = IcebergTable.create(
        loc, df.schema, partition_by=["bucket(doc_id, 8)"], commit_ts_ms=1
    )
    t.append_df(df, commit_ts_ms=2)

    got = t.scan(spark)
    assert set(got.columns) == {"doc_id", "seq"}           # derived col is not data
    assert got.count() == 400
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0

    all_files = t.plan_files()
    assert {f["partition"]["doc_id_bucket"] for f in all_files} == set(range(8))
    one = t.plan_files([("doc_id", "=", "d37")])
    b = portable_bucket_py("d37", 8)
    assert 0 < len(one) < len(all_files)
    assert all(f["partition"]["doc_id_bucket"] == b for f in one)
    assert t.scan(spark, [("doc_id", "=", "d37")]).count() == 1

    keys = ["d1", "d2", "d3"]
    some = t.plan_files([("doc_id", "in", keys)])
    want_buckets = {portable_bucket_py(k, 8) for k in keys}
    assert all(f["partition"]["doc_id_bucket"] in want_buckets for f in some)
    assert len(some) < len(all_files)
    assert t.scan(spark, [("doc_id", "in", keys)]).count() == 3


def test_truncate_transform_partitioning(spark, tmp_path):
    """truncate(col, W) is monotone, so range predicates on the source
    column project onto the derived field and prune files."""
    loc = str(tmp_path / "trunc")
    df = spark.range(1000).select(
        F.col("id").cast("long").alias("seq"),
        F.concat(F.lit("p"), (F.col("id") % 7).cast("string")).alias("tag"),
    ).repartition(4)
    t = IcebergTable.create(
        loc, df.schema, partition_by=["truncate(seq, 100)"], commit_ts_ms=1
    )
    t.append_df(df, commit_ts_ms=2)

    assert set(t.scan(spark).columns) == {"seq", "tag"}
    assert t.scan(spark).count() == 1000

    all_files = t.plan_files()
    assert {f["partition"]["seq_trunc"] for f in all_files} == {
        i * 100 for i in range(10)
    }
    lo = t.plan_files([("seq", "<", 50)])
    assert all(f["partition"]["seq_trunc"] == 0 for f in lo)
    assert t.scan(spark, [("seq", "<", 50)]).count() == 50
    hi = t.plan_files([("seq", ">=", 850)])
    assert all(f["partition"]["seq_trunc"] >= 800 for f in hi)
    assert t.scan(spark, [("seq", ">=", 850)]).count() == 150
    pt = t.plan_files([("seq", "=", 123)])
    assert all(f["partition"]["seq_trunc"] == 100 for f in pt)
    assert t.scan(spark, [("seq", "=", 123)]).count() == 1


def test_string_truncate_and_mixed_spec(spark, tmp_path):
    """identity + bucket compose in one spec; string truncate takes a
    prefix.  Identity fields re-attach from manifest values, derived
    fields never do."""
    loc = str(tmp_path / "mix")
    df = spark.range(300).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        F.element_at(
            F.array(F.lit("app"), F.lit("db")), (F.col("id") % 2 + 1).cast("int")
        ).alias("source"),
        F.concat(F.lit("us-east-"), (F.col("id") % 3).cast("string")).alias("zone"),
    )
    t = IcebergTable.create(
        loc,
        df.schema,
        partition_by=["source", "bucket(doc_id, 4)", "truncate(zone, 7)"],
        commit_ts_ms=1,
    )
    t.append_df(df, commit_ts_ms=2)

    got = t.scan(spark)
    assert set(got.columns) == {"doc_id", "source", "zone"}
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0

    all_files = t.plan_files()
    assert {f["partition"]["zone_trunc"] for f in all_files} == {"us-east"}
    # identity + bucket prune together on a compound lookup
    few = t.plan_files([("source", "=", "app"), ("doc_id", "=", "doc42")])
    assert 0 < len(few) < len(all_files)
    assert all(f["partition"]["source"] == "app" for f in few)
    assert t.scan(
        spark, [("source", "=", "app"), ("doc_id", "=", "doc42")]
    ).count() == 1


def test_partition_evolution(spark, tmp_path):
    """spec "Partition Evolution": update_spec is metadata-only — old files
    keep their spec, each manifest prunes under its own spec, mixed-spec
    scans re-attach per group, and compaction migrates everything to the
    current spec."""
    from vector_spark.hashing import portable_bucket_py

    loc = str(tmp_path / "evo")
    df = spark.range(600).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.element_at(
            F.array(F.lit("app"), F.lit("db")), (F.col("id") % 2 + 1).cast("int")
        ).alias("source"),
        F.col("id").cast("long").alias("seq"),
    )
    t = IcebergTable.create(loc, df.schema, partition_by=["source"], commit_ts_ms=1)
    t.append_df(df.filter("seq < 300"), subdir="a1", commit_ts_ms=2)
    new_id = t.update_spec(["bucket(doc_id, 8)"])
    assert new_id == 1
    t.append_df(df.filter("seq >= 300").repartition(8), subdir="a2", commit_ts_ms=3)

    # mixed-spec full scan reproduces the input exactly
    got = t.scan(spark)
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0

    # each manifest prunes under its OWN spec: the source filter drops the
    # old-spec db files by partition value; new-spec files keep both sources
    files = t.plan_files([("source", "=", "app")])
    old = [f for f in files if f["_spec_id"] == 0]
    new = [f for f in files if f["_spec_id"] == 1]
    assert old and new
    assert all(f["partition"]["source"] == "app" for f in old)
    assert t.scan(spark, [("source", "=", "app")]).count() == 300

    # bucket lookup prunes only the new-spec half
    one = t.plan_files([("doc_id", "=", "d457")])
    b = portable_bucket_py("d457", 8)
    assert all(f["partition"]["doc_id_bucket"] == b for f in one if f["_spec_id"] == 1)
    assert {f["partition"]["doc_id_bucket"] for f in one if f["_spec_id"] == 1} == {b}
    assert t.scan(spark, [("doc_id", "=", "d457")]).count() == 1

    # persisted: a fresh load sees the new default spec and scans identically
    t2 = IcebergTable(loc)
    assert t2.default_spec_id == new_id
    assert t2.scan(spark).count() == 600

    # compaction migrates every file to the current spec
    t.rewrite_data_files(spark, commit_ts_ms=4)
    after = t.plan_files()
    assert after and all(f["_spec_id"] == new_id for f in after)
    assert {f["partition"]["doc_id_bucket"] for f in after} == set(range(8))
    got2 = t.scan(spark)
    assert got2.exceptAll(df).count() == 0 and df.exceptAll(got2).count() == 0
    pt = t.plan_files([("doc_id", "=", "d42")])
    assert {f["partition"]["doc_id_bucket"] for f in pt} == {portable_bucket_py("d42", 8)}


def test_metadata_tables(table, spark):
    """Inspection surface (tbl.snapshots/.history/.files/.partitions/
    .manifests): driver-built DataFrames that must agree with the layer's
    own planning."""
    t, df = table
    snaps = t.metadata_table(spark, "snapshots").collect()
    assert [r["snapshot_id"] for r in snaps] == [1, 2]
    assert snaps[0]["parent_id"] is None and snaps[1]["parent_id"] == 1
    assert all(r["operation"] == "append" for r in snaps)
    assert int(snaps[0]["summary"]["added-records"]) == 600

    hist = t.metadata_table(spark, "history").collect()
    assert [r["snapshot_id"] for r in hist] == [1, 2]
    assert all(r["is_current_ancestor"] for r in hist)

    files = t.metadata_table(spark, "files")
    planned = t.plan_files()
    assert files.count() == len(planned)
    agg = files.groupBy(F.map_values("partition")[0].alias("src")).agg(
        F.sum("record_count").alias("n")
    )
    by_src = {r["src"]: r["n"] for r in agg.collect()}
    want = {r["source"]: r["n"] for r in df.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert by_src == want

    parts = t.metadata_table(spark, "partitions").collect()
    assert {p["partition"]["source"] for p in parts} == {"app", "db", "web"}
    assert sum(p["record_count"] for p in parts) == 1000
    assert sum(p["file_count"] for p in parts) == len(planned)

    mans = t.metadata_table(spark, "manifests").collect()
    assert len(mans) == 2 and all(m["content"] == 0 for m in mans)
    assert {m["added_snapshot_id"] for m in mans} == {1, 2}


def test_incremental_scan(spark, tmp_path):
    """Snapshot-range delta reads: only rows appended after the cursor,
    upsert deltas read as their new rows, compaction in range refuses."""
    loc = str(tmp_path / "inc")
    mk = lambda lo, hi, val: spark.range(lo, hi).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit(val).alias("val"),
        F.element_at(
            F.array(F.lit("app"), F.lit("db")), (F.col("id") % 2 + 1).cast("int")
        ).alias("source"),
    )
    t = IcebergTable.create(loc, mk(0, 1, 0).schema, partition_by=["source"], commit_ts_ms=1)
    t.append_df(mk(0, 100, 0), subdir="a1", commit_ts_ms=2)      # snap 1
    t.append_df(mk(100, 250, 0), subdir="a2", commit_ts_ms=3)    # snap 2
    t.upsert(spark, mk(200, 300, 7), ["doc_id"], commit_ts_ms=4) # snap 3

    # delta after snap 1 = snap2 appends + snap3 upsert rows (not the
    # snap2 rows the upsert superseded)
    delta = t.incremental_scan(spark, from_snapshot_id=1)
    assert delta.count() == 100 + 100   # d100..d199 from a2 + d200..d299 upsert
    assert delta.filter("val = 7").count() == 100
    assert delta.filter("doc_id = 'd250'").first()["val"] == 7
    assert delta.filter("doc_id = 'd050'").count() == 0  # pre-cursor row absent

    # bounded range (1, 2] sees only the second append
    mid = t.incremental_scan(spark, 1, 2)
    assert mid.count() == 150 and mid.filter("val != 0").count() == 0

    # empty range and full-table sanity
    assert t.incremental_scan(spark, 3).count() == 0
    assert t.scan(spark).count() == 300

    # filters prune the delta like any scan
    assert (
        t.incremental_scan(spark, 1, filters=[("source", "=", "app")]).count()
        == t.incremental_scan(spark, 1).filter("source = 'app'").count()
    )

    # compaction is not an incremental-safe boundary
    t.rewrite_data_files(spark, commit_ts_ms=5)
    with pytest.raises(ValueError, match="non-incremental"):
        t.incremental_scan(spark, 1)
    # but a cursor at/after the replace works again
    t.append_df(mk(300, 320, 1), subdir="a3", commit_ts_ms=6)
    assert t.incremental_scan(spark, 4).count() == 20


def test_schema_evolution_rename_across_files(spark, tmp_path):
    """Rename keeps the field id: files written under the OLD name still
    resolve in one scan with files written under the new name, filters on
    the new name prune via the id-keyed bounds of old manifests."""
    loc = str(tmp_path / "ren")
    df1 = spark.range(10).select(F.col("id").alias("n"),
                                 F.concat(F.lit("v"), F.col("id")).alias("val"))
    t = IcebergTable.create(loc, df1.schema, commit_ts_ms=1)
    t.append_df(df1, subdir="a", commit_ts_ms=2)
    t.rename_column("val", "value", commit_ts_ms=3)
    assert [f["name"] for f in t.schema["fields"]] == ["n", "value"]
    df2 = spark.range(10, 20).select(
        F.col("id").alias("n"), F.concat(F.lit("v"), F.col("id")).alias("value"))
    t.append_df(df2, subdir="b", commit_ts_ms=4)
    got = {(r["n"], r["value"]) for r in t.scan(spark).collect()}
    assert got == {(i, f"v{i}") for i in range(20)}
    # filter on the NEW name must hit old files too (id-keyed bounds)
    assert t.scan(spark, filters=[("n", "<", 5)]).count() == 5
    # reload from disk
    got2 = {(r["n"], r["value"]) for r in IcebergTable(loc).scan(spark).collect()}
    assert got2 == got


def test_schema_evolution_drop_column(spark, tmp_path):
    loc = str(tmp_path / "drop")
    df1 = spark.range(5).select(F.col("id").alias("n"),
                                F.lit("x").alias("junk"),
                                (F.col("id") * 2).alias("keep"))
    t = IcebergTable.create(loc, df1.schema, commit_ts_ms=1)
    t.append_df(df1, subdir="a", commit_ts_ms=2)
    t.drop_column("junk", commit_ts_ms=3)
    assert [f["name"] for f in t.schema["fields"]] == ["n", "keep"]
    df2 = spark.range(5, 10).select(F.col("id").alias("n"),
                                    (F.col("id") * 2).alias("keep"))
    t.append_df(df2, subdir="b", commit_ts_ms=4)
    rows = t.scan(spark).collect()
    assert set(rows[0].asDict()) == {"n", "keep"}
    assert {(r["n"], r["keep"]) for r in rows} == {(i, 2 * i) for i in range(10)}
    # the id is never reused: re-adding a column of the same name must not
    # resurrect the dropped values
    t.add_column("junk", "string", commit_ts_ms=5)
    assert all(r["junk"] is None for r in t.scan(spark).collect())


def test_schema_evolution_type_promotion(spark, tmp_path):
    """int->long promotion: old 4-byte files cast wide on read, and old
    manifests' 4-byte bounds still prune under the promoted type."""
    loc = str(tmp_path / "promo")
    df1 = spark.range(10).select(F.col("id").cast("int").alias("n"),
                                 F.col("id").cast("float").alias("score"))
    t = IcebergTable.create(loc, df1.schema, commit_ts_ms=1)
    t.append_df(df1, subdir="a", commit_ts_ms=2)
    t.promote_column("n", "long", commit_ts_ms=3)
    t.promote_column("score", "double", commit_ts_ms=4)
    df2 = spark.range(10, 20).select(F.col("id").alias("n"),
                                     F.col("id").cast("double").alias("score"))
    t.append_df(df2, subdir="b", commit_ts_ms=5)
    out = t.scan(spark)
    assert dict(out.dtypes)["n"] == "bigint"
    assert dict(out.dtypes)["score"] == "double"
    assert {r["n"] for r in out.collect()} == set(range(20))
    # bounds pruning across the promotion (old manifest bounds are 4-byte)
    assert out.count() == 20
    assert t.scan(spark, filters=[("n", "<", 5)]).count() == 5
    with pytest.raises(ValueError):
        t.promote_column("score", "float")  # narrowing rejected


def test_schema_evolution_full_lifecycle_one_scan(spark, tmp_path):
    """add + rename + promote + drop commits interleaved with appends;
    one final scan unifies files from every schema version (the VERDICT
    r4 'Done' shape)."""
    loc = str(tmp_path / "life")
    df1 = spark.range(5).select(F.col("id").cast("int").alias("k"),
                                F.lit("one").alias("tag"))
    t = IcebergTable.create(loc, df1.schema, commit_ts_ms=1)
    t.append_df(df1, subdir="s1", commit_ts_ms=2)
    t.add_column("extra", "long", commit_ts_ms=3)
    df2 = spark.range(5, 10).select(F.col("id").cast("int").alias("k"),
                                    F.lit("two").alias("tag"),
                                    (F.col("id") + 100).alias("extra"))
    t.append_df(df2, subdir="s2", commit_ts_ms=4)
    t.rename_column("tag", "label", commit_ts_ms=5)
    t.promote_column("k", "long", commit_ts_ms=6)
    df3 = spark.range(10, 15).select(F.col("id").alias("k"),
                                     F.lit("three").alias("label"),
                                     (F.col("id") + 100).alias("extra"))
    t.append_df(df3, subdir="s3", commit_ts_ms=7)
    t.drop_column("extra", commit_ts_ms=8)
    out = t.scan(spark)
    assert [f.name for f in out.schema.fields] == ["k", "label"]
    got = {(r["k"], r["label"]) for r in out.collect()}
    want = ({(i, "one") for i in range(5)}
            | {(i, "two") for i in range(5, 10)}
            | {(i, "three") for i in range(10, 15)})
    assert got == want
    # time travel to snapshot 2 reads under the CURRENT schema (spec:
    # scans use the table schema, not the snapshot's)
    old = t.scan(spark, snapshot_id=2)
    assert {(r["k"], r["label"]) for r in old.collect()} == (
        {(i, "one") for i in range(5)} | {(i, "two") for i in range(5, 10)})


def test_schema_evolution_partition_guards(spark, tmp_path):
    loc = str(tmp_path / "guard")
    df = spark.range(10).select(F.col("id").alias("n"),
                                F.lit("a").alias("source"))
    t = IcebergTable.create(loc, df.schema, partition_by=["source"],
                            commit_ts_ms=1)
    with pytest.raises(ValueError, match="identity partition source"):
        t.rename_column("source", "src")
    with pytest.raises(ValueError, match="identity partition source"):
        t.drop_column("source")


def test_rename_drop_refused_on_live_equality_delete_key(spark, tmp_path):
    """Equality-delete parquet keys by the column NAME current at delete
    time; renaming/dropping a live eq-delete key would silently break
    delete application, so evolution refuses until compaction."""
    loc = str(tmp_path / "eqguard")
    df = spark.range(10).select(F.col("id").alias("k"),
                                F.concat(F.lit("v"), F.col("id")).alias("val"))
    t = IcebergTable.create(loc, df.schema, commit_ts_ms=1)
    t.append_df(df, subdir="a", commit_ts_ms=2)
    t.delete_by_key(spark, spark.range(3).select(F.col("id").alias("k")),
                    ["k"], commit_ts_ms=3)
    with pytest.raises(ValueError, match="equality-delete"):
        t.rename_column("k", "key")
    with pytest.raises(ValueError, match="equality-delete"):
        t.drop_column("k")
    # non-key columns still evolve freely
    t.rename_column("val", "value", commit_ts_ms=4)
    assert t.scan(spark).count() == 7
    # compaction clears the delete files and unblocks the rename
    t.rewrite_data_files(spark, commit_ts_ms=5)
    t.rename_column("k", "key", commit_ts_ms=6)
    assert {r["key"] for r in t.scan(spark).collect()} == set(range(3, 10))
