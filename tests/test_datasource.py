"""The vector_iceberg Spark 4 Python Data Source: batch reads must equal
the layer's own scan (including merge-on-read deletes and time travel),
pushFilters must prune input partitions through partition transforms, and
the stream reader must deliver exactly each commit's delta."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In

from vector_spark.datasource import (
    IcebergBatchReader,
    IcebergDataSource,
    IcebergPushdownBatchReader,
)
from vector_spark.iceberg import IcebergTable


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(IcebergDataSource)


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.sequence(F.lit(1), (F.col("id") % 5 + 1).cast("int")).alias("tokens"),
        (F.col("id") % 5 + 1).cast("int").alias("n_tok"),
        F.element_at(
            F.array(F.lit("app"), F.lit("db")), (F.col("id") % 2 + 1).cast("int")
        ).alias("source"),
        F.col("id").cast("long").alias("seq"),
    )


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("ds") / "tbl")
    df = _corpus(spark)
    t = IcebergTable.create(loc, df.schema, partition_by=["source"], commit_ts_ms=1)
    t.append_df(df.filter("seq < 300"), subdir="a1", commit_ts_ms=2)
    t.append_df(df.filter("seq >= 300"), subdir="a2", commit_ts_ms=3)
    return t, df


def _ds(spark, loc, **opts):
    r = spark.read.format("vector_iceberg").option("path", loc)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _canon(df):
    return df.select(
        "doc_id", F.col("tokens").cast("string").alias("tk"), "n_tok", "source", "seq"
    )


def test_batch_read_equality(table, spark):
    t, df = table
    got = _canon(_ds(spark, t.location))
    want = _canon(df)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_batch_filters_through_spark(table, spark):
    t, df = table
    got = _ds(spark, t.location).filter("source = 'app' AND seq >= 350")
    assert got.count() == df.filter("source = 'app' AND seq >= 350").count()
    assert set(r["source"] for r in got.select("source").distinct().collect()) == {"app"}


def test_pushdown_prunes_partitions(table, spark):
    t, _ = table
    r_all = IcebergPushdownBatchReader({"path": t.location, "pushdown": "true"})
    n_all = len(r_all.partitions())
    r = IcebergPushdownBatchReader({"path": t.location, "pushdown": "true"})
    passthrough = r.pushFilters([EqualTo(("source",), "app"), GreaterThanOrEqual(("seq",), 300)])
    # every filter returns to Spark for post-scan evaluation
    assert len(list(passthrough)) == 2
    assert 0 < len(r.partitions()) < n_all
    # pushed state is consumed by the planning pass it was pushed for:
    # a next planning round with no pushFilters call must see a full scan
    assert len(r.partitions()) == n_all


def test_pushdown_disabled_by_default(table, spark):
    t, _ = table
    r = IcebergBatchReader({"path": t.location})
    n_all = len(r.partitions())
    r.pushFilters([EqualTo(("source",), "app")])
    assert len(r.partitions()) == n_all  # no filter-dependent planning
    # Spark 4 raises DATA_SOURCE_PUSHDOWN_DISABLED for any reader that
    # OVERRIDES pushFilters when spark.sql.python.filterPushdown.enabled is
    # false (the default session config, e.g. the driver harness).  The
    # default reader must therefore inherit, never override.
    from pyspark.sql.datasource import DataSourceReader

    assert type(r).pushFilters is DataSourceReader.pushFilters
    assert (
        type(IcebergDataSource({"path": t.location}).reader(None)).pushFilters
        is DataSourceReader.pushFilters
    )


def test_pushdown_through_bucket_transform(spark, tmp_path):
    loc = str(tmp_path / "bkt")
    df = _corpus(spark)
    t = IcebergTable.create(
        loc, df.schema, partition_by=["bucket(doc_id, 8)"], commit_ts_ms=1
    )
    t.append_df(df.repartition(8), commit_ts_ms=2)
    r_all = IcebergPushdownBatchReader({"path": loc, "pushdown": "true"})
    n_all = len(r_all.partitions())
    r = IcebergPushdownBatchReader({"path": loc, "pushdown": "true"})
    r.pushFilters([In(("doc_id",), ("d37", "d38"))])
    assert 0 < len(r.partitions()) < n_all
    # end-to-end pruned read: single-use load, opt-in pushdown
    got = _ds(spark, loc, pushdown="true").filter(F.col("doc_id").isin("d37", "d38"))
    assert got.count() == 2
    # default (no pushdown option) returns the same rows
    assert _ds(spark, loc).filter(F.col("doc_id").isin("d37", "d38")).count() == 2


def test_no_cross_query_filter_leak(table, spark):
    """The hazard that makes pruning opt-in: Spark's Python-datasource
    pushdown rule caches the planned scan on the shared relation, so a
    filtered query would poison later filter-less queries over the same
    loaded DataFrame.  With default options the reader never plans
    filter-dependently, so DataFrame reuse stays correct."""
    t, df = table
    d = _ds(spark, t.location)
    assert d.filter("source = 'app' AND seq >= 350").count() == 25
    assert d.count() == df.count()  # unfiltered reuse still sees every row
    assert d.exceptAll(_ds(spark, t.location)).count() == 0


def test_snapshot_time_travel_option(table, spark):
    t, df = table
    got = _ds(spark, t.location, snapshotId=1)
    assert got.count() == df.filter("seq < 300").count()


def test_reads_merge_on_read_deletes(spark, tmp_path):
    loc = str(tmp_path / "mor")
    df = _corpus(spark, 200)
    t = IcebergTable.create(loc, df.schema, partition_by=["source"], commit_ts_ms=1)
    t.append_df(df, subdir="a", commit_ts_ms=2)
    t.delete_where(spark, [("seq", "<", 50)], commit_ts_ms=3)
    mod = df.filter("seq >= 150").withColumn("n_tok", F.lit(99).cast("int"))
    t.upsert(spark, mod, ["doc_id"], commit_ts_ms=4)
    got = _canon(_ds(spark, loc))
    want = _canon(t.scan(spark))
    assert got.count() == 150
    assert got.filter("n_tok = 99").count() == 50
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_reads_commit_deltas(spark, tmp_path):
    loc = str(tmp_path / "stream")
    df = _corpus(spark, 300)
    t = IcebergTable.create(loc, df.schema, partition_by=["source"], commit_ts_ms=1)
    t.append_df(df.filter("seq < 100"), subdir="a1", commit_ts_ms=2)

    q = (
        spark.readStream.format("vector_iceberg")
        .option("path", loc)
        .load()
        .writeStream.format("memory")
        .queryName("ice_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("ice_stream").count() == 100
        t.append_df(df.filter("seq >= 100 AND seq < 250"), subdir="a2", commit_ts_ms=3)
        q.processAllAvailable()
        assert spark.table("ice_stream").count() == 250
        # delta only: no re-read of the first commit
        assert (
            spark.table("ice_stream").groupBy("doc_id").count().filter("count > 1").count()
            == 0
        )
        t.append_df(df.filter("seq >= 250"), subdir="a3", commit_ts_ms=4)
        q.processAllAvailable()
        got = spark.table("ice_stream")
        assert got.count() == 300
        want = _canon(df)
        assert _canon(got).exceptAll(want).count() == 0
    finally:
        q.stop()


def test_schema_evolution_through_datasource(spark, tmp_path):
    """Files written before a rename/promote/add must resolve by field id
    through spark.read.format("vector_iceberg") exactly as through
    t.scan(): renamed columns re-attach, promoted ints widen, added
    columns read NULL (round 5: the DataSource read path previously
    resolved by name only)."""
    loc = str(tmp_path / "evo_ds")
    df1 = spark.range(10).select(
        F.col("id").cast("int").alias("n"),
        F.concat(F.lit("v"), F.col("id")).alias("val"))
    t = IcebergTable.create(loc, df1.schema, commit_ts_ms=1)
    t.append_df(df1, subdir="a", commit_ts_ms=2)
    t.rename_column("val", "value", commit_ts_ms=3)
    t.promote_column("n", "long", commit_ts_ms=4)
    t.add_column("extra", "string", commit_ts_ms=5)
    df2 = spark.range(10, 20).select(
        F.col("id").alias("n"),
        F.concat(F.lit("v"), F.col("id")).alias("value"),
        F.lit("new").alias("extra"))
    t.append_df(df2, subdir="b", commit_ts_ms=6)

    got = spark.read.format("vector_iceberg").option("path", loc).load()
    assert dict(got.dtypes) == {"n": "bigint", "value": "string",
                                "extra": "string"}
    rows = {(r["n"], r["value"], r["extra"]) for r in got.collect()}
    want = ({(i, f"v{i}", None) for i in range(10)}
            | {(i, f"v{i}", "new") for i in range(10, 20)})
    assert rows == want
    # parity with the layer's own scan
    scan_rows = {(r["n"], r["value"], r["extra"])
                 for r in t.scan(spark).collect()}
    assert scan_rows == rows


def test_drop_then_readd_not_resurrected_through_datasource(spark, tmp_path):
    """A dropped-then-re-added column has a NEW field id: the DataSource
    must NOT resurrect the stale physical column of the same name from
    old files (round-5 review finding: name-based selection did)."""
    loc = str(tmp_path / "resurrect")
    df1 = spark.range(5).select(F.col("id").alias("n"),
                                F.lit("old").alias("junk"))
    t = IcebergTable.create(loc, df1.schema, commit_ts_ms=1)
    t.append_df(df1, subdir="a", commit_ts_ms=2)
    t.drop_column("junk", commit_ts_ms=3)
    t.add_column("junk", "string", commit_ts_ms=4)
    got = spark.read.format("vector_iceberg").option("path", loc).load()
    rows = got.collect()
    assert all(r["junk"] is None for r in rows)
    assert {r["n"] for r in rows} == set(range(5))
    # also with a TYPE change (used to crash with ArrowInvalid)
    t.drop_column("junk", commit_ts_ms=5)
    t.add_column("junk", "long", commit_ts_ms=6)
    got2 = spark.read.format("vector_iceberg").option("path", loc).load()
    assert all(r["junk"] is None for r in got2.collect())
