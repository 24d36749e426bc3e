"""geoip bucketed range join + tag_cardinality_limit probabilistic mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.enrichment import geoip_enrich, load_geoip_mmdb

GEO = [
    (1 << 24, (2 << 24) - 1, "AA"),
    ((2 << 24) + 5, (2 << 24) + 10, "BB"),  # tiny range inside one /16
    (3 << 24, (10 << 24) - 1, "CC"),
]


def _geo_df(spark):
    return spark.createDataFrame(GEO, ["ip_start", "ip_end", "country_code"])


def test_geoip_bucketed_matches_naive(spark):
    ips = [
        "1.0.0.1", "1.255.255.255", "2.0.0.5", "2.0.0.11", "3.4.5.6",
        "9.255.0.1", "10.0.0.0", "200.1.2.3",
    ]
    ev = spark.createDataFrame([(i, ip) for i, ip in enumerate(ips)], ["id", "ip"])
    out = {r["ip"]: r["country_code"] for r in geoip_enrich(ev, _geo_df(spark), "ip").collect()}
    assert out == {
        "1.0.0.1": "AA", "1.255.255.255": "AA", "2.0.0.5": "BB",
        "2.0.0.11": None, "3.4.5.6": "CC", "9.255.0.1": "CC",
        "10.0.0.0": None, "200.1.2.3": None,
    }


def test_geoip_plan_is_hash_join(spark):
    """The bucket trick must produce a broadcast HASH join, not a
    nested-loop join — that is the whole point at scale."""
    ev = spark.createDataFrame([(1, "1.2.3.4")], ["id", "ip"])
    plan = geoip_enrich(ev, _geo_df(spark), "ip")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geoip_mmdb_loader_missing_file(spark):
    # loader is real now (functions/mmdb.py); a missing path surfaces as
    # the file error, not a stub
    with pytest.raises(FileNotFoundError):
        load_geoip_mmdb(spark, "/nonexistent/GeoLite2-City.mmdb")


def test_tag_cardinality_probabilistic(spark):
    from vector_spark.operators.metrics import tag_cardinality_limit

    df = spark.createDataFrame(
        [(i, f"v{i % 20:02d}") for i in range(200)], ["id", "tag"]
    )
    kept = tag_cardinality_limit(
        df, ["tag"], value_limit=5, action="drop_tag", mode="probabilistic", fpp=1e-6
    )
    vals = {r["tag"] for r in kept.collect()}
    # with fpp ~ 0 the sketch behaves like the exact mode: the 5 smallest
    # admitted, the rest nulled
    assert vals == {"v00", "v01", "v02", "v03", "v04", None}
    dropped = tag_cardinality_limit(
        df, ["tag"], value_limit=5, action="drop_event", mode="probabilistic", fpp=1e-6
    )
    assert dropped.count() == 50  # 5 of 20 values x 10 rows each


def test_encode_gelf_rows(spark):
    import json
    from vector_spark.sinks import encode_gelf_rows

    df = spark.createDataFrame(
        [("h1", "boom", "2024-01-01 00:00:00", 3)], ["host", "message", "ts_s", "lvl"]
    ).select("host", "message", F.to_timestamp("ts_s").alias("ts"), "lvl")
    got = json.loads(
        encode_gelf_rows(df, level_col="lvl", extra=["host"]).collect()[0]["value"]
    )
    assert got["version"] == "1.1"
    assert got["host"] == "h1" and got["short_message"] == "boom"
    assert got["level"] == 3 and got["_host"] == "h1"
    assert got["timestamp"] == 1704067200.0


def test_ivf_cells_partition_corpus(spark):
    """Every vector lands in exactly one IVF cell; a query probing its own
    cell sees itself (self-recall at nprobe=1)."""
    import numpy as np
    from pyspark.sql import functions as SF
    from vector_spark.similarity import topk_cosine_ivf

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(SF.col("vec_id") < 5).selectExpr("vec_id AS query_id", "embedding")
    out = topk_cosine_ivf(df, q, k=1, n_cells=4, dim=16)
    got = {r["query_id"]: r["vec_id"] for r in out.collect()}
    assert got == {i: i for i in range(5)}  # top-1 of each query is itself
