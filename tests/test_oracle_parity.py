"""Driver-mimicking gate: every queries() entry must match its oracle_sql()
in DuckDB at sf0.01 — row count, column names, and order-insensitive values.

This is the same comparison CORRECTNESS_r{N}.json records (rebuild of the
reference's `vector test` behavior harness, src/unit_test.rs:62-90).
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


def _normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "NaN"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module", autouse=True)
def _ansi_on(spark):
    """Mimic the driver's harness: Spark 4 defaults ANSI *on*, while our own
    session builder pins it off (session.py:56).  The contract surface must
    work in BOTH modes, so this module — the local twin of the driver's
    CORRECTNESS gate — runs every query under ANSI-on.  (Runtime-settable
    conf, restored afterwards so the other test modules keep the builder
    default.)"""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        df = q(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check
        return
    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = [
        {c: row[c] for c in cols} for row in sdf.collect()
    ]
    odf = duck.execute(oracles[name]).fetch_df()
    assert sorted(odf.columns.tolist()) == cols, (
        f"column mismatch: spark={cols} oracle={sorted(odf.columns.tolist())}"
    )
    oracle_rows = odf.to_dict("records")
    s = _normalize(spark_rows, cols)
    o = _normalize(oracle_rows, cols)
    assert len(s) == len(o), f"row count: spark={len(s)} oracle={len(o)}"
    mismatches = [i for i, (a, b) in enumerate(zip(s, o)) if a != b]
    assert not mismatches, (
        f"{len(mismatches)} value mismatches; first: spark={s[mismatches[0]]} "
        f"oracle={o[mismatches[0]]}"
    )
