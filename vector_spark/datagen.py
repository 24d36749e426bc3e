"""Deterministic synthetic tokenized-log corpus (the F0 fixture / north-rule
input table).

Schema (BASELINE.json input_hint):
    doc_id  string      -- "doc-%012d", unique
    tokens  array<int>  -- n_tok ints in [0, 50257)
    n_tok   int
    source  string      -- Zipf-skewed over {app,web,db,cache,edge}
    ts      timestamp   -- event time, 30-day spread
    message string      -- rendered grok-parseable log line (the analogue of
                           Vector's demo_logs rendered formats,
                           reference src/sources/demo_logs.rs:100-157)

All draws come from one ``numpy`` PCG64 stream seeded 42, in a fixed order,
so the corpus is bit-reproducible per scale factor.  Generation is fully
vectorized (no per-row Python in the hot path) and written via pyarrow.

The same parquet file is read by BOTH the Spark pipeline and the DuckDB
oracle, so per-row token-array equality is checkable end to end.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 50257
BASE_TS = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp())

SOURCES = ["app", "web", "db", "cache", "edge"]
SOURCE_P = [0.55, 0.25, 0.12, 0.05, 0.03]  # skewed on purpose (salting fixture)
LEVELS = ["INFO", "WARN", "ERROR", "DEBUG", "FATAL"]
LEVEL_P = [0.70, 0.15, 0.10, 0.04, 0.01]
SERVICES = ["auth", "billing", "ingest", "search", "api", "worker", "cron", "gateway"]
STATUS = [200, 200, 200, 200, 301, 404, 500, 503]
WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value token "
    "shuffle stage broadcast skew salt plan codegen arrow vector route sink"
).split()

# Enrichment lookup table (F6 fixture; reference src/enrichment_tables/file.rs).
# Shared constant: Spark builds a DataFrame from it, oracle SQL inlines it as
# VALUES — one source of truth.
ENRICH_ROWS = [
    # (key, region, tier, from_date, to_date)
    ("app", "us-east-1", "gold", "2024-01-01", "2024-12-31"),
    ("web", "us-west-2", "silver", "2024-01-01", "2024-12-31"),
    ("db", "eu-west-1", "gold", "2024-01-01", "2024-12-31"),
    ("cache", "eu-west-1", "bronze", "2024-01-01", "2024-12-31"),
    ("edge", "ap-south-1", "bronze", "2024-01-01", "2024-06-30"),
    ("edge", "ap-south-2", "silver", "2024-07-01", "2024-12-31"),
    ("mail", "us-east-1", "bronze", "2024-01-01", "2024-12-31"),  # never matches
]

DATA_ROOT = os.environ.get("SPARK_GRAFT_DATA_ROOT", "/root/repo/data/tokenlogs")


def rows_for_sf(sf: float) -> int:
    return max(1000, int(round(sf * 6_000_000)))


def corpus_path(sf: float) -> str:
    return os.path.join(DATA_ROOT, f"sf{sf:g}", "logs.parquet")


def sf_from_dir(sf_dir: str) -> float:
    """Map a driver sf dir like /root/testdata/sf0.01 -> 0.01."""
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base.removeprefix("sf")) if base.startswith("sf") else 0.01


# Rows per generation chunk.  Chunking matters twice: (a) this sandbox's
# memory subsystem degrades ~15x on allocations beyond a few hundred MB, and
# (b) the writer streams one row group per chunk so peak memory stays
# O(chunk) at any scale factor.  Each chunk draws from its own
# seed-sequence-keyed PCG64 ([SEED, chunk_idx]) so the corpus is
# deterministic per sf and chunks are independently reproducible (the same
# property a distributed generator would need).
CHUNK_ROWS = 250_000


def ensure_corpus(sf: float) -> str:
    """Generate (once) and return the parquet path for scale factor ``sf``."""
    path = corpus_path(sf)
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n_total = rows_for_sf(sf)
    writer = None
    try:
        for chunk_idx, start in enumerate(range(0, n_total, CHUNK_ROWS)):
            n = min(CHUNK_ROWS, n_total - start)
            table = _gen_chunk(chunk_idx, start, n)
            if writer is None:
                writer = pq.ParquetWriter(path, table.schema, compression="zstd")
            writer.write_table(table)
    finally:
        if writer is not None:
            writer.close()
    return path


def _gen_chunk(chunk_idx: int, start: int, n: int) -> pa.Table:
    rng = np.random.default_rng([SEED, chunk_idx])

    n_tok = rng.integers(1, 513, size=n, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    tokens_flat = rng.integers(0, VOCAB_SIZE, size=int(offsets[-1]), dtype=np.int32)

    source_idx = rng.choice(len(SOURCES), size=n, p=SOURCE_P)
    level_idx = rng.choice(len(LEVELS), size=n, p=LEVEL_P)
    service_idx = rng.integers(0, len(SERVICES), size=n)
    status = rng.choice(STATUS, size=n)
    uid = rng.integers(1, 10_000, size=n)
    nbytes = rng.integers(64, 1_048_576, size=n)
    ts_off = ((start + np.arange(n, dtype=np.int64)) * 7919) % (86400 * 30)
    word_i = rng.integers(0, len(WORDS), size=(n, 6))

    # fully vectorized string assembly (6M rows must generate in seconds,
    # not minutes — no per-row Python)
    import pandas as pd

    doc_id = np.char.add(
        "doc-", np.char.zfill((start + np.arange(n)).astype(str), 12)
    )
    srcs = np.array(SOURCES)[source_idx]
    lvls = np.array(LEVELS)[level_idx]
    svcs = np.array(SERVICES)[service_idx]
    ts_epoch = BASE_TS + ts_off
    iso = (
        pd.to_datetime(ts_epoch, unit="s", utc=True)
        .strftime("%Y-%m-%dT%H:%M:%SZ")
        .to_numpy(dtype=object)
        .astype(str)
    )
    wl = np.array(WORDS)
    cols = [wl[word_i[:, j]] for j in range(word_i.shape[1])]
    text = cols[0]
    for c in cols[1:]:
        text = np.char.add(np.char.add(text, " "), c)

    def cat(*parts):
        out = parts[0]
        for p in parts[1:]:
            out = np.char.add(out, p)
        return out

    message = cat(
        iso, " ", lvls, " [", svcs, "] user=", uid.astype(str),
        " status=", status.astype(str), " bytes=", nbytes.astype(str),
        " msg=", text,
    )

    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.string()),
            "tokens": pa.ListArray.from_arrays(pa.array(offsets), pa.array(tokens_flat)),
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array(srcs, pa.string()),
            "ts": pa.array(ts_epoch * 1_000_000, pa.timestamp("us", tz="UTC")),
            "message": pa.array(message, pa.string()),
        }
    )
