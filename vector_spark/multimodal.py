"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions
over ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (seeded by the content hash) produces
stable feature vectors — so the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) is fully real and testable.

Scale design: mapInPandas streams Arrow batches (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch) so executor memory is
O(batch), not O(partition) — required when rows carry multi-MB blobs.
Partition by a size-aware key upstream (repartitionByRange on blob size)
to balance decode cost; the reference's EventArray CHUNK_SIZE=1000
micro-batching (src/source_sender/mod.rs:25) maps to exactly this Arrow
batch knob.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),       # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),       # image/video
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True), # audio
        StructField("duration_ms", LongType(), True),    # audio/video
        StructField("payload", BinaryType(), True),      # the opaque blob
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _synth_media_rows(n: int = 64, seed: int = 7) -> list[tuple]:
    """The deterministic row set shared by :func:`synth_media` (Spark DF)
    and :func:`ensure_media_parquet` (the oracle's parquet twin)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8).tobytes()
        rows.append(
            (
                f"m-{i:06d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(16, 512)) if kind != "audio" else None,
                16000 if kind == "audio" else None,
                int(rng.integers(100, 60000)) if kind != "image" else None,
                payload,
            )
        )
    return rows


def synth_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic synthetic media table (seeded payload bytes)."""
    rows = _synth_media_rows(n, seed)
    # few rows, blob-heavy: a handful of partitions avoids paying one
    # Python-worker startup per (mostly empty) default partition
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(max(2, n // 32))


def ensure_media_parquet(n: int = 64, seed: int = 7, path: str | None = None) -> str:
    """Write (once) the synthetic media table as parquet so the DuckDB
    oracle can recompute byte lengths and content hashes over the SAME
    payload blobs the Spark query reads (closes the round-2 rows-only gap
    on media_features)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = path or os.path.join(
        os.environ.get("SPARK_GRAFT_DATA_ROOT", "/root/repo/data/tokenlogs"),
        "..", "media", f"media_n{n}_s{seed}.parquet",
    )
    path = os.path.abspath(path)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        rows = _synth_media_rows(n, seed)
        cols = list(zip(*rows))
        table = pa.table(
            {
                "media_id": pa.array(cols[0], pa.string()),
                "kind": pa.array(cols[1], pa.string()),
                "mime": pa.array(cols[2], pa.string()),
                "width": pa.array(cols[3], pa.int32()),
                "height": pa.array(cols[4], pa.int32()),
                "sample_rate": pa.array(cols[5], pa.int32()),
                "duration_ms": pa.array(cols[6], pa.int64()),
                "payload": pa.array(cols[7], pa.binary()),
            }
        )
        pq.write_table(table, path)
    return path


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature extractor: PRNG seeded by content hash."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/libvips (absent in this container)."""
    if fake:
        return _fake_decode(payload, 8)
    raise NotImplementedError("image decode requires PIL/pyvips (not installed)")


def extract_features(df: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    The pandas iterator signature is the real production shape; only the
    innermost decode call is faked.  Output is exactly FEATURE_SCHEMA.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            shas = []
            nbytes = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                # fingerprint = sha256 of the lowercase-hex rendering: the
                # DuckDB oracle can only hash VARCHAR, so hex-normalizing
                # first makes the digest engine-portable
                # (sha256(lower(hex(payload))) on the oracle side).
                shas.append(hashlib.sha256(b.hex().encode()).hexdigest())
                nbytes.append(len(b))
                if fake:
                    feats.append(_fake_decode(b, dim).tolist())
                else:  # pragma: no cover - real decoder path
                    feats.append(decode_image(b).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "content_sha": shas,
                    "features": feats,
                }
            )

    return df.mapInPandas(_run, schema=FEATURE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no decode): per kind, count/bytes."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
        )
        .orderBy("kind")
    )
