"""End-to-end training export: shuffle → pack → shard, staged + resumable.

The terminal path of the pipeline, composed from the audited pieces:

1. **shuffle** — :func:`vector_spark.sharding.shuffle_assign` gives every
   doc a seeded pseudo-random position (reproducible, engine-checkable);
2. **pack** — :func:`vector_spark.packing.pack_sequences` concats the
   token stream IN SHUFFLED ORDER (``id_col="pos"`` — the dense shuffle
   position is the packing order, so consecutive sequences mix sources)
   and chunks it into fixed-length training sequences;
3. **shards** — sequences land as one Hive-style directory per shard
   (``seq_id % n_shards``, ascending ``seq_id`` within each writer task),
   ready for data-parallel loaders.

Each stage writes a parquet artifact and then immediately appends its
manifest row (the ``run_pipeline`` / ``run_curation`` contract: the row
lands only after the stage's data write succeeds, and BEFORE the next
stage starts, so the manifest always reflects durable state); re-running
a ``run_id`` skips committed stages, so a killed export resumes at the
failed stage without recomputing the shuffle or the pack.

Scale notes: the shuffle and the pack prefix-sum both run on narrow
projections (O(docs) rows of ~16-24 bytes); token bytes move exactly
twice in the pack (its documented lower bound) and once more into the
shard writers.  The per-stage parquet artifacts make the intermediate
state restartable AND auditable — at 10^12 docs each stage boundary is
where you'd checkpoint anyway.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.packing import pack_sequences
from vector_spark.sharding import _append_manifest_row, _fs_exists, shuffle_assign


def run_export(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str,
    seq_len: int = 128,
    n_shards: int = 4,
    seed: int = 42,
    eos: int | None = 0,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
) -> dict:
    """Run the staged export; returns {counts, skipped, path}."""
    manifest_path = os.path.join(out_dir, "_manifest")
    done: set[str] = set()
    if _fs_exists(spark, manifest_path):
        try:
            prior = spark.read.parquet(manifest_path)
            done = {
                r["stage"]
                for r in prior.filter(
                    (F.col("run_id") == run_id) & F.col("committed")
                )
                .select("stage")
                .collect()
            }
        except Exception:
            done = set()

    counts: dict[str, int] = {}
    skipped: list[str] = []

    def _stage(name: str, build, writer=None) -> DataFrame:
        path = os.path.join(out_dir, name)
        if name in done:
            skipped.append(name)
            out = spark.read.parquet(path)
            counts[name] = out.count()
            return out
        t0 = time.time()
        if writer is None:
            build().write.mode("overwrite").parquet(path)
        else:
            writer(build(), path)
        out = spark.read.parquet(path)
        n = out.count()
        counts[name] = n
        # append THIS stage's manifest row before the next stage starts, so
        # a crash in stage k+1 still resumes past stage k
        _append_manifest_row(
            spark,
            manifest_path,
            (run_id, name, path, n, int((time.time() - t0) * 1000), True),
        )
        return out

    shuffled = _stage(
        "shuffle",
        lambda: shuffle_assign(
            docs.select(id_col, tok_col), n_shards, seed, id_col
        ).select(id_col, tok_col, "pos"),
    )
    packed = _stage(
        "pack",
        lambda: pack_sequences(
            shuffled, seq_len, id_col="pos", tok_col=tok_col, eos=eos
        ),
    )
    _stage(
        "shards",
        lambda: packed.withColumn(
            "shard", (F.col("seq_id") % n_shards).cast("int")
        ),
        writer=lambda df, path: (
            df.repartition(n_shards, F.col("shard"))
            .sortWithinPartitions("shard", "seq_id")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(path)
        ),
    )

    return {
        "counts": counts,
        "skipped": skipped,
        "path": os.path.join(out_dir, "shards"),
    }
