"""Sinks + encoding codecs.

Reference surface (SURVEY.md §2.5): ~40 delivery connectors sharing one
sink toolkit (src/sinks/util/): batching, key-partitioned batching,
templated paths, retries, adaptive concurrency.  In Spark the delivery
machinery IS the writer: batching = target file size, partitioned batching
= partitionBy, retries = task retries, acks = atomic commit protocol.
What remains worth re-expressing: the ENCODERS
(lib/codecs/src/encoding/format/: json, text, logfmt, csv) and the sink
kinds the fixtures use (file, console, blackhole).

Encoders are Column expressions producing one string per event; writers
take any DataFrame.  Templated sink paths ({{ field }} strftime templates,
src/template.rs:21,142-161 + file sink src/sinks/file/mod.rs:46-89) map to
partitionBy columns — a path template IS a partition spec in batch land.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --- encoders (lib/codecs/src/encoding/format/*) ---------------------------


def encode_json_rows(df: DataFrame) -> DataFrame:
    """json encoder: each event -> one JSON line (struct of all columns)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def encode_text_rows(df: DataFrame, field: str = "message") -> DataFrame:
    """text encoder: the message field verbatim (encoding/format/text.rs)."""
    return df.select(F.col(field).cast("string").alias("value"))


def encode_logfmt_rows(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """logfmt encoder: k=v pairs, keys in lexicographic order
    (encoding/format/logfmt.rs uses field order; rebuild pins sorted order
    for determinism — documented delta)."""
    cols = sorted(fields or df.columns)
    parts = [F.concat(F.lit(f"{c}="), F.col(c).cast("string")) for c in cols]
    return df.select(F.concat_ws(" ", *parts).alias("value"))


def encode_csv_rows(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """csv encoder: fixed field order, RFC-4180 quoting via to_csv
    (escape='"' doubles embedded quotes per the RFC; Spark's default
    backslash escape is NOT RFC-4180 and the reference's csv encoder is)."""
    cols = fields or df.columns
    return df.select(
        F.to_csv(F.struct(*[F.col(c) for c in cols]), {"escape": '"'}).alias("value")
    )


def encode_gelf_rows(
    df: DataFrame,
    host_col: str = "host",
    short_message_col: str = "message",
    ts_col: str | None = "ts",
    level_col: str | None = None,
    extra: list[str] | None = None,
) -> DataFrame:
    """gelf encoder (lib/codecs/src/encoding/format/gelf.rs): the GELF 1.1
    envelope — version/host/short_message required, timestamp as epoch
    seconds, level, and additional fields prefixed with underscore."""
    fields = [
        F.lit("1.1").alias("version"),
        F.col(host_col).cast("string").alias("host"),
        F.col(short_message_col).cast("string").alias("short_message"),
    ]
    if ts_col:
        fields.append(F.unix_timestamp(F.col(ts_col)).cast("double").alias("timestamp"))
    if level_col:
        fields.append(F.col(level_col).cast("int").alias("level"))
    for c in extra or []:
        fields.append(F.col(c).cast("string").alias(f"_{c}"))
    return df.select(F.to_json(F.struct(*fields)).alias("value"))


def encode_avro_rows(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """avro encoder (lib/codecs/src/encoding/format/avro.rs): each row's
    selected fields as one Avro-serialized binary value.

    Gated seam: uses Spark's own `to_avro` (JVM, codegen) — requires the
    ``spark-avro`` module jar on the classpath (``--packages
    org.apache.spark:spark-avro_2.13:<ver>``).  This sandbox ships core
    avro jars but not the module, so calling this here raises with that
    instruction (same gating pattern as the zstd codec).  A jar-free
    from-spec datum codec lives in ``functions/avro.py``
    (`encode_avro_rows(df, schema)` / `decode_avro_rows`) — same binary
    encoding, Python-side; prefer THIS function when the jar exists."""
    cols = fields or df.columns
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "encode_avro_rows needs the spark-avro module "
            "(--packages org.apache.spark:spark-avro_2.13)"
        ) from e
    try:
        return df.select(to_avro(F.struct(*[F.col(c) for c in cols])).alias("value"))
    except Exception as e:
        raise RuntimeError(
            "encode_avro_rows needs the spark-avro module jar on the "
            "classpath (--packages org.apache.spark:spark-avro_2.13)"
        ) from e


def encode_protobuf_rows(
    df: DataFrame, desc_file: str, message_name: str, fields: list[str] | None = None
) -> DataFrame:
    """protobuf encoder (Vector's `native` wire codec,
    lib/codecs/src/encoding/format/native.rs): each row's selected fields
    as one protobuf-serialized binary value via Spark's own `to_protobuf`
    (JVM, codegen) against a compiled descriptor file.

    Gated seam like :func:`encode_avro_rows`: needs the ``spark-protobuf``
    module jar (``--packages org.apache.spark:spark-protobuf_2.13``),
    absent in this sandbox."""
    cols = fields or df.columns
    try:
        from pyspark.sql.protobuf.functions import to_protobuf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "encode_protobuf_rows needs the spark-protobuf module "
            "(--packages org.apache.spark:spark-protobuf_2.13)"
        ) from e
    try:
        return df.select(
            to_protobuf(
                F.struct(*[F.col(c) for c in cols]), message_name, descFilePath=desc_file
            ).alias("value")
        )
    except Exception as e:
        raise RuntimeError(
            "encode_protobuf_rows needs the spark-protobuf module jar on "
            "the classpath (--packages org.apache.spark:spark-protobuf_2.13)"
        ) from e


# --- sinks -----------------------------------------------------------------


def write_file_sink(
    df: DataFrame,
    path: str,
    encoding: str = "json",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    text_field: str = "message",
    target_file_rows: int | None = None,
) -> None:
    """file sink (src/sinks/file/mod.rs): encoded lines; ``partition_by``
    is the batch rendering of the path template; ``target_file_rows``
    stands in for BatchConfig.max_events (sink batching,
    src/sinks/util/batch.rs:96-116)."""
    def value_col(cols: list[str]) -> Column:
        if encoding == "json":
            return F.to_json(F.struct(*cols))
        if encoding == "text":
            return F.col(text_field).cast("string")
        if encoding == "logfmt":
            parts = [F.concat(F.lit(f"{c}="), F.col(c).cast("string")) for c in sorted(cols)]
            return F.concat_ws(" ", *parts)
        if encoding == "csv":
            return F.to_csv(F.struct(*cols), {"escape": '"'})
        raise ValueError(f"unknown encoding {encoding!r}")

    if partition_by:
        payload = [c for c in df.columns if c not in partition_by]
        encoded = df.select(*partition_by, value_col(payload).alias("value"))
    else:
        encoded = df.select(value_col(df.columns).alias("value"))
    writer = encoded.write.mode(mode)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", target_file_rows)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.text(path) if not partition_by else writer.format("text").save(path)


def write_parquet_sink(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Table sink seam (parquet now; fmt='iceberg' + saveAsTable when the
    runtime jar is present — none in this sandbox, documented fallback)."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_blackhole(df: DataFrame) -> int:
    """blackhole sink (src/sinks/blackhole/): swallow + report count."""
    df.write.format("noop").mode("overwrite").save()
    return df.count()


def write_console(df: DataFrame, n: int = 20, encoding: str = "json") -> None:
    """console sink: encoded sample to stdout."""
    enc = {"json": encode_json_rows, "logfmt": encode_logfmt_rows}[encoding]
    for r in enc(df).limit(n).collect():
        print(r["value"])


def write_templated_file_sink(
    df: DataFrame,
    base_path: str,
    template: str,
    ts_col: str | None = None,
    encoding: str = "json",
    mode: str = "overwrite",
) -> None:
    """File sink with a per-event path template — the direct rendering of
    the reference's templated sink path ({{ field }} + strftime,
    src/sinks/file/mod.rs:46-89): the rendered template becomes a partition
    column, so each distinct rendered path is one output directory."""
    from vector_spark.template import render_template

    keyed = df.withColumn("_path", render_template(template, ts_col=ts_col))
    write_file_sink(keyed, base_path, encoding=encoding, partition_by=["_path"], mode=mode)
