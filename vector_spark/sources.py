"""Sources (scans) + decoding codecs.

Reference surface (SURVEY.md §2.4): 38 network/file sources whose batch
analogue is a table/file scan, plus shared decoding codecs
(lib/codecs/src/decoding/): framing = newline / character-delimited /
length-prefixed / octet-counting; deserializers = bytes, json, syslog,
native_json, gelf.

Spark-first mapping: ingestion IS `spark.read` — the connector zoo
collapses into format + framing + deserializer:

- `file` source (src/sources/file.rs) -> read_lines / read_json_lines;
  fingerprint checkpoints (lib/file-source/src/checkpointer.rs) ->
  pipeline manifest table
- `kafka`/`socket`/`http_server` -> out of batch scope; an Iceberg/parquet
  landing table replaces them (north_rule is batch-over-table)
- `demo_logs` (src/sources/demo_logs.rs) -> datagen.ensure_corpus
- syslog source (src/sources/syslog.rs) -> read_lines + decode_syslog

Every decoder is a Column expression (JVM, codegen); a malformed line
yields NULL fields + `_decode_error`, the sources' invalid-frame drop path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.functions.grok import CANNED, grok_columns, grok_matched


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited framing (decoding/framing/newline_delimited.rs):
    one event per line, raw bytes in `message` + lineage columns
    (log_schema defaults: message/source_type, log_schema.rs:86-106)."""
    return (
        spark.read.text(path)
        .withColumnRenamed("value", "message")
        .withColumn("source_type", F.lit("file"))
        .withColumn("file", F.input_file_name())
    )


def read_character_delimited(
    spark: SparkSession, path: str, delimiter: str
) -> DataFrame:
    """Character-delimited framing: whole file split on a delimiter
    (decoding/framing/character_delimited.rs)."""
    whole = spark.read.text(path, wholetext=True)
    return (
        whole.select(
            F.explode(F.split(F.col("value"), F.lit(delimiter), -1)).alias("message")
        )
        .filter(F.length("message") > 0)
        .withColumn("source_type", F.lit("file"))
    )


def read_json_lines(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON deserializer over newline framing (decoding/format/json.rs).
    With an explicit schema malformed rows surface via _corrupt_record."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path).withColumn("source_type", F.lit("json_file"))


def read_csv_table(
    spark: SparkSession, path: str, schema: str | None = None, header: bool = True, sep: str = ","
) -> DataFrame:
    reader = spark.read.option("header", header).option("sep", sep)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_table(spark: SparkSession, path_or_name: str, fmt: str = "parquet") -> DataFrame:
    """Table scan seam: parquet today, `fmt='iceberg'` + a table name when
    the Iceberg runtime jar is on the classpath (none in this sandbox —
    documented fallback; the pipeline code is format-agnostic)."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path_or_name)
    return spark.read.format(fmt).load(path_or_name)


def frame_octet_counting(df: DataFrame, src: str = "payload") -> DataFrame:
    """Octet-counting framing (decoding/framing/octet_counting.rs; RFC 6587
    syslog TCP): the stream is ``<LEN> <MSG>`` repeated, LEN = byte length
    of MSG.  Sequential *within* a payload (inherent to the framing — the
    reference's per-connection framer is the same scan), parallel across
    payload rows; runs as an Arrow-batched ``mapInPandas``.  A malformed
    prefix stops the scan and surfaces the tail in ``_decode_error``
    (invalid-frame drop path)."""
    import pandas as pd

    keep = [c for c in df.columns if c != src]
    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes if c != src]
        + ["frame_idx int", "message string", "_decode_error string"]
    )

    def _frames(batches):
        for pdf in batches:
            rows = []
            # zip over plain lists, not iterrows: per-row Series construction
            # is the slow idiom (~10x, measured in BENCH.md); the per-payload
            # sequential scan is inherent to the framing
            for buf, *kv in zip(pdf[src].tolist(), *(pdf[c].tolist() for c in keep)):
                buf, pos, idx = buf or "", 0, 0
                while pos < len(buf):
                    sp = buf.find(" ", pos)
                    head = buf[pos:sp] if sp != -1 else ""
                    if sp == -1 or not head.isdigit():
                        rows.append(kv + [idx, None, f"bad frame at {pos}"])
                        break
                    n = int(head)
                    msg = buf[sp + 1 : sp + 1 + n]
                    err = None if len(msg) == n else f"truncated frame at {pos}"
                    rows.append(kv + [idx, msg, err])
                    if err:
                        break
                    pos, idx = sp + 1 + n, idx + 1
            yield pd.DataFrame(rows, columns=keep + ["frame_idx", "message", "_decode_error"])

    return df.mapInPandas(_frames, out_schema)


def frame_length_delimited(df: DataFrame, src: str = "payload") -> DataFrame:
    """Length-delimited framing (decoding/framing/length_delimited.rs):
    4-byte big-endian length prefix + payload, repeated, over a ``binary``
    column.  Same execution shape as :func:`frame_octet_counting`."""
    import pandas as pd

    keep = [c for c in df.columns if c != src]
    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes if c != src]
        + ["frame_idx int", "message binary", "_decode_error string"]
    )

    def _frames(batches):
        for pdf in batches:
            rows = []
            for raw, *kv in zip(pdf[src].tolist(), *(pdf[c].tolist() for c in keep)):
                buf = bytes(raw or b"")
                pos, idx = 0, 0
                while pos < len(buf):
                    if pos + 4 > len(buf):
                        rows.append(kv + [idx, None, f"short prefix at {pos}"])
                        break
                    n = int.from_bytes(buf[pos : pos + 4], "big")
                    msg = buf[pos + 4 : pos + 4 + n]
                    err = None if len(msg) == n else f"truncated frame at {pos}"
                    rows.append(kv + [idx, msg, err])
                    if err:
                        break
                    pos, idx = pos + 4 + n, idx + 1
            yield pd.DataFrame(rows, columns=keep + ["frame_idx", "message", "_decode_error"])

    return df.mapInPandas(_frames, out_schema)


# --- deserializers (decoding/format/*) -------------------------------------

# RFC 5424-ish syslog line (decoding/format/syslog.rs; same shape as the
# canned grok in functions/grok.py)
_SYSLOG = CANNED["syslog_5424ish"]


def decode_syslog(df: DataFrame, src: str = "message") -> DataFrame:
    """Syslog deserializer: priority/version/timestamp/hostname/appname/
    procid/msgid/message fields; facility = pri >> 3, severity = pri & 7."""
    parsed = df.select(
        "*", *grok_columns(src, _SYSLOG, prefix="syslog_"),
        F.when(~grok_matched(src, _SYSLOG), F.lit("invalid syslog")).alias("_decode_error"),
    )
    return parsed.withColumn(
        "syslog_facility", (F.col("syslog_priority") / 8).cast("int")
    ).withColumn("syslog_severity", (F.col("syslog_priority") % 8).cast("int"))


def decode_json_field(df: DataFrame, schema: str, src: str = "message") -> DataFrame:
    """JSON deserializer as a transform over an already-framed column."""
    return df.withColumn("_parsed", F.from_json(F.col(src), schema)).select(
        "*", "_parsed.*"
    ).drop("_parsed")


def decode_gelf(df: DataFrame, src: str = "message") -> DataFrame:
    """GELF deserializer (decoding/format/gelf.rs): fixed envelope fields;
    host + short_message required, level defaults to 1 (alert)."""
    schema = (
        "version string, host string, short_message string, full_message string,"
        " timestamp double, level int"
    )
    out = decode_json_field(df, schema, src)
    return out.withColumn("level", F.coalesce(F.col("level"), F.lit(1))).withColumn(
        "_decode_error",
        F.when(
            F.col("host").isNull() | F.col("short_message").isNull(),
            F.lit("invalid gelf: missing host/short_message"),
        ),
    )
