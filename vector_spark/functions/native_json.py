"""Vector's `native_json` codec — the JSON twin of the native protobuf
wire format, fully JVM-side (no UDF).

The reference serializes an event as its serde JSON value
(lib/codecs/src/encoding/format/native_json.rs:37-50
`serde_json::to_value(&event)` / `to_writer`) and deserializes with the
inverse parse (lib/codecs/src/decoding/format/native_json.rs).  Vector's
`Event` enum is externally tagged lowercase, so a log event is the
envelope ``{"log": {<fields>}}`` (metric/trace variants analogous); this
module covers the log subset that matches `native_proto.py`'s Value
types (bytes→string, integer, float, boolean, null).

Unlike the protobuf codec (which needs byte-level mapInPandas), both
directions here stay in whole-stage codegen: encode is
``to_json(struct(struct(cols) AS log))``; decode is ``from_json`` with a
corrupt-record column, so malformed buffers surface on the
``_decode_error`` channel (same contract as the other deserializers)
without a Python worker in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def encode_native_json_rows(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """Each row -> one `value:string` JSON datum ``{"log": {...}}``.

    `to_json` drops NULL fields (ignoreNullFields default), matching
    serde's representation of an absent/None optional on the decode
    side (from_json yields NULL for missing keys).
    """
    cols = fields or df.columns
    log = F.struct(*[F.col(c) for c in cols]).alias("log")
    return df.select(F.to_json(F.struct(log)).alias("value"))


def decode_native_json_rows(
    df: DataFrame, schema: dict[str, str], src: str = "value"
) -> DataFrame:
    """Decode a native_json `value` column back into typed columns.

    ``schema`` maps field name -> Spark type string.  Malformed JSON (or
    a JSON value whose ``log`` branch is not an object) sets
    ``_decode_error='native_json: malformed'``; valid JSON that is a
    different event variant (metric/trace envelope) sets
    ``_decode_error='native_json: not a log event'``; either way the
    typed columns come back NULL instead of failing the task.
    """
    inner = ", ".join(f"`{k}` {t}" for k, t in schema.items())
    parsed = F.from_json(
        F.col(src),
        f"struct<log: struct<{inner}>, _corrupt: string>",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    tmp = df.withColumn("_p", parsed)
    err = (
        F.when(F.col("_p._corrupt").isNotNull(), F.lit("native_json: malformed"))
        .when(F.col("_p.log").isNull(), F.lit("native_json: not a log event"))
        .otherwise(F.lit(None).cast("string"))
    )
    out = [F.col(f"_p.log.`{k}`").alias(k) for k in schema]
    return tmp.select(*out, err.alias("_decode_error"))
