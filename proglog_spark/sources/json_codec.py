"""JSON record codec — the reference's HTTP API surface (O23).

The reference's HTTP prototype speaks JSON at the edge: produce is
``POST {"record": {"value": <base64>}}`` and consume returns
``{"record": {"value": <base64>, "offset": N}}``
(internal/server/http.go:14-30,32-78; Go's encoding/json base64-encodes
``[]byte`` fields automatically). This module is the Spark-native twin:
a pair of column-level transforms (``to_json``/``from_json`` +
``base64``/``unbase64``, all JVM-side whole-stage-codegen expressions —
no Python in the path) that convert between the log's record rows and
the wire JSON documents. Record shape follows api/v1/log.proto:7-12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# wire schema: value travels base64-encoded, like Go's []byte JSON form
WIRE_SCHEMA = T.StructType(
    [
        T.StructField(
            "record",
            T.StructType(
                [
                    T.StructField("offset", T.LongType()),
                    T.StructField("value", T.StringType()),  # base64
                    T.StructField("term", T.LongType()),
                    T.StructField("type", T.IntegerType()),
                ]
            ),
        )
    ]
)


def records_to_json(records: DataFrame) -> DataFrame:
    """Encode record rows to one wire JSON document per row
    (``{"record": {...}}``, value base64) in a column named ``json``.
    Offset order is not imposed here — the caller sorts if the wire
    needs ordered delivery, keeping the codec shuffle-free."""
    return records.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("offset"),
                    F.base64(F.col("value").cast("binary")).alias("value"),
                    F.col("term"),
                    F.col("type"),
                ).alias("record")
            )
        ).alias("json")
    )


def records_from_json(wire: DataFrame, json_col: str = "json") -> DataFrame:
    """Decode wire JSON documents back into record rows. Malformed
    documents are dropped — the HTTP twin returns 400 for those
    (http.go:36-39); batch semantics is skip-and-continue. Both
    failure layers are handled: non-JSON decodes to a NULL struct
    (from_json PERMISSIVE mode), and valid JSON carrying a missing or
    non-base64 ``value`` yields NULL from try_to_binary (plain
    unbase64 would abort the whole job under ANSI mode)."""
    rec = F.from_json(F.col(json_col), WIRE_SCHEMA)["record"]
    # explode(array(x)) is a Generate barrier: without it, Catalyst
    # collapses the projects and merges the validity predicates into
    # the upstream Filter, so from_json would be (a) duplicated per
    # predicate and (b) evaluated on every scanned row instead of the
    # rows surviving the caller's cheap pushed-down filters. A 1-item
    # explode keeps decode-once-then-filter ordering at any scale.
    return (
        wire.select(F.explode(F.array(rec)).alias("r"))
        .where(F.col("r").isNotNull())
        .select(
            F.col("r.offset").alias("offset"),
            F.try_to_binary(F.col("r.value"), F.lit("base64"))
            .cast("string")
            .alias("value"),
            F.col("r.term").alias("term"),
            F.col("r.type").alias("type"),
        )
        .where(F.col("value").isNotNull())
    )
