"""JSON wire codec (O23 HTTP edge, http.go:14-30): losslessness and
malformed-document handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from proglog_spark.sources import json_codec


def _records(spark, rows):
    return spark.createDataFrame(
        rows, "offset long, value string, term long, type int"
    )


def test_roundtrip_lossless_including_unicode(spark):
    rows = [
        (0, "plain", 1, 5),
        (1, 'quotes"and\\slashes', 2, 3),
        (2, "unicode: café 日本語 \U0001f600", 0, 1),
        (3, "", 4, 0),
    ]
    wire = json_codec.records_to_json(_records(spark, rows))
    back = json_codec.records_from_json(wire).orderBy("offset").collect()
    assert [tuple(r) for r in back] == rows


def test_wire_form_is_base64_envelope(spark):
    doc = json_codec.records_to_json(_records(spark, [(7, "hi", 0, 1)])).first().json
    # Go encoding/json form: {"record":{...,"value":<base64("hi")>}}
    assert '"record"' in doc and '"aGk="' in doc and '"offset":7' in doc


def test_malformed_documents_are_dropped(spark):
    wire = spark.createDataFrame(
        [("not json at all",), ('{"record":{"offset":5,"value":"aGk=","term":0,"type":1}}',)],
        "json string",
    )
    got = json_codec.records_from_json(wire).collect()
    assert [tuple(r) for r in got] == [(5, "hi", 0, 1)]


def test_invalid_base64_value_is_dropped_not_fatal(spark):
    """Valid JSON whose value is not base64 must be skipped like any
    other malformed document — not abort the job (ANSI unbase64
    would)."""
    wire = spark.createDataFrame(
        [
            ('{"record":{"offset":1,"value":"!!!notb64","term":0,"type":1}}',),
            ('{"record":{"offset":2,"value":"aGk=","term":0,"type":1}}',),
        ],
        "json string",
    )
    got = json_codec.records_from_json(wire).collect()
    assert [tuple(r) for r in got] == [(2, "hi", 0, 1)]
