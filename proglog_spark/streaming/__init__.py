from proglog_spark.streaming.anomaly import streaming_trailing_anomaly
from proglog_spark.streaming.cdc import apply_cdc_stream, latest_per_key
from proglog_spark.streaming.consume import consume_stream, tail_follow
from proglog_spark.streaming.dedup import dedup_stream
from proglog_spark.streaming.derive import derive_log
from proglog_spark.streaming.distinct import (
    continuous_distinct_rollup,
    read_distinct_rollup,
)
from proglog_spark.streaming.joins import (
    enrich_stream,
    streaming_attribution_join,
    streaming_outer_attribution_join,
)
from proglog_spark.streaming.produce import produce_stream
from proglog_spark.streaming.rollup import continuous_rollup, read_rollup
from proglog_spark.streaming.asof import streaming_asof_join
from proglog_spark.streaming.sessions import streaming_sessionize
from proglog_spark.streaming.stateful import inactivity_alerts
from proglog_spark.streaming.windows import streaming_tumbling_counts

__all__ = [
    "apply_cdc_stream",
    "consume_stream",
    "continuous_distinct_rollup",
    "continuous_rollup",
    "dedup_stream",
    "derive_log",
    "enrich_stream",
    "inactivity_alerts",
    "latest_per_key",
    "produce_stream",
    "read_distinct_rollup",
    "read_rollup",
    "streaming_attribution_join",
    "streaming_outer_attribution_join",
    "streaming_asof_join",
    "streaming_sessionize",
    "streaming_trailing_anomaly",
    "streaming_tumbling_counts",
    "tail_follow",
]
