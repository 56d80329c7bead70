from proglog_spark.sources.tables import (
    TABLES,
    load_all,
    load_table,
    register_views,
)
from proglog_spark.sources.records import records_from_events

__all__ = ["TABLES", "load_all", "load_table", "register_views", "records_from_events"]
