from proglog_spark.log.offsets import assign_dense_offsets
from proglog_spark.log.table import LogTable, RECORD_SCHEMA

__all__ = ["LogTable", "RECORD_SCHEMA", "assign_dense_offsets"]
