"""Custom aggregates (UDAF surface) — grouped-agg Pandas UDFs.

The reference has no user function surface at all (payloads are opaque
bytes; SURVEY §2.0b "UDF/UDAF/UDTF — absent"). This module
demonstrates the Spark-native custom-aggregate path: an Arrow-batched
``pandas_udf`` in GROUPED_AGG mode, which Catalyst plans like any
aggregate (partial shuffle by group key, one Python evaluation per
group batch).

Honest scale note: a Python UDAF is the SLOW path. Every reduction in
the declared surface uses JVM builtins (`min/max/count/percentile`);
a grouped-agg UDF ships the whole group's column through Arrow and
cannot do map-side partial aggregation, so the shuffle carries raw
rows, not partial states. Reach for it only when the aggregate
genuinely does not exist as a builtin (custom robust statistics,
weighted sketches); the declared ``docs_median_length`` query exists
to pin the plumbing end-to-end against an oracle, not to recommend it
over ``F.percentile``.

NB: pandas is imported at module top — string annotations on
pandas_udf resolve in module globals under
``from __future__ import annotations``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median of the group (numpy partial-sort per Arrow batch)."""
    return float(v.median())
