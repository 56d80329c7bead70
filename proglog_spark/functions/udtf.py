"""Table functions (UDTF surface) — Python UDTFs (Spark >= 4).

The reference has no user function surface at all (SURVEY §2.0b
"UDF/UDAF/UDTF — absent"). This module completes the custom-function
triple (row UDF → functions/vectors, aggregate → functions/udaf,
table → here) with a Python UDTF: one input row fans out to many
output rows through ``eval`` generators, planned by Catalyst as a
LATERAL join over a Python evaluation node.

Honest scale note: like every Python surface, a UDTF is the SLOW
path. The declared ``docs_udtf_ngrams`` query exists to pin the
plumbing end-to-end against an oracle; the exact same fan-out is
expressed JVM-side as ``explode(transform(sequence(...)))`` — see
queries.docs_contamination — which stays inside whole-stage codegen
and is what every hot-path operator in this repo actually uses.
UDTFs earn their cost only when the per-row expansion logic genuinely
cannot be written as array expressions (stateful tokenizers, external
format parsers).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, gram string")
class NGramsUDTF:
    """Emit (position, word n-gram) rows for one document.

    Positions are 0-based; a doc with fewer than ``n`` words emits
    nothing. Deterministic, so the declared query is oracle-checkable.
    """

    def eval(self, text: str, n: int):
        if text is None or n is None or n <= 0:
            return
        words = text.split(" ")
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i : i + n])


def register_ngrams_udtf(spark, name: str = "ngrams_udtf") -> str:
    """Register the n-gram UDTF for SQL LATERAL use; returns the name."""
    spark.udtf.register(name, NGramsUDTF)
    return name
