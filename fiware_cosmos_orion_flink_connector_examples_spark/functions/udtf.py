"""Python user-defined TABLE function (UDTF) — the third member of the
UDF/UDAF/UDTF capability triple (SURVEY.md §2.2: the reference's
``flatMap`` lambdas, Example1.scala:21 / Example5.scala:25, are its
de-facto UDTF surface; Spark 4 exposes the real thing).

Like every row-at-a-time Python path, a UDTF is the SLOW path — the
engine's production rule stays "explode + built-in expressions"
(operators/text.py does token stats fully JVM-side).  This module
exists to cover the API surface: arbitrary one-row→N-rows Python
logic, registered into the SQL namespace and callable via LATERAL —
for logic that genuinely cannot be expressed as column expressions.
Keep inputs to a UDTF pruned (project only the columns it reads) so
the Arrow transfer stays narrow.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, n int")
class TokenCountsUDTF:
    """Per-document token histogram: yields (token, count) rows in
    deterministic (sorted-token) order.  Equivalent relational form:
    explode(tokens) → groupBy — use that at scale; this is the
    API-surface demonstration."""

    def eval(self, text: str):
        if text is None:
            return
        from collections import Counter

        for tok, n in sorted(Counter(text.split()).items()):
            yield tok, int(n)


def register_udtfs(spark) -> None:
    """Install the engine's UDTFs into the session's SQL namespace."""
    spark.udtf.register("token_counts", TokenCountsUDTF)
