"""Custom aggregation functions — the general capability behind the
reference's ``AverageAggregate`` (Example4.scala:39-49).

The reference's UDAF contract (createAccumulator / add / merge /
getResult) is exactly Spark's partial → merge → final aggregate
lifecycle.  For aggregates Spark already ships (avg, min…), we use the
built-ins (ngsi_window_avg).  This module carries the escape hatch for
aggregates Spark does NOT ship, via Arrow-batched GROUPED_AGG pandas
UDFs — batch-columnar transfer, not per-row Python.

``geometric_mean`` is the demonstration aggregate: genuinely absent
from Spark's built-ins, still oracle-checkable (exp(avg(ln x))).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: exp(mean(log(v))) over positive values.

    Arrow ships each group's column as one pandas Series — the Python
    cost is per-group, not per-row.  NOTE on scale: GROUPED_AGG
    materializes each group in memory and (unlike JVM partial
    aggregation) shuffles raw rows, so at 100 TB prefer the algebraic
    rewrite exp(avg(ln(x))) with built-ins when the aggregate
    decomposes; this UDF is the pattern for when it doesn't."""
    import numpy as np

    pos = v[v > 0]
    if len(pos) == 0:
        return float("nan")
    return float(np.exp(np.log(pos.astype("float64")).mean()))
