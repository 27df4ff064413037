"""Custom aggregations — the reference's accumulator contract on Arrow.

The reference's window/aggregate accumulators expose add/merge/end
(`vendor/jx_python/windows.py:27-52`, registry :322-333).  In Spark, partial
aggregation (add) and combiner merge happen inside the engine; a custom
aggregate is a GROUPED_AGG pandas UDF that sees each group's values as an
Arrow batch.  Built-ins cover the whole es52 aggregate surface
(`vendor/jx_elasticsearch/es52/util.py:97-124`); these are the escape-hatch
examples for genuinely custom math.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.StringType())
def mode_agg(v: pd.Series) -> str:
    """Most frequent value (ties -> lexicographically smallest), the
    reference's count_values argmax."""
    if v.empty:
        return None
    counts = v.value_counts()  # drops NaN: an all-null group ends up empty
    if counts.empty:
        return None
    top = counts[counts == counts.max()]
    return sorted(top.index)[0]


@pandas_udf(T.DoubleType())
def trimmed_mean_agg(v: pd.Series) -> float:
    """10%-trimmed mean — analog of the reference's middle-80 stats
    (`_Stats(middle=0.8)`, vendor/jx_python/windows.py:122-153)."""
    if v.empty:
        return None
    x = v.dropna().sort_values()
    if x.empty:
        return None
    k = int(len(x) * 0.1)
    trimmed = x.iloc[k: len(x) - k] if len(x) > 2 * k else x
    return float(trimmed.mean())
