"""Event-time as-of join — the operator the reference only simulates
(lead() at day granularity + equi-join, sensor_data_regression.py:42-46;
SURVEY.md §2.3 "north-star" note).

Spark has no native ASOF JOIN; this is the standard composition:
union both sides tagged, one sort within the entity partition, carry the
right side's latest values forward, keep only left rows. Exactly one
shuffle on the entity key — same cost as the sort-merge join Spark would
pick for an equi-join, so it scales to 100 TB the same way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "",
) -> DataFrame:
    """Backward as-of: for each left row, the most recent right row with
    ``right_ts <= left_ts`` within the same ``on`` key.

    ``value_cols`` are the right-side columns to carry. If several right
    rows share the same key+timestamp, pre-aggregate ``right`` first for
    deterministic output.
    """
    out_cols = [c + suffix for c in value_cols]
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)],
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for o in out_cols:
        l = l.withColumn(o, F.lit(None).cast(r.schema[o].dataType))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # right rows (side=0) sort before left rows at the same timestamp,
    # so an exactly-coincident right row IS visible to the left row.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for o in out_cols:
        unioned = unioned.withColumn(o, F.last(o, ignorenulls=True).over(w))
    return unioned.where(F.col("__side") == 1).drop("__ts", "__side")
