"""Gap-based sessionization (alarm-episode grouping, SURVEY.md §2.11
north star). Batch variant: lag + cumulative-sum over a per-entity
window. The streaming twin is ``F.session_window`` (streaming/ingest.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    partition_by: Sequence[str],
    gap_seconds: int,
    session_col: str = "session_seq",
) -> DataFrame:
    """Add a per-entity session sequence number: a new session starts
    when the gap since the previous event exceeds ``gap_seconds``.

    One shuffle (by entity key); the cumulative sum runs inside the
    sorted partition.
    """
    w = Window.partitionBy(*partition_by).orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.col(ts_col).cast("double") - prev_ts.cast("double")) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*partition_by).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new", is_new).withColumn(
        session_col, F.sum("__new").over(running)
    ).drop("__new")
