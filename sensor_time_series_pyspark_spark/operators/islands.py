"""Gaps-and-islands: interval merging and consecutive-run detection.

Absent from the reference (its alarm episodes are implicit in the
message-code stream, sensor_data_etl.py:73-76) but fundamental for
sensor uptime/downtime reporting: collapse overlapping maintenance
windows, find unbroken daily-reporting streaks per terminal.

Both operators are the classic two-window composition — a running-max /
row-number pass to label islands, then one hash aggregate per island —
so the cost is ONE shuffle on the entity key (the sort and the groupBy
share the partitioning). No UDFs, no iteration: scales like any other
window aggregate, and AQE handles skewed entities.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    by: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Collapse overlapping/touching intervals per ``by`` key into
    disjoint islands.

    A row starts a new island iff its start exceeds the running maximum
    of all previous ends within the key (ordered by start, end — ties
    cannot split an island, since equal starts always overlap, so the
    labeling is deterministic under any tie order). Touching intervals
    (next.start == prev.end) merge — use half-open inputs if you want
    them kept apart.

    Output: [*by], island_start, island_end, n_intervals.
    """
    keys = [F.col(k) for k in by]
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    prev = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    flagged = df.withColumn(
        "__new",
        F.when(
            F.col(start_col) > F.max(end_col).over(prev), F.lit(1)
        ).otherwise(F.lit(0)),  # first row per key: max over empty = NULL
    ).withColumn("__island", F.sum("__new").over(run))
    return flagged.groupBy(*by, "__island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    ).drop("__island")


def streaks(
    df: DataFrame,
    by: Sequence[str],
    date_col: str,
    min_length: int = 1,
) -> DataFrame:
    """Maximal runs of CONSECUTIVE calendar days per key (reporting
    streaks). Duplicate (key, date) rows collapse first.

    The anchor trick: over distinct dates ordered ascending,
    ``date - row_number() days`` is constant within a consecutive run —
    group by it. One shuffle (distinct and window share the key
    partitioning; the final agg reuses it).

    Output: [*by], streak_start, streak_end, n_days (≥ ``min_length``).
    """
    d = df.select(*by, F.col(date_col).cast("date").alias("__d")).distinct()
    w = Window.partitionBy(*[F.col(k) for k in by]).orderBy("__d")
    anchored = d.withColumn(
        "__anchor", F.date_sub("__d", F.row_number().over(w))
    )
    out = (
        anchored.groupBy(*by, "__anchor")
        .agg(
            F.min("__d").alias("streak_start"),
            F.max("__d").alias("streak_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("__anchor")
    )
    if min_length > 1:
        out = out.where(F.col("n_days") >= min_length)
    return out


def null_runs(
    df: DataFrame,
    by: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-series longest NULL run — the "how broken is this sensor"
    diagnostic: maximal stretches of consecutive missing readings,
    reported as count + run length stats per series.

    Same single-shuffle islands shape as streaks(): a running count of
    non-null rows anchors each null row to its island (rows in one
    unbroken null stretch share the anchor), then one hash aggregate
    per island and one per series. The sort and both aggregates share
    the entity partitioning.

    Output: [*by], n_runs, longest_run, total_nulls.
    """
    keys = [F.col(k) for k in by]
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*keys).orderBy(*order)
    anchored = df.select(
        *keys,
        F.col(value_col).alias("__v"),
        F.count(value_col).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__anchor"),
    ).where(F.col("__v").isNull())
    runs = anchored.groupBy(*[F.col(k) for k in by], F.col("__anchor")).agg(
        F.count(F.lit(1)).alias("__len")
    )
    return runs.groupBy(*[F.col(k) for k in by]).agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max("__len").alias("longest_run"),
        F.sum("__len").alias("total_nulls"),
    )
