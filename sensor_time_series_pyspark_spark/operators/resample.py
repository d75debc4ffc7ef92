"""Time-bucket resampling (reference T1: pandas ``resample('30T').mean()``,
pandas_timeseries_forecast.py:65) as a native tumbling-window aggregate —
one hash aggregate, streaming-compatible (the same expression works under
``readStream`` + watermark)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    bucket_col: str = "bucket",
) -> DataFrame:
    """Tumbling-window aggregate: one row per (``keys``, bucket).

    ``aggs`` default to nothing — pass e.g. ``[F.avg('value').alias('avg_value')]``.
    Bucket = window start (floor of epoch time to the width, 1970 origin).
    """
    aggs = list(aggs) or [F.count(F.lit(1)).alias("n")]
    win = F.window(ts_col, width)
    return (
        df.groupBy(win, *keys)
        .agg(*aggs)
        .withColumn(bucket_col, F.col("window.start"))
        .drop("window")
    )


def ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    width: str,
    keys: Sequence[str] = (),
    bucket_col: str = "bucket",
) -> DataFrame:
    """Open/high/low/close bars per tumbling bucket — the standard
    downsampled view of a dense series (sensor telemetry, ticks).

    open/close are ``min_by``/``max_by`` on the timestamp (single hash
    aggregate — no window sort, no self-join back to the first/last
    row), so the whole bar is ONE map-side-combinable aggregation, the
    same shuffle shape as ``resample``. Deterministic when (keys, ts)
    is unique; at ties Spark/DuckDB both pick an arbitrary row, so key
    on a unique series id for oracle comparisons.
    """
    win = F.window(ts_col, width)
    return (
        df.groupBy(win, *keys)
        .agg(
            F.min_by(value_col, ts_col).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, ts_col).alias("close"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .withColumn(bucket_col, F.col("window.start"))
        .drop("window")
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    width_seconds: int,
    keys: Sequence[str] = (),
    bucket_col: str = "bucket",
) -> DataFrame:
    """Time-weighted average per tumbling bucket under LOCF (last
    observation carried forward): each sample's value is weighted by
    how long it was "in effect" — until the next sample or the bucket's
    end, whichever is first. The honest mean for irregularly-sampled
    series, where the plain ``avg`` over-weights bursts (the
    TimescaleDB/InfluxDB ``time_weight('LOCF')`` semantic).

    Weights are integer seconds and the weighted sum uses exact decimal
    arithmetic, so the result is engine-portable (q70's oracle).
    Plan shape: one lag/lead window per series + one hash aggregate —
    the window partitions on the series keys, so parallelism is
    per-series (fine: series count ≫ cores at scale).
    """
    from pyspark.sql import Window

    t = F.col(ts_col).cast("long")
    bucket_start = (F.floor(t / width_seconds) * width_seconds).cast("long")
    bucket_end = bucket_start + width_seconds
    w = Window.partitionBy(*keys).orderBy(t)
    next_t = F.lead(t).over(w)
    weight = F.least(F.coalesce(next_t, bucket_end), bucket_end) - t
    base = df.select(
        *keys,
        F.timestamp_seconds(bucket_start).alias(bucket_col),
        F.col(value_col).alias("__v"),
        weight.alias("__w"),
    )
    wsum = F.sum((F.col("__v") * F.col("__w")).cast("decimal(38,6)"))
    return base.groupBy(*keys, bucket_col).agg(
        (wsum.cast("double") / F.sum("__w")).alias("twa"),
        F.sum("__w").alias("covered_seconds"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def hopping_resample(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    bucket_col: str = "bucket",
) -> DataFrame:
    """Hopping (sliding) window aggregate: one row per (keys, window)
    where windows of ``width`` start every ``slide`` — the smoothed
    trend view (e.g. "1-hour average, updated every 15 minutes").

    ``F.window(ts, width, slide)`` replicates each row into its
    width/slide containing windows BEFORE the aggregation — the
    replication happens map-side inside the generated Expand node, so
    the shuffle carries partial aggregates per (key, window), not
    width/slide copies of the raw rows. This is the plan Catalyst
    builds natively; the same expression is streaming-compatible under
    a watermark. Requires width to be a multiple of slide (Spark
    enforces divisibility of windows into slides).
    """
    aggs = list(aggs) or [F.count(F.lit(1)).alias("n")]
    win = F.window(ts_col, width, slide)
    return (
        df.groupBy(win, *keys)
        .agg(*aggs)
        .withColumn(bucket_col, F.col("window.start"))
        .drop("window")
    )


def densify_locf(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Densify an irregular series onto a regular grid with
    last-observation-carried-forward fill — the `fill(previous)` /
    `time_bucket_gapfill` shape every time-series engine exposes.

    Per entity, grid points run from floor(min ts) to floor(max ts) in
    ``step_seconds`` strides (epoch-integer floors — portable). The
    fill is NOT a per-gridpoint as-of lookup (that's a range join per
    point); instead grid rows union with observations and ONE
    last_value(ignorenulls) window pass per entity carries values
    forward — same single-shuffle shape as ffill. Observations at a
    grid timestamp win over the carried value (is_grid orders after
    observations at equal epoch).

    Grid size is data-driven per entity (sequence() on integers), so a
    sparse entity costs little and a long-lived one densifies fully —
    no global calendar cross join.

    Output: [*entity_cols], bucket_ts, value.
    """
    keys = list(entity_cols)
    # observations keyed by exact epoch micros for ordering; grid rows
    # carry NULL value and sort AFTER same-instant observations so LOCF
    # prefers the real reading.
    obs = df.select(
        *keys,
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.lit(0).alias("__is_grid"),
        F.col(value_col).alias("__v"),
    )
    spans = df.groupBy(*keys).agg(
        F.expr(f"min(unix_micros({ts_col})) div {step_seconds * 1_000_000}")
        .alias("__b0"),
        F.expr(f"max(unix_micros({ts_col})) div {step_seconds * 1_000_000}")
        .alias("__b1"),
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__b0"), F.col("__b1"))
        ).alias("__bucket"),
    ).select(
        *keys,
        (F.col("__bucket") * F.lit(step_seconds * 1_000_000)).alias("__us"),
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast(dict(df.dtypes)[value_col]).alias("__v"),
    )
    unioned = obs.unionByName(grid)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__us", "__is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "__f", F.last("__v", ignorenulls=True).over(w)
    )
    return (
        filled.where(F.col("__is_grid") == 1)
        .select(
            *keys,
            F.timestamp_micros(F.col("__us")).alias("bucket_ts"),
            F.col("__f").alias("value"),
        )
    )
