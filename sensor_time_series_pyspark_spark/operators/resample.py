"""Time-bucket resampling (reference T1: pandas ``resample('30T').mean()``,
pandas_timeseries_forecast.py:65) as a native tumbling-window aggregate —
one hash aggregate, streaming-compatible (the same expression works under
``readStream`` + watermark)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
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
