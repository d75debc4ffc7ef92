"""Time-series gap detection: which expected sample buckets never
arrived, per series.

The reference handles gaps only *after* resampling, by imputing inside
pandas (ffill `/root/reference/pandas_timeseries_forecast.py:65`,
interpolate `/root/reference/spark_pandas_timeseries_forecast.py:34-35`)
— it can say "this bucket's mean is missing" but never report the gap
itself. Monitoring a sensor fleet needs the complement: the explicit
list of (series, bucket) holes, e.g. to alert on dead terminals.

Spark-first shape: bucket each observation (epoch-second floor), take
per-series min/max span, generate the expected bucket grid with
``sequence`` + ``explode`` (rows never leave the JVM), and left-anti
join the observed buckets — two shuffles total (span agg, anti join),
no UDF, no driver-side loop.

Scale: the generated grid is bounded by span/width per series, NOT by
input rows — 100 TB of dense readings with a 30-min grid over a year is
only ~17k rows per series. For series with unbounded history, pass a
time-bounded ``df`` (partition-pruned by date) so the span stays sane.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_buckets(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    width_seconds: int = 1800,
) -> DataFrame:
    """Expected-minus-observed bucket grid per series.

    Output: (*keys, bucket) — one row per bucket of width
    ``width_seconds`` that lies inside the series' [min, max] bucket
    span but contains no observation. Series with a single bucket
    produce no rows (their span has no interior).
    """
    w = int(width_seconds)
    bucket = (F.floor(F.col(ts_col).cast("long") / w) * w).cast("long")
    observed = df.select(*keys, bucket.alias("__b")).distinct()
    spans = observed.groupBy(*keys).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    expected = spans.select(
        *keys,
        F.explode(F.sequence("__lo", "__hi", F.lit(w))).alias("__b"),
    )
    missing = expected.join(observed, [*keys, "__b"], "left_anti")
    return missing.select(
        *keys, F.timestamp_seconds(F.col("__b")).alias("bucket")
    )
