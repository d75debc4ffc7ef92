"""Distributed per-series forecast (reference
spark_pandas_timeseries_forecast.py parity, grouped by SERIES IDENTITY
instead of the reference's per-row ('datetime','O2') bug — SURVEY.md §8
bug 5): native daily resample → Arrow groups → Holt forecast per user."""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.ml import fit_forecast
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table


def main(sf_dir: str, horizon: int = 7) -> int:
    spark = get_spark("example-forecast-distributed")
    ev = read_table(spark, sf_dir, "events")
    # resample NATIVELY before the Python boundary: groups entering
    # Arrow are one row per day per user, bounded regardless of raw
    # event cardinality
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("value")
    )
    fc = fit_forecast(
        daily, series_keys=["user_id"], ts_col="day", value_col="value",
        horizon=horizon, model="holt",
    )
    fc.orderBy("user_id", "step").show(3 * horizon, truncate=False)
    print(f"forecasted {fc.select('user_id').distinct().count()} series")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir))
