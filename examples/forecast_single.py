"""Single-series driver-side forecast (reference
pandas_timeseries_forecast.py parity): one series pulled to the driver,
grid-searched ARIMA order by walk-forward MSE, forecast with CI,
seasonal decomposition. For fleets of series use
forecast_distributed.py — this path exists for the analyst working one
sensor at a time."""

from __future__ import annotations

import argparse

import numpy as np
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.ml.models import (
    MODELS,
    arima,
    seasonal_decompose_additive,
    walk_forward_mse,
)
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table


def main(sf_dir: str, user_id: int = 1, horizon: int = 7) -> int:
    spark = get_spark("example-forecast-single")
    ev = read_table(spark, sf_dir, "events")
    series = (
        ev.where(F.col("user_id") == user_id)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("value"))
        .orderBy("day")
    )
    x = np.array([r["value"] for r in series.collect()], dtype="float64")

    # grid search (p,d,q) by walk-forward MSE (reference
    # pandas_timeseries_forecast.py:22-55, minus the shipped bugs)
    grid = [(1, 0, 0), (1, 1, 0), (2, 0, 0), (0, 1, 1)]
    scored = [
        (walk_forward_mse(x, "arima", {"p": p, "d": d, "q": q}), (p, d, q))
        for p, d, q in grid
    ]
    best_mse, best = min(scored)
    fc, se = arima(x, horizon, p=best[0], d=best[1], q=best[2])
    lo, hi = fc - 1.96 * se, fc + 1.96 * se
    print(f"user={user_id} best_order={best} mse={best_mse:.4f}")
    for i in range(horizon):
        print(f"  t+{i+1}: {fc[i]:.3f} [{lo[i]:.3f}, {hi[i]:.3f}]")

    trend, seasonal, resid = seasonal_decompose_additive(x, period=7)
    print(f"decomposition: trend[0..2]={np.round(trend[:3], 3)}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--user-id", type=int, default=1)
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir, a.user_id))
