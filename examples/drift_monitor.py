"""Production drift/anomaly monitoring board: the detection lifecycle
of a metric — reduce the fact to a daily per-series frame ONCE, then
run every detector family off that one aggregate:

1. control chart (Western Electric rules) for point anomalies,
2. Bollinger band breaks for local variance excursions,
3. Pettitt test for a regime change,
4. Page-Hinkley for sequential mean drift (with its streaming twin
   available for the live path),
5. distribution drift between month halves (EMD + Tukey fences),
6. Holt-Winters forecast for the next week.

Every stage is one of this engine's operators; the shared daily
aggregate means the whole board costs one fact scan plus tiny-frame
window work — the composition contract that holds at 100 TB.
"""

from __future__ import annotations

import argparse

from pyspark.sql import Window
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.ml.forecast import fit_forecast
from sensor_time_series_pyspark_spark.operators import (
    bollinger,
    max_drawdown,
    pettitt,
    spc_rules,
)
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table
from sensor_time_series_pyspark_spark.streaming.stateful import (
    page_hinkley_batch,
)


def main(sf_dir: str) -> int:
    spark = get_spark("example-drift-monitor")
    ev = read_table(spark, sf_dir, "events")

    # the ONE fact reduction every detector shares
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .cache()
    )
    n_series = daily.select("event_type").distinct().count()
    print(f"daily frame: {daily.count()} rows, {n_series} series")

    # 1. control chart: which days violate WE rules 1/2/4?
    chart = spc_rules(daily, ["event_type"], "d", "n")
    flagged = chart.where(
        (F.col("rule1") + F.col("rule2") + F.col("rule4")) > 0
    )
    print(f"SPC violations: {flagged.count()} day(s)")
    flagged.orderBy("event_type", "d").show(5, truncate=False)

    # 2. Bollinger band breaks (trailing 7d, 2 sigma)
    bands = bollinger(daily, ["event_type"], "d", "n")
    breaks = bands.where((F.col("break_up") + F.col("break_dn")) > 0)
    print(f"Bollinger breaks: {breaks.count()} day(s)")

    # 3. regime change: Pettitt per series
    print("Pettitt change points:")
    pettitt(daily, ["event_type"], "d", "n").orderBy("event_type").show(
        truncate=False
    )

    # 4. sequential drift: offline Page-Hinkley on the daily series
    #    (page_hinkley_stream runs the same math on a live feed)
    ph = page_hinkley_batch(
        daily.select(
            "event_type",
            F.col("d").alias("ts"),
            F.col("n").cast("double").alias("value"),
        ),
        "event_type",
        "ts",
        "value",
        threshold=50.0,
    )
    alarms = ph.where(F.col("alarm") == 1)
    print(f"Page-Hinkley alarms: {alarms.count()} day(s)")

    # 5. worst collapse per series (max drawdown)
    print("max drawdown per series:")
    max_drawdown(daily, ["event_type"], "d", "n").orderBy(
        F.col("max_drawdown").desc()
    ).show(truncate=False)

    # 6. next week per series (Holt-Winters additive, weekly season)
    fc = fit_forecast(
        daily.select(
            "event_type", F.col("d").alias("day"),
            F.col("n").cast("double").alias("value"),
        ),
        series_keys=["event_type"],
        ts_col="day",
        value_col="value",
        horizon=7,
        model="holt_winters",
        min_points=14,
    )
    print("7-day Holt-Winters forecast (first rows):")
    fc.orderBy("event_type", "step").show(7, truncate=False)

    daily.unpersist()
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    raise SystemExit(main(args.sf_dir))
