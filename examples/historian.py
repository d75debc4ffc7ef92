"""Sensor historian pipeline: the archive-side lifecycle of a reading —
rate-limit the chattering raw feed, compress what remains (deadband and
swinging-door), densify back onto a regular grid for consumers, and
report per-series data-quality diagnostics.

Every stage is one of this engine's operators; the compression stages
quantify their own fidelity (reconstruction error vs the raw series).
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import (
    deadband_compress,
    densify_locf,
    m4_downsample,
    null_runs,
    swinging_door_compress,
)
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table
from sensor_time_series_pyspark_spark.streaming.stateful import debounce_batch


def main(sf_dir: str) -> int:
    spark = get_spark("example-historian")
    ev = read_table(spark, sf_dir, "events")
    raw = ev.select("user_id", "ts", "value").where(F.col("value").isNotNull())
    n_raw = raw.count()

    # 1. alarm rate-limit: at most one event per user per 10 minutes
    kept = debounce_batch(ev, "user_id", "ts", cooldown_seconds=600)
    print(f"debounce: {n_raw} -> {kept.count()} events")

    # 2. archive compression, two historian rules side by side
    db = deadband_compress(raw, "user_id", "ts", "value", epsilon=20.0)
    sd = swinging_door_compress(raw, "user_id", "ts", "value", epsilon=20.0)
    print(f"deadband keeps {db.count()}/{n_raw}; SDT keeps {sd.count()}/{n_raw}")

    # 3. consumers read a regular 30-min grid (LOCF fill) over the
    # compressed series — compression + densify round trip
    grid = densify_locf(db, ["user_id"], "ts", "value", step_seconds=1800)
    print(f"densified grid rows: {grid.count()}")

    # 4. dashboard-ready downsample (M4: pixel-exact min/max/first/last)
    m4 = m4_downsample(
        raw.withColumn("pid", F.col("user_id")), ["pid"], "ts", "value",
        "user_id", "1 day",
    )
    print(f"M4 points: {m4.count()}")

    # 5. data-quality: longest missing stretch per series
    nulled = ev.withColumn(
        "value", F.when(F.col("event_type") != "error", F.col("value"))
    )
    runs = null_runs(nulled, ["user_id"], ["ts", "event_id"], "value")
    worst = runs.orderBy(F.col("longest_run").desc()).limit(3).collect()
    print("worst gaps:", [(r["user_id"], r["longest_run"]) for r in worst])
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir))
