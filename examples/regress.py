"""GBT next-day-max regression (reference sensor_data_regression.py
parity, also covering sensor_data_train.py's working intent): daily
max + lead-1 label, seeded pipeline, rmse/r2 + feature importances."""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.ml import (
    evaluate_regression,
    feature_importances,
    regression_pipeline,
    temporal_split,
)
from sensor_time_series_pyspark_spark.operators import lead_target
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table


def main(sf_dir: str, cutoff: str = "2024-01-25") -> int:
    spark = get_spark("example-regress")
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max("value").alias("day_max")
    )
    labeled = lead_target(
        daily, order_col="day", target_col="day_max",
        partition_by=["user_id"], out_col="next_day_max",
    ).withColumn("epoch_day", F.unix_date("day").cast("double"))
    train, test = temporal_split(labeled, "day", cutoff, cache=True)
    pipe = regression_pipeline(
        ["day_max", "epoch_day", "user_id"], "next_day_max", seed=42, max_iter=10
    )
    model = pipe.fit(train)
    preds = model.transform(test)
    rmse = evaluate_regression(preds, "next_day_max", "rmse")
    r2 = evaluate_regression(preds, "next_day_max", "r2")
    print(f"rmse={rmse:.4f} r2={r2:.4f} importances={feature_importances(model)}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir))
