"""Streaming ingestion (SURVEY.md §2.11 north star — the reference's
batch CSV drops re-expressed as Structured Streaming): file stream →
watermarked 30-minute windows → date-partitioned parquet, exactly-once
via checkpoint, availableNow for catch-up runs."""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table
from sensor_time_series_pyspark_spark.streaming import (
    read_stream,
    windowed_agg,
    write_parquet_stream,
)


def main(sf_dir: str, work_dir: str) -> int:
    spark = get_spark("example-streaming")
    # stage the events table as a drop directory (stand-in for the
    # reference's arriving CSV batches)
    src = f"{work_dir}/src"
    ev = read_table(spark, sf_dir, "events")
    ev.write.mode("overwrite").parquet(src)

    sdf = read_stream(spark, src, ev.schema, fmt="parquet")
    agg = windowed_agg(
        sdf,
        ts_col="ts",
        width="30 minutes",
        keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value")],
        watermark="1 hour",
    ).withColumn("date", F.to_date("bucket"))
    q = write_parquet_stream(
        agg, f"{work_dir}/out", f"{work_dir}/ckpt", partition_date_col="date"
    )
    q.awaitTermination()
    n = spark.read.parquet(f"{work_dir}/out").count()
    print(f"streamed {n} window rows into {work_dir}/out")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--work-dir", default="/tmp/stream_example")
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir, a.work_dir))
