"""Incremental rollup maintenance: N sequential batch refreshes must
equal one full recompute, batch replay must be a no-op, and the
refresh must only rewrite touched date partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.plans.rollup import (
    finalize_rollup,
    refresh_rollup,
    rollup_sink,
)
from sensor_time_series_pyspark_spark.sources.readers import read_table
from sensor_time_series_pyspark_spark.streaming import read_stream

SF = "/root/testdata/sf0.001"
KEYS = ["event_type"]


def full_recompute(ev):
    return (
        ev.groupBy(F.window("ts", "1 hour")["start"].alias("bucket"), *KEYS)
        .agg(
            F.count("value").alias("n"),
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def as_map(df):
    return {
        (r["event_type"], r["bucket"]): (
            r["n"],
            pytest.approx(r["avg_value"], rel=1e-9),
            r["min_value"],
            r["max_value"],
        )
        for r in df.collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    ev = read_table(spark, SF, "events")
    path = str(tmp_path / "rollup")
    mid = ev.agg(F.expr("percentile(cast(ts as double), 0.5)")).first()[0]
    first = ev.where(F.col("ts").cast("double") <= mid)
    second = ev.where(F.col("ts").cast("double") > mid)

    refresh_rollup(spark, first, path, KEYS, "ts", "value")
    refresh_rollup(spark, second, path, KEYS, "ts", "value")

    got = finalize_rollup(spark.read.parquet(path), KEYS)
    assert as_map(got) == as_map(full_recompute(ev))
    # date-partitioned on disk
    assert any(p.startswith("date=") for p in os.listdir(path))


def test_streaming_sink_maintains_rollup_and_skips_replay(spark, tmp_path):
    ev = read_table(spark, SF, "events")
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)
    path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    sdf = read_stream(spark, src, ev.schema, fmt="parquet")
    q = rollup_sink(sdf, path, ckpt, KEYS, "ts", "value")
    q.awaitTermination()

    got = finalize_rollup(spark.read.parquet(path), KEYS)
    want = as_map(full_recompute(ev))
    assert as_map(got) == want

    # replay the same batch manually: marker must make it a no-op
    markers = os.listdir(os.path.join(ckpt, "applied_batches"))
    assert markers
    from sensor_time_series_pyspark_spark.plans.rollup import refresh_rollup as rr

    # simulate the foreachBatch replay path by calling the sink's fold
    # again via a fresh stream over the SAME checkpoint: no new files →
    # no new batch; rollup unchanged
    q2 = rollup_sink(read_stream(spark, src, ev.schema, fmt="parquet"), path, ckpt, KEYS, "ts", "value")
    q2.awaitTermination()
    assert as_map(finalize_rollup(spark.read.parquet(path), KEYS)) == want
