"""Custom Python DataSource tests: registration, determinism,
partition independence, and composition with the pivot ETL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import pivot_wide
from sensor_time_series_pyspark_spark.sources.sensor_sim import (
    GASES,
    SensorSimDataSource,
)


@pytest.fixture(scope="module")
def sim(spark):
    spark.dataSource.register(SensorSimDataSource)
    return (
        spark.read.format("sensor_sim")
        .option("rows_per_partition", 500)
        .option("num_partitions", 4)
        .option("seed", 7)
        .load()
    )


def test_shape_and_domain(spark, sim):
    assert sim.count() == 2000
    types = {r["sensor_type"] for r in sim.select("sensor_type").distinct().collect()}
    assert types == set(GASES)
    assert sim.where(F.col("reading") < 0).count() == 0


def test_deterministic_across_reads(spark, sim):
    a = sim.agg(F.sum(F.col("reading").cast("decimal(38,6)"))).first()[0]
    b = (
        spark.read.format("sensor_sim")
        .option("rows_per_partition", 500)
        .option("num_partitions", 4)
        .option("seed", 7)
        .load()
        .agg(F.sum(F.col("reading").cast("decimal(38,6)")))
        .first()[0]
    )
    assert a == b


def test_partition_independence(spark):
    """Each partition generates from (seed, pid): the first partition's
    rows are identical whether the source has 1 or 4 partitions — the
    no-coordination property that lets generation scale out."""
    one = (
        spark.read.format("sensor_sim")
        .option("rows_per_partition", 100).option("num_partitions", 1)
        .option("seed", 7).load().collect()
    )
    four_first = [
        r
        for r in spark.read.format("sensor_sim")
        .option("rows_per_partition", 100).option("num_partitions", 4)
        .option("seed", 7).load().collect()
        if r["ts"] < one[-1]["ts"] or r["ts"] == one[-1]["ts"]
    ]
    # partition 0 of the 4-way read == the whole 1-way read
    assert sorted(map(tuple, one)) == sorted(map(tuple, four_first))


def test_feeds_pivot_etl(spark, sim):
    """The simulated EAV stream pivots into the reference's wide gas
    table (datetime × CO/LEL/H2S/O2) — source and ETL compose."""
    wide = pivot_wide(
        sim.withColumn("bucket", F.date_trunc("hour", "ts")),
        keys=["terminal_id", "bucket"],
        pivot_col="sensor_type",
        pivot_values=list(GASES),
        value_col="reading",
        agg="avg_decimal",
    )
    rows = wide.limit(5).collect()
    assert set(GASES) <= set(wide.columns)
    assert len(rows) > 0


def test_stream_reader_replay_deterministic():
    """readBetweenOffsets (the checkpoint-recovery path) must replay
    byte-identical rows — no wall-clock dependence."""
    from sensor_time_series_pyspark_spark.sources.sensor_sim import (
        SensorSimStreamReader,
    )

    r = SensorSimStreamReader({"rows_per_batch": "50", "seed": "7"})
    a = list(r.readBetweenOffsets({"batch": 0}, {"batch": 3}))
    b = list(r.readBetweenOffsets({"batch": 0}, {"batch": 3}))
    assert a == b and len(a) == 150
    rows, nxt = r.read({"batch": 1})
    assert nxt == {"batch": 2}
    assert list(rows) == list(r.readBetweenOffsets({"batch": 1}, {"batch": 2}))


def test_stream_source_first_microbatch(spark, tmp_path):
    """End-to-end: the streaming face produces rows through a real
    writeStream query."""
    import time

    from sensor_time_series_pyspark_spark.sources.sensor_sim import (
        SensorSimDataSource,
    )

    spark.dataSource.register(SensorSimDataSource)
    sdf = (
        spark.readStream.format("sensor_sim")
        .option("rows_per_batch", "100")
        .option("seed", "3")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("sim_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # generous: under a fully loaded suite run the first Python
        # data-source microbatch can take minutes to schedule; the loop
        # exits as soon as the rows land, so the healthy path stays fast
        deadline = time.time() + 240
        while time.time() < deadline and spark.table("sim_stream").count() < 100:
            time.sleep(0.5)
        got = spark.table("sim_stream").count()
    finally:
        q.stop()
    assert got >= 100
