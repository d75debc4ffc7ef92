"""Versioned tables (sources/versioned.py) and delta encoding
(operators/compress.py)."""

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators.compress import (
    delta_decode,
    delta_encode,
)
from sensor_time_series_pyspark_spark.sources.versioned import (
    current_version,
    read_latest,
    read_version,
    rollback,
    vacuum,
    write_version,
)


def test_versioned_publish_time_travel_rollback(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df1 = spark.range(5).withColumn("tag", F.lit("v1"))
    df2 = spark.range(8).withColumn("tag", F.lit("v2"))
    assert write_version(df1, t) == 1
    assert write_version(df2, t) == 2
    assert current_version(spark, t) == 2
    assert read_latest(spark, t).count() == 8
    assert read_version(spark, t, 1).count() == 5        # time travel
    rollback(spark, t, 1)
    assert read_latest(spark, t).count() == 5
    # a new write after rollback allocates PAST the immutable v=2
    assert write_version(df2, t) == 3
    assert read_latest(spark, t).count() == 8
    assert read_version(spark, t, 2).count() == 8  # branch still readable


def test_versioned_validate_blocks_publish(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(spark.range(3), t)

    def reject(df):
        raise ValueError("audit failed")

    with pytest.raises(ValueError):
        write_version(spark.range(0), t, validate=reject)
    # pointer untouched by the failed publish
    assert current_version(spark, t) == 1
    assert read_latest(spark, t).count() == 3


def test_versioned_vacuum_keeps_published(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):
        write_version(spark.range(i + 1), t)
    rollback(spark, t, 2)
    deleted = vacuum(spark, t, keep=1)
    # keeps newest (4) and the published (2)
    assert 2 not in deleted and 4 not in deleted
    assert read_latest(spark, t).count() == 2


def test_delta_roundtrip(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("s1", t0 + dt.timedelta(minutes=i), v)
        for i, v in enumerate([10.25, 10.25, 10.26, 10.24, 99.99, 0.0])
    ] + [("s2", t0, 5.5)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    enc = delta_encode(df, ["k"], "ts", "v")
    # repeated value -> delta 0 (the compression win)
    d = {(r["k"], r["ts"]): r["delta"] for r in enc.collect()}
    assert d[("s1", t0 + dt.timedelta(minutes=1))] == 0
    dec = delta_decode(enc, ["k"])
    got = {(r["k"], r["ts"]): r["value"] for r in dec.collect()}
    for r in rows:
        assert abs(got[(r[0], r[1])] - r[2]) < 1e-9
