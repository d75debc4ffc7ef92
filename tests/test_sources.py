"""Source/sink contracts (reference S3/S5): schema-first CSV reads and
the date-partitioned parquet sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sensor_time_series_pyspark_spark.sources.readers import read_csv, read_table
from sensor_time_series_pyspark_spark.sources.sinks import write_parquet

SF = "/root/testdata/sf0.001"


def test_read_csv_explicit_schema_roundtrip(spark, tmp_path):
    """CSV written then read under an explicit StructType must
    round-trip values and types exactly (the reference's ingestion
    path, sensor_data_etl.py:35-51); a malformed row becomes NULLs,
    never a re-typed column."""
    src = read_table(spark, SF, "events").select("event_id", "user_id", "value")
    d = str(tmp_path / "csv")
    src.write.option("header", "false").csv(d)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = read_csv(spark, d, schema)
    assert back.schema == schema
    assert back.count() == src.count()
    s = src.agg(F.sum("event_id")).first()[0]
    b = back.agg(F.sum("event_id")).first()[0]
    assert s == b

    # malformed row → NULL fields, schema unchanged
    bad = str(tmp_path / "bad.csv")
    with open(bad, "w") as f:
        f.write("1,2,3.5\nnot,a,number\n")
    rows = read_csv(spark, bad, schema).collect()
    assert len(rows) == 2
    assert any(r["value"] is None for r in rows)


def test_write_parquet_date_partitioned(spark, tmp_path):
    """date_col → date=... directories on disk (dynamic partition
    pruning substrate; the reference wrote unpartitioned parquet,
    sensor_data_etl.py:104)."""
    ev = read_table(spark, SF, "events").limit(500)
    out = str(tmp_path / "out")
    write_parquet(ev, out, date_col="ts")
    dirs = [p for p in os.listdir(out) if p.startswith("date=")]
    assert dirs, "expected date= partition directories"
    back = spark.read.parquet(out)
    assert back.count() == 500
    # partition filter must prune: only the matching directory is read
    one_day = dirs[0].split("=", 1)[1]
    pruned = back.where(F.col("date") == one_day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
