"""Flagship ETL (reference sensor_data_etl.py:24-104 parity): long
events → hourly wide table, one aggregation pass, partitioned sink."""

from __future__ import annotations

import argparse

from sensor_time_series_pyspark_spark.functions.metrics import with_row_count
from sensor_time_series_pyspark_spark.plans import sensor_etl
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.sinks import write_parquet


def main(sf_dir: str, out: str) -> int:
    spark = get_spark("example-etl")
    wide = sensor_etl(spark, sf_dir)
    # observe() rides the write job — no extra count() jobs
    # (reference ran >=6 recomputations, SURVEY.md §8 bug 11)
    wide, obs = with_row_count(wide, "etl_out")
    write_parquet(wide, out, date_col="bucket")
    n = obs.get["count"]
    print(f"wrote {n} rows to {out}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", default="/tmp/sensor_etl_out")
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir, a.out))
