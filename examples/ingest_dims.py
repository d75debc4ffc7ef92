"""Dimension ingestion (reference read_sensor_configs.py parity).

The reference pulls two dims from SQL Server via pushed-down JDBC
subqueries with credentials hard-coded in source (SURVEY.md §8 bug 9),
repairs dirty labels with a hand-written CASE WHEN, and writes
unpartitioned parquet. Here: the JDBC path is the documented
`sources.jdbc.read_jdbc_query` (no server in this environment), the
repair is `functions.cleaning`, and the sink partitions. This example
runs the same shape from parquet dims."""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.functions.cleaning import coalesce_labels
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.jdbc import JdbcConfig, read_jdbc_query
from sensor_time_series_pyspark_spark.sources.readers import read_table
from sensor_time_series_pyspark_spark.sources.sinks import write_parquet


def main(sf_dir: str, out: str, jdbc_url: str | None = None) -> int:
    spark = get_spark("example-ingest-dims")
    if jdbc_url:
        # production path: the WHERE/JOIN run server-side, exactly like
        # the reference's subquery pushdown (read_sensor_configs.py:26-47)
        cfg = JdbcConfig(url=jdbc_url, num_partitions=20, partition_column="ID")
        dim = read_jdbc_query(
            spark, cfg,
            "SELECT n.n_nationkey, n.n_name, r.r_name"
            " FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey",
        )
    else:
        n = read_table(spark, sf_dir, "nation")
        r = read_table(spark, sf_dir, "region")
        dim = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
            "n_nationkey", "n_name", "r_name"
        )
    # label coalescing (reference read_sensor_configs.py:59-64)
    dim = dim.withColumn(
        "r_name", coalesce_labels("r_name", ["AFRICA", "MIDDLE EAST"], "EMEA")
    )
    write_parquet(dim, out)
    print(f"wrote {spark.read.parquet(out).count()} dim rows to {out}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", default="/tmp/dims_out")
    p.add_argument("--jdbc-url", default=None)
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir, a.out, a.jdbc_url))
