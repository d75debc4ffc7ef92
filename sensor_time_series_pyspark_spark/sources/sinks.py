"""Sinks.

The reference writes unpartitioned parquet (sensor_data_etl.py:104,
read_sensor_configs.py:53,66). At 100 TB that forfeits partition pruning
for every downstream temporal query, so the default sink here partitions
by a date column and lets AQE pick file sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    date_col: str | None = None,
) -> None:
    """Write parquet, optionally deriving a ``date`` partition column
    from a timestamp column. Partition-by-date → dynamic partition
    pruning for every downstream time-range query."""
    if date_col and not partition_by:
        df = df.withColumn("date", F.to_date(F.col(date_col)))
        partition_by = ["date"]
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Format-generic sink: parquet (default), orc, json, csv — the
    built-in DataSource formats, one code path. ORC keeps parquet's
    columnar pruning/statistics story; json/csv are interchange sinks
    (row-oriented — no pruning, no schema in the file; use them at the
    pipeline EDGE, never for the 100 TB core tables). Avro needs the
    external spark-avro package and raises a clear error without it."""
    fmt = fmt.lower()
    if fmt not in ("parquet", "orc", "json", "csv", "avro"):
        raise ValueError(f"unsupported sink format: {fmt!r}")
    writer = df.write.mode(mode).format(fmt)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    try:
        writer.save(path)
    except Exception as exc:  # pragma: no cover - avro jar absent
        if fmt == "avro" and "avro" in str(exc).lower():
            raise NotImplementedError(
                "avro needs org.apache.spark:spark-avro on the classpath "
                "(spark.jars.packages)"
            ) from exc
        raise
