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
