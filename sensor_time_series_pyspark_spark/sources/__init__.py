"""Sources & sinks: batch readers (parquet/CSV-with-schema/JSON/JDBC),
partitioned parquet sinks, layout maintenance (compaction / sorted
writes), and streaming readers (see ``streaming/``)."""

from .maintenance import compact_parquet, upsert_partitioned, write_sorted, write_zordered, z_value
from .readers import (
    read_any,
    read_binary_blobs,
    read_csv,
    read_parquet,
    read_table,
    read_text_lines,
    star_schema,
)
from .sinks import write_parquet, write_table

__all__ = [
    "read_any",
    "read_binary_blobs",
    "read_text_lines",
    "read_parquet",
    "read_csv",
    "read_table",
    "star_schema",
    "write_parquet",
    "write_table",
    "compact_parquet",
    "upsert_partitioned",
    "write_sorted",
    "write_zordered",
    "z_value",
]
