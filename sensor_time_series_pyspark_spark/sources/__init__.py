"""Sources & sinks: batch readers (parquet/CSV-with-schema/JSON/JDBC),
partitioned parquet sinks, layout maintenance (compaction / sorted
writes), and streaming readers (see ``streaming/``)."""

from .maintenance import compact_parquet, write_sorted, write_zordered, z_value
from .readers import read_csv, read_parquet, read_table, star_schema
from .sinks import write_parquet

__all__ = [
    "read_parquet",
    "read_csv",
    "read_table",
    "star_schema",
    "write_parquet",
    "compact_parquet",
    "write_sorted",
    "write_zordered",
    "z_value",
]
