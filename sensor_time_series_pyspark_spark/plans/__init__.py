"""Composed pipelines (the reference's script-level main()s, rebuilt as
parameterized DataFrame plans), plus continuous-aggregate maintenance."""

from .sensor_etl import sensor_etl, EtlConfig
from .rollup import finalize_rollup, refresh_rollup, rollup_sink
from .ivm import delta_join_rows, refresh_join_view

__all__ = [
    "sensor_etl",
    "EtlConfig",
    "refresh_rollup",
    "finalize_rollup",
    "rollup_sink",
    "delta_join_rows",
    "refresh_join_view",
]
