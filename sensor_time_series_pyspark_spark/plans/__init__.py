"""Composed pipelines (the reference's script-level main()s, rebuilt as
parameterized DataFrame plans)."""

from .sensor_etl import sensor_etl, EtlConfig

__all__ = ["sensor_etl", "EtlConfig"]
