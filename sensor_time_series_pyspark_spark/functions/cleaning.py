"""Dirty-value repair expressions.

The reference repairs the whitespace-dirty sensor label ``'CO '`` with a
hand-written CASE WHEN (sensor_data_etl.py:31-33) and coalesces raw
message-code names to 'Normal' the same way (read_sensor_configs.py:59-64).
Both generalize to two tiny expressions: trim-then-map.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def repair_label(col: Column | str, mapping: dict[str, str] | None = None) -> Column:
    """Trim whitespace, then apply an optional exact-match rename map.

    ``repair_label('sensor_name', {'CO': 'CO'})`` subsumes the
    reference's ``when(col == 'CO ', 'CO').otherwise(col)``: trimming
    fixes every padded variant, not just the one that was noticed.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    if mapping:
        expr = None
        for raw, fixed in mapping.items():
            cond = c == F.lit(raw)
            expr = F.when(cond, F.lit(fixed)) if expr is None else expr.when(cond, F.lit(fixed))
        c = expr.otherwise(c)
    return c


def coalesce_labels(col: Column | str, to_default: list[str], default: str) -> Column:
    """Map every label in ``to_default`` onto ``default``, keep the rest.

    Reference: 'SensorMsg'/'DeviceStatusReport' → 'Normal'
    (read_sensor_configs.py:59-64).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(to_default), F.lit(default)).otherwise(c)
