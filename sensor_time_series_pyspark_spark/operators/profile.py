"""Single-pass dataset profiling — the first thing you run against an
unfamiliar 100 TB table, and the recurring health check on a curated
training set.

One aggregation job computes every column's metrics simultaneously
(count / nulls / HLL++ distinct / min / max): profiling column-by-
column re-scans the table once per column, which is exactly the
reference's recompute anti-pattern (approxQuantile x4 over the same
uncached DAG, /root/reference/sensor_data_etl.py:95-98). The single
result row is reshaped driver-side (one row, not a collect of data).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, approx_distinct,
    min, max) — min/max stringified so mixed types share one schema.

    Complex-typed columns (array/map/struct) get null min/max (not
    orderable) but still count nulls and distincts via their hash.
    """
    names = list(cols) if cols else list(df.columns)
    schema = {f.name: f.dataType for f in df.schema.fields}
    orderable = lambda dt: dt.typeName() not in ("array", "map", "struct", "binary")  # noqa: E731
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        if orderable(schema[c]):
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__d"))
            aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        else:
            aggs.append(
                F.approx_count_distinct(F.xxhash64(F.to_json(F.col(c)))).alias(
                    f"{c}__d"
                )
            )
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max"))
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            c,
            row["__n"],
            row["__n"] - row[f"{c}__nn"],
            row[f"{c}__d"],
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in names
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows long, n_null long, approx_distinct long, "
        "min string, max string",
    )
