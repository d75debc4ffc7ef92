"""Long→wide pivot — the heart of the reference's data model
(SURVEY.md §1: EAV sensor readings → one column per gas).

The reference does it in three shuffles (two groupBys over the same
input + a 3-key self-join, sensor_data_etl.py:73-86) and lets
``.pivot()`` run a hidden distinct-values job (:80). Here the whole
thing is ONE hash aggregate: conditional aggregation with an explicit
value list, plus any scalar aggregates (e.g. the max-alarm-code) in the
same pass. At 100 TB this is the difference between one shuffle of the
fact table and three.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    value_col: str,
    agg: str = "first",
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """One-shuffle pivot via conditional aggregation.

    ``agg`` is any SQL aggregate name ('first', 'avg', 'max', 'sum', …).
    'first' uses ignorenulls=True (reference A6, sensor_data_etl.py:81).
    Column names == pivot values, so the output schema is explicit and
    stable (no distinct job, no surprise columns from dirty labels).
    """
    cols: list[Column] = []
    for v in pivot_values:
        masked = F.when(F.col(pivot_col) == v, F.col(value_col))
        if agg == "first":
            c = F.first(masked, ignorenulls=True)
        elif agg == "avg_decimal":
            # deterministic mean: exact decimal sum, then ONE double
            # division — summation order can't perturb low bits, so the
            # result is reproducible across runs/engines
            c = F.sum(masked.cast("decimal(38,6)")).cast("double") / F.count(masked)
        else:
            c = getattr(F, agg)(masked)
        cols.append(c.alias(v))
    return df.groupBy(*keys).agg(*cols, *extra_aggs)


def unpivot(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    name_col: str = "name",
    value_col: str = "value",
) -> DataFrame:
    """Wide→long (inverse of pivot_wide) via the built-in ``unpivot``
    (STACK under the hood — narrow transformation, no shuffle)."""
    return df.unpivot(list(keys), list(value_cols), name_col, value_col)


def impute_defaults(df: DataFrame, defaults: dict[str, float]) -> DataFrame:
    """Per-column null defaults in a single na.fill (reference P10 does
    two passes, sensor_data_etl.py:83-84; one dict-fill is one projection)."""
    return df.na.fill(defaults)
