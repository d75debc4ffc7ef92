"""Skew-aware auto-dispatch for the hot-key split operators
(VERDICT r8 #3): round 8 proved `sessionize_split` / `asof_join_split`
exact and 4.6x / 3.2x faster on a 90%-hot key, but the caller had to
KNOW the key was hot. These wrappers sample the key histogram with one
sample-sized aggregation job and pick split vs unsplit by the measured
crossover from SCALING.md ("Hot-series stragglers"): the split pays a
constant ~0.5 s (bucket summary + stitch join), the unsplit path pays
the hottest key's full single-task window — breakeven sat between the
23%-hot leg (~1.15M hot rows, +-11%) and the 90%-hot leg (~4.5M hot
rows, 3-5x), so the default crossover is 2M estimated hot-key rows.

At 100 TB the same dispatch holds: a cluster-scale hot key is hours of
single-task work, the sample job is one scan of a fraction of the key
column, and the decision cost amortizes to nothing. The sample reads
ONLY the key columns (column pruning reaches the parquet scan), so the
decision job never touches the wide fact payload.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators.asof import (
    asof_join,
    asof_join_split,
)
from sensor_time_series_pyspark_spark.operators.sessionize import (
    sessionize,
    sessionize_split,
)

#: measured breakeven (SCALING.md round 8): ~1.15M hot rows was wash,
#: ~4.5M was a 3-5x win — 2M splits the bracket.
DEFAULT_HOT_ROWS_CROSSOVER = 2_000_000


def estimate_hot_key_rows(
    df: DataFrame,
    keys: Sequence[str],
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> float:
    """Estimated row count of the HOTTEST key, from one aggregation
    over a Bernoulli sample of the key columns (scaled back up by the
    sampling fraction). 0.0 for an empty frame. fraction >= 1 reads
    the full key column (exact)."""
    if not 0.0 < sample_fraction:
        raise ValueError("sample_fraction must be positive")
    s = df.select(*[F.col(k) for k in keys])
    frac = min(float(sample_fraction), 1.0)
    if frac < 1.0:
        s = s.sample(fraction=frac, seed=seed)
    row = (
        s.groupBy(*keys)
        .count()
        .agg(F.max("count").alias("top"))
        .collect()[0]
    )
    top = row["top"]
    return 0.0 if top is None else float(top) / frac


def should_split(
    df: DataFrame,
    keys: Sequence[str],
    hot_rows_crossover: float = DEFAULT_HOT_ROWS_CROSSOVER,
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> bool:
    """True when the estimated hottest-key row count crosses the
    measured split-operator breakeven."""
    return (
        estimate_hot_key_rows(df, keys, sample_fraction, seed)
        > hot_rows_crossover
    )


def sessionize_auto(
    df: DataFrame,
    ts_col: str,
    partition_by: Sequence[str],
    gap_seconds: int,
    bucket_seconds: int,
    session_col: str = "session_seq",
    tiebreak_col: str | None = None,
    hot_rows_crossover: float = DEFAULT_HOT_ROWS_CROSSOVER,
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> DataFrame:
    """``sessionize`` that self-selects the split path on hot keys.
    Row-identical either way (the split is exact for any bucket
    width); the sample job is the only added cost on the unsplit
    path."""
    if should_split(
        df, partition_by, hot_rows_crossover, sample_fraction, seed
    ):
        return sessionize_split(
            df,
            ts_col,
            partition_by,
            gap_seconds,
            bucket_seconds,
            session_col=session_col,
            tiebreak_col=tiebreak_col,
        )
    return sessionize(
        df,
        ts_col,
        partition_by,
        gap_seconds,
        session_col=session_col,
        tiebreak_col=tiebreak_col,
    )


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    bucket_seconds: int,
    suffix: str = "",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = None,
    tiebreak_col: str | None = None,
    hot_rows_crossover: float = DEFAULT_HOT_ROWS_CROSSOVER,
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> DataFrame:
    """``asof_join`` that self-selects the split path when the LEFT
    side's hottest key crosses the breakeven (the left facts dominate
    the union window; the right side is typically dim-grain)."""
    if should_split(
        left, on, hot_rows_crossover, sample_fraction, seed
    ):
        return asof_join_split(
            left,
            right,
            on,
            left_ts,
            right_ts,
            value_cols,
            bucket_seconds,
            suffix=suffix,
            direction=direction,
            tolerance_seconds=tolerance_seconds,
            matched_ts_col=matched_ts_col,
            tiebreak_col=tiebreak_col,
        )
    return asof_join(
        left,
        right,
        on,
        left_ts,
        right_ts,
        value_cols,
        suffix=suffix,
        direction=direction,
        tolerance_seconds=tolerance_seconds,
        matched_ts_col=matched_ts_col,
        tiebreak_col=tiebreak_col,
    )
