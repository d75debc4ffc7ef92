"""PAA + SAX: Piecewise Aggregate Approximation and Symbolic Aggregate
approXimation (Lin/Keogh 2003) — the classic time-series mining
compaction: each series becomes w segment means (PAA), z-normalized and
discretized against Gaussian breakpoints into a short symbol string
(SAX). Downstream: motif discovery, cheap similarity screening,
hot/cold shelving of sensor archives.

Engine-portable by construction (DuckDB-oracle-gated, q122):

- segment assignment is pure integer algebra on row_number;
- segment means and series moments are EXACT decimal sums with one
  fixed IEEE epilogue each;
- z-normalizing the PAA equals PAA over the z-normed series
  (normalization is affine, means commute with it), so the exact
  decimal path covers the standard z-then-PAA pipeline without ever
  averaging doubles;
- breakpoints are literal constants (quartiles of N(0,1) for the
  default alphabet of 4) — no distribution functions at runtime.

Shape: ONE shuffle on the series key — row numbering, segment
aggregation, and the series-moment join all reuse the entity
partitioning; the moments frame is one row per series, broadcast back.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# quartile breakpoints of the standard normal (alphabet size 4):
# P(Z < b) = 0.25, 0.5, 0.75
_BREAKPOINTS_4 = [-0.6744897501960817, 0.0, 0.6744897501960817]


def sax_symbols(
    df: DataFrame,
    by: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    n_segments: int = 8,
    decimals: int = 6,
) -> DataFrame:
    """Per-series PAA means + SAX symbols (alphabet size 4).

    Output: [*by], segment, n_points, paa (double), symbol (int in
    [0, 3]; 0 = lowest band). Series shorter than n_segments simply
    produce fewer, smaller segments (standard behavior).
    """
    keys = list(by)
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*keys).orderBy(*order)
    xi = (
        (F.col(value_col).cast(f"decimal(18,{decimals})") * (10 ** decimals))
        .cast("decimal(19,0)")
    )
    d38 = "decimal(38,0)"
    base = df.select(
        *keys,
        xi.alias("__xi"),
        (F.row_number().over(w) - 1).alias("__idx"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("__n"),
    )
    # integer floor division — a double-division detour could round a
    # boundary quotient up and mis-bucket the segment edge
    seg = base.withColumn(
        "segment", F.expr(f"CAST((__idx * {n_segments}) div __n AS INT)")
    )
    # per-segment exact sums + per-series exact moments in ONE pass
    # each (both aggregates share the series partitioning)
    per_seg = seg.groupBy(*keys, "segment").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.col("__xi").cast(d38)).alias("__seg_sx"),
    )
    per_series = seg.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__sn"),
        F.sum(F.col("__xi").cast(d38)).alias("__sx"),
        F.sum((F.col("__xi") * F.col("__xi")).cast(d38)).alias("__sxx"),
    )
    joined = per_seg.join(F.broadcast(per_series), keys)
    scale = float(10 ** decimals)
    paa = (
        F.col("__seg_sx").cast("double")
        / F.col("n_points").cast("double")
        / F.lit(scale)
    )
    mean = (
        F.col("__sx").cast("double") / F.col("__sn").cast("double") / F.lit(scale)
    )
    nd = F.col("__sn").cast("decimal(12,0)")
    a = (nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    ratio = F.lit(1.0) / (
        F.col("__sn").cast("double") * (F.col("__sn") - F.lit(1)).cast("double")
    )
    std = F.sqrt(a * ratio) / F.lit(scale)
    z = F.when((F.col("__sn") > 1) & (std > 0), (paa - mean) / std)
    symbol = (
        sum(
            (z >= F.lit(b)).cast("int")
            for b in _BREAKPOINTS_4
        )
    )
    return joined.select(
        *keys,
        "segment",
        "n_points",
        paa.alias("paa"),
        F.when(z.isNotNull(), symbol).alias("symbol"),
    )
