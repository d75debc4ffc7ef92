"""Mergeable sketch aggregates (Apache DataSketches via Spark 3.5+).

``approx_count_distinct`` (q57) answers one distinct-count question per
scan. At 100 TB the winning pattern is different: aggregate each
partition/day ONCE into a mergeable sketch, persist the sketches, and
answer every subsequent rollup (any grouping coarser than the partials)
by merging kilobyte-sized binaries — no rescan of the fact data. This
is the hypertable continuous-aggregate idea (plans/rollup.py) applied
to distinct counts, where plain partial sums don't compose.

Built on the SQL-registered HllSketch functions (``hll_sketch_agg``,
``hll_union_agg``, ``hll_sketch_estimate``) — JVM-side, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partials(
    df: DataFrame,
    by: Sequence[str],
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per ``by`` group over ``key_col`` (binary column
    ``sketch`` + convenience ``estimate``). lg_k=12 → ~2.5 KiB sketch,
    ~1.6% relative standard error."""
    return df.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(key_col), F.lit(lg_k))
        ).alias("estimate"),
    )


def hll_rollup(
    partials: DataFrame,
    by: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate persisted sketch partials to a coarser grouping by
    merging sketches — the fact table is never rescanned. Output:
    [*by], n_distinct (the merged estimate, rounded to long)."""
    merged = partials.groupBy(*by).agg(
        F.hll_union_agg(F.col(sketch_col)).alias("__merged")
    )
    return merged.select(
        *by,
        F.round(F.hll_sketch_estimate("__merged"))
        .cast("long")
        .alias("n_distinct"),
    )
