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


def topk_partials(
    df: DataFrame,
    by: Sequence[str],
    item_col: str,
    max_items_tracked: int = 10000,
) -> DataFrame:
    """One frequent-items sketch per ``by`` group (DataSketches
    ``approx_top_k_accumulate`` — binary ``sketch`` column). The
    mergeable twin of the exact operators/profile.py:top_categories:
    persist these per partition/day, answer coarser top-k questions by
    combining, never rescanning. Estimates are EXACT while a group's
    distinct count stays under ``max_items_tracked``."""
    return df.groupBy(*by).agg(
        F.expr(
            f"approx_top_k_accumulate({item_col}, {int(max_items_tracked)})"
        ).alias("sketch")
    )


def topk_rollup(
    partials: DataFrame,
    by: Sequence[str],
    k: int = 10,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge frequent-items partials to a coarser grouping and emit the
    top-k items. Output: [*by], item, est_count, rank (1-based)."""
    merged = partials.groupBy(*by).agg(
        F.expr(f"approx_top_k_estimate(approx_top_k_combine({sketch_col}), {int(k)})")
        .alias("__top")
    )
    exploded = merged.select(
        *by, F.posexplode("__top").alias("__pos", "__e")
    )
    return exploded.select(
        *by,
        F.col("__e.item").alias("item"),
        F.col("__e.count").alias("est_count"),
        (F.col("__pos") + 1).alias("rank"),
    )
