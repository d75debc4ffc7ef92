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

from pyspark.sql import DataFrame, Window
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
    deterministic_rank: bool = False,
    fetch: int | None = None,
) -> DataFrame:
    """Merge frequent-items partials to a coarser grouping and emit the
    top-k items. Output: [*by], item, est_count, rank (1-based).

    ``deterministic_rank`` (round 10, the q144 promotion path): the
    sketch's own emission order breaks count ties sketch-internally,
    which is the one thing standing between an exact-under-bound
    sketch and a hash-gateable oracle. When set, pull ``fetch`` items
    (default 4k — choose fetch >= the group's distinct-item bound so
    no boundary tie can hide an item) and re-rank deterministically by
    (count DESC, item ASC) in plain column algebra before cutting to
    k. The accumulate/combine/estimate machinery — the part that
    matters at 100 TB — is unchanged; only the presentation rank
    moves out of the sketch."""
    kk = int(fetch or (4 * k if deterministic_rank else k))
    merged = partials.groupBy(*by).agg(
        F.expr(f"approx_top_k_estimate(approx_top_k_combine({sketch_col}), {kk})")
        .alias("__top")
    )
    exploded = merged.select(
        *by, F.posexplode("__top").alias("__pos", "__e")
    )
    out = exploded.select(
        *by,
        F.col("__e.item").alias("item"),
        F.col("__e.count").alias("est_count"),
        (F.col("__pos") + 1).alias("rank"),
    )
    if not deterministic_rank:
        return out
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col("est_count").desc(), F.col("item").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*by, "item", "est_count", "rank")
    )


def kll_partials(
    df: DataFrame,
    by: Sequence[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """One KLL quantile sketch per group over a DOUBLE column — the
    mergeable quantile partial (Karnin-Lang-Liberty): persist per
    partition/day, answer any later quantile question at any coarser
    grouping by merging kilobyte sketches, never rescanning the fact
    table. k=200 → ~1.65% rank error (the DataSketches default).

    The per-query twin is approx_quantiles (GK, one-shot, not
    mergeable); THIS is the one you run at 100 TB where re-scanning for
    every new percentile request is the anti-pattern."""
    return df.groupBy(*by).agg(
        F.expr(f"kll_sketch_agg_double({value_col}, {int(k)})").alias("sketch")
    )


def kll_rollup(
    partials: DataFrame,
    by: Sequence[str],
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge KLL partials to a coarser grouping and read off quantiles.
    Output: [*by], n, q_<pct> per requested quantile."""
    merged = partials.groupBy(*by).agg(
        F.expr(f"kll_merge_agg_double({sketch_col})").alias("__m")
    )
    cols = [
        F.expr(f"kll_sketch_get_quantile_double(__m, CAST({q} AS DOUBLE))").alias(
            f"q_{str(q).replace('.', '_')}"
        )
        for q in quantiles
    ]
    return merged.select(
        *by,
        F.expr("kll_sketch_get_n_double(__m)").alias("n"),
        *cols,
    )


def theta_partials(
    df: DataFrame,
    by: Sequence[str],
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One theta sketch per group over a key column. Unlike HLL, theta
    sketches support set INTERSECTION and DIFFERENCE — the audience-
    overlap algebra ("users who did A and B", "A but not B") that
    distinct-count sketches alone cannot answer. Estimates are EXACT
    while a group's distinct count stays under 2^lg_k."""
    return df.groupBy(*by).agg(
        F.expr(f"theta_sketch_agg({key_col}, {int(lg_k)})").alias("sketch")
    )


def theta_overlap(
    partials: DataFrame,
    label_col: str,
    label_a: str,
    label_b: str,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Set algebra over two groups' theta sketches: |A|, |B|, |A∪B|,
    |A∩B|, |A\\B| as one row — computed entirely from the persisted
    partials (driver-side combine of two kilobyte binaries; the fact
    table is never touched)."""
    a = partials.where(F.col(label_col) == label_a).select(
        F.col(sketch_col).alias("sa")
    )
    b = partials.where(F.col(label_col) == label_b).select(
        F.col(sketch_col).alias("sb")
    )
    both = a.crossJoin(b)
    est = lambda e: F.round(F.expr(f"theta_sketch_estimate({e})")).cast("long")  # noqa: E731
    return both.select(
        est("sa").alias("n_a"),
        est("sb").alias("n_b"),
        est("theta_union(sa, sb)").alias("n_union"),
        est("theta_intersection(sa, sb)").alias("n_intersect"),
        est("theta_difference(sa, sb)").alias("n_a_only"),
    )


def _cm_bucket(item, r, width: int, hash_fn: str):
    """CM bucket for (item, hash-row): ``hash_fn='xx'`` is the
    JVM-side scale path (xxhash64, one hash, no string round-trip);
    ``'portable'`` is the md5-based engine-portable variant
    (dedup.py:shingle_id_portable's construction), so a DuckDB twin
    computes the IDENTICAL cells — the round-10 promotion path for
    q281."""
    if hash_fn == "xx":
        return F.pmod(F.xxhash64(item, r), F.lit(width)).cast("int")
    if hash_fn != "portable":
        raise ValueError(f"hash_fn must be 'xx' or 'portable', got {hash_fn!r}")
    key = F.concat(item.cast("string"), F.lit(":"), r.cast("string"))
    h48 = F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
    return F.pmod(h48, F.lit(width)).cast("int")


def cm_partials(
    df: DataFrame,
    by: Sequence[str],
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xx",
) -> DataFrame:
    """Count-min sketch partials as a RELATIONAL sketch: one row per
    (group, hash-row r, bucket c) with the bucket count — the
    frequency-estimation member of the mergeable-sketch family (HLL =
    distinct counts, theta = set algebra, KLL = quantiles, top-k =
    heavy hitters; CM answers "how often did THIS item occur" for
    items chosen AFTER aggregation). depth x width cells bound the
    state (4 x 1024 rows/group) regardless of item cardinality.

    Relational-not-binary is deliberate: CM cells merge by PLAIN SUM,
    so partial frames compose with ordinary groupBy — no sketch
    library, JVM-side xxhash64 end to end, and the partials stay
    queryable/persistable as parquet like any other rollup
    (plans/rollup.py pattern).
    """
    seeds = F.array(*[F.lit(r) for r in range(depth)])
    exploded = df.select(
        *by,
        F.col(item_col).alias("__item"),
        F.explode(seeds).alias("r"),
    )
    c = _cm_bucket(F.col("__item"), F.col("r"), width, hash_fn)
    return (
        exploded.withColumn("c", c)
        .groupBy(*by, "r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(
    partials: DataFrame,
    by: Sequence[str],
) -> DataFrame:
    """Merge CM partials to a coarser grouping: cells are additive, so
    the merge is ONE hash aggregate over (by, r, c) — never a fact
    rescan."""
    return partials.groupBy(*by, "r", "c").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    partials: DataFrame,
    items: DataFrame,
    item_col: str,
    by: Sequence[str] | None = None,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xx",
) -> DataFrame:
    """Point-frequency estimates from CM partials: for each probe item
    (x group), min over hash rows of the bucket count. Guarantees
    estimate >= true count (never undercounts); overcounts only on
    bucket collisions (expected error <= e*N/width per row, driven
    down by the min over depth rows). The probe side recomputes the
    same xxhash64 buckets and LEFT-joins the cell frame (a missing
    cell is a zero count -> estimate 0).

    Output: [*by], item, estimate.
    """
    keys = list(by) if by else []
    seeds = F.array(*[F.lit(r) for r in range(depth)])
    probes = items.select(
        *keys, F.col(item_col).alias("__item")
    ).withColumn("r", F.explode(seeds))
    probes = probes.withColumn(
        "c", _cm_bucket(F.col("__item"), F.col("r"), width, hash_fn)
    )
    joined = probes.join(
        partials.withColumnRenamed("cnt", "__cnt"), [*keys, "r", "c"], "left"
    ).na.fill({"__cnt": 0})
    return (
        joined.groupBy(*keys, "__item")
        .agg(F.min("__cnt").alias("estimate"))
        .withColumnRenamed("__item", "item")
    )
