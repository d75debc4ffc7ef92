"""Engine-portable Lloyd k-means (round 6).

pyspark.ml's KMeans (used by the IVF coarse-quantizer variant in
operators/similarity.py) is rows-only: its k-means‖ init draws from
Spark's RNG and its float reductions are partition-order dependent.
This operator is the differentially-verifiable twin — every stage is
reproducible bit-for-bit in ANSI SQL, so a Lloyd clustering can sit
behind the same DuckDB hash gate as any relational query:

- init: the k corpus vectors with the smallest md5(id) (the repo's
  deterministic-sampling convention, same as IVF pivots);
- distances: round 1 compares EXACT INTEGER squared distances on
  2^20-quantized vectors (operators/similarity.quantize_vec); later
  rounds compare doubles derived from integer sums by exactly one
  division per component, folded in fixed index order (zip_with left
  fold == DuckDB ordered list_reduce);
- update: component-wise integer sums (order-independent, exact) via
  posexplode → groupBy(cluster, pos) — partial-aggregated map-side,
  the standard distributed-KMeans shuffle of k·dim cells, NOT n rows;
- ties: argmin breaks on (d2, cluster) — total order, no float
  ambiguity in round 1 at all.

Scale shape: each iteration = one broadcast of the k×dim centroid
table + one map-side assignment pass + one k·dim-cell aggregate. The
corpus never self-joins and never shuffles by vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import quantize_vec


def _fold_d2_double(xd: str, mu: str) -> F.Column:
    """Σ (x_i − μ_i)² folded in index order with a 0.0 init. NOTE:
    DuckDB's ordered ``list_reduce`` has NO initial accumulator (it is
    seeded by the first element), so the two folds differ by one
    leading ``0.0 + x0`` — an exact IEEE identity for addition, which
    is the ONLY reason the engines agree bit-for-bit. Do not copy this
    pattern for a fold with a non-identity init or a non-additive op
    (product, min-chain, Kahan-style): those would silently diverge."""
    return F.aggregate(
        F.zip_with(F.col(xd), F.col(mu), lambda x, m: (x - m) * (x - m)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 2,
) -> DataFrame:
    """Deterministic Lloyd k-means, ``n_iter`` unrolled iterations.

    Returns one row per input vector: ``id_col``, ``cluster`` (int,
    1-based), ``d2`` (double, squared distance to the final centroid
    the row is assigned to). Empty clusters simply drop out of the
    centroid table (no re-seeding), matching the plain Lloyd contract.
    """
    v = df.select(
        F.col(id_col).alias("__vid"),
        quantize_vec(vec_col).alias("__qv"),
        F.transform(
            quantize_vec(vec_col), lambda x: x.cast("double")
        ).alias("__xd"),
    )

    piv = (
        v.select(
            "__qv", F.md5(F.col("__vid").cast("string")).alias("__h"), "__vid"
        )
        .orderBy("__h", "__vid")
        .limit(k)
    )
    w_piv = Window.orderBy("__h", "__vid")
    cent0 = piv.withColumn(
        "__cl", F.row_number().over(w_piv).cast("int")
    ).select("__cl", F.col("__qv").alias("__cq"))

    # round 1: exact integer distances to the integer pivots
    w_assign = Window.partitionBy("__vid").orderBy("__d2", "__cl")
    assigned = (
        v.join(F.broadcast(cent0))
        .withColumn(
            "__d2",
            F.aggregate(
                F.zip_with(
                    F.col("__qv"), F.col("__cq"), lambda x, c: (x - c) * (x - c)
                ),
                F.lit(0).cast("long"),
                lambda acc, d: acc + d,
            ).cast("double"),
        )
        .withColumn("__r", F.row_number().over(w_assign))
        .where(F.col("__r") == 1)
        .select("__vid", "__qv", "__xd", "__cl", "__d2")
    )

    for _ in range(n_iter - 1):
        # update: exact integer component sums, ONE division per cell
        sums = (
            assigned.select("__cl", F.posexplode("__qv").alias("__p", "__x"))
            .groupBy("__cl", "__p")
            .agg(
                F.sum("__x").alias("__s"),
                F.count(F.lit(1)).alias("__n"),
            )
            .withColumn(
                "__m", F.col("__s").cast("double") / F.col("__n").cast("double")
            )
        )
        cent = sums.groupBy("__cl").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__p", "__m"))),
                lambda s: s["__m"],
            ).alias("__mu")
        )
        # re-assign: double distances folded in index order
        assigned = (
            v.join(F.broadcast(cent))
            .withColumn("__d2", _fold_d2_double("__xd", "__mu"))
            .withColumn("__r", F.row_number().over(w_assign))
            .where(F.col("__r") == 1)
            .select("__vid", "__qv", "__xd", "__cl", "__d2")
        )

    return assigned.select(
        F.col("__vid").alias(id_col),
        F.col("__cl").alias("cluster"),
        F.col("__d2").alias("d2"),
    )
