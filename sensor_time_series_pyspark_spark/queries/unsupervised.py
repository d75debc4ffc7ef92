"""Unsupervised structure discovery, hash-gated (round 6): k-means
(Lloyd), plus the sequence/segment operators that complete the
clustering story. pyspark.ml's KMeans stays available for the MLlib
surface (operators/similarity.py IVF); these queries are the
differentially-verified twins built on the portable-determinism
recipes (md5-ordered seeds, 2^20 integer quantization, fixed-order
double folds — see operators/clustering.py and q47)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators.clustering import kmeans_lloyd
from sensor_time_series_pyspark_spark.queries.common import read_table
from sensor_time_series_pyspark_spark.queries.registry import register_many


def _q_kmeans_lloyd(spark: SparkSession, sf: str) -> DataFrame:
    """2-iteration Lloyd k-means over the 64-dim embeddings, k=8,
    md5-seeded: per final cluster, member count and WSS (squared
    distances folded in vec_id order — the cross-engine-safe double
    reduction). The whole clustering is 2 broadcast-assign passes +
    2 k·dim-cell integer aggregates; the corpus never self-joins."""
    emb = read_table(spark, sf, "embeddings")
    assigned = kmeans_lloyd(emb, "vec_id", "embedding", k=8, n_iter=2)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("vec_id", "d2"))),
                    lambda s: s["d2"],
                ),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            ).alias("wss"),
        )
        .select("cluster", "n", "wss")
    )


register_many(
    {
        "q509_kmeans_lloyd": _q_kmeans_lloyd,
    },
    {
        # Mirrors operators/clustering.kmeans_lloyd stage by stage:
        # md5-ordered integer pivots; round-1 assignment on EXACT
        # integer d2 (order-free list_sum == Spark integer fold);
        # centroid update = integer component sums, one double division
        # per cell, list re-assembled in position order; round-2
        # assignment + WSS on doubles folded in index order
        # (list_reduce == 0.0-init zip_with fold).
        "q509_kmeans_lloyd": """
            WITH v AS (
              SELECT vec_id,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1048576)
                            AS BIGINT)) AS qv
              FROM embeddings
            ),
            vd AS (
              SELECT vec_id, qv,
                list_transform(qv, x -> CAST(x AS DOUBLE)) AS xd
              FROM v
            ),
            piv AS (
              SELECT qv AS cq,
                CAST(row_number() OVER (ORDER BY h, pid) AS INT) AS cl
              FROM (
                SELECT qv, md5(CAST(vec_id AS VARCHAR)) AS h,
                  vec_id AS pid
                FROM v ORDER BY 2, 3 LIMIT 8
              )
            ),
            a1 AS (
              SELECT vec_id, qv, xd, cl FROM (
                SELECT vd.vec_id, vd.qv, vd.xd, p.cl,
                  row_number() OVER (PARTITION BY vd.vec_id ORDER BY
                    list_sum(list_transform(list_zip(vd.qv, p.cq),
                      s -> (s[1] - s[2]) * (s[1] - s[2]))), p.cl) AS r
                FROM vd, piv p
              ) WHERE r = 1
            ),
            ex AS (
              SELECT cl, u.p AS p, u.x AS x
              FROM a1,
                UNNEST(list_transform(qv, (x, i) -> {'p': i, 'x': x}))
                  AS t(u)
            ),
            sums AS (
              SELECT cl, p, sum(x) AS s, count(*) AS n
              FROM ex GROUP BY 1, 2
            ),
            cent AS (
              SELECT cl,
                list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY p)
                  AS mu
              FROM sums GROUP BY cl
            ),
            a2 AS (
              SELECT vec_id, cl, d2 FROM (
                SELECT vd.vec_id, c.cl,
                  list_reduce(list_transform(list_zip(vd.xd, c.mu),
                    s -> (s[1] - s[2]) * (s[1] - s[2])),
                    (a, b) -> a + b) AS d2,
                  row_number() OVER (PARTITION BY vd.vec_id ORDER BY
                    list_reduce(list_transform(list_zip(vd.xd, c.mu),
                      s -> (s[1] - s[2]) * (s[1] - s[2])),
                      (a, b) -> a + b), c.cl) AS r
                FROM vd, cent c
              ) WHERE r = 1
            )
            SELECT cl AS cluster, CAST(count(*) AS BIGINT) AS n,
              list_reduce(list(d2 ORDER BY vec_id), (a, b) -> a + b)
                AS wss
            FROM a2 GROUP BY cl
        """,
    },
)
