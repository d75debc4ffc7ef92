"""Similarity search over embedding columns (north-star extension).

- ``topk_cosine``: exact brute-force top-k — the correctness baseline.
  Queries broadcast to every executor; corpus never shuffles; the
  per-query ranking is a window over (query, score). At 100 TB corpus ×
  few queries this is a single scan — the right plan.
- ``brp_lsh_join``: bucketed random-projection LSH (pyspark.ml) for
  radius joins at corpus×corpus scale.
- ``signed_random_projection``: 64-bit cosine-LSH signature (random
  hyperplane sign bits) as a column, for banded candidate generation —
  pairs with small signature hamming have high cosine w.h.p.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot, l2_norm


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k nearest corpus rows per query by cosine.

    Output: query_id, corpus_id, rank (1..k), cosine. Deterministic
    tiebreak on corpus id. The join is a broadcast nested loop
    (queries are small by construction); the heavy side streams.
    """
    # Precompute each side's L2 norm BEFORE the join: cosine needs
    # dot(a,b)/(|a||b|), and computing |a|,|b| per PAIR triples the
    # per-pair array work (the norms are per-row quantities — corpus
    # norms were being recomputed once per query and vice versa).
    # Post-join, each pair does exactly one dot product.
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
    )
    scored = c.join(F.broadcast(q), F.col("qid") != F.col("cid")).withColumn(
        "cosine", dot("qv", "cv") / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "rank", "cosine")
    )


def brp_lsh_join(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    vec_col: str,
    distance_threshold: float,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Euclidean radius join via BucketedRandomProjectionLSH.
    Output: id_a, id_b, euclidean_dist (exact on matched candidates)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    va = a.select(F.col(id_a).alias("id"), array_to_vector(F.col(vec_col)).alias("v"))
    vb = b.select(F.col(id_b).alias("id"), array_to_vector(F.col(vec_col)).alias("v"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="sig", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(va)
    joined = model.approxSimilarityJoin(va, vb, distance_threshold, distCol="euclidean_dist")
    return joined.select(
        F.col("datasetA.id").alias("id_a"),
        F.col("datasetB.id").alias("id_b"),
        F.col("euclidean_dist"),
    )


def signed_random_projection(
    df: DataFrame, vec_col: str, dim: int, n_bits: int = 64, seed: int = 42
) -> DataFrame:
    """Append a 64-bit cosine-LSH signature column ``srp_sig``: sign
    bits of dot products with ``n_bits`` fixed random hyperplanes.

    Hyperplanes are generated driver-side from a seeded RNG and folded
    into the plan as array literals, so the signature is pure JVM
    column algebra (no Python worker at scan time); P(bit differs) =
    angle/π, so hamming(sig_a, sig_b) estimates cosine distance.
    Feed the result to dedup.simhash-style banding for candidates.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    sig = F.lit(0).cast("long")
    v = F.col(vec_col)
    for b in range(n_bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit_val = F.lit(2**b if b < 63 else -(2**63)).cast("long")
        sig = sig + F.when(dot > 0, bit_val).otherwise(F.lit(0).cast("long"))
    return df.withColumn("srp_sig", sig)


def srp_planes_rademacher(dim: int, n_bits: int, seed: int = 42) -> list[list[int]]:
    """Seeded ±1 (Rademacher) hyperplanes. Sign-projection with ±1
    entries is a standard SRP variant (Achlioptas-style sparse/signed
    projections preserve the cosine-LSH guarantee), and the constants
    are plain ints from ``random.Random`` — stable across library
    versions, bakeable into oracle SQL."""
    import random

    rnd = random.Random(seed)
    return [
        [1 if rnd.random() < 0.5 else -1 for _ in range(dim)]
        for _ in range(n_bits)
    ]


def srp_signature_portable(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    scale_bits: int = 20,
) -> DataFrame:
    """Engine-portable SRP signature: ±1 hyperplanes over INTEGER-scaled
    components, so every arithmetic step is exact and order-independent
    — the signature is reproducible in ANSI SQL bit-for-bit (q39's
    oracle), unlike float dot products whose low bits depend on
    summation order.

    Each float32 component x becomes floor(x * 2^scale_bits) (double
    multiply by a power of two is exact; floor is deterministic); the
    per-plane dot is a sum of 64-bit ints (< 2^33 total — no overflow);
    bit b of ``srp_sig`` is 1 iff the signed sum > 0. P(bit differs) ≈
    angle/π still holds — the quantization perturbs only dots within
    2^-scale_bits·dim of zero.
    """
    planes = srp_planes_rademacher(dim, n_bits, seed)
    v = F.col(vec_col)
    scaled = F.transform(
        v, lambda x: F.floor(x.cast("double") * F.lit(float(1 << scale_bits))).cast("long")
    )
    df = df.withColumn("__s", scaled)
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        plane = F.array(*[F.lit(p).cast("long") for p in planes[b]])
        dot = F.aggregate(
            F.zip_with(F.col("__s"), plane, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("srp_sig", sig).drop("__s")


def ivf_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine — the scale path
    when brute force's full corpus scan per query batch is too much.

    Build: seeded KMeans partitions the corpus into ``n_cells`` cells
    (one extra column on the corpus — amortized across queries; persist
    it in production). Search: each query scores only the ``n_probe``
    nearest cells' members — a fraction n_probe/n_cells of the corpus —
    via an equi-join on cell id, so the probe is a hash join, not a
    scan. Recall is tunable with n_probe (== n_cells ⇒ exact).

    Output: qid, cid, rank, cosine (same contract as topk_cosine).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c_vecs = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
        array_to_vector(F.col(vec_col)).alias("__mlvec"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="__mlvec", predictionCol="__cell")
    model = km.fit(c_vecs)
    assigned = model.transform(c_vecs).select("cid", "cv", "cn", "__cell")

    # centroids as a tiny DataFrame: query → n_probe nearest cells
    spark = corpus.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "__cell int, centroid array<double>",
    )
    q_vecs = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
    )
    q_cells = (
        q_vecs.join(F.broadcast(cents))
        .withColumn("__sim", cosine_similarity("qv", "centroid"))
    )
    w_probe = Window.partitionBy("qid").orderBy(F.col("__sim").desc(), F.col("__cell"))
    probes = (
        q_cells.withColumn("__pr", F.row_number().over(w_probe))
        .where(F.col("__pr") <= n_probe)
        .select("qid", "qv", "qn", "__cell")
    )

    # per-pair cost = one dot product; norms were computed per row above
    scored = (
        assigned.join(probes, "__cell")
        .where(F.col("qid") != F.col("cid"))
        .withColumn("cosine", dot("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "rank", "cosine")
    )
