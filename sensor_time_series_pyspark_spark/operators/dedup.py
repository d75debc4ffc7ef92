"""Deduplication suite for training-data pipelines (north-star
extension, BASELINE.json — the reference has no dedup at all).

Four tiers, cheapest first:
1. exact        — content-hash groupBy (one shuffle on the hash).
2. ngram/word Jaccard — inverted-index join: explode tokens, join on
   token, count shared per pair. Never materializes the full cross
   product; prune high-document-frequency tokens at scale.
3. MinHash LSH  — pyspark.ml MinHashLSH (seeded) over hashed shingle
   vectors; approxSimilarityJoin only compares within-bucket pairs.
4. SimHash      — 64-bit signature, banded into 16-bit chunks: near-dups
   (hamming ≤ t) must collide on ≥1 band when t < 64/bands, so the
   candidate join is an equi-join on (band_id, band_value).

All candidate-pair stages verify with an exact measure before
reporting — LSH/banding only bound recall, never precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import simhash64, tokens, word_shingles


def _spread(df: DataFrame, parallelism: int | None) -> DataFrame:
    """Repartition before CPU-heavy per-row expression work (shingling,
    signature computation). A small parquet source arrives as ONE input
    split, which serializes the whole expression stage on one core —
    the round-robin repartition costs one narrow shuffle of the raw
    rows and unlocks full-cluster parallelism for everything after."""
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row per distinct content (lowest id wins — deterministic,
    unlike dropDuplicates which keeps an arbitrary row). One shuffle on
    the 64-bit content hash, not the full text."""
    w = Window.partitionBy(F.xxhash64(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_k: int = 1,
    max_token_df: int | None = None,
    parallelism: int | None = None,
    unit: str = "word",
    persist_index: bool = True,
) -> DataFrame:
    """Exact shingle-set Jaccard for all pairs ≥ threshold, via an
    inverted-index self-join (never a cross join).

    ``unit='word'`` shingles are k-word windows; ``unit='char'`` are
    character k-grams (robust to tokenization differences / CJK).
    Output: id_a, id_b (a < b), jaccard. ``max_token_df`` drops tokens
    appearing in more than N docs before the join — the skew/scale
    valve: ubiquitous tokens generate O(df²) candidate pairs while
    contributing little to Jaccard.
    """
    if unit == "word":
        shingles = (
            word_shingles(text_col, shingle_k) if shingle_k > 1 else tokens(text_col)
        )
    elif unit == "char":
        from ..functions.text import char_ngrams

        shingles = char_ngrams(text_col, shingle_k)
    else:
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    # Hash each shingle to 64 bits INSIDE the array, before explode:
    # the inverted index then carries longs, not shingle strings —
    # ~4x smaller shuffle, cheaper key compares, and the explode never
    # materializes the strings row-wise (measured 2x on the whole
    # query). Collision risk ~n²/2⁶⁴ — at a billion distinct shingles
    # that's ~5e-2 spurious co-occurrences TOTAL, each worth +1
    # intersection count: immaterial.
    toks = _spread(df, parallelism).select(
        F.col(id_col).alias("id"),
        F.transform(F.array_distinct(shingles), lambda s: F.xxhash64(s)).alias("tok"),
    )
    inverted = toks.select(
        "id", F.size("tok").alias("n_tok"), F.explode("tok").alias("token")
    )
    if persist_index:
        # Both sides of the self-join consume `inverted`; without a
        # materialization barrier Spark re-runs the ENTIRE shingle
        # pipeline per side (exchange reuse does not fire across the
        # differing projections, measured). At 100 TB that second pass
        # is the single most expensive thing in the query — persist
        # (disk-spillable) computes it once. Lifecycle: left to Spark's
        # LRU eviction; pass persist_index=False to opt out.
        from pyspark import StorageLevel

        inverted = inverted.persist(StorageLevel.MEMORY_AND_DISK)
    if max_token_df is not None:
        df_counts = inverted.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        inverted = inverted.join(
            df_counts.where(F.col("df") <= max_token_df).select("token"), "token"
        )
    a = inverted.select(
        F.col("token"),
        F.col("id").alias("id_a"),
        F.col("n_tok").alias("n_a"),
    )
    b = inverted.select(
        F.col("token"),
        F.col("id").alias("id_b"),
        F.col("n_tok").alias("n_b"),
    )
    pairs = (
        a.join(b, "token")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_dist_threshold: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    shingle_k: int = 2,
    seed: int = 42,
    parallelism: int | None = None,
) -> DataFrame:
    """Approximate near-dup pairs via MinHash LSH
    (pyspark.ml.feature.MinHashLSH — SURVEY.md §4: no custom Catalyst
    work needed). Shingles → binary HashingTF vector → seeded MinHash
    signatures → approxSimilarityJoin compares only candidate buckets.

    Output: id_a, id_b (a < b), jaccard_dist (exact on hashed sets).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = _spread(df, parallelism).select(
        F.col(id_col).alias("id"), word_shingles(text_col, shingle_k).alias("shingles")
    ).where(F.size("shingles") > 0)
    tf = HashingTF(
        inputCol="shingles", outputCol="vec", numFeatures=num_features, binary=True
    )
    vecs = tf.transform(sh)
    lsh = MinHashLSH(inputCol="vec", outputCol="sig", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, jaccard_dist_threshold, distCol="jaccard_dist")
    return (
        joined.where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.col("jaccard_dist"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    shingle_k: int = 1,
    n_bands: int = 8,
    parallelism: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature (pure column algebra,
    functions/text.py:simhash64), banded equi-join for candidates,
    exact hamming (bit_count(xor)) verify.

    With n_bands=8 (8 bits each), any pair with hamming ≤ 7 shares ≥1
    intact band (pigeonhole) → recall is exact for max_hamming ≤ 7,
    probabilistic above. Output: id_a, id_b, hamming.
    """
    sigs = _spread(df, parallelism).select(
        F.col(id_col).alias("id"), simhash64(text_col, shingle_k).alias("sig")
    )
    band_width = 64 // n_bands
    bands = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftrightunsigned(F.col("sig"), i * band_width)
                        .bitwiseAND(F.lit((1 << band_width) - 1))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "sig", "band.band_id", "band.band_val")
    a = bands.select(
        "band_id", "band_val", F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    b = bands.select(
        "band_id", "band_val", F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    cand = (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.expr("sig_a ^ sig_b"))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cosine_threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicates: pairs with cosine ≥ threshold.

    Baseline implementation is the exact block-join (self-join on a
    norm-bucketed key would prune little for cosine, so this is the
    honest O(n²/2) form — fine to ~10⁵ rows). The scale path is
    random-hyperplane LSH (similarity.py:signed_random_projection) to
    generate candidates, with this same exact cosine as the verifier.
    Output: id_a, id_b, cosine.
    """
    from ..functions.vectors import cosine_similarity

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", cosine_similarity("va", "vb"))
        .where(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", "cosine")
    )
