"""Train/eval contamination detection — which evaluation documents
share verbatim word n-grams with the training corpus, and how many.

This is the standard decontamination primitive for LLM training data
(n-gram overlap between a benchmark/eval set and the training set).
The reference has no document surface; north-star training-pipeline
operator (BASELINE.json).

Shape at scale: both sides reduce to DISTINCT (doc, ngram-id) pairs
before the join, so the join key is a 48/64-bit long, the shuffle
carries (long, long) rows only, and ubiquitous n-grams can be capped
with ``max_ngram_df`` exactly like the Jaccard inverted index
(operators/dedup.py:jaccard_pairs) — a hot n-gram appearing in half
the corpus would otherwise fan out O(df_train · df_test) joined rows
while signalling nothing about verbatim copying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_from_tokens, tokens
from .dedup import shingle_id_portable


def _doc_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int, portable: bool
) -> DataFrame:
    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks"))
    sh = shingles_from_tokens(F.col("__toks"), n) if n > 1 else F.array_distinct(
        F.col("__toks")
    )
    hasher = shingle_id_portable if portable else F.xxhash64
    return base.select(
        "id", F.explode(F.transform(sh, lambda s: hasher(s))).alias("gram")
    )


def ngram_overlap(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    max_ngram_df: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Per test document: how much of it is verbatim-covered by the
    training corpus.

    Output: (id, n_grams, n_shared, n_train_docs) — the test doc's
    distinct n-gram count, how many of those appear in ≥1 training
    document, and how many distinct training documents share ≥1 n-gram
    with it. ``n_shared / n_grams`` is the contamination fraction;
    callers threshold it (the common decontamination rule drops eval
    docs with any 8-gram hit, i.e. threshold 0 at n=8).

    ``max_ngram_df`` drops n-grams appearing in more than N *training*
    docs before the join (boilerplate/stop-phrase valve). ``portable``
    switches from xxhash64 (production: one hash op) to the md5-based
    48-bit id that DuckDB reproduces exactly (differential testing,
    operators/dedup.py:shingle_id_portable).

    Left join keeps uncontaminated test docs (n_shared = 0) in the
    output — dropping them would make the clean set invisible.
    """
    tr = _doc_ngrams(train, id_col, text_col, n, portable)
    te = _doc_ngrams(test, id_col, text_col, n, portable)
    if max_ngram_df is not None:
        keep = (
            tr.groupBy("gram")
            .agg(F.count_distinct("id").alias("__df"))
            .where(F.col("__df") <= max_ngram_df)
            .select("gram")
        )
        tr = tr.join(keep, "gram")
    hits = (
        te.join(tr.withColumnRenamed("id", "train_id"), "gram", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("__rows"),
            F.count("train_id").alias("__hit_rows"),
            F.count_distinct(
                F.when(F.col("train_id").isNotNull(), F.col("gram"))
            ).alias("n_shared"),
            F.count_distinct("train_id").alias("n_train_docs"),
        )
    )
    # n_grams = distinct grams of the test doc = rows that joined to no
    # train doc (one row each) + distinct grams among hit rows
    return hits.select(
        "id",
        (F.col("__rows") - F.col("__hit_rows") + F.col("n_shared")).alias(
            "n_grams"
        ),
        "n_shared",
        "n_train_docs",
    )


def dup_ngram_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Per-document duplicated-n-gram rate: the fraction of a doc's
    DISTINCT n-grams that also appear in at least one other document —
    the RefinedWeb/Gopher-style repetition-across-corpus signal used to
    down-rank boilerplate-heavy pages.

    Shape: one exploded (doc, gram) frame (distinct grams per doc), a
    gram-level document-frequency aggregate, a join back, and a per-doc
    aggregate — two shuffles on the gram key, one on the doc key, all
    hash-partitioned; no self-join of docs (the naive pairwise form is
    O(docs²)). Integer counts + ONE division → engine-portable.

    Output: id, n_grams, n_dup, dup_rate. Docs shorter than n tokens
    have zero grams and are absent (no 0/0 rows).
    """
    grams = _doc_ngrams(df, id_col, text_col, n, portable).distinct()
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    return (
        grams.join(gram_df, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("__df") > 1, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "id",
            "n_grams",
            "n_dup",
            (F.col("n_dup").cast("double") / F.col("n_grams").cast("double")).alias(
                "dup_rate"
            ),
        )
    )


def chunk_dup_share(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 8,
) -> DataFrame:
    """Chunk-level exact duplication (the CCNet/RefinedWeb paragraph
    dedup signal, token-chunk flavored): split every document into
    disjoint ``chunk_size``-token chunks, hash each chunk, and score
    each document by the share of its chunks that also appear in some
    OTHER document. High shares mark boilerplate/mirrored text that
    document-level exact dedup misses.

    Shape at scale: chunks reduce to (doc, chunk-id-hash) rows; the
    corpus-wide frequency of each chunk hash is ONE hash aggregate
    keyed on the 48-bit id, and the per-document rollup joins the tiny
    (hash, df) frame back on that same key — the inverted-index shape
    of jaccard_pairs without the pair fan-out (no doc x doc join at any
    point). Duplicated-ness needs df>=2, computed per DISTINCT chunk
    then re-joined, so a doc repeating its own chunk is not
    self-contaminated.

    Output: (id, n_chunks, n_dup_chunks, dup_share).
    """
    from .chunking import chunk_tokens

    chunks = chunk_tokens(df, id_col, text_col, chunk_size=chunk_size).select(
        "id", shingle_id_portable(F.col("chunk_text")).alias("gram")
    )
    # distinct docs per chunk hash (df>=2 <=> appears in another doc)
    docfreq = chunks.distinct().groupBy("gram").agg(
        F.countDistinct("id").alias("df")
    )
    j = chunks.join(docfreq, "gram")
    return j.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("bigint").alias(
            "n_dup_chunks"
        ),
    ).select(
        "id",
        "n_chunks",
        "n_dup_chunks",
        (
            F.col("n_dup_chunks").cast("double")
            / F.col("n_chunks").cast("double")
        ).alias("dup_share"),
    )
