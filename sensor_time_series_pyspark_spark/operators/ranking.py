"""Corpus-level text ranking and training-sequence packing.

Two training-data-pipeline operators over the documents table:

- ``bm25_rank``: per-document top terms under BM25 weighting — the
  retrieval-grade upgrade of the tf-idf ranking in q56 (term saturation
  via k1, document-length normalization via b). Used for corpus
  fingerprinting, keyword extraction, and quality filtering.
- ``pack_offsets``: concat-and-chunk sequence packing — the layout step
  before LLM training: documents are concatenated in a deterministic
  order and split into fixed token-budget chunks; each document gets
  its global token offset and chunk id. Everything is integer window
  algebra (exact, engine-portable, oracle-checkable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def bm25_rank(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``top_n`` terms per document by BM25 weight.

    BM25 (Robertson et al., Okapi): idf(t) * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl)). We use the idf RATIO
    (N - df + 0.5)/(df + 0.5) WITHOUT the log: log is monotone, so
    per-document term ranking is unchanged, and the score stays a pure
    rational function of integers — bit-identical across engines
    (libm log low bits are not portable; see q56's integer-score
    precedent).

    Plan shape: explode → (doc, term) tf counts → term df aggregate →
    one global avgdl scalar (broadcast literal join) → per-doc ranking
    window. Two shuffles on term, one on doc — same skeleton as
    q56_top_terms, so the scale analysis there (high-df stopword skew →
    prune via max_token_df upstream) carries over.

    Output: id, term, tf, df, score (double), rank ≤ top_n.
    """
    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks"))
    term_tf = (
        base.select("id", F.size("__toks").alias("dl"), F.explode("__toks").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs_dl = base.select(
        F.count(F.lit(1)).alias("n_docs"), F.sum(F.size("__toks")).alias("total_dl")
    )
    term_df = term_tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        term_tf.join(term_df, "term")
        .crossJoin(F.broadcast(n_docs_dl))
        .withColumn("avgdl", F.col("total_dl") / F.col("n_docs"))
        .withColumn(
            "score",
            ((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("id", "term", "tf", "df", "score", "rank")
    )


def pack_offsets(
    df: DataFrame,
    id_col: str,
    n_tokens_col,
    budget: int,
    order_by: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk packing plan: documents are laid out
    back-to-back in ``order_by`` order (default: by id — deterministic
    and reproducible across runs) and the stream is cut into
    ``budget``-token chunks. Each document's chunk id is where its
    FIRST token lands; a document may straddle a boundary (the
    standard pretraining layout — no padding waste, splits allowed).

    ``partition_by`` (e.g. source/shard) packs each group
    independently, which is also the scale path: the running-total
    window is then per-group instead of one global serial sort. For a
    single global stream at 100 TB, pack per shard and assign shard
    base offsets from shard totals (one tiny driver-side pass) —
    same operator, composed twice.

    Integer window algebra only — exact and oracle-checkable.
    Output: id (+partition cols), n_tokens, offset (first-token global
    position, 0-based), chunk_id = offset div budget.
    """
    keys = list(partition_by or [])
    # the layout frame renames id_col → "id"; order on the renamed
    # column when the caller didn't pass an explicit order
    order = list(order_by or ["id"])
    w = (
        Window.partitionBy(*keys).orderBy(*order)
        if keys
        else Window.orderBy(*order)
    )
    n_tok = (
        F.col(n_tokens_col) if isinstance(n_tokens_col, str) else n_tokens_col
    )
    base = df.select(
        F.col(id_col).alias("id"), *keys, n_tok.cast("long").alias("n_tokens")
    )
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("offset", (cum - F.col("n_tokens")))
        .withColumn("chunk_id", F.floor(F.col("offset") / F.lit(budget)))
        .select("id", *keys, "n_tokens", "offset", "chunk_id")
    )


def collocation_lift(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_pair_count: int = 3,
) -> DataFrame:
    """Corpus collocations (adjacent word pairs) scored by LIFT —
    observed bigram frequency over the independence expectation:

        lift(x, y) = N_tokens * c(x y) / (c(x) * c(y))

    PMI is log(lift); the log is dropped deliberately — every input to
    the score is an exact integer count, so the single division makes
    the score engine-portable where log's libm variation would not, and
    log is monotone so the RANKING is identical.

    Shape: one token explode for unigram counts, one shifted zip for
    bigram counts (both hash aggregates), then two broadcast-sized
    joins of the bigram frame against the unigram frame (vocabulary
    is tiny next to the corpus; at web scale the unigram frame is still
    ~millions of rows — the joins stay shuffle-hash on the word key).
    ``min_pair_count`` prunes the hapax noise that dominates raw lift.

    Output: w1, w2, n_pair, n_w1, n_w2, lift.
    """
    toks = df.select(tokens(text_col).alias("__t"))
    uni = (
        toks.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                    F.slice(F.col("__t"), 2, F.greatest(F.size("__t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    # empty corpus: sum() is NULL — coalesce to 0 (the lift frame is
    # empty anyway, so the multiplier never divides anything real)
    n_tokens = toks.agg(F.sum(F.size("__t")).alias("n")).collect()[0]["n"] or 0
    out = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")), "w2")
    )
    lift = (
        (F.lit(int(n_tokens)) * F.col("n_pair")).cast("double")
        / (F.col("n_w1") * F.col("n_w2")).cast("double")
    )
    return out.select("w1", "w2", "n_pair", "n_w1", "n_w2", lift.alias("lift"))


def ngram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_context_count: int = 2,
) -> DataFrame:
    """Maximum-likelihood n-gram language model table:
    P(w_n | w_1..w_{n-1}) = c(w_1..w_n) / c(w_1..w_{n-1} ·) — the
    classic corpus LM estimation step (the count tables behind KenLM /
    infini-gram style scoring), at Spark scale: two hash aggregates on
    the gram key plus a window over the AGGREGATED context frame (tiny
    next to the corpus), never a second corpus scan for denominators.

    Probabilities are exact-integer counts with ONE division —
    engine-portable. ``min_context_count`` drops sparse contexts whose
    MLE is noise (and whose cardinality dominates the table at scale).

    Output: context (space-joined n-1 words), next_word, c_full,
    c_context, prob.
    """
    if n < 2:
        raise ValueError("ngram_lm needs n >= 2")
    toks = df.select(tokens(text_col).alias("__t"))
    m = n - 1
    win = F.greatest(F.size("__t") - (n - 1), F.lit(0))
    grams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), win),
                lambda i: F.struct(
                    F.array_join(F.slice(F.col("__t"), i, m), " ").alias("context"),
                    F.element_at(F.col("__t"), (i + m).cast("int")).alias("next_word"),
                ),
            )
        ).alias("g")
    ).select("g.context", "g.next_word")
    full = grams.groupBy("context", "next_word").agg(
        F.count(F.lit(1)).alias("c_full")
    )
    w_ctx = Window.partitionBy("context")
    out = full.select(
        "context",
        "next_word",
        "c_full",
        F.sum("c_full").over(w_ctx).alias("c_context"),
    ).where(F.col("c_context") >= min_context_count)
    return out.select(
        "context",
        "next_word",
        "c_full",
        "c_context",
        (F.col("c_full").cast("double") / F.col("c_context").cast("double")).alias(
            "prob"
        ),
    )


def posting_lists(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Inverted-index posting-list summary per term: document
    frequency, total term frequency, and the posting id range — the
    index-construction statistics a search build emits before writing
    segments.

    One explode + one hash aggregate; the per-(doc, term) tf is
    pre-reduced map-side by the first groupBy, so the term-level
    shuffle carries one row per (doc, term), not one per occurrence.

    Output: term, df, tf, min_doc_id, max_doc_id.
    """
    occ = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    per_doc = occ.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )
