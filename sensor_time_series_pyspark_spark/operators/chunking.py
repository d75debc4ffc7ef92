"""Document chunking — splitting long documents into fixed-size token
windows (optionally overlapping) for training-sequence construction and
RAG passage extraction.

The reference has no document surface; this is a north-star
training-pipeline operator (BASELINE.json). Everything is pure column
algebra (split / sequence / slice / array_join) — no UDF, no explode of
token rows, so at 100 TB each document is processed entirely map-side
and the only row growth is the ~n_tokens/stride chunks per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_size`` tokens, starting every ``stride`` tokens
    (``stride < chunk_size`` → overlapping chunks; default
    ``stride = chunk_size`` → disjoint).

    Output: (id, chunk_id, chunk_text, n_tokens) — chunk_id is the
    0-based window index; the final chunk may be short (it is never
    padded, and a start past the end is never emitted, so every token
    appears in ≥1 chunk and the concatenation of disjoint chunks
    round-trips the tokenized document).

    Scale notes: tokenization is bound to a real column first (the
    higher-order-function free-variable trap — a lambda re-evaluates
    free subexpressions per element, see
    functions/text.py:shingles_from_tokens). The per-document work is
    O(n_tokens · chunks) array slicing, map-side only; there is no
    shuffle at all.
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    stride = stride or chunk_size
    if stride <= 0:
        raise ValueError("stride must be positive")

    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks"))
    n = F.size("__toks")
    # window starts: 0, stride, 2*stride, ... < n_tokens
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    exploded = base.select(
        "id",
        "__toks",
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, F.lit(chunk_size))
    return exploded.select(
        "id",
        "chunk_id",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )
