"""Vector math over ``array<float>`` embedding columns — pure
higher-order functions (F.zip_with / F.aggregate), JVM-side. No UDFs:
at 100 TB the dot products run inside whole-stage codegen, not in a
Python worker.

Not in the reference (north-star extension, BASELINE.json): the
reference has no array columns at all (SURVEY.md §1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (double)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe only insofar as NULL arrays yield
    NULL (filter upstream). Zero vectors yield NULL (division by zero)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def quantize_int8(vec: Column | str) -> Column:
    """Symmetric int8 quantization of an embedding column: struct
    (scale: double, q: array<tinyint>) with q_i = round_half_up(x_i /
    scale), scale = max|x|/127.

    Why: at 100 TB an embedding column is the widest thing in the
    table — int8 cuts it 4x (plus better parquet byte-stream-split /
    dictionary behavior), and reranking on the float originals after a
    quantized candidate pass loses ~nothing for cosine retrieval.

    round is floor(x+0.5) (half-up) rather than rint: identical results
    in every engine, no banker's-rounding ambiguity. Zero vectors get
    scale=0 and all-zero codes.
    """
    v = F.transform(_c(vec), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qstruct: Column | str) -> Column:
    """Inverse of quantize_int8: array<double> reconstruction
    (error <= scale/2 per element)."""
    s = _c(qstruct)
    return F.transform(s["q"], lambda e: e.cast("double") * s["scale"])
