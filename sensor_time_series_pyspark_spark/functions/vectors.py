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
