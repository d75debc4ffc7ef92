"""Declarative data-quality expectations (Great-Expectations-style)
evaluated in ONE Spark pass.

``run_expectations(df, suite)`` compiles a list of declarative checks
into a single conditional aggregate over the input — no per-check
scans, no driver loops — and returns one audit row per expectation:
``(name, kind, passed, observed, threshold)``. At 100 TB the whole
suite costs exactly one map-side-combinable aggregate regardless of
how many expectations it contains.

Supported kinds:
- ``row_count_between(lo, hi)``
- ``not_null(col, max_null_frac)``
- ``unique(col)`` — distinct count equals row count
- ``accepted_values(col, values)`` — no row outside the set
- ``between(col, lo, hi, max_violation_frac)``
- ``monotonic_id(col)`` — max(col) - min(col) + 1 >= count (no dense
  requirement, catches gross id reuse when equality holds)
- ``matches_regex(col, pattern, max_violation_frac)`` — partial-match
  (rlike) semantics; NULL is a violation
- ``mean_between(col, lo, hi)`` — exact decimal-sum mean in band
  (the only two-aggregate kind: sum + non-null count)
- ``unique_combo(cols)`` — composite-key uniqueness over the tuple

NULL policy: a NULL value is a VIOLATION for ``between`` and
``accepted_values`` (a contract on a column's domain is not satisfied
by an absent value), and is what ``not_null`` counts by definition.
Empty-input policy: with zero rows every data-content check reports
``passed = false`` and ``observed = 0.0`` — an audit over an empty
table must not vacuously succeed — while ``row_count_between``
evaluates its band naturally (``lo <= 0 <= hi`` may legitimately
pass). Every audit row therefore carries a definite (non-NULL)
boolean, so downstream ``WHERE passed`` / ``WHERE NOT passed``
filters partition the report exactly.

Each expectation is pure integer counting; ``observed`` is reported
as a double with at most one division, so audit rows hash-gate
cross-engine (see q560's oracle).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    kind: str
    col: str | None = None
    lo: float | None = None
    hi: float | None = None
    frac: float = 0.0
    values: tuple = field(default_factory=tuple)
    pattern: str | None = None
    cols: tuple = field(default_factory=tuple)


def row_count_between(name: str, lo: int, hi: int) -> Expectation:
    return Expectation(name, "row_count_between", lo=lo, hi=hi)


def not_null(name: str, col: str, max_null_frac: float = 0.0) -> Expectation:
    return Expectation(name, "not_null", col=col, frac=max_null_frac)


def unique(name: str, col: str) -> Expectation:
    return Expectation(name, "unique", col=col)


def accepted_values(name: str, col: str, values) -> Expectation:
    return Expectation(name, "accepted_values", col=col, values=tuple(values))


def between(
    name: str, col: str, lo: float, hi: float, max_violation_frac: float = 0.0
) -> Expectation:
    return Expectation(name, "between", col=col, lo=lo, hi=hi, frac=max_violation_frac)


def monotonic_id(name: str, col: str) -> Expectation:
    return Expectation(name, "monotonic_id", col=col)


def matches_regex(
    name: str, col: str, pattern: str, max_violation_frac: float = 0.0
) -> Expectation:
    """Rows where ``col`` does NOT contain a match of ``pattern``
    (partial-match semantics, like Spark rlike / DuckDB
    regexp_matches) count as violations; NULL is a violation."""
    return Expectation(
        name, "matches_regex", col=col, pattern=pattern,
        frac=max_violation_frac,
    )


def mean_between(name: str, col: str, lo: float, hi: float) -> Expectation:
    """Column mean (NULLs excluded, standard SQL avg semantics) must
    land in [lo, hi]. Computed as an EXACT decimal(38,6) sum with one
    double division, so the observed value hash-gates cross-engine;
    empty input or an all-NULL column is a definite failure."""
    return Expectation(name, "mean_between", col=col, lo=lo, hi=hi)


def unique_combo(name: str, cols) -> Expectation:
    """Multi-column uniqueness: distinct count over the column TUPLE
    equals the row count (the composite-key contract ``unique`` can't
    express)."""
    return Expectation(name, "unique_combo", cols=tuple(cols))


def run_expectations(df: DataFrame, suite: list[Expectation]) -> DataFrame:
    """One conditional aggregate for the whole suite, then a
    constant-cardinality projection to one audit row per check."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for i, e in enumerate(suite):
        if e.kind == "not_null":
            aggs.append(
                F.sum(F.when(F.col(e.col).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"__m{i}")
            )
        elif e.kind == "unique":
            aggs.append(F.count_distinct(F.col(e.col)).alias(f"__m{i}"))
        elif e.kind == "accepted_values":
            # NULL is outside every accepted domain -> violation
            aggs.append(
                F.sum(
                    F.when(
                        F.col(e.col).isNull()
                        | ~F.col(e.col).isin(list(e.values)),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias(f"__m{i}")
            )
        elif e.kind == "between":
            # NULL cannot satisfy a range contract -> violation
            aggs.append(
                F.sum(
                    F.when(
                        F.col(e.col).isNull()
                        | (F.col(e.col) < e.lo)
                        | (F.col(e.col) > e.hi),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias(f"__m{i}")
            )
        elif e.kind == "monotonic_id":
            aggs.append(
                (
                    F.max(F.col(e.col)) - F.min(F.col(e.col)) + 1
                )
                .cast("bigint")
                .alias(f"__m{i}")
            )
        elif e.kind == "matches_regex":
            # NULL or no partial match -> violation (rlike semantics)
            aggs.append(
                F.sum(
                    F.when(
                        F.col(e.col).isNull()
                        | ~F.col(e.col).rlike(e.pattern),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias(f"__m{i}")
            )
        elif e.kind == "mean_between":
            # exact decimal sum; the companion count counts only values
            # that SURVIVE the decimal cast (NaN / overflow cast to NULL
            # in the non-ANSI sum — counting them would silently deflate
            # the observed mean), so sum and count see the same rows
            aggs.append(
                F.sum(F.col(e.col).cast("decimal(38,6)")).alias(f"__m{i}")
            )
            aggs.append(
                F.count(F.col(e.col).cast("decimal(38,6)"))
                .cast("bigint")
                .alias(f"__m2_{i}")
            )
        elif e.kind == "unique_combo":
            aggs.append(
                F.count_distinct(
                    F.struct(*[F.col(c) for c in e.cols])
                ).alias(f"__m{i}")
            )
        elif e.kind == "row_count_between":
            aggs.append(F.lit(0).cast("bigint").alias(f"__m{i}"))
        else:
            raise ValueError(f"unknown expectation kind {e.kind!r}")
    one = df.agg(*aggs)

    # ONE projection: an inline struct per expectation exploded from
    # the single aggregate row (a union of per-check selects would
    # re-plan the aggregate once per branch)
    structs = []
    for i, e in enumerate(suite):
        n = F.col("__n")
        m = F.col(f"__m{i}")
        if e.kind == "row_count_between":
            passed = (n >= int(e.lo)) & (n <= int(e.hi))
            observed = n.cast("double")
            threshold = F.lit(float(e.hi))
        elif e.kind == "not_null":
            observed = m.cast("double") / n.cast("double")
            passed = observed <= F.lit(float(e.frac))
            threshold = F.lit(float(e.frac))
        elif e.kind == "unique":
            passed = m == n
            observed = m.cast("double")
            threshold = n.cast("double")
        elif e.kind == "accepted_values":
            passed = m == 0
            observed = m.cast("double")
            threshold = F.lit(0.0)
        elif e.kind == "between":
            observed = m.cast("double") / n.cast("double")
            passed = observed <= F.lit(float(e.frac))
            threshold = F.lit(float(e.frac))
        elif e.kind == "matches_regex":
            observed = m.cast("double") / n.cast("double")
            passed = observed <= F.lit(float(e.frac))
            threshold = F.lit(float(e.frac))
        elif e.kind == "mean_between":
            cnt = F.col(f"__m2_{i}")
            observed = F.when(
                cnt > 0, m.cast("double") / cnt.cast("double")
            ).otherwise(F.lit(0.0))
            # all-NULL column (cnt=0): definite failure, observed 0.0
            passed = F.when(
                cnt > 0,
                (observed >= F.lit(float(e.lo)))
                & (observed <= F.lit(float(e.hi))),
            ).otherwise(F.lit(False))
            threshold = F.lit(float(e.hi))
        elif e.kind == "unique_combo":
            passed = m == n
            observed = m.cast("double")
            threshold = n.cast("double")
        else:  # monotonic_id
            # coalesce: max/min are NULL on an all-NULL id column
            # (and on empty input) — that's a definite failure, not
            # a NULL verdict
            passed = F.coalesce(m >= n, F.lit(False))
            observed = F.coalesce(m.cast("double"), F.lit(0.0))
            threshold = n.cast("double")
        if e.kind != "row_count_between":
            # empty input: definite failure, never a NULL verdict
            # (0/0 and max()-min() are NULL at n=0 otherwise)
            empty = n == F.lit(0).cast("bigint")
            passed = F.when(empty, F.lit(False)).otherwise(passed)
            observed = F.when(empty, F.lit(0.0)).otherwise(observed)
        structs.append(
            F.struct(
                F.lit(e.name).alias("name"),
                F.lit(e.kind).alias("kind"),
                passed.alias("passed"),
                observed.alias("observed"),
                threshold.alias("threshold"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("__e")).select(
        "__e.*"
    )
