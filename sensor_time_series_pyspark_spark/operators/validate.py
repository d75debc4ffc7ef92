"""Data-quality constraints for training-data pipelines (north-star
adjunct: before dedup/filter/train, a 100 TB ingest needs cheap,
single-pass validation — the deequ pattern, minimally).

Constraints are plain boolean Columns (JVM-side, codegen'd). Three
consumption modes off one definition:
- ``violation_counts``: one aggregate row (n_rows + violations per
  rule) — the audit query.
- ``observe_violations``: same counters attached to an existing
  action via ``observe`` — zero extra jobs in production pipelines.
- ``quarantine``: split (good, bad) with a ``failed_rules`` array on
  the bad side — the routing primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def _violation(cond: Column) -> Column:
    # NULL condition results count as violations: a rule that can't
    # evaluate is a failed rule, not a pass
    return F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1))


def violation_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-row audit: n_rows plus one violation counter per rule, in a
    single aggregate pass regardless of rule count."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[_violation(cond).alias(name) for name, cond in rules.items()],
    )


def observe_violations(
    df: DataFrame, rules: dict[str, Column], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach the same counters to the NEXT action on df (no extra
    job; read ``obs.get`` after the action)."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        *[_violation(cond).alias(n) for n, cond in rules.items()],
    )
    return observed, obs


def quarantine(
    df: DataFrame, rules: dict[str, Column], failed_col: str = "failed_rules"
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): bad rows carry the array of rule names they failed.
    One filter each side — Catalyst shares the scan when both are
    consumed in one action (e.g. writes in the same job via union)."""
    fails = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in rules.items()
            ]
        )
    )
    tagged = df.withColumn(failed_col, fails)
    good = tagged.where(F.size(failed_col) == 0).drop(failed_col)
    bad = tagged.where(F.size(failed_col) > 0)
    return good, bad
