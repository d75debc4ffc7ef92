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


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive content checksum of a table — the regression
    fingerprint for pipeline rewrites: same rows (in any order, any
    partitioning) ⇒ same checksum, one different cell ⇒ different
    checksum (w.h.p.).

    Each row hashes to a 48-bit integer (md5 — engine-portable, unlike
    xxhash64), reduced mod 1e9+7, and the checksum is the SUM of the
    reduced hashes (order-independent, map-side combinable — the whole
    thing is one aggregate) carried as decimal(38) so no row count can
    overflow it, then folded mod 1e9+7.

    Caveat the caller owns: pass columns whose STRING form is engine-
    stable — integers, strings, decimals. Cast doubles to scaled
    decimals and timestamps to epoch integers first (double/timestamp
    formatting differs across engines).

    Output: one row — n_rows, checksum (long).
    """
    names = list(cols) if cols else list(df.columns)
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in names
    ]
    row_h = (
        F.conv(F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 12), 16, 10)
        .cast("long") % F.lit(1000000007)
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_h.cast("decimal(38,0)")).alias("__s"),
    )
    return agg.select(
        "n_rows",
        (F.col("__s") % F.lit(1000000007)).cast("long").alias("checksum"),
    )
