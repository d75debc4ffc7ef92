"""Rainflow fatigue analysis (round 10): ASTM E1049-85 four-point
cycle counting per asset (q603) and the Miner's-rule damage roll-up
over the counted cycles (q604). The one classic sensor-domain
operator absent through round 9 (flagged in VERDICT r9 #5): the
algorithm is a sequential stack over each series' turning points, so
the Spark side is ``applyInPandas`` per entity
(operators/rainflow.py) and the DuckDB twin replays the identical
stack machine as a recursive CTE — one push or one reduction per
recursion step, terminal state's residual unnested as half cycles.
Everything is integer algebra on the q444-convention cents series
(decimal(12,2)*100), so the cycle multiset hash-gates exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators.rainflow import (
    rainflow_cycles,
)
from sensor_time_series_pyspark_spark.queries.registry import register_many
from sensor_time_series_pyspark_spark.sources.readers import read_table


def _daily_cents(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user daily-max load series in integer cents (the q444
    convention) — resampled BEFORE the Python hop so each pandas
    group is one bounded series."""
    ev = read_table(spark, sf, "events")
    return ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        (F.max("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("xc")
    )


def _q_rainflow_cycles(spark: SparkSession, sf: str) -> DataFrame:
    """Rainflow cycle signatures per user: (rng, mean2, is_full,
    n_cycles) with rng = |B-C| and mean2 = B+C (twice the cycle mean
    — integers stay integers). ONE shuffle to co-locate each user's
    daily series; the stack walk is O(n) per series inside the Arrow
    batch; only cycle SIGNATURES cross back."""
    return rainflow_cycles(_daily_cents(spark, sf), "user_id", "day", "xc")


def _q_rainflow_damage(spark: SparkSession, sf: str) -> DataFrame:
    """Miner's-rule fatigue damage per user over the rainflow cycles:
    damage ∝ sum(weight * n * rng^3) with weight 2 for full cycles, 1
    for residual halves — reported as the INTEGER damage2 (twice the
    conventional half-weighted sum, so no float ever enters).
    Headroom: rng <= ~5e4 cents so rng^3 <= ~1.25e14; the decimal
    (38,0) accumulator is safe past 1e23 cycles and the final BIGINT
    cast is exact to ~9.2e18 total damage2 — five decades above the
    tested scale; the HUGEINT->BIGINT cast in the twin errors loudly
    at the same bound."""
    cy = _q_rainflow_cycles(spark, sf)
    d38 = "decimal(38,0)"
    w = F.when(F.col("is_full") == 1, F.lit(2)).otherwise(F.lit(1))
    rng = F.col("rng").cast(d38)
    term = (
        F.col("n_cycles").cast(d38) * w.cast(d38) * rng * rng * rng
    )
    return cy.groupBy("user_id").agg(
        F.sum(F.when(F.col("is_full") == 1, F.col("n_cycles")))
        .cast("bigint")
        .alias("n_full"),
        F.sum(F.when(F.col("is_full") == 0, F.col("n_cycles")))
        .cast("bigint")
        .alias("n_half"),
        F.sum(term).cast("bigint").alias("damage2"),
    )


_RAINFLOW_CTE = """
  daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
      CAST(CAST(max(value) AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
    FROM events GROUP BY 1, 2
  ),
  seq AS (
    SELECT user_id, list(x ORDER BY day) AS v FROM daily GROUP BY user_id
  ),
  comp AS (
    SELECT user_id,
      list_transform(
        list_filter(range(1, len(v) + 1),
          i -> i = 1 OR v[i] != v[i - 1]),
        i -> v[i]) AS c
    FROM seq
  ),
  tp AS (
    SELECT user_id,
      CASE WHEN len(c) <= 2 THEN c
      ELSE
        [c[1]] ||
        list_transform(
          list_filter(range(2, len(c)),
            i -> (c[i] - c[i - 1]) * (c[i + 1] - c[i]) < 0),
          i -> c[i])
        || [c[len(c)]]
      END AS pts
    FROM comp
  ),
  walk AS (
    SELECT user_id, pts, 1 AS i,
      CAST([] AS BIGINT[]) AS stack,
      CAST(NULL AS BIGINT) AS rng, CAST(NULL AS BIGINT) AS mean2
    FROM tp
    UNION ALL
    SELECT user_id, pts,
      CASE WHEN red THEN i ELSE i + 1 END AS i,
      CASE WHEN red THEN stack[1:n-3] || [stack[n]]
           ELSE stack || [pts[i]] END AS stack,
      CASE WHEN red THEN abs(stack[n-1] - stack[n-2]) END AS rng,
      CASE WHEN red THEN stack[n-1] + stack[n-2] END AS mean2
    FROM (
      SELECT user_id, pts, i, stack,
        len(stack) AS n,
        (len(stack) >= 4
          AND abs(stack[len(stack) - 1] - stack[len(stack) - 2])
            <= abs(stack[len(stack) - 2] - stack[len(stack) - 3])
          AND abs(stack[len(stack) - 1] - stack[len(stack) - 2])
            <= abs(stack[len(stack)] - stack[len(stack) - 1])) AS red
      FROM walk
    )
    WHERE red OR i <= len(pts)
  ),
  final AS (
    SELECT user_id, stack FROM walk
    WHERE i > len(pts)
      AND NOT (len(stack) >= 4
        AND abs(stack[len(stack) - 1] - stack[len(stack) - 2])
          <= abs(stack[len(stack) - 2] - stack[len(stack) - 3])
        AND abs(stack[len(stack) - 1] - stack[len(stack) - 2])
          <= abs(stack[len(stack)] - stack[len(stack) - 1]))
  ),
  halves AS (
    SELECT user_id, u['rng'] AS rng, u['mean2'] AS mean2
    FROM (
      SELECT user_id, UNNEST(list_transform(range(1, len(stack)),
        j -> struct_pack(rng := abs(stack[j + 1] - stack[j]),
                         mean2 := stack[j] + stack[j + 1]))) AS u
      FROM final)
  ),
  allc AS (
    SELECT user_id, rng, mean2, 1 AS is_full
    FROM walk WHERE rng IS NOT NULL
    UNION ALL
    SELECT user_id, rng, mean2, 0 AS is_full FROM halves
  ),
  sig AS (
    SELECT user_id, rng, mean2, CAST(is_full AS INT) AS is_full,
      CAST(count(*) AS BIGINT) AS n_cycles
    FROM allc GROUP BY 1, 2, 3, 4
  )
"""


register_many(
    {
        "q603_rainflow_cycles": _q_rainflow_cycles,
        "q604_rainflow_damage": _q_rainflow_damage,
    },
    {
        "q603_rainflow_cycles": f"""
            WITH RECURSIVE
            {_RAINFLOW_CTE}
            SELECT user_id, rng, mean2, is_full, n_cycles FROM sig
        """,
        "q604_rainflow_damage": f"""
            WITH RECURSIVE
            {_RAINFLOW_CTE}
            SELECT user_id,
              CAST(sum(CASE WHEN is_full = 1 THEN n_cycles END)
                AS BIGINT) AS n_full,
              CAST(sum(CASE WHEN is_full = 0 THEN n_cycles END)
                AS BIGINT) AS n_half,
              CAST(sum(CAST(n_cycles AS HUGEINT)
                  * (CASE WHEN is_full = 1 THEN 2 ELSE 1 END)
                  * rng * rng * rng) AS BIGINT) AS damage2
            FROM sig GROUP BY user_id
        """,
    },
)
