"""Round-7 bracket gates for the remaining rows-only sketch queries
(VERDICT r6 next-round #1): q57/q96 (HLL distinct-count), q131 (KLL
quantiles), q144 (frequent-items top-k). Each assertion is the
SKETCH'S OWN published error contract evaluated against the exact
answer computed in-test — at BOTH sf0.01 and sf0.1 — so the gate class
"rows-only, invariants elsewhere" is emptied:

- q57 uses Spark's ``approx_count_distinct`` (HyperLogLog++,
  default rsd = 0.05 = one standard deviation of relative error).
  Observed sf0.1 error is 6.7% (~1.3 sigma); we assert within 3 sigma
  (15%) — a real HLL break (hash bucketing bug, merge bug) is 10-100%.
- q96 merges DataSketches HLL partials at lg_k=12
  (RSE = 1.04/sqrt(2^12) ~= 1.625%); union of same-lg_k sketches keeps
  the bound. Assert within 3*RSE ~= 4.9%.
- q131 merges KLL(k=200) partials (normalized rank error ~1.65% at
  99% confidence, the DataSketches published figure for k=200; merging
  preserves it). Like q35's bracket: compute the exact order
  statistics at ranks (p +- eps)*n and assert each sketch quantile
  lies inside the value bracket. Observed error is <=0.45%.
- q144 tracks max_items_tracked=10000 >> the 5-value event_type
  domain, so the DataSketches frequent-items contract degenerates to
  EXACT counts: assert each (nation, item) est_count equals the exact
  count, and the per-nation top-3 count multiset equals the exact
  window-rank top-3.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.sources.readers import read_table

SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _queries():
    import __spark_entry__ as m

    return m.queries()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_q57_hllpp_within_3_sigma(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in _queries()["q57_approx_distinct"](spark, sf_dir).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        rel = abs(approx[et] - ex) / max(ex, 1)
        assert rel <= 3 * 0.05, (et, ex, approx[et], rel)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_q96_hll_merge_within_3_rse(spark, sf_dir):
    rse = 1.04 / math.sqrt(2**12)  # lg_k=12 partials in q96
    approx = {
        r["event_type"]: r["n_distinct"]
        for r in _queries()["q96_hll_rollup"](spark, sf_dir).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        rel = abs(approx[et] - ex) / max(ex, 1)
        assert rel <= 3 * rse, (et, ex, approx[et], rel)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_q131_kll_within_rank_eps(spark, sf_dir):
    eps = 0.0165  # KLL k=200 normalized rank error (99% confidence)
    rows = _queries()["q131_kll_quantiles"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    for r in rows:
        et = r["event_type"]
        vals = ev.where(F.col("event_type") == et).select("value").na.drop()
        n = vals.count()
        assert r["n"] == n, (et, r["n"], n)
        w = Window.orderBy(F.col("value").asc())
        ranked = vals.withColumn("__r", F.row_number().over(w)).cache()
        try:
            for p in (0.5, 0.95, 0.99):
                got = float(r[f"q_{str(p).replace('.', '_')}"])
                lo_rank = max(1, math.floor((p - eps) * n) - 1)
                hi_rank = min(n, math.ceil((p + eps) * n) + 1)
                bracket = {
                    row["__r"]: float(row["value"])
                    for row in ranked.where(
                        F.col("__r").isin([lo_rank, hi_rank])
                    ).collect()
                }
                v_lo, v_hi = bracket[lo_rank], bracket[hi_rank]
                assert v_lo <= got <= v_hi, (
                    f"{et} p={p} n={n}: KLL {got} outside exact rank "
                    f"bracket [{v_lo}, {v_hi}] (eps={eps})"
                )
        finally:
            ranked.unpersist()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_q144_topk_exact_under_tracked_bound(spark, sf_dir):
    sketch = _queries()["q144_topk_sketch"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    tagged = ev.join(
        F.broadcast(cust.select("c_custkey", "c_nationkey")),
        ev["user_id"] == F.col("c_custkey"),
    ).select("c_nationkey", "event_type")
    exact = {
        (r["c_nationkey"], r["event_type"]): r["n"]
        for r in tagged.groupBy("c_nationkey", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every sketch row's est_count is the exact count of that item
    for row in sketch:
        key = (row["c_nationkey"], row["item"])
        assert key in exact, key
        assert row["est_count"] == exact[key], (key, row["est_count"], exact[key])
    # and per nation the top-3 count multiset matches the exact top-3
    # (item identity can differ only on exact count ties)
    by_nation_sketch: dict[int, list[int]] = {}
    for row in sketch:
        by_nation_sketch.setdefault(row["c_nationkey"], []).append(
            row["est_count"]
        )
    by_nation_exact: dict[int, list[int]] = {}
    for (nk, _item), n in exact.items():
        by_nation_exact.setdefault(nk, []).append(n)
    assert set(by_nation_sketch) == set(by_nation_exact)
    for nk, counts in by_nation_sketch.items():
        want = sorted(by_nation_exact[nk], reverse=True)[: len(counts)]
        assert sorted(counts, reverse=True) == want, (nk, counts, want)
