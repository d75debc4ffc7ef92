"""Round-4 query mechanics, cross-checked against brute-force
reference computations on tiny in-memory frames: the Pettitt
U_t = -cumsum(r) identity, sweep-line concurrency, SPC rule flags,
drawdown, burstiness, and the k-NN agreement vote."""

import math

import pytest
from pyspark.sql import Window, functions as F


# --- Pettitt identity ------------------------------------------------------

def _pettitt_brute(xs):
    """Direct U_t = sum_{i<=t} sum_{j>t} sign(x_j - x_i), 1-based t."""
    n = len(xs)
    out = []
    for t in range(1, n):  # split after position t (last split excluded)
        u = 0
        for i in range(t):
            for j in range(t, n):
                u += (xs[j] > xs[i]) - (xs[j] < xs[i])
        out.append(u)
    return out


def test_pettitt_cumsum_identity_matches_brute_force(spark):
    xs = [5, 7, 6, 20, 22, 21, 19, 23]
    rows = [("a", float(i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    a = df.select("k", F.col("t").alias("ti"), F.col("x").alias("xi"))
    b = df.select(
        F.col("k").alias("k2"), F.col("t").alias("tj"), F.col("x").alias("xj")
    )
    r = (
        a.join(b, (a["k"] == b["k2"]) & (a["ti"] != b["tj"]))
        .groupBy("k", "ti")
        .agg(
            F.sum(
                F.signum((F.col("xi") - F.col("xj")).cast("double")).cast(
                    "bigint"
                )
            ).alias("r")
        )
    )
    wcum = (
        Window.partitionBy("k")
        .orderBy("ti")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = (
        r.select("ti", (-F.sum("r").over(wcum)).alias("u"))
        .orderBy("ti")
        .collect()
    )
    got = [row["u"] for row in u][:-1]  # drop U_n (== 0 by antisymmetry)
    assert got == _pettitt_brute(xs)
    assert u[-1]["u"] == 0


def test_pettitt_flags_obvious_changepoint(spark):
    from __spark_entry__ import queries

    out = queries()["q255_pettitt"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "pettitt returned no rows"
    for r in rows:
        assert r["k_stat"] >= 0
        assert r["n_candidates"] >= 1


# --- sweep-line concurrency ------------------------------------------------

def _concurrency_brute(sessions, at_times):
    return {
        t: sum(1 for s, e in sessions if s <= t <= e) for t in at_times
    }


def test_sweepline_matches_interval_stabbing(spark):
    # sessions as (start, end) seconds; peak overlap is 3 at t=55
    sessions = [(0, 100), (50, 60), (55, 58), (200, 300), (250, 260)]
    rows = [(float(s), float(e)) for s, e in sessions]
    sess = spark.createDataFrame(rows, ["s", "e"])
    bounds = sess.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        sess.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = Window.orderBy("t", "d").rowsBetween(Window.unboundedPreceding, 0)
    conc = bounds.select("t", F.sum("d").over(w).alias("c"))
    peak = conc.agg(F.max("c")).collect()[0][0]
    assert peak == 3
    # ends release before starts acquire at the same instant:
    touching = [(0, 10), (10, 20)]
    sess2 = spark.createDataFrame(
        [(float(s), float(e)) for s, e in touching], ["s", "e"]
    )
    b2 = sess2.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        sess2.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    c2 = b2.select(F.sum("d").over(w).alias("c"))
    assert c2.agg(F.max("c")).collect()[0][0] == 1


# --- SPC rules -------------------------------------------------------------

def test_spc_rule_flags_on_synthetic_shift(spark):
    from __spark_entry__ import queries

    out = queries()["q261_spc_rules"](spark, "/root/testdata/sf0.001")
    pdf = out.toPandas()
    assert set(
        ["event_type", "d", "n", "z", "rule1", "rule2", "rule4"]
    ) <= set(pdf.columns)
    # z-scores of each series must be centered: sum(z) ~ 0 per type
    for _, grp in pdf.groupby("event_type"):
        assert abs(grp["z"].sum()) < 1e-6 * max(1, len(grp))
    assert set(pdf["rule1"]) <= {0, 1}


# --- drawdown --------------------------------------------------------------

def test_drawdown_brute_force(spark):
    xs = [10, 12, 8, 15, 9, 9]
    df = spark.createDataFrame(
        [("a", float(i), x) for i, x in enumerate(xs)], ["k", "t", "n"]
    )
    wrun = (
        Window.partitionBy("k")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = df.select(
        "t",
        (
            (F.max("n").over(wrun) - F.col("n")).cast("double")
            / F.max("n").over(wrun).cast("double")
        ).alias("dd"),
    )
    got = max(r["dd"] for r in dd.collect())
    # brute force
    peak, best = -1, 0.0
    for x in xs:
        peak = max(peak, x)
        best = max(best, (peak - x) / peak)
    assert got == pytest.approx(best)


# --- burstiness ------------------------------------------------------------

def test_burstiness_limits(spark):
    # metronome gaps -> sigma = 0 -> B = -1
    gaps = [60, 60, 60, 60]
    k, s1, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
    sigma = math.sqrt(k * s2 - s1 * s1) / k
    mu = s1 / k
    assert sigma == 0.0
    assert (sigma - mu) / (sigma + mu) == -1.0
    from __spark_entry__ import queries

    out = queries()["q265_burstiness"](spark, "/root/testdata/sf0.001")
    pdf = out.toPandas()
    assert ((pdf["burstiness"] > -1.0 - 1e-12) & (pdf["burstiness"] < 1.0)).all()


# --- kNN label agreement ---------------------------------------------------

def test_knn_agreement_bounds_and_self_exclusion(spark):
    from __spark_entry__ import queries

    out = queries()["q257_knn_label_agreement"](spark, "/root/testdata/sf0.001")
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert (pdf["agreement"] >= 0).all() and (pdf["agreement"] <= 1).all()
    assert (pdf["n_agree"] <= 3).all()


# --- changepoint module (reusable operators) -------------------------------

def test_pettitt_operator_finds_obvious_shift_string_keys(spark):
    # level shift at t=4; string series key exercises type-agnostic path
    xs = [5, 6, 5, 7, 50, 52, 51, 53]
    rows = [("sensor-a", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    from sensor_time_series_pyspark_spark.operators import pettitt

    out = pettitt(df, ["k"], "t", "x").collect()
    assert len(out) == 1
    assert out[0]["change_point"] == 3  # last point of the low regime
    assert out[0]["k_stat"] == 16  # 4*4 pairs all concordant
    assert out[0]["n_candidates"] == 7


def test_bollinger_operator_flags_spike(spark):
    xs = [10, 10, 10, 10, 10, 100]
    df = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate(xs)], ["k", "t", "x"]
    )
    from sensor_time_series_pyspark_spark.operators import bollinger

    out = {r["t"]: r for r in bollinger(df, ["k"], "t", "x").collect()}
    assert out[5]["break_up"] == 1  # constant history, huge spike
    assert out[0]["hi"] is None  # no trailing window yet
    assert out[1]["hi"] is None and out[2]["hi"] is None  # < min_points


def test_max_drawdown_operator(spark):
    xs = [10, 20, 5, 30]
    df = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate(xs)], ["k", "t", "x"]
    )
    from sensor_time_series_pyspark_spark.operators import max_drawdown

    row = max_drawdown(df, ["k"], "t", "x").collect()[0]
    assert row["worst_point"] == 2
    assert row["trough"] == 5 and row["peak"] == 20
    assert row["max_drawdown"] == pytest.approx(0.75)


def test_spc_rules_operator_rule1_and_rule4(spark):
    # one extreme outlier among n points has z = (n-1)/sqrt(n); that
    # exceeds 3 sigma only for n >= 11, so use 15 points
    xs = [10.0] * 14 + [1000.0]
    df = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate(xs)], ["k", "t", "x"]
    )
    from sensor_time_series_pyspark_spark.operators import spc_rules

    rows = {r["t"]: r for r in spc_rules(df, ["k"], "t", "x").collect()}
    assert rows[14]["rule1"] == 1  # the outlier is beyond 3 sigma
    assert rows[7]["rule4"] == 1  # 8th consecutive point below mean


# --- count-min sketch ------------------------------------------------------

def test_cm_never_undercounts_and_is_exact_when_sparse(spark):
    from sensor_time_series_pyspark_spark.operators import (
        cm_estimate,
        cm_partials,
    )

    rows = [("g", f"item{i % 7}") for i in range(700)]
    df = spark.createDataFrame(rows, ["g", "item"])
    parts = cm_partials(df, ["g"], "item", depth=4, width=1024)
    probes = df.select("g", "item").distinct()
    est = cm_estimate(parts, probes, "item", by=["g"], depth=4, width=1024)
    true = {r["item"]: r["n"] for r in df.groupBy("item").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for r in est.collect():
        assert r["estimate"] >= true[r["item"]]  # CM never undercounts
    # 7 distinct items in 4x1024 cells: collisions impossible -> exact
    for r in est.collect():
        assert r["estimate"] == true[r["item"]]


def test_cm_partials_merge_additively(spark):
    from sensor_time_series_pyspark_spark.operators import (
        cm_estimate,
        cm_merge,
        cm_partials,
    )

    rows1 = [("a", "x")] * 5 + [("a", "y")] * 3
    rows2 = [("b", "x")] * 2 + [("b", "z")] * 4
    d1 = spark.createDataFrame(rows1, ["shard", "item"])
    d2 = spark.createDataFrame(rows2, ["shard", "item"])
    p = cm_partials(
        d1.unionByName(d2), ["shard"], "item", depth=4, width=64
    )
    merged = cm_merge(p, by=[])  # collapse shards: cells sum
    probes = spark.createDataFrame([("x",), ("y",), ("z",)], ["item"])
    est = {
        r["item"]: r["estimate"]
        for r in cm_estimate(
            merged, probes, "item", by=[], depth=4, width=64
        ).collect()
    }
    assert est["x"] == 7 and est["y"] == 3 and est["z"] == 4


def test_cm_estimate_zero_for_unseen(spark):
    from sensor_time_series_pyspark_spark.operators import (
        cm_estimate,
        cm_partials,
    )

    df = spark.createDataFrame([("g", "present")], ["g", "item"])
    parts = cm_partials(df, ["g"], "item", depth=4, width=1024)
    probes = spark.createDataFrame([("g", "absent")], ["g", "item"])
    est = cm_estimate(parts, probes, "item", by=["g"], depth=4, width=1024)
    # an unseen item hits at least one empty cell with overwhelming
    # probability at this load factor -> estimate 0
    assert est.collect()[0]["estimate"] == 0


# --- mode / purity tiebreaks ----------------------------------------------

def test_daily_mode_deterministic_tiebreak(spark):
    rows = [
        ("2024-01-01 00:00:00", "b"),
        ("2024-01-01 01:00:00", "a"),
    ]
    df = spark.createDataFrame(rows, ["ts", "et"]).select(
        F.col("ts").cast("timestamp").alias("ts"), F.col("et")
    )
    daily = df.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"), "et"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("d").orderBy(F.col("n").desc(), F.col("et"))
    top = (
        daily.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .collect()
    )
    assert top[0]["et"] == "a"  # tie on n=1 broken lexicographically


# --- incremental join-view maintenance -------------------------------------

def test_delta_join_identity_matches_full_recompute(spark):
    from sensor_time_series_pyspark_spark.plans import delta_join_rows

    a_old = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3")], ["k", "va"]
    )
    b_old = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "b2x")], ["k", "vb"]
    )
    da = spark.createDataFrame([(2, "a2new"), (4, "a4")], ["k", "va"])
    db = spark.createDataFrame([(3, "b3"), (4, "b4")], ["k", "vb"])
    old_view = a_old.join(b_old, ["k"])
    new_rows = delta_join_rows(a_old, b_old, da, db, ["k"])
    got = sorted(
        tuple(r) for r in old_view.unionByName(new_rows).collect()
    )
    full = sorted(
        tuple(r)
        for r in a_old.unionByName(da)
        .join(b_old.unionByName(db), ["k"])
        .collect()
    )
    assert got == full


def test_refresh_join_view_composes_across_batches(spark, tmp_path):
    from sensor_time_series_pyspark_spark.plans import refresh_join_view

    store = str(tmp_path / "jv")
    a1 = spark.createDataFrame([(1, "a1"), (2, "a2")], ["k", "va"])
    b1 = spark.createDataFrame([(1, "b1")], ["k", "vb"])
    r1 = refresh_join_view(spark, store, a1, b1, ["k"])
    assert r1["view_rows_total"] == 1  # only k=1 matches

    a2 = spark.createDataFrame([(3, "a3")], ["k", "va"])
    b2 = spark.createDataFrame([(2, "b2"), (3, "b3")], ["k", "vb"])
    r2 = refresh_join_view(spark, store, a2, b2, ["k"])
    # full recompute ground truth: A={1,2,3}, B={1,2,3} -> 3 rows
    assert r2["view_rows_total"] == 3
    got = sorted(
        (r["k"], r["va"], r["vb"])
        for r in spark.read.parquet(store + "/view").collect()
    )
    assert got == [(1, "a1", "b1"), (2, "a2", "b2"), (3, "a3", "b3")]
