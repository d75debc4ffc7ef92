"""Unit + invariant tests for the round-3 operators: triangle count,
exact-moment trend/z-score, transition matrix, running distinct,
duplicated-n-gram rate, snapshot diff, collocation lift, Gopher
quality flags, null-run islands."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.functions.text import gopher_flags
from sensor_time_series_pyspark_spark.operators import (
    collocation_lift,
    dup_ngram_rate,
    group_zscore,
    null_runs,
    running_distinct,
    snapshot_diff,
    transition_matrix,
    trend_slope,
    triangle_count,
)


# ---------------------------------------------------------------- triangles
def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_count_k4(spark):
    # complete graph on 4 nodes has C(4,3) = 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    n = triangle_count(_edges(spark, k4)).collect()[0]["n_triangles"]
    assert n == 4


def test_triangle_count_path_has_none(spark):
    n = triangle_count(_edges(spark, [(1, 2), (2, 3), (3, 4)])).collect()[0][
        "n_triangles"
    ]
    assert n == 0


def test_triangle_count_orientations_agree(spark):
    # duplicate/reversed/self-loop edges must collapse identically
    edges = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 4), (4, 1), (2, 4), (5, 5)]
    by_deg = triangle_count(_edges(spark, edges), orient="degree")
    by_id = triangle_count(_edges(spark, edges), orient="id")
    assert (
        by_deg.collect()[0]["n_triangles"] == by_id.collect()[0]["n_triangles"] == 4
    )


# ------------------------------------------------------------- trend slope
def test_trend_slope_recovers_line(spark):
    rows = [(float(x), 2.0 * x + 1.0, "g") for x in range(10)]
    df = spark.createDataFrame(rows, "x double, y double, g string")
    out = trend_slope(df, "x", "y", by=["g"], x_decimals=0, y_decimals=2).collect()[0]
    assert out["n"] == 10
    assert abs(out["slope"] - 2.0) < 1e-9
    assert abs(out["intercept"] - 1.0) < 1e-9


def test_trend_slope_degenerate_x_is_null(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (1.0, 7.0)], "x double, y double"
    )
    out = trend_slope(df, "x", "y").collect()[0]
    assert out["slope"] is None


# ----------------------------------------------------------------- z-score
def test_group_zscore_matches_reference(spark):
    vals = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(v, "a") for v in vals], "v double, g string")
    out = {
        r["v"]: r["z"]
        for r in group_zscore(df, "v", by=["g"], out_col="z").collect()
    }
    mean = sum(vals) / 4
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / 3)
    for v in vals:
        assert abs(out[v] - (v - mean) / sd) < 1e-9


def test_group_zscore_singleton_null(spark):
    df = spark.createDataFrame([(5.0, "solo")], "v double, g string")
    assert group_zscore(df, "v", by=["g"]).collect()[0]["zscore"] is None


# ---------------------------------------------------------- transitions
def test_transition_matrix_counts_and_shares(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),     # a→b, b→a
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),     # a→b, b→c
    ]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    out = {
        (r["from_state"], r["to_state"]): (r["n"], r["share"])
        for r in transition_matrix(df, "u", "t", "s").collect()
    }
    assert out[("a", "b")] == (2, 1.0)
    assert out[("b", "a")][0] == 1 and abs(out[("b", "a")][1] - 0.5) < 1e-12
    assert out[("b", "c")][0] == 1
    # terminal events contribute no row
    assert ("c", None) not in out


# ------------------------------------------------------- running distinct
def test_running_distinct_cumulative(spark):
    rows = [
        (1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00"),
        (1, "2024-01-02 10:00:00"), (3, "2024-01-02 11:00:00"),
        (3, "2024-01-03 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "u long, ts string").select(
        "u", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {str(r["day"]): (r["new_entities"], r["cum_entities"])
           for r in running_distinct(df, "u", "ts").collect()}
    assert out["2024-01-01"] == (2, 2)
    assert out["2024-01-02"] == (1, 3)
    # day 3 brings no new entities → absent
    assert "2024-01-03" not in out


# -------------------------------------------------------- dup n-gram rate
def test_dup_ngram_rate_planted(spark):
    shared = "alpha beta gamma delta"          # identical 3-grams in both
    rows = [
        (1, shared), (2, shared),
        (3, "unique tokens only here nothing shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in dup_ngram_rate(df, "doc_id", "text", n=3).collect()}
    assert out[1]["dup_rate"] == 1.0 and out[2]["dup_rate"] == 1.0
    assert out[3]["dup_rate"] == 0.0
    assert out[3]["n_grams"] == 4  # 6 tokens → 4 distinct 3-grams


# ----------------------------------------------------------- snapshot diff
def test_snapshot_diff_all_classes(spark):
    old = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)], "k long, a string, b double"
    )
    new = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 99.0), (4, "w", 4.0)], "k long, a string, b double"
    )
    out = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_aware(spark):
    old = spark.createDataFrame([(1, None)], "k long, a string")
    new = spark.createDataFrame([(1, None)], "k long, a string")
    assert snapshot_diff(old, new, ["k"]).collect()[0]["change"] == "unchanged"


# ------------------------------------------------------------ collocations
def test_collocation_lift_scores(spark):
    # "new york" always adjacent; "the the" never occurs
    docs = [(i, "new york is big and new york is old") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["w1"], r["w2"]): r for r in
           collocation_lift(df, "doc_id", "text", min_pair_count=3).collect()}
    ny = out[("new", "york")]
    assert ny["n_pair"] == 6 and ny["n_w1"] == 6 and ny["n_w2"] == 6
    # N_tokens=27, lift = 27*6/(6*6) = 4.5
    assert abs(ny["lift"] - 4.5) < 1e-12


def test_collocation_lift_empty_corpus(spark):
    # regression: driver-side int(None) crash — the token-count collect
    # returns NULL on an empty frame; must yield an empty result instead
    df = spark.createDataFrame([], "doc_id long, text string")
    assert collocation_lift(df, "doc_id", "text").collect() == []


# ------------------------------------------------------------ gopher flags
def test_gopher_flags_pass_and_fail(spark):
    good = " ".join(["the quick brown fox jumps over a lazy dog ok"] * 6)  # 60 words
    short = "too short"
    symbolic = " ".join(["### and more ###"] * 20)
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbolic)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", gopher_flags("text").alias("g"))
        .select("doc_id", "g.*")
        .collect()
    }
    assert out[1]["pass_all"] is True
    assert out[2]["ok_word_count"] is False and out[2]["pass_all"] is False
    assert out[3]["ok_symbol_ratio"] is False


# --------------------------------------------------------------- null runs
def test_null_runs_finds_longest(spark):
    rows = [
        ("s", 1, 1.0), ("s", 2, None), ("s", 3, None), ("s", 4, 2.0),
        ("s", 5, None), ("s", 6, None), ("s", 7, None), ("s", 8, 3.0),
        ("t", 1, 1.0), ("t", 2, 2.0),
    ]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = {r["g"]: r for r in null_runs(df, ["g"], "t", "v").collect()}
    assert out["s"]["n_runs"] == 2
    assert out["s"]["longest_run"] == 3
    assert out["s"]["total_nulls"] == 5
    assert "t" not in out  # fully observed series has no run rows


# ---------------------------------------------------------------- ngram LM
def test_ngram_lm_probabilities(spark):
    from sensor_time_series_pyspark_spark.operators import ngram_lm

    docs = [(1, "a b c"), (2, "a b d"), (3, "a b c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["context"], r["next_word"]): r
           for r in ngram_lm(df, "doc_id", "text", n=3, min_context_count=1).collect()}
    ab_c = out[("a b", "c")]
    assert ab_c["c_full"] == 2 and ab_c["c_context"] == 3
    assert abs(ab_c["prob"] - 2 / 3) < 1e-12
    assert out[("a b", "d")]["c_full"] == 1


def test_posting_lists_summary(spark):
    from sensor_time_series_pyspark_spark.operators import posting_lists

    docs = [(1, "x y x"), (2, "x z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["term"]: r for r in posting_lists(df, "doc_id", "text").collect()}
    assert out["x"]["df"] == 2 and out["x"]["tf"] == 3
    assert out["x"]["min_doc_id"] == 1 and out["x"]["max_doc_id"] == 2
    assert out["z"]["df"] == 1


# ------------------------------------------------------------ time in state
def test_time_in_state_durations(spark):
    rows = [
        (1, "2024-01-01 00:00:00", "on"),
        (1, "2024-01-01 00:00:10", "off"),
        (1, "2024-01-01 00:00:40", "on"),
        (1, "2024-01-01 00:00:45", "off"),  # terminal, no duration
    ]
    from sensor_time_series_pyspark_spark.operators import time_in_state

    df = spark.createDataFrame(rows, "u long, ts string, s string").select(
        "u", F.col("ts").cast("timestamp").alias("ts"), "s"
    )
    out = {r["state"]: r for r in time_in_state(df, "u", "ts", "s").collect()}
    assert out["on"]["n_intervals"] == 2 and out["on"]["total_seconds"] == 15
    assert out["off"]["n_intervals"] == 1 and out["off"]["total_seconds"] == 30
    assert abs(out["on"]["mean_seconds"] - 7.5) < 1e-12


# ------------------------------------------------------------ densify LOCF
def test_densify_locf_grid_and_fill(spark):
    from sensor_time_series_pyspark_spark.operators import densify_locf

    rows = [
        ("s", "2024-01-01 00:00:30", 1.0),
        ("s", "2024-01-01 00:03:10", 2.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), F.col("v")
    )
    out = sorted(
        densify_locf(df, ["g"], "ts", "v", step_seconds=60).collect(),
        key=lambda r: r["bucket_ts"],
    )
    # buckets 00:00 .. 00:03 inclusive
    assert len(out) == 4
    assert out[0]["value"] is None          # grid point precedes first obs
    assert out[1]["value"] == 1.0           # LOCF
    assert out[2]["value"] == 1.0
    assert out[3]["value"] == 1.0           # 00:03 grid sorts before 00:03:10 obs


def test_densify_locf_same_instant_prefers_observation(spark):
    from sensor_time_series_pyspark_spark.operators import densify_locf

    rows = [("s", "2024-01-01 00:00:00", 5.0), ("s", "2024-01-01 00:01:00", 7.0)]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), F.col("v")
    )
    out = sorted(
        densify_locf(df, ["g"], "ts", "v", step_seconds=60).collect(),
        key=lambda r: r["bucket_ts"],
    )
    assert [r["value"] for r in out] == [5.0, 7.0]


# ------------------------------------------------------------ minmax scale
def test_minmax_scale_bounds(spark):
    from sensor_time_series_pyspark_spark.operators import minmax_scale

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 15.0), (4, "b", 3.0)],
        "id long, g string, v double",
    )
    out = {r["id"]: r["scaled"] for r in minmax_scale(df, "v", by=["g"]).collect()}
    assert out[1] == 0.0 and out[2] == 1.0 and abs(out[3] - 0.5) < 1e-12
    assert out[4] is None  # degenerate single-value group


# ---------------------------------------------------------------- spearman
def test_spearman_monotone_is_one(spark):
    from sensor_time_series_pyspark_spark.operators import spearman_corr

    rows = [(float(x), float(x**3), "g") for x in range(1, 11)]  # monotone, nonlinear
    df = spark.createDataFrame(rows, "x double, y double, g string")
    out = spearman_corr(df, "x", "y", by=["g"]).collect()[0]
    assert out["spearman"] == 1.0


def test_spearman_ties_average_rank(spark):
    from sensor_time_series_pyspark_spark.operators import spearman_corr

    # x has a tie: average ranks x=[1, 2.5, 2.5, 4], y=[1,2,3,4]
    # pearson(ranks) = 4.5 / sqrt(4.5 * 5)
    rows = [(1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 40.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = spearman_corr(df, "x", "y").collect()[0]
    assert abs(out["spearman"] - 4.5 / math.sqrt(4.5 * 5.0)) < 1e-12


# ------------------------------------------------------------------ chisq
def test_chisq_independent_is_zero(spark):
    from sensor_time_series_pyspark_spark.operators import chisq_cells

    # perfectly independent 2x2: all contributions zero
    rows = [("a", "x")] * 4 + [("a", "y")] * 4 + [("b", "x")] * 4 + [("b", "y")] * 4
    df = spark.createDataFrame(rows, "p string, q string")
    for r in chisq_cells(df, "p", "q").collect():
        assert r["chi2_contrib"] == 0.0 and r["expected"] == r["observed"]


def test_chisq_matches_reference(spark):
    from sensor_time_series_pyspark_spark.operators import chisq_cells

    # 2x2 table [[10, 20], [30, 5]], uncorrected chi2 from first principles
    table = {("a", "x"): 10, ("a", "y"): 20, ("b", "x"): 30, ("b", "y"): 5}
    n = sum(table.values())
    row = {"a": 30, "b": 35}
    col = {"x": 40, "y": 25}
    want = sum(
        (o - row[a] * col[b] / n) ** 2 / (row[a] * col[b] / n)
        for (a, b), o in table.items()
    )
    rows = [(a, b) for (a, b), c in table.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "p string, q string")
    total = sum(r["chi2_contrib"] for r in chisq_cells(df, "p", "q").collect())
    assert abs(total - want) < 1e-9


# ----------------------------------------------------------------- benford
def test_benford_digit_extraction(spark):
    from sensor_time_series_pyspark_spark.operators import benford_digits

    df = spark.createDataFrame(
        [(123.45,), (0.072,), (9000.0,), (-5.0,), (910.0,)], "v double"
    )
    out = {r["digit"]: r for r in benford_digits(df, "v", decimals=3).collect()}
    # 123.45 → 1; 0.072 → 7; 9000 and 910 → 9; -5 excluded
    assert out[1]["n"] == 1 and out[7]["n"] == 1 and out[9]["n"] == 2
    assert abs(out[9]["share"] - 0.5) < 1e-12
    assert abs(out[1]["expected"] - 0.3010299956639812) < 1e-15


def test_benford_tiny_and_decade_boundary(spark):
    # regression: values in (0, 0.5*10^-decimals) used to round to
    # scaled 0 → digit 0 → element_at(arr, 0) runtime crash; and 9.997
    # used to round to '1000' → digit 1 (decade shift). The regexp
    # extraction keeps both exact.
    from sensor_time_series_pyspark_spark.operators import benford_digits

    df = spark.createDataFrame(
        [(0.0001,), (0.004,), (9.997,), (2.5e-7,)], "v double"
    )
    out = {r["digit"]: r["n"] for r in benford_digits(df, "v", decimals=2).collect()}
    assert out == {1: 1, 4: 1, 9: 1, 2: 1}


# --------------------------------------------------------------------- SAX
def test_sax_symbols_shape_and_bands(spark):
    from sensor_time_series_pyspark_spark.operators import sax_symbols

    # ramp 0..15 over one series: 4 segments of 4 points; PAA means
    # 1.5, 5.5, 9.5, 13.5; symbols must be monotone 0..3
    rows = [("s", i, float(i)) for i in range(16)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = sorted(
        sax_symbols(df, ["g"], "t", "v", n_segments=4).collect(),
        key=lambda r: r["segment"],
    )
    assert [r["paa"] for r in out] == [1.5, 5.5, 9.5, 13.5]
    assert [r["symbol"] for r in out] == [0, 1, 2, 3]
    assert all(r["n_points"] == 4 for r in out)


def test_sax_constant_series_null_symbol(spark):
    from sensor_time_series_pyspark_spark.operators import sax_symbols

    rows = [("c", i, 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = sax_symbols(df, ["g"], "t", "v", n_segments=2).collect()
    assert all(r["symbol"] is None for r in out)  # zero variance → no z
    assert all(r["paa"] == 5.0 for r in out)


# ------------------------------------------------------ weighted sampling
def test_weighted_hash_sample_deterministic_and_biased(spark):
    from sensor_time_series_pyspark_spark.operators import weighted_hash_sample

    # 1000 keys; second half carries 20x the weight
    rows = [(i, 20.0 if i >= 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, w double")
    a = sorted(r["k"] for r in weighted_hash_sample(df, "k", "w", 100).collect())
    b = sorted(
        r["k"]
        for r in weighted_hash_sample(
            df.repartition(7), "k", "w", 100
        ).collect()
    )
    assert a == b and len(a) == 100  # partitioning-independent draw
    heavy = sum(1 for k in a if k >= 500)
    # E[heavy] ≈ 95 of 100; even 5 sigma leaves > 80
    assert heavy > 80
    # different salt decorrelates
    c = sorted(
        r["k"]
        for r in weighted_hash_sample(df, "k", "w", 100, salt="x").collect()
    )
    assert c != a


def test_weighted_hash_sample_excludes_nonpositive(spark):
    from sensor_time_series_pyspark_spark.operators import weighted_hash_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, None), (4, 5.0)], "k long, w double"
    )
    out = [r["k"] for r in weighted_hash_sample(df, "k", "w", 10).collect()]
    assert out == [4]


# --------------------------------------------------------------------- DTW
def _ref_dtw(a, b):
    import math

    n, m = len(a), len(b)
    D = [[math.inf] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
            )
    return D[n][m]


def test_dtw_pairs_matches_reference(spark):
    from sensor_time_series_pyspark_spark.operators import dtw_pairs

    s1 = [0.0, 1.0, 2.0, 3.0, 2.0, 1.0]
    s2 = [0.0, 0.0, 1.0, 2.0, 3.0, 2.0, 1.0]   # shifted copy: small DTW
    s3 = [5.0, 5.0, 5.0]
    rows = (
        [("a", i, v) for i, v in enumerate(s1)]
        + [("b", i, v) for i, v in enumerate(s2)]
        + [("c", i, v) for i, v in enumerate(s3)]
    )
    df = spark.createDataFrame(rows, "k string, t long, v double")
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "key_a string, key_b string"
    )
    out = {(r["key_a"], r["key_b"]): r for r in
           dtw_pairs(df, "k", "t", "v", pairs).collect()}
    assert out[("a", "b")]["dtw"] == pytest.approx(_ref_dtw(s1, s2))
    assert out[("a", "c")]["dtw"] == pytest.approx(_ref_dtw(s1, s3))
    assert out[("a", "b")]["n_a"] == 6 and out[("a", "b")]["n_b"] == 7


def test_dtw_band_wide_enough_is_exact(spark):
    from sensor_time_series_pyspark_spark.operators import dtw_pairs

    s1 = [float(i % 5) for i in range(20)]
    s2 = [float((i + 1) % 5) for i in range(20)]
    rows = [("a", i, v) for i, v in enumerate(s1)] + [
        ("b", i, v) for i, v in enumerate(s2)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    pairs = spark.createDataFrame([("a", "b")], "key_a string, key_b string")
    full = dtw_pairs(df, "k", "t", "v", pairs).collect()[0]["dtw"]
    banded = dtw_pairs(df, "k", "t", "v", pairs, band=20).collect()[0]["dtw"]
    assert banded == pytest.approx(full) == pytest.approx(_ref_dtw(s1, s2))


# ------------------------------------------------------------------ A/B test
def test_ab_proportion_test_known_value(spark):
    from sensor_time_series_pyspark_spark.operators import ab_proportion_test

    rows = [(i, "a", 1 if i < 30 else 0) for i in range(100)] + [
        (100 + i, "b", 1 if i < 20 else 0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "u long, arm string, converted int")
    out = ab_proportion_test(df, "u", "arm", "converted").collect()[0]
    assert (out["n_a"], out["n_b"], out["conv_a"], out["conv_b"]) == (100, 100, 30, 20)
    p, pa, pb = 0.25, 0.30, 0.20
    se = math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert abs(out["z"] - (pa - pb) / se) < 1e-12


def test_ab_proportion_test_empty_arm_null_z(spark):
    from sensor_time_series_pyspark_spark.operators import ab_proportion_test

    df = spark.createDataFrame([(1, "a", 1)], "u long, arm string, converted int")
    out = ab_proportion_test(df, "u", "arm", "converted").collect()[0]
    assert out["z"] is None and out["p_b"] is None


# -------------------------------------------------------- capped running sum
def test_capped_running_sum_matches_recursion(spark):
    from sensor_time_series_pyspark_spark.operators import capped_running_sum

    deltas = [3.0, -5.0, 4.0, -1.0, -9.0, 2.5]
    rows = [("g", i, d) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, "g string, t long, x double")
    out = {r["t"]: r["balance"] for r in
           capped_running_sum(df, ["g"], ["t"], "x").collect()}
    b, want = 0.0, {}
    for i, d in enumerate(deltas):
        b = max(b + d, 0.0)
        want[i] = b
    assert out == want


# ------------------------------------------------------------ market basket
def test_market_basket_metrics(spark):
    from sensor_time_series_pyspark_spark.operators import market_basket_pairs

    # baskets: {x,y} x3, {x,z}, {y}  → n_baskets=5
    rows = [
        (1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "y"),
        (4, "x"), (4, "z"), (5, "y"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["item_a"], r["item_b"]): r for r in
           market_basket_pairs(df, "b", "i", min_pair_count=2).collect()}
    xy = out[("x", "y")]
    assert xy["n_pair"] == 3 and xy["n_a"] == 4 and xy["n_b"] == 4
    assert abs(xy["support"] - 3 / 5) < 1e-12
    assert abs(xy["confidence"] - 3 / 4) < 1e-12
    assert abs(xy["lift"] - (5 * 3) / (4 * 4)) < 1e-12
    assert ("x", "z") not in out  # below min_pair_count


# ---------------------------------------------------------------- sketches
def test_kll_rollup_tracks_exact_percentiles(spark):
    from sensor_time_series_pyspark_spark.operators import kll_partials, kll_rollup
    from sensor_time_series_pyspark_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    daily = kll_partials(
        ev.withColumn("day", F.to_date("ts")), ["event_type", "day"], "value"
    )
    rolled = {r["event_type"]: r for r in
              kll_rollup(daily, ["event_type"], quantiles=(0.5,)).collect()}
    exact = {r["event_type"]: r["m"] for r in
             ev.groupBy("event_type")
             .agg(F.expr("percentile(value, 0.5)").alias("m")).collect()}
    for t, r in rolled.items():
        # k=200 → ~1.65% rank error; on these distributions the value
        # error stays well inside 10%
        assert abs(r["q_0_5"] - exact[t]) <= 0.1 * max(1.0, abs(exact[t]))
        assert r["n"] > 0


def test_theta_overlap_exact_mode_matches_sets(spark):
    from sensor_time_series_pyspark_spark.operators import theta_overlap, theta_partials
    from sensor_time_series_pyspark_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    parts = theta_partials(ev, ["event_type"], "user_id", lg_k=12)
    got = theta_overlap(parts, "event_type", "click", "view").collect()[0]
    a = {r["user_id"] for r in
         ev.where(F.col("event_type") == "click").select("user_id").distinct().collect()}
    b = {r["user_id"] for r in
         ev.where(F.col("event_type") == "view").select("user_id").distinct().collect()}
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["n_union"] == len(a | b)
    assert got["n_intersect"] == len(a & b)
    assert got["n_a_only"] == len(a - b)


# ---------------------------------------------------------- label propagation
def test_label_propagation_two_cliques(spark):
    from sensor_time_series_pyspark_spark.operators import label_propagation

    import itertools

    # two 4-cliques joined by a single bridge edge
    c1 = list(itertools.combinations([1, 2, 3, 4], 2))
    c2 = list(itertools.combinations([11, 12, 13, 14], 2))
    edges = c1 + c2 + [(4, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["label"] for r in label_propagation(df, n_iter=6).collect()}
    l1 = {out[n] for n in [1, 2, 3]}
    l2 = {out[n] for n in [12, 13, 14]}
    assert len(l1) == 1 and len(l2) == 1 and l1 != l2


def test_label_propagation_deterministic(spark):
    from sensor_time_series_pyspark_spark.operators import label_propagation

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, label_propagation(df, n_iter=4).collect()))
    b = sorted(map(tuple, label_propagation(df.repartition(5), n_iter=4).collect()))
    assert a == b


def test_label_propagation_string_node_ids(spark):
    from sensor_time_series_pyspark_spark.operators import label_propagation

    import itertools

    # regression: the old tiebreak negated the LABEL column, an ANSI
    # string→double cast error for non-numeric ids; min_by(struct(-n,
    # label)) must work for any orderable id type
    c1 = list(itertools.combinations(["a", "b", "c", "d"], 2))
    c2 = list(itertools.combinations(["x", "y", "z", "w"], 2))
    df = spark.createDataFrame(c1 + c2 + [("d", "w")], "src string, dst string")
    out = {r["node"]: r["label"] for r in label_propagation(df, n_iter=6).collect()}
    l1 = {out[n] for n in ["a", "b", "c"]}
    l2 = {out[n] for n in ["x", "y", "z"]}
    assert len(l1) == 1 and len(l2) == 1 and l1 != l2


# ------------------------------------------------------------ table checksum
def test_table_checksum_order_insensitive_and_sensitive_to_change(spark):
    from sensor_time_series_pyspark_spark.operators import table_checksum

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    a = table_checksum(df).collect()[0]
    b = table_checksum(df.repartition(7).orderBy(F.col("k").desc())).collect()[0]
    assert (a["n_rows"], a["checksum"]) == (b["n_rows"], b["checksum"])
    changed = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 21), (3, "c", 30)], "k long, s string, v long"
    )
    c = table_checksum(changed).collect()[0]
    assert c["checksum"] != a["checksum"]


def test_table_checksum_null_vs_literal_distinct(spark):
    from sensor_time_series_pyspark_spark.operators import table_checksum

    with_null = spark.createDataFrame([(1, None)], "k long, s string")
    with_lit = spark.createDataFrame([(1, "null")], "k long, s string")
    a = table_checksum(with_null).collect()[0]["checksum"]
    b = table_checksum(with_lit).collect()[0]["checksum"]
    assert a != b  # the \\x00 sentinel keeps NULL distinct from 'null'
