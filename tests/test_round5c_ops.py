"""Round-5c batch: invariant tests for the embedding-diagnostic
queries (robust_business.py, né latest3.py). The DuckDB oracle pins exact values; these pin
the math."""

import math

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    qs = entrymod.queries()
    names = [
        "q481_embedding_anisotropy",
        "q482_participation_ratio",
        "q483_centroid_separation",
    ]
    return {n: qs[n](spark, SF).collect() for n in names}


def test_anisotropy_bounds(results):
    rows = results["q481_embedding_anisotropy"]
    assert len(rows) == 10
    for r in rows:
        # ||mean||^2 <= mean ||x||^2 (Jensen) => ratio in [0, 1]
        assert 0.0 <= r["anisotropy"] <= 1.0 + 1e-12
        assert r["mean_sq_norm"] > 0
        assert r["n_vecs"] > 0


def test_participation_ratio_bounds(results):
    rows = results["q482_participation_ratio"]
    assert len(rows) == 10
    for r in rows:
        # Cauchy-Schwarz: 1 <= PR <= n_dims
        assert 1.0 - 1e-12 <= r["part_ratio"] <= 64.0 + 1e-12
        assert abs(r["pr_frac"] - r["part_ratio"] / 64.0) < 1e-12


def test_centroid_separation_metricity(results):
    rows = results["q483_centroid_separation"]
    assert len(rows) == 45  # C(10,2) label pairs
    d = {}
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert r["dist"] >= 0.0 and math.isfinite(r["dist"])
        d[(r["label_a"], r["label_b"])] = r["dist"]

    def dist(a, b):
        return d[(a, b)] if a < b else d[(b, a)]

    labs = sorted({r["label_a"] for r in rows} | {r["label_b"] for r in rows})
    # triangle inequality on a sample of triples
    for i in range(0, len(labs) - 2, 2):
        a, b, c = labs[i], labs[i + 1], labs[i + 2]
        assert dist(a, c) <= dist(a, b) + dist(b, c) + 1e-9


def test_sorted_neighborhood_candidates(spark):
    rows = entrymod.queries()["q484_sorted_neighborhood"](
        spark, SF
    ).collect()
    assert rows  # synthetic corpus has near-dups in every slice
    seen = set()
    for r in rows:
        assert r["doc_a"] != r["doc_b"]
        assert 5 * r["n_inter"] >= r["n_union"] > 0
        assert 0.2 - 1e-12 <= r["jaccard"] <= 1.0
        key = (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        assert key not in seen  # w-window emits each pair once
        seen.add(key)


def test_gumbel_pwm_identities(spark):
    rows = entrymod.queries()["q485_gumbel_pwm"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_blocks"] == 30
        # for maxima-ordered samples 2*b1 > b0 (positive spread)
        assert r["beta"] > 0
        # return levels grow with horizon and exceed the location
        assert r["ret_30"] > r["ret_10"] > r["mu"]
        # b1 is a weighted partial mean: b1 < b0
        assert r["b1"] < r["b0"]


def test_theil_between_identities(spark):
    rows = entrymod.queries()["q486_theil_between"](spark, SF).collect()
    assert len(rows) == 25
    s = sum(r["rev_share"] for r in rows)
    p = sum(r["pop_share"] for r in rows)
    assert abs(s - 1.0) < 1e-9 and abs(p - 1.0) < 1e-9
    theil = rows[0]["theil_between"]
    mix = sum(r["contrib"] for r in rows)
    assert abs(mix - theil) < 1e-9
    # between-group Theil is nonnegative (Gibbs / log-sum ineq)
    assert theil >= -1e-12


def test_l_moments_bounds(spark):
    rows = entrymod.queries()["q487_l_moments"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_days"] == 30
        assert r["l1"] > 0 and r["l2"] > 0  # positive scale
        # Hosking bounds: |t3| < 1 and (5t3^2 - 1)/4 <= t4 < 1
        assert -1.0 < r["t3"] < 1.0
        assert (5 * r["t3"] ** 2 - 1) / 4 - 1e-9 <= r["t4"] < 1.0


def test_bowley_moors_bounds(spark):
    rows = entrymod.queries()["q488_bowley_moors"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["q1"] <= r["median"] <= r["q3"]
        assert -1.0 - 1e-12 <= r["bowley_skew"] <= 1.0 + 1e-12
        assert r["moors_kurt"] >= 0.0


def test_newsvendor_identities(spark):
    rows = entrymod.queries()["q489_newsvendor"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # critical fractile 0.75 is met or just exceeded
        assert r["service_level"] >= 0.75 - 1e-12
        assert r["overage_units"] >= 0 and r["underage_units"] >= 0
        assert r["expected_cost"] >= 0.0


def test_rmst_bounds(spark):
    [r] = entrymod.queries()["q490_rmst"](spark, SF).collect()
    assert 0.0 < r["rmst"] <= r["tau"]
    assert 0.0 <= r["s_final"] <= 1.0
    if r["median_surv"] is not None:
        assert 0 <= r["median_surv"] <= 30


def test_weibull_shape_positive(spark):
    import math

    rows = entrymod.queries()["q491_weibull_shape"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # a1 < a0/2 strictly for any non-degenerate sample
        assert 0 < r["a1"] < r["a0"] / 2 or r["a1"] > 0
        assert r["shape_k"] > 0 and math.isfinite(r["shape_k"])


def test_discount_elasticity_shape(spark):
    import math

    rows = entrymod.queries()["q492_discount_elasticity"](
        spark, SF
    ).collect()
    assert rows
    for r in rows:
        assert 3 <= r["n_levels"] <= 11
        assert math.isfinite(r["elasticity"])


def test_xbar_r_chart_identities(spark):
    rows = entrymod.queries()["q493_xbar_r_chart"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["lcl_x"] < r["cl_x"] < r["ucl_x"]
        assert r["r_bar"] >= 0.0
        assert 0 <= r["n_x_violations"] <= 5
        assert 0 <= r["n_r_violations"] <= 5


def test_zero_inflation_identities(spark):
    rows = entrymod.queries()["q494_zero_inflation"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["obs_zero"] <= r["n_cells"]
        assert r["lambda"] > 0
        assert 0.0 < r["exp_zero"] < r["n_cells"]


def test_mutual_information_bounds(spark):
    import math

    [r] = entrymod.queries()["q495_mutual_information"](
        spark, SF
    ).collect()
    # 0 <= MI <= min(H_type, H_hour); H_type <= ln 5, H_hour <= ln 24
    assert -1e-12 <= r["mi"] <= min(r["h_type"], r["h_hour"]) + 1e-12
    assert 0.0 < r["h_type"] <= math.log(5) + 1e-12
    assert 0.0 < r["h_hour"] <= math.log(24) + 1e-12
    assert 0.0 - 1e-12 <= r["nmi"] <= 1.0 + 1e-12


def test_touch_attribution_shares(spark):
    rows = entrymod.queries()["q496_touch_attribution"](
        spark, SF
    ).collect()
    assert rows
    sl = sum(r["share_last"] for r in rows)
    sf_ = sum(r["share_first"] for r in rows)
    assert abs(sl - 1.0) < 1e-9 and abs(sf_ - 1.0) < 1e-9
    chans = {r["channel"] for r in rows}
    assert "purchase" not in chans  # purchases never credit themselves
    n_last = sum(r["n_last"] for r in rows)
    n_first = sum(r["n_first"] for r in rows)
    assert n_last == n_first  # same purchase population both models


def test_fisher_index_identities(spark):
    [r] = entrymod.queries()["q497_fisher_index"](spark, SF).collect()
    assert r["n_parts"] > 0
    # Fisher is the geometric mean: between L and P
    lo, hi = sorted((r["laspeyres"], r["paasche"]))
    assert lo - 1e-12 <= r["fisher"] <= hi + 1e-12
    assert r["laspeyres"] > 0 and r["paasche"] > 0


def test_forecast_errors_bounds(spark):
    rows = entrymod.queries()["q498_forecast_errors"](
        spark, SF
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_pts"] == 23  # 30 days minus 7-day warmup
        assert r["wape"] >= 0.0
        assert 0.0 <= r["smape"] <= 2.0 + 1e-12  # sMAPE is bounded
        assert 0.0 <= r["theil_u1"] <= 1.0 + 1e-12
        assert -1.0 - 1e-12 <= r["tracking"] <= 1.0 + 1e-12
        assert r["mdape"] >= 0.0


def test_dow_profile_cells_census(spark):
    rows = entrymod.queries()["q499_dow_profile_cells"](
        spark, SF
    ).collect()
    assert 1 <= len(rows) <= 8
    n = sum(r["n_users"] for r in rows)
    assert n == 15  # every sf0.001 user lands in exactly one cell
    for r in rows:
        assert 1 <= r["cell"] <= 8
        assert r["total_cents"] >= 0


def test_sprt_state_machine(spark):
    rows = entrymod.queries()["q500_sprt"](spark, SF).collect()
    assert len(rows) == 30
    rows = sorted(rows, key=lambda r: r["t"])
    seen_decision = None
    for r in rows:
        assert 0 <= r["n_purchases"] <= r["n_events"]
        if seen_decision:
            # once decided, the state is absorbing
            assert r["decision"] == seen_decision
        elif r["decision"] in ("h0", "h1"):
            seen_decision = r["decision"]
        else:
            assert r["decision"] == "continue"


def test_cvar_backtest_identities(spark):
    rows = entrymod.queries()["q501_cvar_backtest"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # CVaR (mean of the tail at/below VaR) cannot exceed VaR
        assert r["cvar_cents"] <= r["var_cents"] + 1e-9
        # t runs 2..30 after the lag filter: 14 train, 15 test days
        assert 0 <= r["x_exceptions"] <= r["n_test"] == 15
        assert r["kupiec_lr"] >= -1e-9  # LR is nonnegative


def test_davies_bouldin_positive(spark):
    rows = entrymod.queries()["q502_davies_bouldin"](spark, SF).collect()
    assert len(rows) == 10
    db = rows[0]["db_index"]
    mean_worst = sum(r["worst_ratio"] for r in rows) / len(rows)
    assert abs(db - mean_worst) < 1e-9
    for r in rows:
        assert r["s_within"] > 0
        assert r["worst_ratio"] > 0
        assert r["db_index"] == db


def test_calinski_harabasz_positive(spark):
    [r] = entrymod.queries()["q503_calinski_harabasz"](
        spark, SF
    ).collect()
    assert r["k"] == 10 and r["n_vecs"] == 500
    assert r["b_scatter"] > 0 and r["w_scatter"] > 0
    expect = (r["b_scatter"] / (r["k"] - 1)) / (
        r["w_scatter"] / (r["n_vecs"] - r["k"])
    )
    assert abs(r["ch_index"] - expect) / expect < 1e-9
