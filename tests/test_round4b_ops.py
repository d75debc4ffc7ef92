"""Round-4b stats batch: invariant + brute-force cross-checks for the
Kruskal–Wallis / Brown–Forsythe / Allan / Hurst / PSI / CCF / Granger /
James–Stein / Good–Turing / Kaplan–Meier / binseg / entropy / Bartlett
queries. The DuckDB oracle gate already pins exact values at sf0.01;
these tests pin the MATH (closed-form identities on tiny frames) and
the distributional invariants the oracle can't see."""

import math

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    qs = entrymod.queries()
    names = [
        "q391_kruskal_wallis",
        "q392_brown_forsythe",
        "q393_allan_variance",
        "q394_hurst_rs",
        "q395_psi_drift",
        "q396_xcorr_lag",
        "q397_granger",
        "q398_james_stein",
        "q399_good_turing",
        "q400_kaplan_meier",
        "q401_binseg_changepoint",
        "q402_entropy_mix",
        "q403_bartlett",
    ]
    return {n: qs[n](spark, SF).collect() for n in names}


def test_kruskal_wallis_bounds(results):
    [r] = results["q391_kruskal_wallis"]
    # H is bounded by N-1 (all-distinct case) and non-negative
    assert 0.0 <= r["h_stat"] <= r["n_cells"] - 1
    # tie correction only inflates H
    assert r["h_corrected"] >= r["h_stat"]


def test_brown_forsythe_positive_with_correct_dfs(results):
    [r] = results["q392_brown_forsythe"]
    assert r["df1"] == 4
    assert r["df2"] == r["n_days"] - 5
    assert r["f_stat"] >= 0.0


def test_allan_variance_shape(results):
    rows = results["q393_allan_variance"]
    # 5 types x 3 taus, complete-bin counts decrease with tau
    assert len(rows) == 15
    by_type = {}
    for r in rows:
        assert r["allan_var"] >= 0.0
        by_type.setdefault(r["event_type"], {})[r["tau"]] = r["m_bins"]
    for bins in by_type.values():
        assert bins[1] >= bins[2] * 2 - 1
        assert bins[2] >= bins[3]


def test_hurst_rs_positive_and_block_counts(results):
    rows = results["q394_hurst_rs"]
    for r in rows:
        assert r["rs"] > 0.0
    n8 = sum(1 for r in rows if r["w"] == 8)
    n16 = sum(1 for r in rows if r["w"] == 16)
    # 30-day series: 3 complete blocks of 8, 1 of 16, per type
    assert n8 == 15 and n16 == 5


def test_psi_nonnegative(results):
    [r] = results["q395_psi_drift"]
    # PSI is a symmetrized KL — each term (p-q)ln(p/q) >= 0
    assert r["psi"] >= 0.0
    assert r["n_train"] > 0 and r["n_test"] > 0


def test_xcorr_bounded(results):
    rows = results["q396_xcorr_lag"]
    assert len(rows) == 7
    for r in rows:
        assert -1.0 - 1e-12 <= r["xcorr"] <= 1.0 + 1e-12


def test_granger_f_finite(results):
    [r] = results["q397_granger"]
    assert r["n_obs"] >= 10
    assert math.isfinite(r["f_granger"])


def test_james_stein_contracts_toward_grand_mean(results):
    rows = results["q398_james_stein"]
    assert len(rows) == 5
    raw = [r["raw_mean"] for r in rows]
    gbar_lo, gbar_hi = min(raw), max(raw)
    for r in rows:
        # shrinkage never overshoots: shrunk lies between raw and ḡ
        assert gbar_lo - 1e-9 <= r["shrunk_mean"] <= gbar_hi + 1e-9
        spread_raw = abs(r["raw_mean"] - sum(raw) / 5)
        spread_shr = abs(r["shrunk_mean"] - sum(raw) / 5)
        assert spread_shr <= spread_raw + 1e-9


def test_good_turing_consistency(results):
    for r in results["q399_good_turing"]:
        assert 0 <= r["n_hapax"] <= r["n_types"] <= r["n_tokens"]
        assert 0.0 <= r["unseen_mass"] <= 1.0


def test_kaplan_meier_monotone_nonincreasing(results):
    rows = sorted(results["q400_kaplan_meier"], key=lambda r: r["duration"])
    prev_s, prev_n = 1.0, None
    for r in rows:
        assert r["survival"] <= prev_s + 1e-12
        if prev_n is not None:
            assert r["n_risk"] <= prev_n
        prev_s, prev_n = r["survival"], r["n_risk"]
    # risk set starts at the full span count
    assert rows[0]["n_risk"] == sum(
        r["d_events"] + r["c_censored"] for r in rows
    )


def test_binseg_gain_nonnegative(results):
    [r] = results["q401_binseg_changepoint"]
    # between-SS of any split is >= 0 and the split is interior
    assert r["gain"] >= 0.0
    assert r["n_left"] >= 1 and r["n_right"] >= 1


def test_entropy_mix_identities(results):
    for r in results["q402_entropy_mix"]:
        # 0 <= H <= ln(n_langs); 1/n_langs <= HHI <= 1; eff = exp(H)
        assert -1e-12 <= r["entropy"] <= math.log(r["n_langs"]) + 1e-12
        assert 1.0 / r["n_langs"] - 1e-12 <= r["herfindahl"] <= 1.0
        assert r["effective_langs"] == pytest.approx(
            math.exp(r["entropy"]), abs=0
        )


def test_bartlett_chi2_nonnegative(results):
    [r] = results["q403_bartlett"]
    # (N-k)ln(pooled) >= sum (m_j-1) ln(var_j) by Jensen
    assert r["bartlett_chi2"] >= 0.0
    assert r["pooled_var"] > 0.0


@pytest.fixture(scope="module")
def results2(spark):
    qs = entrymod.queries()
    names = [
        "q404_stl_lite",
        "q405_streak_days",
        "q406_ar1_fit",
        "q407_mase",
        "q408_winsorized_mean",
        "q409_wilson_interval",
        "q410_readability",
    ]
    return {n: qs[n](spark, SF).collect() for n in names}


def test_stl_decomposition_reconstructs(results2):
    rows = results2["q404_stl_lite"]
    # complete-window days only: 30 - 6 = 24 per type
    assert len(rows) == 24 * 5
    for r in rows:
        assert r["n"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["remainder"], rel=1e-12
        )
    # seasonal component sums to ~0 within each type (mean of
    # detrended values, re-weighted by dow frequency)
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        mean_rem = sum(r["remainder"] for r in rs) / len(rs)
        assert abs(mean_rem) < max(abs(r["n"]) for r in rs) * 0.5


def test_streaks_within_series_span(results2):
    rows = results2["q405_streak_days"]
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r["streak_len"] <= 15  # above-median days <= half+ties


def test_ar1_r2_is_phi_scaled(results2):
    for r in results2["q406_ar1_fit"]:
        assert -1.0 - 1e-9 <= r["phi"] <= 1.0 + 1e-9
        assert 0.0 <= r["r2"] <= 1.0 + 1e-12
        # for simple regression r2 = phi * (Hxy/Hyy); both share sign
        assert math.isfinite(r["intercept"])


def test_mase_consistency(results2):
    for r in results2["q407_mase"]:
        assert r["mase"] == pytest.approx(
            r["mae_naive7"] / r["mae_naive1"], rel=1e-12
        )
        assert r["n_seasonal_errors"] == 23  # 30-day span, lag 7


def test_winsorized_between_bounds(results2):
    for r in results2["q408_winsorized_mean"]:
        assert r["p10"] <= r["winsorized_mean"] <= r["p90"]
        assert r["p10"] <= r["trimmed_mean"] <= r["p90"]
        assert r["n_kept"] <= r["n_days"]


def test_wilson_brackets_p_hat(results2):
    for r in results2["q409_wilson_interval"]:
        # at p_hat == 1 the upper bound equals 1 analytically but can
        # land one ulp below in floats — bracket with tolerance
        assert 0.0 <= r["wilson_lo"] <= r["p_hat"] + 1e-12
        assert r["p_hat"] - 1e-12 <= r["wilson_hi"] <= 1.0 + 1e-12


def test_readability_ranges(results2):
    for r in results2["q410_readability"]:
        assert r["words"] > 0
        if r["words_per_sentence"] is not None:
            assert r["words_per_sentence"] > 0
        assert 0.0 < r["syllables_per_word"] < 10.0


@pytest.fixture(scope="module")
def results3(spark):
    qs = entrymod.queries()
    names = [
        "q411_contamination",
        "q412_heaps_law",
        "q413_ngram_novelty",
        "q414_hour_chisq",
        "q415_zipf_fit",
        "q416_audience_overlap",
    ]
    return {n: qs[n](spark, SF).collect() for n in names}


def test_contamination_pairs_ordered(results3):
    rows = results3["q411_contamination"]
    assert len(rows) == 20
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["shared_shingles"] >= 1
    counts = [r["shared_shingles"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_heaps_curve_monotone(results3):
    rows = sorted(results3["q412_heaps_law"], key=lambda r: r["pct_docs"])
    assert [r["pct_docs"] for r in rows] == list(range(10, 101, 10))
    for a, b in zip(rows, rows[1:]):
        assert b["vocab_size"] >= a["vocab_size"]
        assert b["tokens_seen"] >= a["tokens_seen"]
    # vocabulary can never exceed tokens
    for r in rows:
        assert r["vocab_size"] <= r["tokens_seen"]


def test_novelty_in_unit_interval(results3):
    for r in results3["q413_ngram_novelty"]:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_hapax"] <= r["n_shingles"]


def test_hour_chisq_marginals(results3):
    rows = results3["q414_hour_chisq"]
    # expected counts reproduce the observed margins per type
    from collections import defaultdict

    obs_t, exp_t = defaultdict(int), defaultdict(float)
    for r in rows:
        assert r["chi2_contrib"] >= 0.0
        obs_t[r["event_type"]] += r["observed"]
        exp_t[r["event_type"]] += r["expected"]
    for t in obs_t:
        assert exp_t[t] == pytest.approx(obs_t[t], rel=1e-9)


def test_zipf_slope_negative(results3):
    [r] = results3["q415_zipf_fit"]
    assert 2 <= r["n_ranks"] <= 50  # vocab may be < 50 at tiny SF
    assert r["zipf_slope"] < 0.0  # frequency falls with rank
    assert math.isfinite(r["zipf_intercept"])


def test_audience_overlap_bounds(results3):
    rows = results3["q416_audience_overlap"]
    assert len(rows) == 10  # C(5,2) type pairs
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0.0 <= r["jaccard"] <= 1.0


@pytest.fixture(scope="module")
def results4(spark):
    qs = entrymod.queries()
    names = [
        "q417_slew_alarm",
        "q418_twa",
        "q419_gap_audit",
        "q420_availability",
        "q421_calibration_bins",
        "q422_auc",
        "q423_gains_table",
    ]
    return {n: qs[n](spark, SF).collect() for n in names}


def test_slew_rate_bounded(results4):
    for r in results4["q417_slew_alarm"]:
        assert 0.0 <= r["violation_rate"] <= 1.0
        assert r["n_violations"] <= r["n_pairs"]


def test_twa_within_value_range(results4):
    # values are 0..~100-ish; the trapezoid average must sit inside
    for r in results4["q418_twa"]:
        assert 0.0 < r["twa_value"] < 10000.0
        assert r["n_points"] > 0


def test_gap_audit_consistency(results4):
    for r in results4["q419_gap_audit"]:
        assert r["n_long"] <= r["n_gaps"]
        assert r["med_gap_us"] > 0
        # every long gap exceeds 2x median, so downtime > n_long*2*med
        assert r["downtime_us"] >= r["n_long"] * 2 * r["med_gap_us"]


def test_availability_unit_interval(results4):
    for r in results4["q420_availability"]:
        assert 0.0 < r["availability"] <= 1.0
        assert r["n_buckets"] <= 1440


def test_calibration_bins_flat_for_hash_score(results4):
    rows = sorted(results4["q421_calibration_bins"], key=lambda r: r["bin"])
    assert [r["bin"] for r in rows] == list(range(10))
    total = sum(r["n_events"] for r in rows)
    base = sum(r["n_pos"] for r in rows) / total
    # md5 score is independent of the label: every bin's observed
    # rate must hover near the base rate (binomial tolerance)
    for r in rows:
        se = 3.5 * (base * (1 - base) / r["n_events"]) ** 0.5
        assert abs(r["obs_rate"] - base) <= se + 0.02


def test_auc_is_probability(results4):
    [r] = results4["q422_auc"]
    assert 0.0 <= r["auc"] <= 1.0
    assert r["n_pos"] > 0 and r["n_neg"] > 0


def test_gains_table_monotone_cum_lift(results4):
    rows = sorted(results4["q423_gains_table"], key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(10))
    # cumulative lift ends at exactly 1.0 (full population)
    assert rows[-1]["cum_lift"] == pytest.approx(1.0, rel=1e-12)
    # cum_pos is nondecreasing
    for a, b in zip(rows, rows[1:]):
        assert b["cum_pos"] >= a["cum_pos"]


def test_seasonal_mk_and_partial_corr(spark):
    qs = entrymod.queries()
    mk = qs["q424_seasonal_mk"](spark, SF).collect()
    assert len(mk) == 5
    for r in mk:
        assert r["var_num"] > 0
        # |S| is bounded by total pairs: 7 strata of ~4-5 days
        assert abs(r["s_stat"]) <= 7 * 10
    pc = qs["q425_partial_corr"](spark, SF).collect()
    [r] = pc
    assert -1.0 - 1e-12 <= r["r_xy"] <= 1.0 + 1e-12
    assert -1.0 - 1e-12 <= r["r_xy_given_z"] <= 1.0 + 1e-12


def test_hampel_fold_cv_rev_allocation(spark):
    qs = entrymod.queries()
    hp = qs["q426_hampel_outliers"](spark, SF).collect()
    for r in hp:
        # every flagged day genuinely violates the 3-MAD band
        assert abs(r["n"] - r["med"]) > 3 * r["mad"]
    cv = qs["q427_fold_cv"](spark, SF).collect()
    [r] = cv
    assert r["n_folds"] == 5
    assert r["var_of_fold_means"] >= 0.0
    ra = qs["q429_rev_allocation"](spark, SF).collect()
    assert len(ra) == 20
    for r in ra:
        # the whole point: allocation reconciles to the header exactly
        assert r["allocated_cents"] == r["header_cents"]
        assert r["bumped_lines"] <= r["n_lines"]


def test_logrank_and_mde(spark):
    qs = entrymod.queries()
    [lr] = qs["q430_logrank"](spark, SF).collect()
    assert lr["v_stat"] > 0.0
    assert lr["logrank_chi2"] >= 0.0
    assert lr["n_steps"] >= 1
    [m] = qs["q431_mde"](spark, SF).collect()
    assert m["metric_var"] > 0.0
    assert m["mde_abs"] > 0.0
    assert m["mde_rel"] == pytest.approx(
        m["mde_abs"] / m["metric_mean"], rel=1e-12
    )


def test_eval_metric_batch(spark):
    qs = entrymod.queries()
    [e] = qs["q432_ece"](spark, SF).collect()
    assert 0.0 <= e["ece"] <= 1.0
    [k] = qs["q433_cohen_kappa"](spark, SF).collect()
    assert -1.0 - 1e-12 <= k["kappa"] <= 1.0 + 1e-12
    assert 0.0 <= k["p_observed"] <= 1.0
    [m] = qs["q434_mcc"](spark, SF).collect()
    assert -1.0 - 1e-12 <= m["mcc"] <= 1.0 + 1e-12
    assert 0.0 <= m["precision"] <= 1.0 and 0.0 <= m["recall"] <= 1.0
    # F1 is the harmonic mean: between min and max of P/R
    assert min(m["precision"], m["recall"]) - 1e-12 <= m["f1"]
    assert m["f1"] <= max(m["precision"], m["recall"]) + 1e-12
    [j] = qs["q435_jsd"](spark, SF).collect()
    assert 0.0 <= j["jsd"] <= math.log(2.0) + 1e-12


def test_ops_batch8(spark):
    qs = entrymod.queries()
    st = qs["q436_staleness"](spark, SF).collect()
    for r in st:
        assert 0 <= r["p50_age_us"] <= r["p90_age_us"] <= r["max_age_us"]
    tp = qs["q437_throughput_percentiles"](spark, SF).collect()
    for r in tp:
        assert 1 <= r["p50_per_bucket"] <= r["p90_per_bucket"]
        assert r["p90_per_bucket"] <= r["max_per_bucket"]
        assert r["n_buckets"] <= 1440
    rp = qs["q438_ramp_extremes"](spark, SF).collect()
    assert len(rp) == 5
    for r in rp:
        assert r["max_ramp_down"] <= r["max_ramp_up"]


def test_lorenz_points(spark):
    qs = entrymod.queries()
    rows = sorted(
        qs["q439_lorenz_points"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    # Lorenz curve: nondecreasing, below the diagonal, ends at 1.0
    prev = 0.0
    for r in rows:
        assert r["cum_rev_share"] >= prev - 1e-12
        assert r["cum_rev_share"] <= r["cum_pop_share"] + 1e-12
        prev = r["cum_rev_share"]
    assert rows[-1]["cum_rev_share"] == pytest.approx(1.0, abs=1e-12)
    assert rows[-1]["cum_pop_share"] == pytest.approx(1.0, abs=1e-12)


def test_peak_hour_and_repeat_purchase(spark):
    qs = entrymod.queries()
    ph = qs["q440_peak_hour"](spark, SF).collect()
    assert len(ph) == 5
    for r in ph:
        assert 0 <= r["peak_hour"] <= 23
        assert r["prominence"] >= 1.0  # max >= median by definition
    [rp] = qs["q441_repeat_purchase"](spark, SF).collect()
    assert 0 <= rp["n_loyal"] <= rp["n_repeat"] <= rp["n_buyers"]
    assert 0.0 <= rp["loyal_rate"] <= rp["repeat_rate"] <= 1.0


def test_gap_histogram(spark):
    qs = entrymod.queries()
    rows = qs["q442_gap_histogram"](spark, SF).collect()
    total = sum(r["n_gaps"] for r in rows)
    assert total > 0
    for r in rows:
        # bucket b holds gaps in [2^(b-1), 2^b); µs gaps over a month
        # stay under 2^63
        assert 1 <= r["log2_bucket"] <= 63


def test_no_shadowed_query_functions():
    """A later `def _q_x` silently SHADOWS an earlier one and rebinds
    every registry entry that referenced it (the q203/q385 round-3
    incident, re-triggered in round 4 by q408/q411/q420/q422/q423).
    The registry now raises on duplicate REGISTRATION at import time;
    this test pins the remaining hole — duplicate top-level defs
    WITHIN a single family module (same-file shadowing never reaches
    the registry)."""
    import ast
    import glob
    from collections import Counter

    files = ["/root/repo/__spark_entry__.py"] + sorted(
        glob.glob(
            "/root/repo/sensor_time_series_pyspark_spark/queries/*.py"
        )
    )
    for path in files:
        tree = ast.parse(open(path, encoding="utf-8").read())
        names = [
            n.name for n in tree.body if isinstance(n, ast.FunctionDef)
        ]
        dups = [n for n, c in Counter(names).items() if c > 1]
        assert not dups, f"shadowed top-level defs in {path}: {dups}"


def test_registry_raises_on_duplicates():
    """register_many must refuse duplicate query names, duplicate
    oracle names, and oracles without a query — at import time, not
    silently at gate time."""
    import pytest

    from sensor_time_series_pyspark_spark.queries.registry import (
        QUERIES,
        register_many,
    )

    taken = "q01_pricing_summary"  # registered WITH an oracle
    assert taken in QUERIES
    with pytest.raises(ValueError, match="duplicate query"):
        register_many({taken: lambda s, d: None}, {})
    with pytest.raises(ValueError, match="duplicate oracle"):
        register_many({}, {taken: "SELECT 1"})
    with pytest.raises(ValueError, match="without query"):
        register_many({}, {"q_never_registered": "SELECT 1"})


def test_kw_matches_scipy_formula_on_tiny_frame(spark):
    """Brute-force the tie-corrected H on a tiny known frame and
    compare with the query's algebra replayed in pure Python."""
    data = {"a": [1, 2, 5], "b": [3, 3, 7], "c": [4, 6, 8]}
    pooled = sorted(
        (v, g) for g, vs in data.items() for v in vs
    )
    # average ranks with ties
    from collections import defaultdict

    ranks = {}
    vals = [v for v, _ in pooled]
    for i, (v, _) in enumerate(pooled):
        same = [j for j, w in enumerate(vals) if w == v]
        ranks[i] = sum(j + 1 for j in same) / len(same)
    rsum = defaultdict(float)
    for i, (_, g) in enumerate(pooled):
        rsum[g] += ranks[i]
    n = len(pooled)
    h = 12.0 / (n * (n + 1)) * sum(
        rsum[g] ** 2 / len(vs) for g, vs in data.items()
    ) - 3 * (n + 1)
    ties = defaultdict(int)
    for v in vals:
        ties[v] += 1
    corr = 1.0 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    # replay the query's doubled-rank algebra
    r2 = {}
    for i, (v, _) in enumerate(pooled):
        same = [j for j, w in enumerate(vals) if w == v]
        r2[i] = 2 * min(j + 1 for j in same) + len(same) - 1
    r2sum = defaultdict(int)
    for i, (_, g) in enumerate(pooled):
        r2sum[g] += r2[i]
    srr = sum(r2sum[g] ** 2 / len(vs) for g, vs in data.items())
    h2 = 3.0 * srr / (n * (n + 1)) - 3.0 * (n + 1)
    assert h2 == pytest.approx(h, rel=1e-12)
    tie2 = sum(
        (len([j for j, w in enumerate(vals) if w == v]) ** 2 - 1)
        for v in vals
    )
    assert tie2 == sum(t**3 - t for t in ties.values())
    assert h2 / corr == pytest.approx(h / corr, rel=1e-12)
