"""Round-5b batch: invariant tests for q462–q465 (complexity_evt.py, né latest2.py).
The DuckDB oracle gate pins exact values at sf0.01; these pin the
MATH — identities and bounds the hash can't explain on its own."""

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    qs = entrymod.queries()
    names = [
        "q462_permutation_entropy",
        "q463_cliffs_delta",
        "q464_gini_stump",
        "q465_ccf_lags",
    ]
    return {n: qs[n](spark, SF).collect() for n in names}


def test_permutation_entropy_bounds(results):
    rows = results["q462_permutation_entropy"]
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["pe_norm"] <= 1.0
        assert 1 <= r["n_patterns"] <= 6
        # 30-day January series embeds into n-2 ordinal triples
        assert r["n_windows"] == 28


def test_cliffs_delta_identities(results):
    rows = results["q463_cliffs_delta"]
    assert len(rows) == 10  # C(5,2) unordered type pairs
    for r in rows:
        assert -1.0 <= r["delta"] <= 1.0
        # gt + lt + ties == n_a * n_b
        assert 0 <= r["gt"] + r["lt"] <= r["n_a"] * r["n_b"]
        assert r["type_a"] < r["type_b"]


def test_gini_stump_bounds(results):
    rows = sorted(
        results["q464_gini_stump"], key=lambda r: r["threshold"]
    )
    assert rows
    n = rows[0]["n_left"] + rows[0]["n_right"]
    prev = 0
    for r in rows:
        # max Gini for 5 classes is 1 - 1/5
        assert 0.0 <= r["gini_weighted"] <= 0.8 + 1e-12
        assert r["n_left"] + r["n_right"] == n
        assert r["n_left"] > prev  # distinct thresholds strictly grow
        prev = r["n_left"]
        # Cauchy-Schwarz floor: ssq >= n^2/k for k=5 classes
        assert 5 * r["ssq_left"] >= r["n_left"] * r["n_left"]


def test_ccf_bounds(results):
    rows = results["q465_ccf_lags"]
    assert len(rows) == 7
    for r in rows:
        assert abs(r["ccf"]) <= 1.0 + 1e-12
        # lag-k alignment over a 30-day span leaves 30 - |k| pairs
        assert r["n_days"] == 30 - abs(r["lag"])


def test_sample_entropy_identities(spark):
    rows = entrymod.queries()["q466_sample_entropy"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # 3-template matches are a subset of 2-template matches
        assert 0 <= r["a_pairs"] <= r["b_pairs"] <= 28 * 27 // 2
        if r["sampen"] is not None:
            assert r["sampen"] >= 0.0
        assert r["r_tol"] >= 0


def test_source_overlap_identities(spark):
    rows = entrymod.queries()["q467_source_overlap"](spark, SF).collect()
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert 0 < r["n_inter"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard"] <= r["containment"] <= 1.0


def test_kendall_matrix_identities(spark):
    rows = entrymod.queries()["q468_kendall_matrix"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n0"] == 30 * 29 // 2  # C(30,2) day pairs
        assert (
            r["concordant"] + r["discordant"] <= r["n0"]
        )
        assert -1.0 <= r["tau_b"] <= 1.0


def test_haar_parseval_exact(spark):
    """Unnormalized Haar satisfies 8·Σv² = 4E1 + 2E2 + E3 + EA as an
    EXACT integer identity — the lossless-decomposition proof."""
    rows = entrymod.queries()["q469_haar_energy"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert (
            8 * r["sum_sq"]
            == 4 * r["e1"] + 2 * r["e2"] + r["e3"] + r["ea"]
        )
        for c in ("frac_l1", "frac_l2", "frac_l3"):
            assert 0.0 <= r[c] <= 1.0


def test_periodogram_fracs(spark):
    rows = entrymod.queries()["q470_periodogram"](spark, SF).collect()
    assert len(rows) == 35  # 5 types x 7 harmonics
    by_type = {}
    for r in rows:
        assert r["power"] >= 0.0
        by_type.setdefault(r["event_type"], 0.0)
        by_type[r["event_type"]] += r["power_frac"]
    for tot in by_type.values():
        assert abs(tot - 1.0) < 1e-12


def test_hjorth_positive(spark):
    import math

    rows = entrymod.queries()["q471_hjorth"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["activity"] > 0
        assert r["mobility"] > 0 and math.isfinite(r["mobility"])
        assert r["complexity"] > 0 and math.isfinite(r["complexity"])
        assert r["n_days"] == 30


def test_hill_tail_bounds(spark):
    rows = entrymod.queries()["q472_hill_tail"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # top-50 values all >= x_(51) => every ln term >= 0
        assert r["hill_h"] >= 0.0
        assert r["x_k1"] > 0
        if r["hill_h"] > 0:
            assert abs(r["alpha"] * r["hill_h"] - 1.0) < 1e-12


def test_mean_excess_monotone_count(spark):
    rows = entrymod.queries()["q473_mean_excess"](spark, SF).collect()
    assert rows
    by_type = {}
    for r in rows:
        assert r["mean_excess"] >= 0.0
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        rs = sorted(rs, key=lambda r: r["decile"])
        for a, b in zip(rs, rs[1:]):
            # higher threshold => fewer exceedances, larger u
            assert b["u"] >= a["u"]
            assert b["n_exceed"] <= a["n_exceed"]


def test_rfm_segment_census(spark):
    rows = entrymod.queries()["q474_rfm_segments"](spark, SF).collect()
    n = sum(r["n_users"] for r in rows)
    assert n == 15  # sf0.001 has 15 distinct users
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5
        assert r["n_users"] > 0


def test_nelson_aalen_monotone(spark):
    rows = entrymod.queries()["q475_nelson_aalen"](spark, SF).collect()
    assert rows
    rows = sorted(rows, key=lambda r: r["duration"])
    prev_h, prev_n = 0.0, None
    for r in rows:
        # cumulative hazard is nondecreasing; at-risk set shrinks
        assert r["cum_hazard"] >= prev_h
        if prev_n is not None:
            assert r["n_risk"] < prev_n
        prev_h, prev_n = r["cum_hazard"], r["n_risk"]
        assert 0.0 < r["breslow_surv"] <= 1.0


def test_lz_complexity_bounds(spark):
    rows = entrymod.queries()["q476_lz_complexity"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_len"] == 29
        # LZ76 phrase count is between 1 and n
        assert 1 <= r["n_phrases"] <= r["n_len"]
        assert r["lz_norm"] > 0


def test_lz76_python_reference():
    """The driver-side parse against hand-checked values."""

    def lz76(s):
        n = len(s)
        i = c = 0
        while i < n:
            l = 1
            while i + l <= n and s[i : i + l] in s[: i + l - 1]:
                l += 1
            c += 1
            i += l
        return c

    assert lz76("0001101001000101") == 6
    assert lz76("1111111") == 2
    assert lz76("0101010101") == 3
    assert lz76("1") == 1


def test_spectral_entropy_bounds(spark):
    rows = entrymod.queries()["q477_spectral_entropy"](
        spark, SF
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["spec_entropy"] <= 1.0 + 1e-12
        assert 1 <= r["peak_k"] <= 7
        assert abs(r["peak_period"] - 30.0 / r["peak_k"]) < 1e-12


def test_dfa_alpha_shape(spark):
    rows = entrymod.queries()["q478_dfa_alpha"](spark, SF).collect()
    assert len(rows) == 20  # 5 types x 4 box sizes
    import math

    by_type = {}
    for r in rows:
        assert r["f_s"] >= 0.0 and math.isfinite(r["f_s"])
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        # every row of a type carries the same fitted alpha
        assert len({round(r["alpha"], 12) for r in rs}) == 1
        assert {r["s"]: r["n_boxes"] for r in rs} == {
            4: 7, 5: 6, 6: 5, 10: 3
        }


def test_higuchi_fd_bounds(spark):
    rows = entrymod.queries()["q479_higuchi_fd"](spark, SF).collect()
    assert len(rows) == 20
    by_type = {}
    for r in rows:
        assert r["l_k"] > 0
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        assert len({round(r["higuchi_fd"], 12) for r in rs}) == 1
        rs = sorted(rs, key=lambda r: r["k"])
        # curve length shrinks with stride (Higuchi's premise)
        assert rs[0]["l_k"] >= rs[-1]["l_k"]


def test_entropy_rate_identities(spark):
    import math

    rows = entrymod.queries()["q480_entropy_rate"](spark, SF).collect()
    assert len(rows) == 5
    pi_sum = sum(r["pi"] for r in rows)
    assert abs(pi_sum - 1.0) < 1e-12
    rate = rows[0]["entropy_rate"]
    for r in rows:
        assert 0.0 <= r["row_entropy"] <= math.log(5) + 1e-12
        assert r["entropy_rate"] == rate
    # rate is the pi-weighted mean of row entropies
    mix = sum(r["pi"] * r["row_entropy"] for r in rows)
    assert abs(mix - rate) < 1e-9
