"""Round-5d batch: invariant tests for the agreement/reliability
queries (agreement.py, né latest4.py)."""

import math

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_cronbach_alpha_identities(spark):
    [r] = entrymod.queries()["q504_cronbach_alpha"](spark, SF).collect()
    assert r["k_items"] == 5 and r["n_days"] == 30
    assert r["sum_item_var"] > 0 and r["total_var"] > 0
    # alpha = 1.25 * (1 - sum_item/total), and alpha <= 1 always
    expect = 1.25 * (1.0 - r["sum_item_var"] / r["total_var"])
    assert abs(r["cronbach_alpha"] - expect) < 1e-12
    assert r["cronbach_alpha"] <= 1.0 + 1e-12


def test_lin_ccc_bounds(spark):
    [r] = entrymod.queries()["q505_lin_ccc"](spark, SF).collect()
    assert r["n_days"] == 30
    assert -1.0 - 1e-12 <= r["lin_ccc"] <= 1.0 + 1e-12


def test_deming_slope_finite(spark):
    [r] = entrymod.queries()["q506_deming_slope"](spark, SF).collect()
    assert r["n_days"] == 30
    assert math.isfinite(r["beta"]) and math.isfinite(r["alpha_cents"])
    # lambda=1 Deming slope has the sign of the covariance
    assert r["beta"] != 0


def test_dedup_yield_curve_monotone(spark):
    rows = entrymod.queries()["q507_dedup_yield_curve"](
        spark, SF
    ).collect()
    assert len(rows) == 8
    rows = sorted(rows, key=lambda r: r["threshold"])
    for a, b in zip(rows, rows[1:]):
        # stricter threshold => fewer pairs, fewer removals,
        # more corpus survives
        assert b["n_pairs"] <= a["n_pairs"]
        assert b["n_removed"] <= a["n_removed"]
        assert b["survival_frac"] >= a["survival_frac"]
    for r in rows:
        assert 0.0 <= r["survival_frac"] <= 1.0
