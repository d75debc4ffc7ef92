"""Round-8 tests: expectation-compiler NULL/empty policy, and the
hypothesis differential test comparing the single-pass compiled suite
against a naive per-check scan (VERDICT r7 item #8)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sensor_time_series_pyspark_spark.operators import (
    accepted_values,
    between,
    matches_regex,
    mean_between,
    monotonic_id,
    not_null,
    row_count_between,
    run_expectations,
    unique,
    unique_combo,
)


def test_expectations_null_values_are_violations(spark):
    """ADVICE r7 (medium): a NULL value must count as a violation for
    between/accepted_values — a df whose ONLY bad values are NULL used
    to sail through both checks (NULL predicate -> otherwise(0))."""
    df = spark.createDataFrame(
        [(1, None, None), (2, "a", 5.0)],
        "id int, cat string, x double",
    )
    suite = [
        accepted_values("cat_dom", "cat", ("a", "b")),
        between("x_rng", "x", 0.0, 100.0, 0.0),
    ]
    got = {r["name"]: r for r in run_expectations(df, suite).collect()}
    assert got["cat_dom"]["passed"] is False
    assert got["cat_dom"]["observed"] == 1.0  # the NULL row
    assert got["x_rng"]["passed"] is False
    assert got["x_rng"]["observed"] == 0.5  # 1 NULL of 2


def test_expectations_empty_input_definite_failure(spark):
    """ADVICE r7 (medium): an empty table must NOT vacuously pass —
    every data-content check reports a definite passed=False (never
    NULL, which would drop out of both WHERE passed and WHERE NOT
    passed), while row_count_between evaluates its band naturally."""
    df = spark.createDataFrame([], "id int, cat string, x double")
    suite = [
        row_count_between("rows_pos", 1, 10),
        row_count_between("rows_zero_ok", 0, 10),
        not_null("x_nn", "x", 0.0),
        unique("id_uniq", "id"),
        accepted_values("cat_dom", "cat", ("a",)),
        between("x_rng", "x", 0.0, 1.0, 0.0),
        monotonic_id("id_span", "id"),
    ]
    rows = run_expectations(df, suite).collect()
    got = {r["name"]: r for r in rows}
    assert got["rows_pos"]["passed"] is False
    assert got["rows_zero_ok"]["passed"] is True  # band admits zero
    for name in ("x_nn", "id_uniq", "cat_dom", "x_rng", "id_span"):
        assert got[name]["passed"] is False, name
    # every verdict and observation is definite — no NULLs anywhere
    for r in rows:
        assert r["passed"] is not None, r
        assert r["observed"] is not None, r


def test_expectations_all_null_id_column(spark):
    """monotonic_id over an all-NULL column (max/min NULL at n>0) must
    fail definitively, not emit a NULL verdict."""
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0)], "id int, x double"
    )
    got = {
        r["name"]: r
        for r in run_expectations(df, [monotonic_id("span", "id")]).collect()
    }
    assert got["span"]["passed"] is False
    assert got["span"]["observed"] == 0.0


def _naive_audit(rows, suite):
    """Reference evaluator: one independent Python scan per check,
    mirroring the documented semantics exactly (NULL = violation for
    between/accepted_values; empty input fails every data-content
    check; count_distinct ignores NULLs)."""
    n = len(rows)
    out = {}
    for e in suite:
        vals = [getattr(r, e.col) for r in rows] if e.col else []
        if e.kind == "unique_combo" and n == 0:
            out[e.name] = (False, 0.0)
            continue
        if e.kind == "row_count_between":
            passed, obs = int(e.lo) <= n <= int(e.hi), float(n)
        elif n == 0:
            passed, obs = False, 0.0
        elif e.kind == "not_null":
            m = sum(v is None for v in vals)
            obs = m / n
            passed = obs <= e.frac
        elif e.kind == "unique":
            m = len({v for v in vals if v is not None})
            obs = float(m)
            passed = m == n
        elif e.kind == "accepted_values":
            m = sum((v is None) or (v not in e.values) for v in vals)
            obs = float(m)
            passed = m == 0
        elif e.kind == "between":
            m = sum((v is None) or v < e.lo or v > e.hi for v in vals)
            obs = m / n
            passed = obs <= e.frac
        elif e.kind == "matches_regex":
            import re

            m = sum(
                (v is None) or (re.search(e.pattern, v) is None)
                for v in vals
            )
            obs = m / n
            passed = obs <= e.frac
        elif e.kind == "mean_between":
            # mirror the operator's exact decimal(38,6) accumulation:
            # each double rounds HALF_UP to 6 places, the sum is exact,
            # and one correctly-rounded double division follows
            from decimal import ROUND_HALF_UP, Decimal

            q = Decimal("0.000001")
            nn = [
                Decimal(v).quantize(q, ROUND_HALF_UP)
                for v in vals
                if v is not None
            ]
            if not nn:
                passed, obs = False, 0.0
            else:
                obs = float(sum(nn)) / len(nn)
                passed = e.lo <= obs <= e.hi
        elif e.kind == "unique_combo":
            tups = {tuple(getattr(r, c) for c in e.cols) for r in rows}
            obs = float(len(tups))
            passed = len(tups) == n
        else:  # monotonic_id
            nn = [v for v in vals if v is not None]
            if not nn:
                passed, obs = False, 0.0
            else:
                span = max(nn) - min(nn) + 1
                passed, obs = span >= n, float(span)
        out[e.name] = (bool(passed), obs)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-5, 12)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", "zz"])),
            st.one_of(
                st.none(),
                st.floats(
                    -50.0, 150.0, allow_nan=False, allow_infinity=False
                ),
            ),
        ),
        max_size=25,
    ),
    lo=st.integers(0, 5),
    hi=st.integers(5, 30),
    frac=st.sampled_from([0.0, 0.25, 0.5]),
    dom=st.sets(st.sampled_from(["a", "b", "c", "zz"]), min_size=1),
    blo=st.floats(-20.0, 0.0, allow_nan=False),
    bhi=st.floats(1.0, 120.0, allow_nan=False),
)
def test_expectations_differential_vs_naive(
    spark, rows, lo, hi, frac, dom, blo, bhi
):
    """VERDICT r7 #8: property test — the single-pass compiled suite
    must agree check-for-check with a naive per-expectation scan on
    arbitrary data (including NULL-heavy and empty frames)."""
    df = spark.createDataFrame(rows, "id int, cat string, x double")
    suite = [
        row_count_between("rows", lo, hi),
        not_null("x_nn", "x", frac),
        unique("id_uniq", "id"),
        accepted_values("cat_dom", "cat", tuple(sorted(dom))),
        between("x_rng", "x", blo, bhi, frac),
        monotonic_id("id_span", "id"),
        matches_regex("cat_rx", "cat", "^(a|zz)$", frac),
        mean_between("x_mean", "x", blo, bhi),
        unique_combo("id_cat", ("id", "cat")),
    ]
    got = {
        r["name"]: (r["passed"], r["observed"])
        for r in run_expectations(df, suite).collect()
    }
    want = _naive_audit(
        df.collect(), suite
    )  # same rows Spark saw, engine-independent semantics
    assert set(got) == set(want)
    for name in want:
        assert got[name][0] is want[name][0], (name, got[name], want[name])
        assert math.isclose(
            got[name][1], want[name][1], rel_tol=0, abs_tol=0
        ), (name, got[name], want[name])


def test_gate_codegen_guard_fires_and_clears():
    """cli.gate_main's codegen guard (round 8): the gate must FAIL
    when 'ERROR CodeGenerator' appears on the JVM's stderr during the
    run, and pass (printing the zero-count line) when it doesn't.
    Runs gate_main twice in a subprocess on one real query; the
    failing leg injects the marker onto fd 2 from inside a query fn —
    the same channel log4j writes to."""
    import subprocess
    import sys

    code = """
import os, sys
sys.path.insert(0, "/root/repo")
import sensor_time_series_pyspark_spark.cli as cli
from sensor_time_series_pyspark_spark.queries import registry

real = dict(cli.QUERIES)["q01_pricing_summary"]
sql = dict(cli.ORACLE_SQL)["q01_pricing_summary"]

def noisy(spark, sf):
    os.write(2, b"25/01/01 00:00:00 ERROR CodeGenerator: failed to compile\\n")
    return real(spark, sf)

cli.QUERIES = {"q01_pricing_summary": noisy}
cli.ORACLE_SQL = {"q01_pricing_summary": sql}
rc_bad = cli.gate_main(["/root/testdata/sf0.001"])
cli.QUERIES = {"q01_pricing_summary": real}
rc_ok = cli.gate_main(["/root/testdata/sf0.001"])
print("GUARD", rc_bad, rc_ok)
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
        cwd="/root/repo",
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("GUARD")]
    assert lines, out.stderr[-2000:]
    _, rc_bad, rc_ok = lines[0].split()
    assert (rc_bad, rc_ok) == ("1", "0"), (lines, out.stdout[-1500:])
    assert "FAIL codegen" in out.stdout
    assert "codegen: 0 'ERROR CodeGenerator' lines" in out.stdout
