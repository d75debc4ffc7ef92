"""Plan diagnostics — the shuffle/broadcast/pushdown summary the test
suite pins (tests/test_plans.py), exposed as an API so pipelines can
assert their own plan budgets in CI ("this query must stay
one-shuffle") instead of discovering regressions in production run
time.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame) -> dict:
    """Summarize the physical plan of ``df`` WITHOUT executing it.

    Returns a dict with:
      n_exchanges       data shuffles (hash/range/single-partition)
      n_broadcasts      broadcast exchanges (dim-sized, cheap)
      n_scans           file scans
      python_eval       True if any Batch/ArrowEvalPython node exists
      cartesian         True if a cartesian / nested-loop join exists
      pushed_filters    list of PushedFilters strings from the scans
      whole_stage_codegen  True if a codegen stage is visible —
                           best-effort: with AQE on, pre-execution
                           plans may not show codegen stages yet
    """
    qe = df._jdf.queryExecution()
    formatted = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
    executed = qe.executedPlan().toString()
    return {
        "n_exchanges": len(re.findall(r"\(\d+\) Exchange\b", formatted)),
        "n_broadcasts": len(
            re.findall(r"\(\d+\) BroadcastExchange\b", formatted)
        ),
        "n_scans": len(re.findall(r"\(\d+\) Scan\b", formatted)),
        "python_eval": (
            "BatchEvalPython" in executed or "ArrowEvalPython" in executed
        ),
        "cartesian": (
            "CartesianProduct" in executed
            or "BroadcastNestedLoopJoin" in executed
        ),
        "pushed_filters": re.findall(r"PushedFilters: \[[^\]]*\]", executed),
        "whole_stage_codegen": (
            "WholeStageCodegen" in executed or "*(" in executed
        ),
    }


def assert_plan_budget(
    df: DataFrame,
    max_exchanges: int | None = None,
    allow_python: bool = False,
    allow_cartesian: bool = False,
) -> dict:
    """Raise AssertionError if the plan exceeds the given budget;
    returns the summary for logging. The CI-gate form of plan_summary.
    """
    s = plan_summary(df)
    if max_exchanges is not None and s["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {s['n_exchanges']} exchanges > budget {max_exchanges}"
        )
    if not allow_python and s["python_eval"]:
        raise AssertionError("plan contains Python evaluation nodes")
    if not allow_cartesian and s["cartesian"]:
        raise AssertionError("plan contains a cartesian/nested-loop join")
    return s
