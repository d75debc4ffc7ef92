"""Rainflow cycle counting (ASTM E1049-85 four-point / stack method) —
the classic sensor-domain fatigue-analysis operator: decompose a load
series into closed hysteresis cycles plus a residual, so damage models
(Miner's rule over range^m) can aggregate per asset. The reference
repo has no rainflow; this is the round-10 addition flagged in the
round-9 review as the one canonical sensor operator still absent.

The algorithm is inherently sequential per series (a stack over the
turning points), so the Spark shape is ``applyInPandas`` per entity —
the same pattern as the per-series ARIMA/Holt fits (ml/forecast.py):
groups are bounded (one series per asset, resampled BEFORE the Python
hop), the fan-out across entities is where the parallelism lives, and
everything before the hop is native DataFrame algebra.

Exactness: the operator takes an INTEGER value column (the q444
convention — cents via decimal(12,2)*100) and emits integer cycle
features only: rng = |B-C| and mean2 = B+C (TWICE the cycle mean, so
no halving ever leaves the integers). The DuckDB oracle twin
(q603's) replays the identical stack machine as a recursive CTE, one
push or one reduction per recursion step, so the emitted cycle
multiset is bit-equal — this is how a genuinely sequential operator
still earns a hash-gated oracle.

Algorithm (four-point, residual-as-half-cycles):
1. compress consecutive equal values, keep turning points
   (endpoints + strict local extrema);
2. push points onto a stack; whenever the top four A,B,C,D satisfy
   |C-B| <= |B-A| and |C-B| <= |D-C|, count a FULL cycle (B,C) and
   remove B,C (re-check after every reduction);
3. the residual stack yields a HALF cycle per adjacent pair.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _turning_points(values: Iterable[int]) -> list[int]:
    comp: list[int] = []
    for v in values:
        if not comp or v != comp[-1]:
            comp.append(v)
    if len(comp) <= 2:
        return comp
    pts = [comp[0]]
    for i in range(1, len(comp) - 1):
        if (comp[i] - comp[i - 1]) * (comp[i + 1] - comp[i]) < 0:
            pts.append(comp[i])
    pts.append(comp[-1])
    return pts


def rainflow_count(values: Iterable[int]) -> list[tuple[int, int, int]]:
    """Pure-python rainflow over one integer series: list of
    (rng, mean2, is_full) with mean2 = the cycle's B+C (twice the
    mean — integers stay integers)."""
    stack: list[int] = []
    out: list[tuple[int, int, int]] = []
    for p in _turning_points(values):
        stack.append(p)
        while len(stack) >= 4:
            a, b, c, d = stack[-4:]
            if abs(c - b) <= abs(b - a) and abs(c - b) <= abs(d - c):
                out.append((abs(c - b), b + c, 1))
                del stack[-3:-1]
            else:
                break
    for x, y in zip(stack, stack[1:]):
        out.append((abs(y - x), x + y, 0))
    return out


def rainflow_cycles(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Per-entity rainflow cycle counting over an INTEGER-valued,
    ``order_col``-ordered series. Output grain: one row per distinct
    cycle signature — (entity, rng, mean2, is_full, n_cycles), with
    rng = |B-C|, mean2 = B+C (twice the mean), is_full 1 for closed
    cycles / 0 for residual half cycles.

    Scale shape: ONE shuffle to co-locate each entity's series into a
    single Arrow batch (series are resampled upstream, so groups are
    bounded — the q25/ARIMA sizing argument); the stack walk is O(n)
    per series; the output aggregate happens INSIDE the pandas group
    (cycle signatures, not raw cycles, cross back over Arrow).
    """
    out_schema = (
        f"{entity_col} long, rng long, mean2 long, "
        "is_full int, n_cycles long"
    )

    def _one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        series = pdf.sort_values(order_col)[value_col].tolist()
        counts: dict[tuple[int, int, int], int] = {}
        for sig in rainflow_count(series):
            counts[sig] = counts.get(sig, 0) + 1
        if not counts:
            return pd.DataFrame(
                columns=[entity_col, "rng", "mean2", "is_full", "n_cycles"]
            )
        rows = [
            (key[0], rng, mean2, full, n)
            for (rng, mean2, full), n in sorted(counts.items())
        ]
        return pd.DataFrame(
            rows,
            columns=[entity_col, "rng", "mean2", "is_full", "n_cycles"],
        )

    ordered = df.select(entity_col, order_col, value_col)
    return (
        ordered.groupBy(entity_col)
        .applyInPandas(_one, schema=out_schema)
        .select(
            F.col(entity_col),
            F.col("rng").cast("bigint"),
            F.col("mean2").cast("bigint"),
            F.col("is_full").cast("int"),
            F.col("n_cycles").cast("bigint"),
        )
    )
