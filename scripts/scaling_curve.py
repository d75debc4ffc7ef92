"""Empirical scaling curve (VERDICT r6 next-round #6): time the 13
headline queries at sf0.1 and at the builder-owned 10x fixture
(/tmp/scale10, from scripts/gen_scale_fixture.py), plus the
events-based queries on the 5M-row uniform vs zipf variants, and
print one JSON blob with per-query wall-time slopes.

slope = t(10x) / t(1x). A slope near (or below) 10 on a 10x input is
linear scaling; >> 10 is a super-linear plan and a bug report. Slopes
well below 10 are common at this absolute scale — fixed JVM/scheduling
overhead dominates sub-second queries at sf0.1, so the 10x run mostly
amortizes it.

Methodology matches bench.py: one warm-up execution per dataset, then
best-of-N (default 3) noop-sink executions per query; cache cleared
between queries; 1-minute loadavg recorded before each dataset leg.

Load gate (VERDICT r8 #1): round-8 legs were recorded under load1 up
to 23 and the first-decade slopes stopped being comparable
round-over-round. Each leg now WAITS until load1 drops below
--max-load (default 2.0, like the bench discipline) before timing,
up to --load-timeout seconds (then proceeds and the recorded per-leg
load1 documents the compromise).

Usage: python scripts/scaling_curve.py [--repeats N] [--out FILE]
       [--max-load L] [--load-timeout SEC]
"""

from __future__ import annotations

import json
import os
import sys
import time

from sensor_time_series_pyspark_spark.cli import BENCH_QUERIES
from sensor_time_series_pyspark_spark.queries import QUERIES
from sensor_time_series_pyspark_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SCALE10 = "/tmp/scale10"
EV_UNIFORM = "/tmp/scale_events/uniform"
EV_ZIPF = "/tmp/scale_events/zipf"
SCALE_BIG = "/tmp/scale_big"

# VERDICT r7 #6: the steepest first-decade queries get a second
# decade — documents grow 10x over scale10 (500k docs) for q17/q19/
# q22, events grow 50x (50M rows) for q29. Slopes are normalized per
# decade ((t_big/t_10x)^(1/log10(factor))) so the 50x events step
# compares against the 10x first-decade slope directly. q17 joined in
# round 9 (VERDICT r8 #1: first-decade slope 3.69 with no second
# datapoint).
SECOND_DECADE = {
    "q17_dedup_exact": 10.0,     # docs 50k -> 500k
    "q19_jaccard_pairs": 10.0,   # docs 50k -> 500k
    "q22_doc_stats": 10.0,       # docs 50k -> 500k
    "q29_asof_join": 50.0,       # events 1M -> 50M
    # round-9 late addition: the span-level dedup family (q581) shares
    # q19's inverted-index + df-valve shape — give it both decades too
    "q581_dup_spans": 10.0,      # docs 50k -> 500k
    # round-9 late addition: the segment (line-level) dedup audit —
    # two hash shuffles on segment text, worth both decades
    "q588_segment_dedup": 10.0,  # docs 50k -> 500k
}

# headline queries whose input is the events table — these also run
# on the 5M uniform/zipf variants (50x events rows, skewed users)
EVENT_QUERIES = [
    "flagship_hourly_wide",
    "q05_event_type_pivot",
    "q11_resample_30min",
    "q14_interpolate",
    "q15_sessionize",
    "q29_asof_join",
]


def wait_for_idle(max_load: float, timeout_s: float) -> float:
    """Block until load1 < max_load (or timeout); return the load1 the
    leg actually ran at. The gate makes legs comparable ROUND-OVER-
    ROUND, which round 8's under-load numbers were not."""
    deadline = time.monotonic() + timeout_s
    load1 = os.getloadavg()[0]
    while load1 >= max_load and time.monotonic() < deadline:
        time.sleep(10.0)
        load1 = os.getloadavg()[0]
    if load1 >= max_load:
        print(
            f"WARNING leg starting at load1={load1:.2f} >= {max_load} "
            f"after {timeout_s:.0f}s wait",
            file=sys.stderr,
        )
    return round(load1, 2)


def time_leg(spark, sf_dir, names, repeats, max_load=2.0, load_timeout=600.0):
    qs = dict(QUERIES)
    load1 = wait_for_idle(max_load, load_timeout)
    # warm the JVM + footer caches on this dataset (untimed)
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()
    return timings, load1


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    out_file = None
    max_load = 2.0
    load_timeout = 600.0
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])
    if "--out" in args:
        out_file = args[args.index("--out") + 1]
    if "--max-load" in args:
        max_load = float(args[args.index("--max-load") + 1])
    if "--load-timeout" in args:
        load_timeout = float(args[args.index("--load-timeout") + 1])
    for d in (SCALE10, EV_UNIFORM, EV_ZIPF):
        if not os.path.exists(d):
            raise SystemExit(
                f"{d} missing — run scripts/gen_scale_fixture.py first"
            )
    spark = get_spark("scaling_curve")
    gate = dict(max_load=max_load, load_timeout=load_timeout)

    t1, load_a = time_leg(spark, SF01, BENCH_QUERIES, repeats, **gate)
    t10, load_b = time_leg(spark, SCALE10, BENCH_QUERIES, repeats, **gate)
    tu, load_c = time_leg(spark, EV_UNIFORM, EVENT_QUERIES, repeats, **gate)
    tz, load_d = time_leg(spark, EV_ZIPF, EVENT_QUERIES, repeats, **gate)
    second = {}
    if os.path.exists(SCALE_BIG):
        import math

        tb, load_e = time_leg(
            spark, SCALE_BIG, list(SECOND_DECADE), repeats, **gate
        )
        for name, factor in SECOND_DECADE.items():
            decades = math.log10(factor)
            ratio = tb[name] / t10[name]
            second[name] = {
                "t_10x": t10[name],
                "t_big": tb[name],
                "factor": factor,
                "ratio": round(ratio, 2),
                "slope_per_decade": round(ratio ** (1.0 / decades), 2),
                "first_decade_slope": round(t10[name] / t1[name], 2),
            }
        second["load1"] = load_e

    result = {
        "metric": "scaling_curve",
        "repeats": repeats,
        "max_load": max_load,
        "load1": {
            "sf0.1": load_a, "scale10": load_b,
            "events5m_uniform": load_c, "events5m_zipf": load_d,
        },
        "queries": {
            name: {
                "t_sf01": t1[name],
                "t_10x": t10[name],
                "slope": round(t10[name] / t1[name], 2),
            }
            for name in BENCH_QUERIES
        },
        "events5m": {
            name: {
                "t_uniform": tu[name],
                "t_zipf": tz[name],
                "zipf_over_uniform": round(tz[name] / tu[name], 2),
            }
            for name in EVENT_QUERIES
        },
        "second_decade": second,
    }
    blob = json.dumps(result)
    print(blob)
    if out_file:
        with open(out_file, "w") as f:
            f.write(blob + "\n")


if __name__ == "__main__":
    main()
