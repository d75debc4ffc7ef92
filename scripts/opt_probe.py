"""Optimization probe: capture `.explain("formatted")` and isolated
noop-sink timings (bench.py methodology: best-of-N on a warm JVM) for
a set of queries.

Usage:
  python scripts/opt_probe.py plans  <tag> [names...]   # write plans/<round>/<name>_<tag>.txt
  python scripts/opt_probe.py time   [names...]         # print per-query best-of-N secs
  python scripts/opt_probe.py both   <tag> [names...]

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
core count from $SPARK_GRAFT_CPUS — same contract as bench.py. Plans
land in plans/$SPARK_GRAFT_PLANS_ROUND (default r11).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sensor_time_series_pyspark_spark.cli import BENCH_QUERIES
from sensor_time_series_pyspark_spark.queries import QUERIES
from sensor_time_series_pyspark_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(
    ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
)

USAGE = __doc__


def fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("plans", "time", "both"):
        print(USAGE)
        return 2
    mode = sys.argv[1]
    if mode in ("plans", "both"):
        if len(sys.argv) < 3:
            print(USAGE)
            return 2
        tag = sys.argv[2]
        names = sys.argv[3:] or list(BENCH_QUERIES)
    else:
        tag = None
        names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = dict(QUERIES)
    unknown = [n for n in names if n not in qs]
    names = [n for n in names if n in qs]
    if unknown:
        print(f"unknown queries skipped: {unknown}")
    if not names:
        print("no known queries requested; nothing to do")
        return 2
    spark = get_spark("opt_probe")

    if mode in ("plans", "both"):
        os.makedirs(PLANS_DIR, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(fmt_plan(df))
            print(f"wrote {path}")

    if mode in ("time", "both"):
        load1 = round(os.getloadavg()[0], 2)
        # warm JVM once
        qs[names[0]](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        repeats = max(
            1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
        )
        timings = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"opt_probe:{name}")
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"queries": timings, "load1": load1}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
