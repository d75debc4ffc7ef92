"""Driver-contract shim: ``python bench.py`` prints one JSON line.

The implementation lives in the installable package
(``sensor_time_series_pyspark_spark.cli:bench_main``, also exposed as
the ``sensor-ts-bench`` console script). Running this file directly
works without installing: Python puts this script's directory (the
repo root) on ``sys.path``, where the package lives.
"""

from __future__ import annotations

from sensor_time_series_pyspark_spark.cli import bench_main

if __name__ == "__main__":
    bench_main()
