"""Local mirror of the driver's t2 correctness gate — thin shim over
``sensor_time_series_pyspark_spark.cli:gate_main`` (also installed as
the ``sensor-ts-gate`` console script).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]

Requires the package to be importable: either ``pip install -e .``
(the supported path) or invocation from the repo root via
``python -m scripts.check_oracle`` / PYTHONPATH.
"""

from __future__ import annotations

import sys

try:
    from sensor_time_series_pyspark_spark.cli import gate_main
except ImportError as exc:  # pragma: no cover - setup guidance only
    raise SystemExit(
        "sensor_time_series_pyspark_spark is not importable "
        f"({exc}); run `pip install -e .` from the repo root first"
    )

if __name__ == "__main__":
    raise SystemExit(gate_main(sys.argv[1:]))
