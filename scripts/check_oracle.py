"""Local mirror of the driver's t2 correctness gate: run every
``queries()`` entry in Spark and its ``oracle_sql()`` twin in DuckDB,
compare row count + schema-width + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # normalize integer dtypes (int32 vs int64 diffs are reported
        # separately as a schema note, not a value mismatch)
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df, duck_df) -> list[str]:
    issues = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        issues.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return issues
    s, d = canon(spark_df), canon(duck_df)
    if len(s) != len(d):
        issues.append(f"row count: spark={len(s)} duck={len(d)}")
        return issues
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f":
            import numpy as np

            bad = pd.Series(
                ~(np.isclose(sv, dv, rtol=0, atol=0, equal_nan=True)), index=sv.index
            )
            if bad.any():
                i = bad.idxmax()
                issues.append(f"col {c}: {int(bad.sum())} mismatches, e.g. row {i}: {sv[i]!r} vs {dv[i]!r}")
        else:
            bad = ~((sv == dv) | (sv.isna() & dv.isna()))
            if bad.any():
                i = bad.idxmax()
                issues.append(f"col {c}: {int(bad.sum())} mismatches, e.g. row {i}: {sv[i]!r} vs {dv[i]!r}")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle")
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            if len(sdf) == 0:
                failed.append(name)
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failed.append(name)
            continue
        issues = compare(name, sdf, ddf)
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues))
            failed.append(name)
        else:
            print(f"ok   {name}: {len(sdf)} rows match")
    print(f"\n{n_run - len(failed)}/{n_run} pass"
          + (f" (selected of {len(qs)} registered)" if only else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
