"""DuckDB-oracle differential tests (SURVEY.md §5 strategy #1): every
SQL-expressible ``queries()`` entry must match its oracle at sf0.001.
The driver runs the same comparison at sf0.01; this is the fast local
gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from sensor_time_series_pyspark_spark.cli import compare, duck_con

SF = "/root/testdata/sf0.001"

_QUERIES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def duck():
    return duck_con(SF)


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF).toPandas()
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert len(sdf) > 0, f"{name}: rows-only check, got empty result"
        return
    ddf = duck.execute(sql).fetchdf()
    issues = compare(name, sdf, ddf)
    assert not issues, f"{name}: " + "; ".join(issues)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_query_has_oracle_or_is_marked():
    qs = set(entrymod.queries())
    extra = set(entrymod.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys without queries(): {extra}"
