"""Drive every registered oracle-checkable query through the same
Spark-vs-DuckDB compare the verification driver performs (sf0.001)."""

from __future__ import annotations

import pytest

from gpu_database_spark import registry


def _names():
    return sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    from tests.oracle_utils import assert_query_matches_oracle

    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    df = fn(spark, sf_dir)
    assert_query_matches_oracle(df, duck, sql, name=name)


def test_every_query_has_runnable_entry(spark, sf_dir):
    qs = registry.queries()
    assert qs, "no queries registered"
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
