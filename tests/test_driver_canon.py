"""Driver-canonicalizer conformance: schema-level contract checks.

The verification driver canonicalizes each result by loading it into
pandas, sorting columns by name, ``sort_values`` over every column,
then hashing cell values. Two result shapes break that pipeline even
when the VALUES are bit-identical across engines (both bit us in
round 6):

1. a top-level ``array``/``map`` column in the Spark result — pandas
   materializes the cells as ndarrays, which are unhashable, so
   ``sort_values`` raises (``fn_regexp_extract_all``, round 6);
2. a DuckDB oracle aggregate typed HUGEINT (``SUM`` over INTEGER and
   anything it union-promotes) — pandas gives it ``object`` dtype, so
   the value hash differs from Spark's int64 (``corpus_funnel_yield``,
   round 6).

These tests enforce the contract over EVERY registered query so the
class of bug is caught in CI before a driver round burns on it:
complex values must be stringified (``concat_ws`` / ``to_json``) in
the final projection, and oracle SUMs must be ``CAST(... AS BIGINT)``.
"""

from __future__ import annotations

import pytest

from gpu_database_spark import registry


def _all_names():
    return sorted(registry.queries().keys())


def _oracled_names():
    return sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", _all_names())
def test_spark_schema_has_no_toplevel_complex_column(spark, sf_dir, name):
    from pyspark.sql.types import ArrayType, MapType

    df = registry.queries()[name](spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not bad, (
        f"{name}: top-level complex column(s) {bad} break the driver's "
        "pandas canonicalizer (unhashable ndarray cells) — stringify in "
        "the final projection (concat_ws / to_json)"
    )


@pytest.mark.parametrize("name", _oracled_names())
def test_oracle_dtypes_are_pandas_hashable(duck, name):
    sql = registry.oracle_sql()[name]
    rows = duck.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if "HUGEINT" in typ.upper()
        or typ.upper().endswith("[]")
        or typ.upper().startswith(("MAP(", "STRUCT(", "UNION("))
    ]
    assert not bad, (
        f"{name}: oracle column(s) {bad} reach pandas as object dtype "
        "and hash-mismatch the Spark result even when values are "
        "identical — CAST sums to BIGINT / stringify lists in the SQL"
    )
