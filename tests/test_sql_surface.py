"""Semantics tests for the modern-SQL surface beyond the oracle gate:
HLL sketch accuracy/mergeability and recursive-CTE structure."""

from __future__ import annotations


def test_hll_union_matches_global_estimate(spark, sf_dir):
    """Merging per-group sketches must estimate the same cardinality as
    sketching the whole column — the re-aggregatability property that
    makes sketches the 100-TB rollup currency."""
    from pyspark.sql import functions as F

    from gpu_database_spark.operators.sql_surface import hll_merged_estimate
    from gpu_database_spark.sources.catalog import load_table

    merged = hll_merged_estimate(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    exact = o.select(F.count_distinct("o_custkey")).collect()[0][0]
    direct = o.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey"))
    ).collect()[0][0]
    assert merged == direct, "sketch union must equal one-pass sketch"
    assert abs(merged - exact) / exact < 0.05, (merged, exact)


def test_hll_per_group_accuracy(spark, sf_dir):
    from gpu_database_spark.registry import queries

    rows = queries()["agg_hll_sketch_merge"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.est_nd - r.exact_nd) / max(r.exact_nd, 1) < 0.05, r


def test_recursive_cte_depth_is_log_n(spark, sf_dir):
    """Every nation appears exactly once; depth == floor(log2(nk+1))
    for a binary heap — pins that the fixpoint ran to completion and
    didn't duplicate rows across iterations."""
    import math

    from gpu_database_spark.registry import queries

    rows = queries()["sql_recursive_cte"](spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.nk for r in rows) == list(range(n))
    for r in rows:
        assert r.depth == int(math.log2(r.nk + 1)), r
        assert r.path.endswith(r.n_name)


def test_variant_missing_path_is_null(spark, sf_dir):
    """try_variant_get on an absent path must be NULL for every row —
    n_missing equals the group count."""
    from gpu_database_spark.registry import queries

    for r in queries()["fn_variant_json"](spark, sf_dir).collect():
        assert r.n_missing > 0
        assert r.n_hi <= r.n_missing  # n_missing == group row count
