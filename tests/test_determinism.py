"""Determinism guarantees: partition-layout invariance of the exact
decimal aggregation pattern, and seeded-generator reproducibility
(the reference's explicit design goal, random.h:15-21)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_database_spark import gen
from gpu_database_spark.functions.compat import dsum
from gpu_database_spark.sources.catalog import load_table


def test_decimal_sum_invariant_under_partitioning(spark, sf_dir):
    """The compat.dsum pattern must produce bit-identical doubles no
    matter how the rows are partitioned (plain double sums would not)."""
    l = load_table(spark, sf_dir, "lineitem")
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    results = set()
    for n_parts in (1, 3, 8, 32):
        v = (
            l.repartition(n_parts)
            .agg(dsum(expr).alias("s"))
            .first()
            .s
        )
        results.add(v)
    assert len(results) == 1, f"partitioning changed the sum: {results}"


def test_generators_reproducible_and_in_spec(spark):
    """gen.transactions: same seed -> identical batch; distributions
    within the reference's documented bounds (Transction.h:24-33)."""
    a = gen.transactions_local(batch_size=200, max_ops=30, keys_max=20_000, seed=5)
    b = gen.transactions_local(batch_size=200, max_ops=30, keys_max=20_000, seed=5)
    c = gen.transactions_local(batch_size=200, max_ops=30, keys_max=20_000, seed=6)
    assert a == b
    assert a != c
    ops_per_txn: dict[int, int] = {}
    for t, op, k, u in a:
        assert 1 <= k <= 20_000
        assert 0 <= op <= 29
        ops_per_txn[t] = ops_per_txn.get(t, 0) + 1
    assert max(ops_per_txn.values()) <= 30
    wr = sum(1 for r in a if r[3]) / len(a)
    assert 0.3 < wr < 0.5, f"write rate {wr} off the 0.4 spec"
    # Spark-side generator materializes the same rows
    df = gen.transactions(spark, batch_size=200, max_ops=30, keys_max=20_000, seed=5)
    assert sorted(map(tuple, df.collect())) == sorted(a)


def test_asof_join_deterministic_on_tied_timestamps(spark):
    """Multiple right rows sharing one (key, timestamp) must resolve to
    the same winner regardless of partition/arrival order: the greatest
    tiebreak tuple (default: the value columns)."""
    from gpu_database_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20)], "k long, t long"
    )
    right_rows = [(1, 10, "a"), (1, 10, "c"), (1, 10, "b"), (1, 15, "x")]
    results = set()
    for n_parts in (1, 2, 4):
        right = spark.createDataFrame(
            right_rows, "k long, rt long, v string"
        ).repartition(n_parts)
        out = asof_join(
            left, right, on="k", left_ts="t", right_ts="rt", value_cols=["v"]
        )
        results.add(tuple(sorted((r.t, r.v) for r in out.collect())))
    assert results == {((10, "c"), (20, "x"))}, results


def test_kv_generators_deterministic(spark):
    t1 = gen.kv_table(spark, 100, seed=9).collect()
    t2 = gen.kv_table(spark, 100, seed=9).collect()
    assert sorted(map(tuple, t1)) == sorted(map(tuple, t2))
    d1 = gen.kv_table_distributed(spark, 100, seed=9)
    d2 = gen.kv_table_distributed(spark, 100, seed=9)
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))
    assert d1.count() == 100
