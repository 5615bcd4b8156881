"""Scale-property tests for the layout/maintenance operators.

Correctness is covered by the auto-generated oracle parity sweep
(tests/test_oracle_parity.py); these tests pin the *scale* claims:
z-order beats a linear sort on zone-map tightness, the distributed
quantile plan never range-partitions the raw column, and the IVM
fold is mergeable across batches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_database_spark.operators import maintenance
from gpu_database_spark.sources.catalog import load_table


def test_zorder_zone_maps_tighter_than_linear_sort(spark, sf_dir):
    """Files cut from the Morton order must have tighter 2-D zone maps
    than files cut from a single-column sort: with x-sorted files the
    y dimension is unclustered (full-width ranges), so any y-predicate
    scan skips nothing. Compare total bounding-box area."""
    o = load_table(spark, sf_dir, "orders")
    dims = o.select(
        F.col("o_custkey").bitwiseAND(F.lit(255)).alias("x"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01"))
        .bitwiseAND(F.lit(255))
        .alias("y"),
    )
    n_files = 16

    def total_area(df_with_file):
        return (
            df_with_file.groupBy("file_id")
            .agg(
                ((F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)).alias(
                    "area"
                )
            )
            .agg(F.sum("area"))
            .collect()[0][0]
        )

    z = dims.withColumn(
        "zval", maintenance._zvalue(F.col("x"), F.col("y"))
    ).withColumn("file_id", F.expr("zval div 4096"))
    zorder_area = total_area(z)

    # linear layout: sort by x alone, cut into equal-count files
    from pyspark.sql.window import Window

    n = dims.count()
    linear = dims.withColumn(
        "rn", F.row_number().over(Window.orderBy("x", "y"))
    ).withColumn("file_id", ((F.col("rn") - 1) * n_files / n).cast("long"))
    linear_area = total_area(linear)

    assert zorder_area < linear_area, (zorder_area, linear_area)


def test_distributed_quantiles_no_raw_column_range_partition(spark, sf_dir):
    """The selection plan must not global-sort the measure column: no
    rangepartitioning exchange keyed on the raw value (only the final
    4-row ORDER BY q is allowed to)."""
    df = maintenance.stat_exact_quantiles_distributed(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(v" not in plan, plan[:2000]


def test_ivm_fold_is_mergeable_across_batches(spark, sf_dir):
    """IVM contract: folding two changelog halves independently and
    merging (sum of partials) equals the one-shot fold — the property
    that lets the maintained view absorb micro-batches forever."""
    e = load_table(spark, sf_dir, "events")
    op = F.when(F.col("event_id") % 7 == 0, F.lit(-1)).otherwise(F.lit(1))
    log = e.select("user_id", op.alias("op"), "value")

    def fold(df):
        return df.groupBy("user_id").agg(
            F.sum("op").alias("net_rows"),
            F.sum(F.col("op") * F.col("value")).alias("net_value"),
        )

    half_a = fold(log.filter(F.col("value") < 50))
    half_b = fold(log.filter(~(F.col("value") < 50)))
    merged = (
        half_a.unionByName(half_b)
        .groupBy("user_id")
        .agg(
            F.sum("net_rows").alias("net_rows"),
            F.round(F.sum("net_value"), 6).alias("net_value"),
        )
    )
    oneshot = fold(log).select(
        "user_id", "net_rows", F.round("net_value", 6).alias("net_value")
    )
    assert merged.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(merged).count() == 0


def test_count_min_sketch_bound(spark, sf_dir):
    """CMS guarantee: exact <= estimate <= exact + eps*N (w.p. 1-delta;
    with a fixed seed this is deterministic for the fixture)."""
    from gpu_database_spark.operators.aggregates import agg_count_min_sketch

    rows = agg_count_min_sketch(spark, sf_dir).collect()
    n_total = sum(r["exact_n"] for r in rows)
    for r in rows:
        assert r["cms_estimate"] >= r["exact_n"], r
        assert r["cms_estimate"] <= r["exact_n"] + 0.001 * n_total + 1, r


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime row-group pruning: with a selective filter on the build
    side of a shuffle join, Spark should inject a bloom-filter
    semi-join onto the probe side (might_contain in the plan) — the
    optimization that turns a full fact scan into a pre-filtered one
    at 100 TB. Thresholds are tuned down because the fixture is tiny."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from gpu_database_spark.sources.catalog import load_table

        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter("o_orderpriority = '1-URGENT'")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan or "bloom_filter" in plan, plan[:3000]
        j.collect()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
