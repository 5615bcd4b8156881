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


def _er_blocked(spark, sf_dir, clones: int):
    """part sample with `clones` extra exact-duplicate copies per row
    (key-shifted), blocked the way er_golden_record blocks."""
    base = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_brand")
        .limit(500)
    )
    amplified = base
    for i in range(1, clones + 1):
        amplified = amplified.unionAll(
            base.select(
                (F.col("p_partkey") + F.lit(10_000_000 * i)).alias(
                    "p_partkey"
                ),
                "p_name",
                "p_brand",
            )
        )
    return amplified.select(
        "p_partkey",
        "p_name",
        F.concat(
            F.split(F.col("p_name"), " ").getItem(1),
            F.lit("|"),
            F.col("p_brand"),
        ).alias("block_key"),
    )


def _naive_pairs(p):
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(
            F.col("a.p_partkey").alias("a"), F.col("b.p_partkey").alias("b")
        )
    )


def test_er_clone_collapse_components_match_naive(spark, sf_dir):
    """The collapsed edge set (clone stars + distinct-name rep pairs)
    must yield EXACTLY the components of the naive quadratic rule on
    a duplicate-heavy frame — the connectivity-preservation claim
    er_golden_record's scale story rests on. Min-label components are
    canonical (label = min reachable id), so equal connectivity means
    equal (id, component) rows."""
    from gpu_database_spark.llm.dedup import connected_components

    p = _er_blocked(spark, sf_dir, clones=3)
    nodes = p.select(F.col("p_partkey").alias("id"))
    got = connected_components(
        nodes, maintenance.er_collapsed_pairs(p, 8)
    )
    want = connected_components(nodes, _naive_pairs(p))
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_er_collapsed_pairs_linear_in_clones(spark, sf_dir):
    """Exact duplicates must grow the collapsed pair set linearly
    while the naive clique rule grows it quadratically — the sf1.0
    failure mode. With 3 extra clone copies every naive clique is
    >= 4x4 on the clone axis; the collapsed form adds |g|-1 star
    edges instead."""
    p1 = _er_blocked(spark, sf_dir, clones=0)
    p4 = _er_blocked(spark, sf_dir, clones=3)
    n = p1.count()
    collapsed1 = maintenance.er_collapsed_pairs(p1, 8).count()
    collapsed4 = maintenance.er_collapsed_pairs(p4, 8).count()
    naive1 = _naive_pairs(p1).count()
    naive4 = _naive_pairs(p4).count()
    # linear, EXACTLY: 4x-ing every (block, name) group of size g
    # adds 4g-1 - (g-1) = 3g star edges and zero rep cross-pairs
    # (clones introduce no new distinct names)
    assert collapsed4 == collapsed1 + 3 * n, (collapsed1, collapsed4, n)
    # quadratic: the naive clique pays C(4g,2) - C(g,2) >= 6g per
    # group (2x the star growth at g=1, worse for bigger groups) PLUS
    # a 16x blow-up on every cross-name pair
    assert naive4 - naive1 >= 2 * (collapsed4 - collapsed1) + 15 * naive1, (
        naive1,
        naive4,
        collapsed1,
        collapsed4,
    )
