"""Aggregation operators (SURVEY.md §2B "Aggregations").

Reference parity: the reference's only aggregate is the CAS min-Tid
register (``src/cuda/metadatahelper.cuh:36-90``) == groupBy().min(),
and slot counting (``src/cuda/hashTable.cuh:157-163``) == count().
Here the full surface: multi-aggregate groupBy, distinct counting
(exact + approximate), rollup/cube/grouping sets, filtered/conditional
aggregation, HAVING.

Scale notes: every groupBy below is a two-phase hash aggregate
(map-side partial -> shuffle on group key -> final); distinct counts
shuffle the distinct pairs; approx_count_distinct is the 100 TB path
(HLL sketch, constant memory, one pass, mergeable across partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import davg, davg_sql, dsum, dsum_sql
from gpu_database_spark.functions.materialize import materialize
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


@register(
    "agg_stats",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           {davg_sql('o_totalprice')} AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate groupBy: count, distinct count, min/max/avg.
    MIN/MAX on doubles are order-independent (no decimal detour needed)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            davg(F.col("o_totalprice")).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals (flag, flag+status, grand total)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust,
           {dsum_sql('c_acctbal')} AS total_bal,
           CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
           CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() disambiguation markers."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    return spark.sql(
        f"""
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust,
               {_dsum_sql_spark('c_acctbal')} AS total_bal,
               CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
               CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat
        FROM gs_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY g_seg, g_nat, c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST
        """
    )


def _dsum_sql_spark(expr: str) -> str:
    # Spark SQL spelling of the exact-decimal sum (same semantics as
    # functions.compat.dsum).
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


@register(
    "agg_distinct_exact",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS d_parts,
           COUNT(DISTINCT l_suppkey) AS d_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact distinct counts in one aggregate (expand + two
    shuffles under the hood — the exact-but-expensive path)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("d_parts"),
            F.countDistinct("l_suppkey").alias("d_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register("agg_approx_distinct")  # no oracle: sketch estimates are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB cardinality
    path — constant memory, single shuffle of mergeable sketches.
    Estimates are engine-specific so the driver records rows-only."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_mode",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_qty, n
    FROM (
        SELECT l_returnflag, l_quantity, COUNT(*) AS n,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY COUNT(*) DESC, l_quantity) AS rn
        FROM lineitem GROUP BY l_returnflag, l_quantity
    )
    WHERE rn = 1
    ORDER BY l_returnflag
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value, smallest on ties) —
    count-then-rank rather than the builtin mode(), whose tie choice is
    engine-specific."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(F.col("n").desc(), F.col("l_quantity"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"), "n")
        .orderBy("l_returnflag")
    )


@register(
    "scan_sample",
    oracle="""
    WITH b AS (
        SELECT l_returnflag, l_orderkey,
               CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                       CAST(l_linenumber AS VARCHAR)), 1, 15)
                    AS BIGINT) % 1000000 AS bkt
        FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*) AS n_sampled,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_checksum
    FROM b
    WHERE bkt < CASE l_returnflag WHEN 'A' THEN 20000
                                  WHEN 'N' THEN 10000
                                  ELSE 5000 END
    GROUP BY l_returnflag
    UNION ALL
    SELECT '__overall__', COUNT(*), CAST(SUM(l_orderkey) AS BIGINT)
    FROM b WHERE bkt < 10000
    ORDER BY l_returnflag
    """,
)
def scan_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic table sampling: a 1% overall sample plus
    per-returnflag stratified rates (A 2%, N 1%, R 0.5%), keyed on
    md5(l_orderkey:l_linenumber) — NOT ``df.sample``/``sampleBy``,
    whose Bernoulli draw depends on partition iteration order and so
    changes with file layout and cluster size. The hash-kept set is a
    pure function of the data: any engine, any partitioning, same
    rows — which is what lets DuckDB hash-verify the census (counts
    AND a key checksum over the kept rows). Same md5-bucket discipline
    as llm/sampling.py. At 100 TB sampling feeds statistics, data
    exploration, and splits without full scans of the output."""
    from gpu_database_spark.llm.sampling import hash_bucket

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    base = l.withColumn(
        "_bkt", hash_bucket(F.concat_ws(":", "l_orderkey", "l_linenumber"))
    )
    rate = (
        F.when(F.col("l_returnflag") == "A", 20_000)
        .when(F.col("l_returnflag") == "N", 10_000)
        .otherwise(5_000)
    )
    strat = (
        base.filter(F.col("_bkt") < rate)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("l_orderkey").cast("long").alias("key_checksum"),
        )
    )
    plain = (
        base.filter(F.col("_bkt") < 10_000)
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("l_orderkey").cast("long").alias("key_checksum"),
        )
        .select(F.lit("__overall__").alias("l_returnflag"), "n_sampled", "key_checksum")
    )
    return strat.unionByName(plain).orderBy("l_returnflag")


@register("agg_approx_percentile")  # no oracle: sketch estimates are engine-specific
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch): the 100 TB quantile path —
    one pass, bounded memory, mergeable partials — alongside the exact
    interpolated percentile in agg_numeric_stats. Engine-specific
    estimates, so the driver records rows-only."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
            F.percentile_approx("l_extendedprice", 0.99, 1000).alias("approx_p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_conditional",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           {dsum_sql("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END")} AS urgent_value,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS n_priority
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered / conditional aggregation (sum-when, count-when) —
    Catalyst short-circuits the predicates inside the partial agg."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
            dsum(
                F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).otherwise(0)
            ).alias("urgent_value"),
            F.count(
                F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            ).alias("n_priority"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT l_suppkey, COUNT(*) AS n_lines, {dsum_sql('l_extendedprice')} AS total
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 100
    ORDER BY l_suppkey
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING — post-aggregation filter."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice")).alias("total"),
        )
        .filter(F.col("n_lines") > 100)
        .orderBy("l_suppkey")
    )


@register(
    "agg_linear_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 6) AS covar_pq,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression aggregates (price ~ quantity per return flag):
    slope/intercept/R^2/correlation/covariance in ONE pass — each is a
    closed form over the same five running moments, which Spark
    accumulates map-side and merges associatively (no per-group row
    buffering, unlike a naive two-pass fit). Rounded to 6dp on both
    engines: the moments are float sums whose last-bit accumulation
    order differs, ~1e-12 relative — far below the rounding."""
    l = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.corr(y, x), 6).alias("corr_pq"),
            F.round(F.covar_samp(y, x), 6).alias("covar_pq"),
            F.regr_count(y, x).cast("long").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_distinct
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via roaring-style bitmaps: keys map to
    (bucket, bit position); per (group, bucket) a fixed 4KB bitmap ORs
    all bits (bitmap_construct_agg), then popcounts sum per group.
    Unlike COUNT(DISTINCT) — whose shuffle carries every distinct key —
    the shuffle here carries one bitmap per (group, bucket): bounded
    bytes per key-range regardless of row count, mergeable across
    partitions/days like the HLL sketches but exact. The oracle is the
    plain COUNT(DISTINCT) it must equal."""
    o = load_table(spark, sf_dir, "orders")
    per_bucket = (
        o.select(
            "o_orderstatus",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderstatus", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        per_bucket.groupBy("o_orderstatus")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct"))
        .orderBy("o_orderstatus")
    )


@register("agg_count_min_sketch")  # rows-only: sketch estimates are Spark-side
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter estimates vs exact counts.

    Builds a CMS over event_type (eps=0.1%, confidence 99%, fixed
    seed) and probes it for every type. The sketch is a few KB of
    mergeable counters regardless of row count — at 100 TB it is THE
    way to get approximate frequencies in one pass without shuffling
    the key stream; counter merge is commutative addition, so the
    estimate is deterministic for a given dataset + seed no matter the
    partitioning. The driver records rows-only (DuckDB has no CMS);
    tests/test_maintenance.py gates the CMS guarantee
    (exact <= estimate <= exact + eps * N).
    """
    e = load_table(spark, sf_dir, "events")
    # distributed build via the SQL aggregate (map-side partial sketches
    # merged by counter addition); only the final O(1/eps * ln(1/delta))
    # counter array (~KBs) reaches the driver — the designed collect
    sk_bytes = bytes(
        e.agg(
            F.expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").alias("sk")
        ).collect()[0]["sk"]
    )
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(sk_bytes)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    exact = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = [(r["event_type"],) for r in exact.select("event_type").collect()]
    est = spark.createDataFrame(
        [(t, int(cms.estimateCount(t))) for (t,) in sorted(probes)],
        ["event_type", "cms_estimate"],
    )
    return (
        exact.join(F.broadcast(est), "event_type")
        .select(
            "event_type",
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_n")).cast("long").alias("overcount"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_filtered_modern",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           bool_and(o_totalprice > 900) AS all_above_floor,
           bool_or(o_orderstatus = 'P') AS any_pending,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_key
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_filtered_modern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern conditional-aggregate surface: count_if (FILTER
    clause), bool_and/bool_or (every/any), and a deterministic
    any_value stand-in (MIN — any_value itself is
    partition-order-dependent, so the oracle-gated form pins it).
    One partial-aggregating pass; every aggregate is JVM-side."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.every(F.col("o_totalprice") > 900).alias("all_above_floor"),
            F.some(F.col("o_orderstatus") == "P").alias("any_pending"),
            F.min("o_orderkey").cast("long").alias("first_key"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS price_p25,
           quantile_cont(l_extendedprice, 0.5) AS price_p50,
           quantile_cont(l_extendedprice, 0.75) AS price_p75,
           quantile_cont(l_quantity, 0.9) AS qty_p90,
           median(l_quantity) AS qty_median
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped percentiles (continuous interpolation) WITHOUT
    per-group value buffering. Spark's builtin ``percentile()``
    collects every group value into the aggregation buffer — fine for
    many small groups, fatal here: the group key ``l_returnflag`` has
    THREE values, so at 100 TB each of 3 reducers would buffer ~2e9
    doubles. Instead: the distributed-selection plan
    (``stat_exact_quantiles_distributed``'s, grouped + interpolated).
    Pass 1 histograms (flag, metric, value-bucket) — map-side
    combined, only aggregated COUNTS ever shuffle — and prefix-sums
    the domain-bounded bucket table; each target position h=(n-1)p
    locates its straddling ranks' buckets there. Pass 2 re-scans ONLY
    the hit buckets (~1/50th of rows behind a broadcast semi-join),
    ranks within each, and interpolates
    ``(ceil(h)-h)*lo + (h-floor(h))*hi`` — the literal op order of
    Spark's Percentile (bit-compatible with DuckDB's quantile_cont on
    this data), so results stay bit-identical to the buffering
    builtin. No full-data shuffle anywhere; bucket widths are
    data-independent (TPC-H price/qty domains), so the plan shape is
    scale-invariant."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_quantity").cast("double").alias("qty"),
    )
    # Both metrics ride one narrow layout: (flag, metric, value).
    pairs = li.select(
        "l_returnflag",
        F.explode(
            F.array(
                F.struct(F.lit("price").alias("metric"), F.col("price").alias("value")),
                F.struct(F.lit("qty").alias("metric"), F.col("qty").alias("value")),
            )
        ).alias("mv"),
    ).select("l_returnflag", "mv.metric", "mv.value")
    # metric-specific monotone bucket: ~55 price buckets / 50 qty
    bucketed = pairs.withColumn(
        "bucket",
        F.when(F.col("metric") == "price", F.floor(F.col("value") / 2000.0))
        .otherwise(F.floor(F.col("value")))
        .cast("long"),
    )
    # Pass 1: per-(flag, metric, bucket) histogram — map-side combined,
    # only aggregated counts ever shuffle. Prefix-sum the TINY bucket
    # table (domain-bounded row count) for cumulative bases.
    # Materialized: hist feeds cum (twice, via located/wanted) and cnt
    # — without this single execution point the histogram scan re-runs
    # once per consumer. The table is domain-bounded tiny (~300 rows).
    hist = materialize(
        bucketed.groupBy("l_returnflag", "metric", "bucket").agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    wc = (
        Window.partitionBy("l_returnflag", "metric")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "l_returnflag",
        "metric",
        "bucket",
        "cnt",
        F.coalesce(F.sum("cnt").over(wc), F.lit(0)).alias("base"),
    )
    cnt = (
        hist.filter(F.col("metric") == "price")
        .groupBy("l_returnflag")
        .agg(F.sum("cnt").alias("n"))
    )
    spec = spark.createDataFrame(
        [
            ("price", "price_p25", 0.25),
            ("price", "price_p50", 0.5),
            ("price", "price_p75", 0.75),
            ("qty", "qty_p90", 0.9),
            ("qty", "qty_median", 0.5),
        ],
        "metric string, label string, p double",
    )
    # Spark Percentile.getPercentile: position = (n-1)*p,
    # result = (ceil-pos)*lower + (pos-floor)*higher, lower value
    # returned verbatim when the position is integral.
    h = (F.col("n") - 1).cast("double") * F.col("p")
    targets = (
        cnt.crossJoin(spec)
        .select(
            "l_returnflag",
            "metric",
            "label",
            (F.ceil(h).cast("double") - h).alias("w_lo"),
            (h - F.floor(h).cast("double")).alias("w_hi"),
            (F.floor(h) + 1).cast("long").alias("k_lo"),
            (F.ceil(h) + 1).cast("long").alias("k_hi"),
        )
        .select(
            "l_returnflag",
            "metric",
            "label",
            "w_lo",
            "w_hi",
            F.explode(
                F.array(
                    F.struct(F.lit("lo").alias("which"), F.col("k_lo").alias("k")),
                    F.struct(F.lit("hi").alias("which"), F.col("k_hi").alias("k")),
                )
            ).alias("t"),
        )
        .select("l_returnflag", "metric", "label", "w_lo", "w_hi", "t.which", "t.k")
    )
    # Each target rank k lives in the bucket with base < k <= base+cnt.
    located = (
        F.broadcast(targets)
        .join(
            cum.withColumnsRenamed({"l_returnflag": "flag", "metric": "m"}),
            (F.col("l_returnflag") == F.col("flag"))
            & (F.col("metric") == F.col("m"))
            & (F.col("base") < F.col("k"))
            & (F.col("k") <= F.col("base") + F.col("cnt")),
        )
        .select("l_returnflag", "metric", "label", "w_lo", "w_hi", "which", "k", "bucket", "base")
    )
    # Pass 2: re-scan ONLY the hit buckets (a ~1/50th slice); rank
    # within each — bounded per-task sort — and pick global rank k.
    wanted = located.select("l_returnflag", "metric", "bucket").distinct()
    wb = Window.partitionBy("l_returnflag", "metric", "bucket").orderBy("value")
    in_bucket = bucketed.join(
        F.broadcast(wanted), ["l_returnflag", "metric", "bucket"]
    ).withColumn("rn", F.row_number().over(wb))
    hit = in_bucket.join(
        F.broadcast(
            located.withColumnsRenamed(
                {"l_returnflag": "flag", "metric": "m", "bucket": "bk"}
            )
        ),
        (F.col("l_returnflag") == F.col("flag"))
        & (F.col("metric") == F.col("m"))
        & (F.col("bucket") == F.col("bk"))
        & (F.col("base") + F.col("rn") == F.col("k")),
    )
    vals = (
        hit.groupBy("flag", "label", "w_lo", "w_hi")
        .agg(
            F.max(F.when(F.col("which") == "lo", F.col("value"))).alias("lo"),
            F.max(F.when(F.col("which") == "hi", F.col("value"))).alias("hi"),
        )
        .select(
            "flag",
            "label",
            F.when(F.col("hi").isNull() | (F.col("w_hi") == 0), F.col("lo"))
            .otherwise(F.col("w_lo") * F.col("lo") + F.col("w_hi") * F.col("hi"))
            .alias("v"),
        )
    )

    def pick(label: str):
        return F.max(F.when(F.col("label") == label, F.col("v"))).alias(label)

    return (
        vals.groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            pick("price_p25"),
            pick("price_p50"),
            pick("price_p75"),
            pick("qty_p90"),
            pick("qty_median"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH by_price AS (
        SELECT l_returnflag AS flag, l_extendedprice AS price,
               SUM(CAST(l_quantity AS BIGINT)) AS wt
        FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
        SELECT flag, price, wt,
               SUM(wt) OVER (PARTITION BY flag ORDER BY price
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cw,
               SUM(wt) OVER (PARTITION BY flag) AS total_w
        FROM by_price
    )
    SELECT flag, MIN(price) AS weighted_median,
           CAST(MAX(total_w) AS BIGINT) AS total_weight
    FROM cum WHERE 2 * cw >= total_w
    GROUP BY flag ORDER BY flag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the smallest
    price whose cumulative weight reaches half the total — the
    weighted order statistic behind fair-price and data-mix audits,
    which percentile() cannot express (it weights rows equally).

    Scale shape: the stream collapses to (flag, price) weight cells;
    the cumulative weight then uses the repo's two-level bucket
    decomposition WITHIN each flag — running sums per (flag,
    floor(price/1000)) slice plus an exclusive prefix over the tiny
    per-flag bucket-totals table — never a per-flag single-task sort
    of all distinct prices. Selection (2*cum >= total) is integer
    arithmetic; the oracle states the plain windowed form."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    by_price = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("wt"))
    # the collapsed (flag, price, weight) table feeds the local
    # prefix, the bucket totals, the offsets and the per-flag totals;
    # materialize it once (domain-bounded: distinct prices per flag)
    b = by_price.withColumn(
        "_bkt", F.floor(F.col("price") / 1000).cast("long")
    ).transform(materialize)
    wl = Window.partitionBy("flag", "_bkt").orderBy("price").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = b.withColumn("_lc", F.sum("wt").over(wl))
    bt = b.groupBy("flag", "_bkt").agg(F.sum("wt").alias("_bw"))
    wo = Window.partitionBy("flag").orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = bt.select(
        "flag",
        "_bkt",
        F.coalesce(F.sum("_bw").over(wo), F.lit(0)).alias("_off"),
    )
    totals = bt.groupBy("flag").agg(F.sum("_bw").alias("total_w"))
    cum = (
        local.join(F.broadcast(off), ["flag", "_bkt"])
        .join(F.broadcast(totals), "flag")
        .select(
            "flag",
            "price",
            (F.col("_off") + F.col("_lc")).alias("cw"),
            "total_w",
        )
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("total_w"))
        .groupBy("flag")
        .agg(
            F.min("price").alias("weighted_median"),
            F.max("total_w").cast("long").alias("total_weight"),
        )
        .orderBy("flag")
    )


@register(
    "agg_histogram_2d",
    oracle="""
    WITH b AS (
        SELECT LEAST(CAST(FLOOR(l_extendedprice / 10000) AS BIGINT), 9)
                   AS price_bin,
               LEAST(CAST(FLOOR(l_quantity / 10) AS BIGINT), 4) AS qty_bin,
               l_discount
        FROM lineitem
    )
    SELECT price_bin, qty_bin, COUNT(*) AS n,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_discount,
           round(CAST(COUNT(*) AS DOUBLE)
                 / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS density
    FROM b GROUP BY price_bin, qty_bin
    ORDER BY price_bin, qty_bin
    """,
)
def agg_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (price x quantity heat grid) with a per-cell
    mean of a third measure and the cell density — the joint-
    distribution profile behind every heat map and the binning
    pre-pass of a mutual-information or copula estimate. Both bin ids
    are row-local clamped expressions, so the whole grid is ONE
    map-side-combinable groupBy to <= 50 cells; the density window
    runs over that tiny grid only. Discount means use the exact
    DECIMAL(27,6) sum discipline."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.least(
            F.floor(F.col("l_extendedprice") / 10000).cast("long"), F.lit(9)
        ).alias("price_bin"),
        F.least(
            F.floor(F.col("l_quantity") / 10).cast("long"), F.lit(4)
        ).alias("qty_bin"),
        "l_discount",
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        b.groupBy("price_bin", "qty_bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_discount").cast("decimal(27,6)"))
            .cast("double")
            .alias("dsum"),
        )
        .select(
            "price_bin",
            "qty_bin",
            "n",
            F.round(F.col("dsum") / F.col("n").cast("double"), 6).alias(
                "avg_discount"
            ),
            F.round(
                F.col("n").cast("double")
                / F.sum("n").over(w_all).cast("double"),
                6,
            ).alias("density"),
        )
        .orderBy("price_bin", "qty_bin")
    )


@register(
    "agg_bitwise",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(user_id % 256 AS BIGINT) AS mask
        FROM events
    )
    SELECT event_type,
           CAST(bit_or(mask) AS BIGINT) AS union_mask,
           CAST(bit_and(mask) AS BIGINT) AS common_mask,
           CAST(bit_xor(mask) AS BIGINT) AS parity_mask,
           COUNT(*) AS n
    FROM m GROUP BY event_type ORDER BY event_type
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates — BIT_OR / BIT_AND / BIT_XOR over a per-row
    bitmask: the flag-merge primitive (union of capability masks,
    intersection of common flags, xor parity for change detection)
    that replaces a 64-row explode + boolean roll-up with one
    associative, map-side-combinable aggregation — O(1) state per
    task, exactly the shape of the reference's metadata-word OR-merge
    (src/cuda/metadatahelper.cuh bit pack/unpack, here at column
    granularity)."""
    m = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 256).cast("long").alias("mask")
    )
    return (
        m.groupBy("event_type")
        .agg(
            F.bit_or("mask").cast("long").alias("union_mask"),
            F.bit_and("mask").cast("long").alias("common_mask"),
            F.bit_xor("mask").cast("long").alias("parity_mask"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_mean_families",
    oracle="""
    WITH t AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem
    )
    SELECT flag,
           COUNT(*) AS n,
           CAST((2 * CAST(SUM(q) AS HUGEINT) * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS DOUBLE) / 1000000.0 AS mean_arith,
           round(exp(CAST(SUM(CAST(round(ln(q), 8) AS DECIMAL(38,10)))
                          AS DOUBLE) / COUNT(*)), 6) AS mean_geom,
           round(COUNT(*) / CAST(SUM(CAST(round(1.0 / q, 8)
                                          AS DECIMAL(38,10))) AS DOUBLE),
                 6) AS mean_harm,
           round(sqrt(CAST(SUM(q * q) AS DOUBLE) / COUNT(*)), 6)
               AS mean_quad
    FROM t GROUP BY flag ORDER BY flag
    """,
)
def agg_mean_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pythagorean mean family per group — arithmetic, geometric
    (exp of mean log), harmonic (n over sum of reciprocals) and
    quadratic (root mean square) of quantity by return flag: the
    standard aggregate set for rate-like and multiplicative metrics
    where the arithmetic mean is the wrong average.

    Scale shape: ONE map-side-combinable groupBy; all four means come
    from per-row terms folded in the same pass. Quantities are
    integer-valued, so n / sum(q) / sum(q^2) are EXACT BIGINTs; the
    transcendental terms (ln q, 1/q) have <= 50 distinct inputs, are
    rounded at 8dp (cross-engine libm drift cannot straddle a
    boundary) and summed exactly in DECIMAL(38,10).

    Reference tie-in: generalizes the reference's single-statistic
    count aggregate (hashTable.cuh:157-163) to the mean family."""
    # spread=True: ln/reciprocal + DECIMAL(38,10) folding is CPU-bound
    # and otherwise single-threaded in the one-row-group scan (A/B:
    # 2.15s -> 0.96s, oracle hash unchanged).
    # columns=: the spread exchange carries 2 columns, not 16 (r14).
    t = load_table(
        spark,
        sf_dir,
        "lineitem",
        spread=True,
        columns=["l_returnflag", "l_quantity"],
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    d38 = "decimal(38,10)"
    return (
        t.groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # integer (2u+c) div (2c) rounding: integer-sum/count
            # quotients land exactly on 6dp half-boundaries where the
            # engines' round() semantics disagree
            (
                F.expr(
                    "(2 * CAST(SUM(q) AS DECIMAL(38,0)) * 1000000"
                    " + COUNT(*)) div (2 * COUNT(*))"
                ).cast("double")
                / 1000000.0
            ).alias("mean_arith"),
            F.round(
                F.exp(
                    F.sum(F.round(F.log(F.col("q")), 8).cast(d38))
                    .cast("double") / F.count(F.lit(1))
                ), 6,
            ).alias("mean_geom"),
            F.round(
                F.count(F.lit(1))
                / F.sum(F.round(1.0 / F.col("q"), 8).cast(d38))
                .cast("double"), 6,
            ).alias("mean_harm"),
            F.round(
                F.sqrt(
                    F.sum(F.col("q") * F.col("q")).cast("double")
                    / F.count(F.lit(1))
                ), 6,
            ).alias("mean_quad"),
        )
        .orderBy("flag")
    )


# approx_percentile accuracy knob: rank error is bounded by
# n / APPROX_Q_ACCURACY (Greenwald-Khanna guarantee).
APPROX_Q_ACCURACY = 10_000
APPROX_QS = (0.5, 0.9, 0.99)


@register("agg_approx_quantile_audit")  # rows-only: sketch is engine-local
def agg_approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-vs-exact quantile audit: Spark's approx_percentile
    (Greenwald-Khanna sketch, the 100 TB path) scored against the
    EXACT order statistics from the bucketed rank plan — per quantile:
    both values, the absolute error, and whether the sketch respected
    its rank-error guarantee (exact values at ranks ±n/accuracy must
    bracket the estimate). The audit a pipeline runs once per metric
    before trusting the sketch in production rollups.

    Scale shape: the sketch is one map-side-combinable aggregate; the
    exact side is the histogram-bucket rank plan (no global sort);
    the bracket check joins three O(1) rank lookups. Rows-only: the
    sketch's exact output is engine-specific (DuckDB's approximate
    quantile is a different t-digest); the GUARANTEE, not the value,
    is the contract — asserted here and in tests/test_round8_ops.py."""
    from gpu_database_spark.functions.ranks import bucketed_row_number

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    n_df = li.agg(F.count(F.lit(1)).alias("n"))
    approx = li.agg(
        F.percentile_approx(
            "v", list(APPROX_QS), APPROX_Q_ACCURACY
        ).alias("apx")
    )
    r = bucketed_row_number(
        li, "v", ["l_orderkey", "l_linenumber"],
        F.floor(F.col("v") / 2000.0), rank_col="rn",
    ).join(F.broadcast(n_df), how="cross")
    picks = []
    for i, q in enumerate(APPROX_QS):
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        tol = (F.col("n") / APPROX_Q_ACCURACY).cast("long") + 1
        picks.append(
            F.max(F.when(F.col("rn") == rank, F.col("v"))).alias(f"x{i}")
        )
        picks.append(
            F.max(
                F.when(F.col("rn") == F.greatest(rank - tol, F.lit(1)),
                       F.col("v"))
            ).alias(f"lo{i}")
        )
        picks.append(
            F.max(
                F.when(F.col("rn") == F.least(rank + tol, F.col("n")),
                       F.col("v"))
            ).alias(f"hi{i}")
        )
    exact = r.groupBy().agg(*picks)
    wide = exact.crossJoin(F.broadcast(approx)).crossJoin(F.broadcast(n_df))
    rows = []
    for i, q in enumerate(APPROX_QS):
        a = F.element_at(F.col("apx"), i + 1)
        rows.append(
            F.struct(
                F.lit(q).alias("q"),
                F.col(f"x{i}").alias("exact"),
                a.alias("approx"),
                F.round(F.abs(a - F.col(f"x{i}")), 6).alias("abs_err"),
                ((a >= F.col(f"lo{i}")) & (a <= F.col(f"hi{i}")))
                    .alias("within_guarantee"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"), "n")
        .select(
            "s.q", "s.exact", "s.approx", "s.abs_err",
            "s.within_guarantee", F.col("n").cast("long").alias("n"),
        )
        .orderBy("q")
    )
