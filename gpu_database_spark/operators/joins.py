"""Join operators (SURVEY.md §2B "Joins").

The reference has no join operator; its multiget is a left join of an
op-batch against the store (``src/database/ycsb/TrancM_func.cuh:21-63``)
and its dependency check is an inner join of op-sets against per-key
reservations (``TrancM_func.cuh:125-164``). Here the full relational
join surface: inner/left/full/semi/anti/cross, broadcast vs shuffle,
non-equi (range) joins, and a salted-skew pattern.

Scale notes (100 TB): dimension tables (region/nation/part/supplier)
broadcast — zero shuffle on the fact side; fact-fact joins
(lineitem x orders) shuffle on the join key and AQE handles skew;
the salted pattern shows the manual fallback when one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum, dsum_sql
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join -> agg -> global top-k.

    customer is small -> broadcast into orders; orders x lineitem is
    the one shuffle (co-partitioned on orderkey). Top-k via
    orderBy+limit is a TakeOrderedAndProject — no full sort at scale.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle=f"""
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE', 'AMERICA')
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table star join.

    All dimensions broadcast; the single big shuffle is
    lineitem x orders on orderkey. Catalyst folds the
    region->nation->supplier chain into the broadcast side.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE", "AMERICA")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p_brand, s_name,
           COUNT(*) AS n_lines,
           {dsum_sql('l_quantity')} AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_type = 'PROMO'
    GROUP BY p_brand, s_name
    ORDER BY p_brand, s_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension broadcast joins: zero shuffle on the fact side
    until the final aggregation; filter on p_type prunes the broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_quantity")).alias("total_qty"),
        )
        .orderBy("p_brand", "s_name")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE), 0.0) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders (COUNT(col)
    skips the null-extended rows, matching SQL semantics)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.col("o_orderkey")).alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.k, sn.k) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (nations having only customers
    or only suppliers survive with zero-filled counts)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "k", "full_outer")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one large order
    (ref analogue: membership probe, src/cuda/hashTable.cuh:94-110)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders (ref analogue: the
    abort-set complement / retry compaction, TransctionManager.cuh:177-183)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT p_partkey, p_name, COUNT(l_orderkey) AS n_lines
    FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
    WHERE p_partkey <= 100
    GROUP BY p_partkey, p_name
    ORDER BY p_partkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving parts with no lineitem references
    (planner-wise a mirrored left join; COUNT(col) skips nulls)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return (
        l.join(p, l.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey", "p_name")
        .agg(F.count("l_orderkey").alias("n_lines"))
        .orderBy("p_partkey")
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, o_orderpriority, COUNT(*) AS combos
    FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    GROUP BY r_name, o_orderpriority
    ORDER BY r_name, o_orderpriority
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny sets (scale rule: cross joins only ever
    between broadcast-sized inputs; never fact x fact)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    p = load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return (
        r.crossJoin(p)
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("combos"))
        .orderBy("r_name", "o_orderpriority")
    )


@register(
    "join_range",
    oracle=f"""
    WITH bands AS (
        SELECT i AS band_id, i * 20000.0 AS lo, (i + 1) * 20000.0 AS hi
        FROM range(0, 6) t(i)
    )
    SELECT band_id, lo, hi, COUNT(*) AS n_parts,
           {dsum_sql('p_retailprice')} AS band_value
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band_id, lo, hi
    ORDER BY band_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: histogram banding by price.

    The band table is tiny -> broadcast nested-loop join, which is the
    right physical plan; at scale the alternative is precomputing the
    band id with arithmetic (O(1) per row), shown by Catalyst folding
    this to BroadcastNestedLoopJoin.
    """
    part = load_table(spark, sf_dir, "part")
    bands = spark.range(0, 6).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 20000.0).alias("lo"),
        ((F.col("id") + 1) * 20000.0).alias("hi"),
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum(F.col("p_retailprice")).alias("band_value"),
        )
        .orderBy("band_id")
    )


@register(
    "join_skew_replicated",
    oracle=f"""
    WITH flag_info AS (
        SELECT 'A' AS flag, 'accepted' AS label UNION ALL
        SELECT 'N', 'new' UNION ALL
        SELECT 'R', 'returned'
    )
    SELECT label, COUNT(*) AS n_lines, {dsum_sql('l_quantity')} AS total_qty
    FROM lineitem JOIN flag_info ON l_returnflag = flag
    GROUP BY label ORDER BY label
    """,
)
def join_skew_replicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted SKEW JOIN: the fact side's join key has only 3 values
    (maximal skew — a plain shuffle join would put ~1/3 of 100 TB on
    each of 3 reducers). Fix: salt the fact side into 16 sub-keys and
    replicate the small side x16, so each hot key spreads over 16
    reducers; results are identical to the plain join (the oracle).
    With a genuinely small dim the broadcast join is better still —
    this pattern is for when BOTH sides are too big to broadcast but
    one key dominates."""
    l = load_table(spark, sf_dir, "lineitem")
    info = spark.createDataFrame(
        [("A", "accepted"), ("N", "new"), ("R", "returned")], ["flag", "label"]
    )
    n_salt = 16
    salted_l = l.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt))
    )
    replicated = info.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return (
        salted_l.join(
            replicated,
            (salted_l.l_returnflag == replicated.flag)
            & (salted_l._salt == replicated._salt),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_quantity")).alias("total_qty"),
        )
        .orderBy("label")
    )


@register(
    "join_skew_salted",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_rows, {dsum_sql('l_extendedprice')} AS total
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation over a low-cardinality (skew-prone)
    key: stage 1 aggregates on (key, salt) spreading each hot key over
    16 reducers; stage 2 folds the partials. Result is identical to a
    plain groupBy (the oracle), which is the point — salting is a
    physical rewrite, not a semantic one. Decimal partials re-sum
    exactly, so the two-stage plan stays hash-identical.

    Ref analogue: the reference spreads one epoch's CAS traffic over
    per-key atomic words (metadatahelper.cuh:36-90); salting is the
    shuffle-world equivalent for hot keys.
    """
    l = load_table(spark, sf_dir, "lineitem")
    salted = l.withColumn("_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).alias("_t"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("_n").alias("n_rows"),
            F.sum("_t").cast("double").alias("total"),
        )
        .orderBy("l_returnflag")
    )


BLOOM_BITS = 1 << 20  # prefilter domain: ~1M hash buckets


@register(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit bloom-style hash prefilter: urgent
    orders' keys are collapsed to a DISTINCT set of hash buckets
    (pmod(xxhash64(key), 2^20)) that broadcasts to every scan task;
    lineitem rows whose key-hash misses the set are dropped AT THE
    SCAN, before any shuffle or exact join. Survivors (true matches +
    ~0.3% hash false-positives at fixture selectivity) then pass the
    exact broadcast semi-join. This is the manual form of the runtime
    bloom filter Spark's InjectRuntimeFilter derives for selective
    fact-dim joins — spelled out as an operator so the plan is
    inspectable and the pattern portable to sinks Spark can't infer
    through. The oracle is the plain semi-join semantics the filter
    must preserve (a bloom prefilter has no false negatives).

    Scale shape: the bucket set is bounded by min(n_keys, 2^20) ints
    regardless of fact size; both joins broadcast, so the fact table
    is never shuffled — the aggregation's partial combine is the only
    exchange."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    bits = urgent.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(BLOOM_BITS)).alias("bit")
    ).distinct()
    cand = l.withColumn(
        "bit", F.pmod(F.xxhash64("l_orderkey"), F.lit(BLOOM_BITS))
    ).join(F.broadcast(bits), "bit", "left_semi")
    return (
        cand.join(
            F.broadcast(urgent), cand.l_orderkey == urgent.o_orderkey, "left_semi"
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "join_left_mark",
    oracle="""
    SELECT c.c_custkey,
           EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '1-URGENT') AS has_urgent
    FROM customer c
    ORDER BY c.c_custkey
    """,
)
def join_left_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left mark join: every left row survives, annotated with a
    boolean "a match exists" flag — the shape planners lower
    EXISTS-in-SELECT to (a semi join keeps matches, an anti join
    keeps non-matches, a mark join keeps BOTH with the flag).

    Spark has no mark-join keyword; the equivalent single-pass plan
    is a left join against the DISTINCT matching keys with a
    null-check flag — one shuffle (or broadcast when the key set
    fits), no row duplication because the build side is distinct."""
    c = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    return (
        c.join(urgent, "c_custkey", "left")
        .select(
            "c_custkey", F.col("_m").isNotNull().alias("has_urgent")
        )
        .orderBy("c_custkey")
    )


@register(
    "join_interval_binned",
    oracle="""
    WITH win AS (
        SELECT event_id AS win_id, epoch_ns(ts) AS w_start,
               epoch_ns(ts) + 3600000000000 AS w_end
        FROM events WHERE event_type = 'error'
    ),
    hits AS (
        SELECT w.win_id, COUNT(*) AS n_in_window
        FROM win w JOIN events e
          ON epoch_ns(e.ts) >= w.w_start AND epoch_ns(e.ts) < w.w_end
        GROUP BY w.win_id
    )
    SELECT n_in_window, COUNT(*) AS n_windows
    FROM hits GROUP BY 1 ORDER BY 1
    """,
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIG-BIG interval COUNT via bin + per-bin sweep: every error
    event opens a 1-hour window; count how many events (of any type)
    fall inside each window, reported as a census of window sizes.
    Both join sides are the full event stream — the case
    join_interval_overlap's broadcast plan cannot handle.

    Plan (upgraded r11 — the sf10 smoke caught the original bin +
    pair-join going density-QUADRATIC: the (window x contained-event)
    intermediate is windows/bin * events/bin, so 10x denser streams
    cost 100x; SCALE_sf10.json ratio 33). Because the output is a
    COUNT, the pair list never needs to exist: with bin width = window
    length a window [s, s+1h) splits into [s, bin_end) and
    [bin_end, e), so

        n(win) = |bin b| - #{t in b: t < s} + #{t in b+1: t < e}

    and both #-terms are order-statistic probes. Each window emits two
    weight-0 probe rows; events collapse to weight-n distinct (bin, t)
    rows; ONE window function per bin partition (running sum of event
    weights, probes sorted before events at equal t for strict <)
    answers every probe in a single per-bin merge sweep. Cost is
    O(rows log bin-size) with one hash shuffle on the bin key — linear
    in density where the pair join was quadratic. The oracle states
    the same count as a plain range join; every window contains at
    least its own opening event, so the inner-join census matches."""
    e = load_table(spark, sf_dir, "events")
    hour_ns = 3_600_000_000_000
    ev = (
        e.select(
            F.col("ts_ns").alias("t"),
            F.expr(f"ts_ns div {hour_ns}").alias("bin"),
        )
        .groupBy("bin", "t")
        .agg(F.count(F.lit(1)).alias("w8"))
    )
    bin_totals = ev.groupBy("bin").agg(F.sum("w8").alias("bin_n"))
    win = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("win_id"),
        F.col("ts_ns").alias("w_start"),
        (F.col("ts_ns") + hour_ns).alias("w_end"),
    )
    # probe rows: (bin of start, t=start, side=-1) counts events BEFORE
    # the window in its first bin; (bin of end, t=end, side=+1) counts
    # events before w_end in the spill bin. kind=0 sorts probes ahead
    # of same-t events, making the running sum a strict t < probe.
    probes = win.select(
        "win_id",
        F.explode(
            F.array(
                F.struct(
                    F.expr(f"w_start div {hour_ns}").alias("bin"),
                    F.col("w_start").alias("t"),
                    F.lit(-1).alias("side"),
                ),
                F.struct(
                    F.expr(f"w_start div {hour_ns} + 1").alias("bin"),
                    F.col("w_end").alias("t"),
                    F.lit(1).alias("side"),
                ),
            )
        ).alias("p"),
    ).select("win_id", "p.bin", "p.t", "p.side")
    merged = probes.select(
        "bin", "t", F.lit(0).alias("kind"), F.lit(0).cast("long").alias("w8"),
        "win_id", "side",
    ).unionByName(
        ev.select(
            "bin", "t", F.lit(1).alias("kind"), "w8",
            F.lit(None).cast("long").alias("win_id"),
            F.lit(0).alias("side"),
        )
    )
    sweep = Window.partitionBy("bin").orderBy("t", "kind").rowsBetween(
        Window.unboundedPreceding, 0
    )
    answered = (
        merged.withColumn("n_before", F.sum("w8").over(sweep))
        .filter(F.col("kind") == 0)
        .join(F.broadcast(bin_totals), "bin", "left")
        .select(
            "win_id",
            F.when(
                F.col("side") == -1,
                F.coalesce(F.col("bin_n"), F.lit(0)) - F.col("n_before"),
            ).otherwise(F.col("n_before")).alias("part"),
        )
    )
    hits = answered.groupBy("win_id").agg(
        F.sum("part").cast("long").alias("n_in_window")
    )
    return (
        hits.groupBy("n_in_window")
        .agg(F.count(F.lit(1)).alias("n_windows"))
        .orderBy("n_in_window")
    )


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE o_custkey END AS k
        FROM orders WHERE o_orderkey <= 2000
    ),
    r AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN NULL
                    ELSE c_custkey END AS k,
               c_mktsegment
        FROM customer
    )
    SELECT (l.k IS NULL) AS null_key, COUNT(*) AS n_matches,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY 1 ORDER BY 1
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the
    semantics CDC pipelines need when a nullable business key is the
    join key. A third of the order keys and a fifth of the customer
    keys are nulled to make both behaviors observable; the census
    splits matches by whether they joined through NULL.

    Scale shape: Spark plans eqNullSafe as an ordinary hash
    join (null hashes to a regular bucket) — same single shuffle as
    an equi-join. CAUTION, documented as the operational guard: the
    NULL bucket is a self-amplifying hot key (every null left row
    matches every null right row); production pipelines either filter
    nulls into a separate union leg or accept the bounded fixture
    fan-out, which is what this query's census measures."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    left = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("k"),
    )
    c = load_table(spark, sf_dir, "customer")
    right = c.select(
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("k"),
        "c_mktsegment",
    )
    joined = left.join(right, left.k.eqNullSafe(right.k))
    return (
        joined.groupBy(left.k.isNull().alias("null_key"))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("null_key")
    )


SPATIAL_CELL = 500  # grid cell edge; box half-widths are < one cell below


@register(
    "join_spatial_grid",
    oracle="""
    WITH points AS (
        SELECT c_custkey,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'),
                                   1, 8) AS BIGINT) % 10000 AS px,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'),
                                   1, 8) AS BIGINT) % 10000 AS py
        FROM customer
    ),
    boxes AS (
        SELECT s_suppkey,
               CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':x'),
                                   1, 8) AS BIGINT) % 10000 AS cx,
               CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':y'),
                                   1, 8) AS BIGINT) % 10000 AS cy,
               50 + CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)
                                            || ':w'), 1, 8) AS BIGINT) % 200
                 AS w
        FROM supplier
    )
    SELECT b.s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_points
    FROM boxes b JOIN points p
      ON ABS(p.px - b.cx) <= b.w AND ABS(p.py - b.cy) <= b.w
    GROUP BY b.s_suppkey
    ORDER BY n_points DESC, s_suppkey
    LIMIT 20
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D spatial containment join (points in boxes) via GRID-CELL
    binning — the planar analogue of join_interval_binned, and the
    shape every geo join (points-in-polygons, radius search) reduces
    to at scale. Both sides are synthesized from md5 so the oracle
    reproduces them; both sides grow with SF, so a broadcast
    range-join is not available and the naive theta join (which the
    DuckDB oracle brute-forces at fixture scale) is quadratic. The
    rewrite: cell edge >= the max box half-width x2, so a box overlaps
    at most 2x2 cells — explode boxes to their covered cells
    (array_distinct keeps it <= 4), EQUI-join points on the cell, then
    filter exact containment. One hash shuffle on the cell key;
    fan-out bounded by boxes-per-cell."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")

    def h32(key, salt: str):
        return F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("long")

    points = c.select(
        "c_custkey",
        (h32(F.col("c_custkey"), ":x") % 10000).alias("px"),
        (h32(F.col("c_custkey"), ":y") % 10000).alias("py"),
    ).withColumn(
        "cell",
        F.struct(
            F.expr(f"px div {SPATIAL_CELL}").alias("gx"),
            F.expr(f"py div {SPATIAL_CELL}").alias("gy"),
        ),
    )
    boxes = s.select(
        "s_suppkey",
        (h32(F.col("s_suppkey"), ":x") % 10000).alias("cx"),
        (h32(F.col("s_suppkey"), ":y") % 10000).alias("cy"),
        (50 + h32(F.col("s_suppkey"), ":w") % 200).alias("w"),
    )
    box_cells = boxes.select(
        "s_suppkey",
        "cx",
        "cy",
        "w",
        F.explode(
            F.array_distinct(
                F.array(
                    *[
                        F.struct(
                            F.expr(f"(cx {sx} w) div {SPATIAL_CELL}").alias("gx"),
                            F.expr(f"(cy {sy} w) div {SPATIAL_CELL}").alias("gy"),
                        )
                        for sx in ("-", "+")
                        for sy in ("-", "+")
                    ]
                )
            )
        ).alias("cell"),
    )
    hits = (
        box_cells.join(points, "cell")
        .filter(
            (F.abs(F.col("px") - F.col("cx")) <= F.col("w"))
            & (F.abs(F.col("py") - F.col("cy")) <= F.col("w"))
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    return hits.orderBy(F.desc("n_points"), "s_suppkey").limit(20)
