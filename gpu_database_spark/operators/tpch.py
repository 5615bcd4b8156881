"""Additional TPC-H-shaped queries (scan-heavy bench depth).

These are the canonical OLAP access patterns at 100 TB: Q6 (pure
scan-filter-agg — the parquet pushdown showcase), Q12 (join +
conditional agg), Q14 (promo revenue share), Q18 (large-order
having-join). Plus the raw spark.sql interface over registered views —
the engine is usable from pure SQL, not just the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum, dsum_sql
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table, register_views


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders with at least one late-shipped line,
    counted by priority — EXISTS with a correlated non-equi condition,
    decorrelated into a semi-join."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q4_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM q4_orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM q4_lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: the distribution of per-customer order counts
    (count-of-counts, two stacked aggregations; the join predicate on
    the OUTER join's ON clause — not a post-filter — keeps zero-order
    customers)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT round({dsum_sql('l_extendedprice')} / 7.0, 6) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                                      / COUNT(*))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue from orders below half a part's average
    quantity — the correlated scalar-aggregate subquery, decorrelated
    into a per-part aggregate join (exact-sum average per part)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part_avg = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(per_part_avg, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(dsum(F.col("l_extendedprice")) / 7.0, 6).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_sales_opportunity",
    oracle="""
    WITH wealthy AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
                                  / COUNT(*)
                           FROM customer WHERE c_acctbal > 0)
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS totacctbal
    FROM wealthy
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance customers who never
    ordered — scalar-average subquery + anti-join + aggregate, the
    dormant-account prospect list."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # scalar stays IN the plan (broadcast cross join), like q15: no
    # eager driver-side scan at construction time
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double").alias(
                "totacctbal"
            ),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan + 4 pushed predicates + global agg —
    the query whose whole cost IS the scan; at 100 TB row-group
    statistics skip most of the table."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS volume
    FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    ORDER BY supp_nation, cust_nation, ship_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bilateral trade volume between two nations by
    ship year — the two-role dimension pattern (nation joined twice
    under different aliases) with a symmetric disjunctive filter."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH volumes AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
    )
    SELECT o_year,
           round({dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
                 / {dsum_sql('volume')}, 8) AS mkt_share
    FROM volumes
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: one nation's share of a region's purchase volume
    per year — conditional-sum ratio over a 7-table star join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_reg") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(dsum(target) / dsum(vol), 8).alias("mkt_share"))
        .orderBy("o_year")
    )


# --- synthesized partsupp -------------------------------------------------
#
# The fixture ships no partsupp table, so we DERIVE one, deterministically,
# from `part` and the supplier count — using the TPC-H dbgen supplier-
# assignment formula (spec 4.2.3: ps_suppkey = (ps_partkey + i*(S/4 +
# (ps_partkey-1)/S)) mod S + 1, i in 0..3). availqty/supplycost follow from
# arithmetic on the keys. Every expression is mirrored token-for-token in
# the oracle CTE below, so Spark and DuckDB synthesize the identical table
# and q9/q11/q16/q20 run their TRUE TPC-H shapes against it.
# (With the fixture's small supplier counts the dbgen formula can assign a
# part the same supplier twice; DISTINCT restores the (partkey, suppkey)
# primary key on both sides.)

_PS_SQL = """
    WITH s_cnt AS (SELECT count(*) AS s FROM supplier),
    ps0 AS (
        SELECT DISTINCT p_partkey AS ps_partkey,
               (p_partkey + i.i * ((s // 4) + ((p_partkey - 1) // s))) % s
                   AS ps_suppkey
        FROM part, s_cnt, (SELECT unnest(range(0, 4)) AS i) i
    ),
    partsupp AS (
        SELECT ps_partkey,
               CAST(ps_suppkey AS BIGINT) AS ps_suppkey,
               CAST((ps_partkey * 7 + ps_suppkey * 131) % 9999 + 1 AS BIGINT)
                   AS ps_availqty,
               CAST((ps_partkey * 31 + ps_suppkey * 517) % 99900 AS DOUBLE)
                   / 100.0 + 1.0 AS ps_supplycost
        FROM ps0
    )
"""


def partsupp_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized partsupp as a DataFrame: part x {0..3} with the
    dbgen supplier-assignment formula (see _PS_SQL). The supplier count
    enters the plan as a broadcast scalar (no driver .first())."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    s_cnt = load_table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("s"))
    idx = spark.range(0, 4).select(F.col("id").alias("i"))
    ps0 = (
        p.crossJoin(F.broadcast(s_cnt))
        .crossJoin(F.broadcast(idx))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr(
                "(p_partkey + i * ((s div 4) + ((p_partkey - 1) div s))) % s"
            ).alias("ps_suppkey"),
        )
        .distinct()
    )
    sk = F.col("ps_suppkey")
    return ps0.select(
        "ps_partkey",
        sk.cast("long").alias("ps_suppkey"),
        ((F.col("ps_partkey") * 7 + sk * 131) % 9999 + 1)
        .cast("long")
        .alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 31 + sk * 517) % 99900).cast("double") / 100.0
            + 1.0
        ).alias("ps_supplycost"),
    )


@register(
    "q9_product_profit",
    oracle=f"""
    {_PS_SQL}
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {dsum_sql('l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity')}
               AS sum_profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (true shape): profit by supplier nation and year for a
    part family, unit cost from the synthesized partsupp
    (ps_supplycost * l_quantity), ordered nation asc / year desc per
    spec."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    ps = partsupp_frame(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(
            F.broadcast(ps),
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_value_concentration",
    oracle=f"""
    {_PS_SQL},
    national AS (
        SELECT ps_partkey, ps_availqty, ps_supplycost
        FROM partsupp
          JOIN supplier ON ps_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    )
    SELECT ps_partkey,
           CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(27,6))) AS DOUBLE)
               AS value
    FROM national
    GROUP BY ps_partkey
    HAVING CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(27,6))) AS DOUBLE)
           > (SELECT CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(27,6)))
                          AS DOUBLE) * 0.005
              FROM national)
    ORDER BY value DESC, ps_partkey
    """,
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (true shape): parts whose stock value held by one
    nation's suppliers exceeds a fraction of that nation's total stock
    value — group over the synthesized partsupp, HAVING against a
    scalar fraction-of-grand-total subquery (in-plan via broadcast
    crossJoin, no driver .first()).

    Plan shape (r10 VERDICT #6 — was the board's worst exchange count
    at 9): the per-part DECIMAL sums are materialized ONCE and the
    grand total re-aggregates them — decimal addition is associative,
    so the two-level total is bit-identical to the oracle's one-level
    SUM, and the partsupp synthesis + national join run a single time
    instead of once per branch."""
    from gpu_database_spark.functions.materialize import materialize

    ps = partsupp_frame(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    national = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", "ps_availqty", "ps_supplycost")
    )
    grouped = materialize(
        national.groupBy("ps_partkey").agg(
            F.sum(
                (F.col("ps_supplycost") * F.col("ps_availqty")).cast(
                    "decimal(27,6)"
                )
            ).alias("_dv")
        )
    )
    total = grouped.agg(F.sum("_dv").cast("double").alias("_t"))
    return (
        grouped.select("ps_partkey", F.col("_dv").cast("double").alias("value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_t") * 0.005)
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: the quarter's top revenue supplier(s) — an
    aggregate 'view' joined against its own MAX (keeps ties exactly,
    unlike LIMIT 1)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle=f"""
    {_PS_SQL}
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT IN ('PROMO', 'LARGE')
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (true shape): distinct supplier counts per part
    attribute combo over the synthesized partsupp, excluding flagged
    suppliers (NOT IN anti-join; the subquery column is non-null so
    anti-join == NOT IN here)."""
    ps = partsupp_frame(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").isin("PROMO", "LARGE")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    return (
        ps.join(bad, "ps_suppkey", "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_supply",
    oracle=f"""
    {_PS_SQL},
    shipped_q AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS shipped
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3' AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp JOIN shipped_q
          ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps_availqty > 0.5 * shipped
    )
    ORDER BY s_suppkey
    """,
)
def q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (true shape): suppliers in one nation holding more
    than half the quantity they shipped of a part family in a year —
    the nested IN chain over partsupp with the correlated half-of-
    shipped scalar, decorrelated into a (partkey, suppkey) aggregate
    joined back (inner join == the spec's NULL-excluding scalar
    comparison: pairs that shipped nothing fail `> NULL` there and
    simply don't match here)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    ps = partsupp_frame(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    parts = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        F.col("p_partkey").alias("ps_partkey")
    )
    shipped_q = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double").alias("shipped")
    )
    heavy = (
        ps.join(F.broadcast(parts), "ps_partkey", "left_semi")
        .join(
            shipped_q,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("shipped"))
        .select(F.col("ps_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: customers generating the most returned-item
    revenue in a year — the churn-risk report (join + selective filter
    + top-20)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
               AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
               AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: fact-fact join + conditional counts."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_share",
    oracle=f"""
    SELECT round(
             100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {dsum_sql('l_extendedprice * (1 - l_discount)')}, 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promo revenue share (broadcast part, one ratio
    of two exact sums — a single final double division)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(0)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * dsum(promo) / dsum(disc), 6).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 150
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           o_totalprice,
           {dsum_sql('l_quantity')} AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
                  JOIN big ON big.l_orderkey = o_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: semi-join against a HAVING aggregate, then
    re-aggregate with customer context and take top-25."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("od"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               CAST(MIN(l_extendedprice / l_quantity) AS DOUBLE) AS unit_cost
        FROM lineitem WHERE l_quantity > 0
        GROUP BY l_partkey, l_suppkey
    ),
    mins AS (
        SELECT l_partkey, MIN(unit_cost) AS unit_cost FROM costs GROUP BY l_partkey
    )
    SELECT p_partkey, p_brand, s_name, round(c.unit_cost, 6) AS unit_cost
    FROM costs c
    JOIN mins m ON m.l_partkey = c.l_partkey AND m.unit_cost = c.unit_cost
    JOIN part ON p_partkey = c.l_partkey
    JOIN supplier ON s_suppkey = c.l_suppkey
    WHERE p_partkey <= 300
    ORDER BY p_partkey, s_name
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: for each part, the supplier(s) achieving the
    minimum observed unit cost — the correlated-min pattern, expressed
    as an aggregate + semi-join on the (key, min) pair (Catalyst's
    decorrelation target shape)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    s = load_table(spark, sf_dir, "supplier")
    costs = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    min_costs = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("unit_cost"))
    return (
        costs.join(min_costs, ["l_partkey", "unit_cost"], "left_semi")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey", "p_brand", "s_name", F.round("unit_cost", 6).alias("unit_cost")
        )
        .orderBy("p_partkey", "s_name")
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_type IN ('PROMO', 'ECONOMY') AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 25)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: a 3-branch disjunction of conjunctive predicates
    spanning both join sides — the shape that tests predicate
    normalization. Catalyst extracts the common join key, pushes the
    part-only disjuncts into the broadcast side's scan, and evaluates
    the residual OR post-join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    b3 = (
        F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").between(20, 50)
        & (F.col("l_quantity") >= 25)
    )
    return j.filter(b1 | b2 | b3).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q21_waiting_orders",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(DISTINCT l1.l_orderkey) AS waiting
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND l1.l_shipdate > o.o_orderdate
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY waiting DESC, s.s_suppkey
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: suppliers with late lines on multi-supplier
    finished orders — EXISTS (semi-join) + a non-equi predicate
    (shipdate > orderdate) stacked on an equi-join."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    l1 = l.select("l_orderkey", "l_suppkey", "l_shipdate")
    multi = (
        l.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    return (
        l1.join(multi, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.countDistinct("l_orderkey").alias("waiting"))
        .orderBy(F.col("waiting").desc(), "s_suppkey")
    )


@register(
    "sql_interface",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    HAVING COUNT(*) > 10
    ORDER BY n_name
    """,
)
def sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL front door: fixture tables registered as views,
    query written in SQL verbatim — Catalyst plans it identically to
    the DataFrame API (one engine, two dialects)."""
    register_views(spark, sf_dir, names=("customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        HAVING COUNT(*) > 10
        ORDER BY n_name
        """
    )
