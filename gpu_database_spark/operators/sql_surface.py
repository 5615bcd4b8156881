"""Modern SQL surface: recursive CTEs, VARIANT, LATERAL, SQL UDFs.

These are the Spark 4 SQL features a reference user migrating a query
workload expects to keep working: iterative hierarchy walks (WITH
RECURSIVE — the one shape plain DataFrame algebra cannot express
without a driver-side loop), semi-structured JSON via the VARIANT
type (parse once, extract many — the open-format answer to the
reference's fixed-width value payloads), correlated LATERAL joins
(top-n-per-row without a window over the whole table), and SQL-body
UDFs (CREATE FUNCTION ... RETURN expr — inlined by Catalyst, so zero
Python round-trip, unlike external UDFs).

Scale notes: the recursive CTE iterates a self-join per level —
depth-bounded (log n for this hierarchy), each step a keyed shuffle;
VARIANT extraction is a narrow map pushed into the scan stage; the
LATERAL here rewrites to a broadcastable join at plan time; SQL UDFs
inline into whole-stage codegen (no serialization boundary at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table, register_views

# Synthesized binary-heap hierarchy over nation: parent(n) = (n-1)//2,
# root 0 — a deterministic org-chart stand-in (the fixture has no
# self-referential table). floor((n-1)/2.0) is used verbatim in BOTH
# engines so integer-division dialect differences can't diverge.
_RECURSIVE_SQL = """
WITH RECURSIVE tree AS (
    SELECT n_nationkey, n_name, 0 AS depth, n_name AS path
    FROM nation WHERE n_nationkey = 0
    UNION ALL
    SELECT c.n_nationkey, c.n_name, t.depth + 1, t.path || '>' || c.n_name
    FROM nation c JOIN tree t
      ON CAST(floor((c.n_nationkey - 1) / 2.0) AS INTEGER) = t.n_nationkey
    WHERE c.n_nationkey > 0
)
SELECT CAST(n_nationkey AS BIGINT) AS nk, n_name,
       CAST(depth AS BIGINT) AS depth, path
FROM tree ORDER BY nk
"""


@register("sql_recursive_cte", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy walk (Spark 4): depth and root-path for
    every node of a binary-heap org chart synthesized over nation.
    Each recursion level is one keyed self-join — Catalyst runs the
    loop to fixpoint inside the engine, no driver-side iteration. The
    oracle is the IDENTICAL statement run by DuckDB (both dialects
    accept it verbatim), the strongest parity form this suite has."""
    register_views(spark, sf_dir, names=("nation",))
    return spark.sql(_RECURSIVE_SQL)


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                      THEN 1 END) AS n_hi,
           COUNT(CASE WHEN json_extract(props, '$.missing') IS NULL
                      THEN 1 END) AS n_missing
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4 open semi-structured type): parse the
    JSON props column once with parse_json, then typed extractions via
    variant_get — the schema-on-read path for event payloads that vary
    by producer. try_variant_get on an absent path yields NULL (counted
    to pin the missing-path semantics). At 100 TB the parse is a narrow
    map in the scan stage; only (event_type, k) survive to the shuffle.
    Oracle: DuckDB json_extract states the same extractions."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.expr("variant_get(v, '$.k', 'long')")
    missing = F.expr("try_variant_get(v, '$.missing', 'long')")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.count(F.when(k > 50, 1)).alias("n_hi"),
            F.count(F.when(missing.isNull(), 1)).alias("n_missing"),
        )
        .orderBy("event_type")
    )


_LATERAL_SQL = """
SELECT r_name, t.n_name, t.rk
FROM region r,
LATERAL (
    SELECT n_name,
           CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS rk
    FROM nation WHERE n_regionkey = r_regionkey
    ORDER BY n_name LIMIT 2
) t
ORDER BY r_name, rk
"""


@register("sql_lateral_topn", oracle=_LATERAL_SQL)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: first 2 nations per region without
    windowing the whole nation table — the decorrelator rewrites the
    per-row subquery into a join, so the 100-TB plan is a partial
    top-k per key, not a global sort. Identical statement runs on both
    engines (DuckDB comma-LATERAL dialect)."""
    register_views(spark, sf_dir, names=("region", "nation"))
    return spark.sql(_LATERAL_SQL)


@register(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (analyst-dialect sugar, identical
    resolution rules in Spark 4 and DuckDB): every non-aggregate select
    item becomes a grouping key, then the full output column list the
    sort key. One exact-decimal-summed aggregation."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "sql_udf_scalar",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)
               AS net_revenue
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-body UDF (CREATE FUNCTION ... RETURN expr, Spark 4): the
    discounted-price business rule declared once, inlined by Catalyst
    into whole-stage codegen — the zero-overhead alternative to a
    Python UDF for pure-expression logic (no serialization boundary,
    full pushdown through it). The oracle inlines the same expression,
    which is exactly what the optimizer does."""
    register_views(spark, sf_dir, names=("lineitem",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_price(price DOUBLE, disc DOUBLE)
        RETURNS DOUBLE RETURN price * (1 - disc)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(CAST(SUM(CAST(net_price(l_extendedprice, l_discount)
                                  AS DECIMAL(27,6))) AS STRING) AS DOUBLE)
                   AS net_revenue
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@register("agg_hll_sketch_merge")  # rows-only: DataSketches binary format
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistable HLL sketches (Apache DataSketches, Spark 3.5+):
    per-group hll_sketch_agg over o_custkey, then hll_union_agg merges
    the group sketches into a corpus-wide estimate — the pattern that
    matters at 100 TB, where you sketch per partition/day ONCE and
    re-aggregate sketches (bytes, not rows) for any rollup after.
    Rows-only: sketch estimates are engine-specific (DuckDB's HLL
    differs); accuracy is pytest-gated against exact counts instead."""
    o = load_table(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_nd"),
    )
    merged = per_status.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.lit("ALL").alias("o_orderstatus"),
    )
    per = per_status.select(
        "o_orderstatus",
        F.hll_sketch_estimate("sk").alias("est_nd"),
        "exact_nd",
    )
    return per.orderBy("o_orderstatus")


# keep the merged-sketch path importable for the accuracy test
def hll_merged_estimate(spark: SparkSession, sf_dir: str) -> float:
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus").agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    return per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 10
    ORDER BY o_orderpriority
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 / GoogleSQL `|>` operators): the same
    filtered-aggregate-having query stated as a linear pipeline —
    FROM |> WHERE |> AGGREGATE ... GROUP BY |> WHERE |> ORDER BY —
    which Catalyst parses to the IDENTICAL logical plan as the nested
    classic form the oracle states (pushdown, partial aggregation and
    AQE all apply unchanged; pipe order is surface syntax only)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                       AS revenue
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> ORDER BY o_orderpriority
        """
    )


@register(
    "sql_parameterized",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_key
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderdate < DATE '1997-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding): the query
    text carries ``:floor`` / ``:cutoff`` markers and values bind at
    execution — the injection-safe prepared-query surface an engine
    front-end exposes. Catalyst folds the bound literals exactly as if
    inlined (same pushdown, same plan), which the oracle's literal
    form verifies."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(o_orderkey) AS BIGINT) AS first_key
        FROM orders
        WHERE o_totalprice > :floor AND o_orderdate < :cutoff
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"floor": 150000.0, "cutoff": "1997-01-01"},
    )


@register(
    "sql_transpose",
    oracle="""
    WITH m AS (
        SELECT l_returnflag AS flag,
               CAST(COUNT(*) AS DOUBLE) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
               CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'n_rows' AS key,
           MAX(CASE WHEN flag = 'A' THEN n_rows END) AS A,
           MAX(CASE WHEN flag = 'N' THEN n_rows END) AS N,
           MAX(CASE WHEN flag = 'R' THEN n_rows END) AS R
    FROM m
    UNION ALL
    SELECT 'n_orders',
           MAX(CASE WHEN flag = 'A' THEN n_orders END),
           MAX(CASE WHEN flag = 'N' THEN n_orders END),
           MAX(CASE WHEN flag = 'R' THEN n_orders END) FROM m
    UNION ALL
    SELECT 'sum_qty',
           MAX(CASE WHEN flag = 'A' THEN sum_qty END),
           MAX(CASE WHEN flag = 'N' THEN sum_qty END),
           MAX(CASE WHEN flag = 'R' THEN sum_qty END) FROM m
    ORDER BY key
    """,
)
def sql_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``DataFrame.transpose()``: flip a per-group metric
    table so metrics become rows and groups become columns — the
    report-orientation move analysts do by hand with N pivot
    expressions (which is exactly what the oracle states). Transpose
    collects the index column to name the output columns, so it is a
    SMALL-RESULT operator by contract: here it runs on the 3-row
    aggregate of a full scan, never on the fact table itself.

    Scale shape: the heavy work (groupBy flag over lineitem) is a
    normal map-side-combinable aggregation; transpose touches only
    the 3x4 result."""
    li = load_table(spark, sf_dir, "lineitem")
    m = (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long"))
            .cast("double")
            .alias("sum_qty"),
            F.countDistinct("l_orderkey").cast("double").alias("n_orders"),
        )
    )
    return m.transpose().orderBy("key")


_QUALIFY_ORACLE = """
SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
QUALIFY rn <= 3
ORDER BY priority, rn
"""


@register("sql_qualify_topn", oracle=_QUALIFY_ORACLE)
def sql_qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-clause semantics (filter on a window result without a
    subquery — DuckDB/BigQuery/Snowflake dialect sugar). Spark SQL has
    no QUALIFY keyword, so the engine exposes the canonical rewrite:
    the window moves into a derived table and QUALIFY becomes WHERE —
    byte-identical results, and Catalyst turns the rank<=k filter
    into a per-partition partial top-k (WindowGroupLimit), so the
    100 TB plan never fully sorts any priority group.

    Reference tie-in: no SQL surface in the reference CUDA KV store
    (src/cuda/*.cuh); part of the modern-SQL dialect layer."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT priority, o_orderkey, o_totalprice, rn FROM (
            SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey)
                       AS rn
            FROM orders
        ) WHERE rn <= 3
        ORDER BY priority, rn
        """
    )
