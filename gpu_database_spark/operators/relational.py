"""KV-store parity operators (SURVEY.md §2A rows 1-12) + flagship query.

The reference's storage operators — point lookup, multiget, insert,
upsert/install, delete, scan, count, bulk load — re-expressed as
declarative DataFrame programs. Reference citations per query.

Scale notes: point lookups and multigets become parquet scans with
pushed predicates (row-group + page skipping at 100 TB); multiget
key-lists broadcast; MERGE-style upserts are a shuffle-free
broadcast join when the delta is small, a shuffled full-outer join
otherwise (AQE picks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import davg, davg_sql, dsum, dsum_sql
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (scan -> filter -> agg -> sort).
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: filter -> groupBy -> 8 aggregates -> sort.

    One shuffle (partial agg map-side, final agg reduce-side); the
    shipdate predicate and 7-column projection push into the parquet
    scan. Flagship because it exercises scan/filter/project/agg/sort in
    one plan the way the reference's epoch pipeline chains its phases.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# KV parity (reference operators #1-#3: probe + project).
# ---------------------------------------------------------------------------


@register(
    "kv_point_lookup",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part WHERE p_partkey = 42
    """,
)
def kv_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key (ref: HashTable::contain, src/cuda/hashTable.cuh:94-110;
    value projection Table::search_value, src/database/common/table.cuh:56-68).

    The hash-probe becomes a pushed equality predicate: parquet
    row-group stats + dictionary/page skipping make this near-O(1) IO
    at scale (no full scan).
    """
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") == 42).select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )


@register(
    "kv_multiget",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_partkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 999999)
    ORDER BY p_partkey
    """,
)
def kv_multiget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key snapshot read (ref: device_execute's per-op probe loop,
    src/database/ycsb/TrancM_func.cuh:21-63 — missing keys skipped, :32-34).

    A batch of point lookups = broadcast semi-join of the key list
    against the table: one scan serves all keys (the reference needs
    one probe per op). Missing key 999999 drops out, matching the
    reference's skip-on-miss.
    """
    part = load_table(spark, sf_dir, "part")
    keys = spark.createDataFrame(
        [(k,) for k in (1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 999999)], ["p_partkey"]
    )
    return (
        part.join(F.broadcast(keys), "p_partkey", "left_semi")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    )


@register(
    "kv_scan_project",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
    """,
)
def kv_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan (ref: show_all_table / kernel_show_table,
    src/cuda/hashTable.cuh:202-206, src/database/ycsb/TrancM_func.cuh:10-18).

    The per-slot-parallel kernel variant is exactly a partitioned
    columnar scan; ordering imposed only for the deterministic oracle.
    """
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).orderBy("n_nationkey")


@register(
    "kv_count",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_keys FROM lineitem
    """,
)
def kv_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality (ref: get_itemnums/get_size, src/cuda/hashTable.cuh:157-163;
    DB::get_kvs_num, src/database/ycsb/db.h:73-76).

    count(*) folds to parquet footer metadata (no row read);
    count(distinct) is a two-phase shuffle agg.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_keys"),
    )


@register(
    "kv_bulk_load",
    oracle="""
    SELECT i AS k, md5(CAST(i AS VARCHAR)) AS v0, upper(substr(md5(CAST(i*31 AS VARCHAR)), 1, 10)) AS v1
    FROM range(1, 1001) t(i)
    ORDER BY k
    """,
)
def kv_bulk_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk load with generated values (ref: DB::init_table seeds keys 1..n
    with random 10x10-char values, src/database/ycsb/db.h:42-53; generator
    src/database/common/random.h:33-39).

    The reference generates rows serially on the host; here
    spark.range() manufactures the keyspace fully distributed and the
    'random' payload is a deterministic hash of the key — same
    reproducibility the reference gets from seeding, no host loop.
    """
    return (
        spark.range(1, 1001)
        .select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("v0"),
            F.upper(F.substring(F.md5((F.col("id") * 31).cast("string")), 1, 10)).alias("v1"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Mutation surface (reference operators #4-#7): MERGE-style transforms.
# ---------------------------------------------------------------------------


@register(
    "kv_upsert_merge",
    oracle="""
    WITH updates AS (
        SELECT p_partkey + 1000000 AS p_partkey, p_retailprice * 2 AS p_retailprice
        FROM part WHERE p_size >= 40
        UNION ALL
        SELECT p_partkey, p_retailprice * 1.1 AS p_retailprice
        FROM part WHERE p_size < 10
    )
    SELECT COALESCE(b.p_partkey, u.p_partkey) AS k,
           COALESCE(u.p_retailprice, b.p_retailprice) AS price,
           (u.p_partkey IS NOT NULL) AS updated
    FROM part b FULL OUTER JOIN updates u ON b.p_partkey = u.p_partkey
    ORDER BY k
    """,
)
def kv_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert / install write-back (ref: insert src/cuda/hashTable.cuh:120-154;
    committed-txn install `src_ptr->copy(storage_ptr)`,
    src/database/ycsb/TrancM_func.cuh:188-197).

    In-place mutation becomes a MERGE: full-outer join base vs delta,
    COALESCE(new, old). New keys (+1000000) are inserts, existing keys
    are updates — both in one shuffle. At scale: if the delta is small
    Spark broadcasts it; no table rewrite beyond affected partitions
    when the sink is partition-aware.
    """
    part = load_table(spark, sf_dir, "part")
    updates = (
        part.filter(F.col("p_size") >= 40)
        .select(
            (F.col("p_partkey") + 1000000).alias("p_partkey"),
            (F.col("p_retailprice") * 2).alias("p_retailprice"),
        )
        .unionAll(
            part.filter(F.col("p_size") < 10).select(
                "p_partkey", (F.col("p_retailprice") * 1.1).alias("p_retailprice")
            )
        )
    )
    base = part.select("p_partkey", "p_retailprice")
    return (
        base.alias("b")
        .join(updates.alias("u"), "p_partkey", "full_outer")
        .select(
            F.col("p_partkey").alias("k"),
            F.coalesce(F.col("u.p_retailprice"), F.col("b.p_retailprice")).alias("price"),
            F.col("u.p_retailprice").isNotNull().alias("updated"),
        )
        .orderBy("k")
    )


@register(
    "kv_delete_anti",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    ORDER BY s_suppkey
    """,
)
def kv_delete_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete (ref: HashTable::_delete is a declared empty stub,
    src/cuda/hashTable.cuh:112-114 — the capability the reference never
    finished, expressed here as an anti-join).
    """
    s = load_table(spark, sf_dir, "supplier")
    doomed = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        s.join(doomed, "s_suppkey", "left_anti")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
