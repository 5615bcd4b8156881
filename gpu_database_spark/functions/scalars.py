"""Scalar-function coverage queries (SURVEY.md §2B "Scalar functions").

Reference parity: the reference's scalar kernel is tiny — random cstr
generation (``src/database/common/random.h:33-39``), bit pack/unpack
(``src/cuda/metadatahelper.cuh:12-34``), a multiplicative hash
(``src/cuda/hashTable.cuh:24-28``). Each query below exercises one
family of built-in (JVM/codegen) scalar functions, the fast path that
replaces row-at-a-time UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum, dsum_sql
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           substr(p_name, 1, 12) AS name_prefix,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           replace(p_brand, 'Brand#', 'B') AS brand_short,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           reverse(p_brand) AS brand_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/substring/length/concat/trim/replace/
    split/reverse/lpad (ref's cstr generator analogue)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    ).orderBy("p_partkey")


@register(
    "fn_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_type,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           (p_type LIKE '%O%') AS has_o,
           regexp_matches(p_name, '^[a-z]+ ') AS starts_word
    FROM part
    WHERE p_type LIKE 'PROMO%' OR p_type LIKE '%LARGE%'
    ORDER BY p_partkey
    """,
)
def fn_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE predicates + regexp_extract/rlike (pushed to the scan where
    possible — LIKE 'PROMO%' becomes a StartsWith pushdown)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("PROMO%") | F.col("p_type").like("%LARGE%"))
        .select(
            "p_partkey",
            "p_name",
            "p_type",
            F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
            F.col("p_type").like("%O%").alias("has_o"),
            F.col("p_name").rlike("^[a-z]+ ").alias("starts_word"),
        )
        .orderBy("p_partkey")
    )


@register(
    "fn_date",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS month_value,
           CAST(MIN(date_diff('day', DATE '1995-01-01', o_orderdate)) AS BIGINT) AS min_day_offset
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY yr, mo
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: year/month/quarter extraction, datediff, grouped by
    calendar month (the classic time-rollup shape)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("month_value"),
            F.min(
                F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            ).cast("long").alias("min_day_offset"),
        )
        .orderBy("yr", "mo")
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(power(l_discount, 2), 10) AS disc_sq,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/floor/ceil/mod/sqrt/ln/power/greatest/least.
    Transcendentals rounded to 6-10 dp (both engines use the platform
    libm; last-bit drift is possible, well below the rounding)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
        F.ceil(F.col("l_quantity") / 7).cast("long").alias("qty_bucket"),
        (F.col("l_orderkey") % 97).cast("long").alias("key_mod"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_discount", 2), 10).alias("disc_sq"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           CAST(('0x' || substr(md5(c_name), 1, 8)) AS BIGINT) AS name_hash32
    FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family (ref's multiplicative hashKey analogue,
    src/cuda/hashTable.cuh:24-28): md5/sha256 agree across engines;
    a 32-bit integer hash is derived from the md5 prefix so the oracle
    can reproduce it (Spark's xxhash64/murmur3 are engine-specific)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.conv(F.substring(F.md5("c_name"), 1, 8), 16, 10).cast("long").alias("name_hash32"),
    ).orderBy("c_custkey")


@register(
    "fn_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object over the events.props payload
    (semi-structured column in an otherwise relational table)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_case_coalesce",
    oracle="""
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_bal
    FROM (
        SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 1000 THEN 'low'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS bucket,
               c_acctbal
        FROM customer
    )
    GROUP BY bucket ORDER BY bucket
    """,
)
def fn_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (3-valued-logic surface the reference's
    CmpBool enum intended but never wired, src/database/common/type.h:22-26)."""
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        c.select(bucket.alias("bucket"), "c_acctbal")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("c_acctbal")).alias("total_bal"))
        .orderBy("bucket")
    )


@register(
    "fn_array",
    oracle="""
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           words[1] AS first_word,
           words[-1] AS last_word,
           array_to_string(list_sort(list_distinct(words[1:5])), ',') AS first5_sorted
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    WHERE doc_id < 50 ORDER BY doc_id
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split/size/element_at/slice/array_distinct/
    array_sort/concat_ws over tokenized document text."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.concat_ws(",", F.array_sort(F.array_distinct(F.slice(words, 1, 5)))).alias(
            "first5_sorted"
        ),
    ).orderBy("doc_id")


@register(
    "fn_type_system",
    oracle="""
    SELECT o_orderkey,
           (o_totalprice > 200000) AS t_boolean,
           CAST(o_orderkey AS INTEGER) AS t_integer,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS t_decimal_str,
           CAST(o_orderkey AS VARCHAR) AS t_varchar,
           CAST(year(o_orderdate) AS BIGINT) AS t_timestamp_year,
           CAST(CAST('123' AS INTEGER) + 1 AS BIGINT) AS t_roundtrip
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
)
def fn_type_system(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's (vestigial) type system made real: its TypeId
    enum {BOOLEAN, INTEGER, DECIMAL, VARCHAR, TIMESTAMP}
    (src/database/common/type.h:9-16) maps to live Spark types with
    working casts in every direction — the surface the reference's
    empty Value class (value.h:9-20) never got.

    double->DECIMAL(18,2) casting rounds identically in both engines
    (deterministic function of the double's bits), and the decimal is
    emitted as its canonical string so the hash compares text."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        (F.col("o_totalprice") > 200000).alias("t_boolean"),
        F.col("o_orderkey").cast("int").alias("t_integer"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("t_decimal_str"),
        F.col("o_orderkey").cast("string").alias("t_varchar"),
        F.year("o_orderdate").cast("long").alias("t_timestamp_year"),
        (F.lit("123").cast("int") + 1).cast("long").alias("t_roundtrip"),
    ).orderBy("o_orderkey")


@register(
    "fn_three_valued_logic",
    oracle="""
    SELECT a, b,
           (a = b) AS eq,
           (a IS DISTINCT FROM b) AS distinct_from,
           (a IS NOT DISTINCT FROM b) AS not_distinct,
           (a = b OR TRUE) AS or_true,
           (a = b AND FALSE) AS and_false,
           (a IS NULL) AS a_is_null,
           COALESCE(a, -1) AS a_filled
    FROM (VALUES (1, 1), (1, 2), (NULL, 1), (1, NULL), (CAST(NULL AS INTEGER), NULL)) t(a, b)
    ORDER BY a NULLS FIRST, b NULLS FIRST
    """,
)
def fn_three_valued_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL three-valued logic, the semantics the reference's CmpBool
    enum {CmpFalse, CmpTrue, CmuNull} intended (type.h:22-26): NULL
    comparisons are NULL, IS [NOT] DISTINCT FROM is the null-safe
    equality, and NULL short-circuits through OR TRUE / AND FALSE."""
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (None, 1), (1, None), (None, None)], "a int, b int"
    )
    return df.select(
        "a",
        "b",
        (F.col("a") == F.col("b")).alias("eq"),
        (~F.col("a").eqNullSafe(F.col("b"))).alias("distinct_from"),
        F.col("a").eqNullSafe(F.col("b")).alias("not_distinct"),
        ((F.col("a") == F.col("b")) | F.lit(True)).alias("or_true"),
        ((F.col("a") == F.col("b")) & F.lit(False)).alias("and_false"),
        F.col("a").isNull().alias("a_is_null"),
        F.coalesce(F.col("a"), F.lit(-1)).alias("a_filled"),
    ).orderBy(F.col("a").asc_nulls_first(), F.col("b").asc_nulls_first())


@register(
    "timeseries_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT MIN(epoch_ns(ts) // 3600000000000) AS h0,
               MAX(epoch_ns(ts) // 3600000000000) AS h1
        FROM events WHERE event_type = 'signup'
    ),
    calendar AS (
        SELECT unnest(range(h0, h1 + 1)) * 3600 AS hour_s FROM bounds
    ),
    actual AS (
        SELECT epoch_ns(ts) // 3600000000000 * 3600 AS hour_s, COUNT(*) AS n
        FROM events WHERE event_type = 'signup' GROUP BY 1
    )
    SELECT c.hour_s, COALESCE(a.n, 0) AS n_signups,
           (a.n IS NULL) AS gap_filled
    FROM calendar c LEFT JOIN actual a ON a.hour_s = c.hour_s
    ORDER BY c.hour_s
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: generate the dense hour calendar
    between min and max event time (sequence — distributed, no driver
    loop) and left-join the sparse actuals, zero-filling silent hours.
    Every monitoring/forecasting pipeline needs this before windowed
    models; at scale the calendar is tiny and broadcasts."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    hours = e.select(F.expr("ts_ns div 3600000000000").alias("h"))
    bounds = hours.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    calendar = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    ).select((F.col("h") * 3600).alias("hour_s"))
    actual = hours.groupBy((F.col("h") * 3600).alias("hour_s")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        calendar.join(actual, "hour_s", "left")
        .select(
            "hour_s",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_signups"),
            F.col("n").isNull().alias("gap_filled"),
        )
        .orderBy("hour_s")
    )


@register(
    "fn_predicates_misc",
    oracle="""
    SELECT c_custkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           (o_totalprice BETWEEN 100000 AND 200000) AS mid_price,
           nullif(o_orderstatus, 'O') AS status_or_null,
           (nullif(o_orderstatus, 'O') IS NULL) AS is_open,
           COALESCE(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey <= 300
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND o_orderpriority NOT LIKE '5%'
      AND o_totalprice IS NOT NULL
    ORDER BY c_custkey, order_month, o_totalprice
    """,
)
def fn_predicates_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-family sweep: BETWEEN, IN-list, NOT LIKE, IS [NOT]
    NULL, NULLIF/COALESCE, date_trunc — the SQL NULL semantics the
    reference's CmpBool enum intended (src/database/common/type.h:22-26)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(
            ~F.col("o_orderpriority").like("5%") & F.col("o_totalprice").isNotNull()
        )
        .select(
            "c_custkey",
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"),
            F.col("o_totalprice").between(100000, 200000).alias("mid_price"),
            status_or_null.alias("status_or_null"),
            status_or_null.isNull().alias("is_open"),
            F.coalesce(status_or_null, F.lit("OPEN")).alias("status_filled"),
            "o_totalprice",
        )
        .orderBy("c_custkey", "order_month", "o_totalprice")
        .drop("o_totalprice")
    )


@register(
    "sub_in",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_totalprice > 350000
    ORDER BY o_orderkey
    """,
)
def sub_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (compiled to a left-semi broadcast join)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM sq_orders
        WHERE o_custkey IN (SELECT c_custkey FROM sq_customer WHERE c_mktsegment = 'MACHINERY')
          AND o_totalprice > 350000
        ORDER BY o_orderkey
        """
    )


@register(
    "sub_scalar",
    oracle="""
    SELECT p_partkey, p_retailprice FROM part
    WHERE p_retailprice > 1.5 * (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(27,6))) AS DOUBLE)
                                        / COUNT(*) FROM part)
    ORDER BY p_partkey
    """,
)
def sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: parts priced >1.5x the mean (one extra stage
    computing the scalar, then broadcast into the filter)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("sq_part")
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice FROM sq_part
        WHERE p_retailprice > 1.5 * (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(27,6))) AS DOUBLE)
                                            / COUNT(*) FROM sq_part)
        ORDER BY p_partkey
        """
    )


@register(
    "sub_exists_correlated",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
    ORDER BY s_suppkey
    """,
)
def sub_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (decorrelated by Catalyst into a semi-join)."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("sq_supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM sq_supplier
        WHERE EXISTS (SELECT 1 FROM sq_lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
        ORDER BY s_suppkey
        """
    )


@register(
    "fn_collation",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
                    ELSE p_type END AS t
        FROM part
    )
    SELECT COUNT(DISTINCT t) AS n_binary,
           COUNT(DISTINCT lower(t)) AS n_ci,
           CAST(SUM(CASE WHEN t = upper(t) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_uppercased
    FROM mixed
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation surface: distinct part types counted under
    the default binary collation vs UTF8_LCASE (case-insensitive) —
    the engine-level alternative to sprinkling lower() through every
    comparison. The fixture has one case per type, so the query first
    upper-cases half the rows to make the two counts genuinely
    diverge.

    The case-insensitive count uses a genuinely collated column
    (collate(t, 'UTF8_LCASE')) so grouping/equality semantics come
    from the type, not an expression rewrite; the oracle states the
    equivalent lower() form (DuckDB's NOCASE collation would also
    work). One aggregation pass, JVM-side throughout."""
    p = load_table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.lower("p_type"))
        .otherwise(F.col("p_type"))
        .alias("t")
    )
    return mixed.agg(
        F.count_distinct(F.col("t")).alias("n_binary"),
        F.count_distinct(F.expr("collate(t, 'UTF8_LCASE')")).alias("n_ci"),
        F.sum(F.when(F.col("t") == F.upper("t"), 1).otherwise(0))
        .cast("long")
        .alias("n_uppercased"),
    )


@register(
    "fn_url_parse",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' ||
               CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '://([^/]+)/', 1) AS host,
           regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?lang=([a-z]+)', 1) AS lang_param
    FROM urls ORDER BY doc_id
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — protocol/host/path/query-parameter — via
    Spark's dedicated parse_url (a JVM built-in ETL staple); DuckDB
    has no URL parser, so the oracle states the equivalent regexes.
    URLs are synthesized deterministically from document columns so
    both engines parse identical strings."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
        ).alias("url"),
    )
    return urls.select(
        "doc_id",
        F.regexp_extract("url", "^([a-z]+)://", 1).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@register(
    "fn_encodings",
    oracle="""
    SELECT c_custkey,
           base64(encode(c_name)) AS name_b64,
           lower(hex(encode(c_mktsegment))) AS seg_hex,
           ascii(c_name) AS first_code,
           chr(65 + CAST(c_custkey % 26 AS INTEGER)) AS rotor
    FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey
    """,
)
def fn_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/text encoding family: base64, hex, ascii code points,
    chr — the staples of key mangling and wire-format debugging.
    Spark emits hex uppercase and DuckDB lowercase, so both sides pin
    lowercase; DuckDB's base64/hex take BLOBs, hence encode()."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.base64(F.col("c_name").cast("binary")).alias("name_b64"),
        F.lower(F.hex(F.col("c_mktsegment").cast("binary"))).alias("seg_hex"),
        F.ascii("c_name").alias("first_code"),
        F.chr(65 + F.col("c_custkey") % 26).alias("rotor"),
    ).orderBy("c_custkey")


@register(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE l_extendedprice / l_discount END AS price_per_disc,
           CASE WHEN l_quantity - 25 = 0 THEN NULL
                ELSE CAST(trunc(CAST(l_orderkey AS DOUBLE)
                                / (l_quantity - 25)) AS BIGINT)
           END AS key_div,
           CASE WHEN l_extendedprice < 100000
                THEN CAST(trunc(l_extendedprice) AS BIGINT)
                ELSE NULL END AS price_small_int
    FROM lineitem WHERE l_orderkey <= 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: try_divide (NULL on division by zero,
    both float and integer) and a guarded narrowing cast — the
    functions that let ANSI mode stay on without blanket try/except
    around every expression. The oracle states the equivalent CASE
    guards; the price_small_int guard doubles as a
    try_cast-on-range demo (values >= 100000 would overflow a
    hypothetical downstream INT32 contract, so they null out)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_disc"
        ),
        F.try_divide(
            F.col("l_orderkey").cast("long"),
            (F.col("l_quantity") - 25).cast("long"),
        ).cast("long").alias("key_div"),
        F.when(
            F.col("l_extendedprice") < 100000,
            F.col("l_extendedprice").cast("long"),
        ).alias("price_small_int"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "fn_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           COALESCE(array_to_string(regexp_extract_all(text, '[A-Za-z]+ing'),
                                    ','), '') AS ing_words,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
           regexp_extract_all(lower(text), 'th[a-z]+')[1] AS first_th
    FROM documents WHERE doc_id < 300 ORDER BY doc_id
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: every match as an array (vs the first-only
    regexp_extract) plus derived counts and head element — the
    pattern-mining primitive both engines implement natively.
    DuckDB arrays are 1-indexed and Spark's element_at matches that
    convention, so the head extraction states the same index.
    The match array is stringified with concat_ws in the FINAL
    projection (driver-canonicalizer contract: pandas cannot hash a
    top-level ndarray cell, so no query may return a top-level
    array/map column — same discipline as fn_array)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        F.concat_ws(
            ",", F.regexp_extract_all("text", F.lit("[A-Za-z]+ing"), 0)
        ).alias("ing_words"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0))
        .cast("long")
        .alias("n_numbers"),
        F.try_element_at(
            F.regexp_extract_all(F.lower("text"), F.lit("th[a-z]+"), 0),
            F.lit(1),
        ).alias("first_th"),
    ).orderBy("doc_id")


@register(
    "fn_xml_parse",
    oracle="""
    WITH x AS (
        SELECT doc_id,
               '<doc id="' || doc_id || '"><lang>' || lang || '</lang>'
               || '<src>' || source || '</src><chars>' || n_chars
               || '</chars></doc>' AS xml
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(regexp_extract(xml, 'id="([0-9]+)"', 1) AS BIGINT) AS xid,
           regexp_extract(xml, '<lang>([^<]*)</lang>', 1) AS xlang,
           regexp_extract(xml, '<src>([^<]*)</src>', 1) AS xsrc,
           CAST(regexp_extract(xml, '<chars>([0-9]+)</chars>', 1) AS BIGINT)
             AS xchars
    FROM x ORDER BY doc_id
    """,
)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 built-in XML support): documents
    are round-tripped through an XML representation and parsed back
    with the xpath_* family — attribute extraction, element text,
    numeric casts — all JVM-side. DuckDB has no XML parser, so the
    oracle states the equivalent regexp extractions over the SAME
    synthesized markup; equality proves the xpath semantics. (from_xml
    to a typed struct is the schema-on-read variant of the same
    machinery; the xpath form is shown because it projects straight to
    flat, canonicalizer-friendly columns.)"""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    xml = F.concat(
        F.lit('<doc id="'),
        F.col("doc_id"),
        F.lit('"><lang>'),
        F.col("lang"),
        F.lit("</lang><src>"),
        F.col("source"),
        F.lit("</src><chars>"),
        F.col("n_chars"),
        F.lit("</chars></doc>"),
    )
    return (
        d.select("doc_id", xml.alias("xml"))
        .select(
            "doc_id",
            F.expr("xpath_long(xml, '/doc/@id')").alias("xid"),
            F.expr("xpath_string(xml, '/doc/lang')").alias("xlang"),
            F.expr("xpath_string(xml, '/doc/src')").alias("xsrc"),
            F.expr("xpath_long(xml, '/doc/chars')").alias("xchars"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_higher_order",
    oracle="""
    WITH items AS (
        SELECT l_orderkey,
               list_sort(list(CAST(round(l_extendedprice * 100) AS BIGINT)))
                   AS cents
        FROM lineitem
        WHERE l_orderkey < 200
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(cents) AS BIGINT) AS n_items,
           CAST(list_aggregate(cents, 'sum') AS BIGINT) AS total_cents,
           CAST(list_aggregate(
                    list_transform(cents, x -> x * 2), 'max')
                AS BIGINT) AS max_doubled,
           CAST(len(list_filter(cents, x -> x > 5000000))
                AS BIGINT) AS n_large,
           (len(list_filter(cents, x -> x <= 0)) = 0) AS all_positive,
           array_to_string(cents[1:3], ',') AS low3
    FROM items ORDER BY l_orderkey
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions over arrays — transform / filter
    / aggregate / exists-style predicates — the JVM-side array
    algebra that replaces per-row Python when a column holds a
    collection. Values stay integral (exact cents) so both engines'
    lambda pipelines hash-match; the collected array is sorted first
    because collect_list order is partition-dependent (determinism
    rule every array-building query here follows).

    Scale shape: groupBy(l_orderkey) + collect_list shuffles once on
    a high-cardinality key; every lambda then runs inside whole-stage
    codegen — zero Python, zero explode-re-aggregate round trips.
    The l_orderkey < 200 filter bounds the demo; the plan is
    row-count linear."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    items = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("cents")).alias("cents")
    )
    return items.select(
        "l_orderkey",
        F.size("cents").cast("long").alias("n_items"),
        F.aggregate(
            "cents", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_cents"),
        F.array_max(F.transform("cents", lambda x: x * 2))
        .cast("long")
        .alias("max_doubled"),
        F.size(F.filter("cents", lambda x: x > 5_000_000))
        .cast("long")
        .alias("n_large"),
        (~F.exists("cents", lambda x: x <= 0)).alias("all_positive"),
        F.concat_ws(",", F.slice("cents", 1, 3)).alias("low3"),
    ).orderBy("l_orderkey")


@register(
    "fn_csv_parse",
    oracle="""
    WITH raw AS (
        SELECT o_orderkey,
               CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ','
                   || CAST(round(o_totalprice, 2) AS VARCHAR)
                   || ',' || o_orderpriority AS line
        FROM orders WHERE o_orderkey < 500
    )
    SELECT o_orderkey, line,
           CAST(string_split(line, ',')[1] AS BIGINT) AS k,
           string_split(line, ',')[2] AS status,
           CAST(string_split(line, ',')[3] AS DOUBLE) AS price,
           string_split(line, ',')[4] AS priority
    FROM raw ORDER BY o_orderkey
    """,
)
def fn_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read CSV parsing as a SCALAR function: ``from_csv``
    turns an embedded delimited string column into a typed struct in
    one JVM-side expression — the log-line / export-blob unpacking
    primitive (the file-level CSV reader is sources/readers.py; this
    is the per-column variant). The line is synthesized from typed
    columns first so both engines parse the identical bytes; the
    oracle states the same unpack with string_split + casts.

    Scale shape: row-local expression, no shuffle, whole-stage
    codegen; the filter bounds the demo output only."""
    raw = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.concat_ws(
                ",",
                F.col("o_orderkey").cast("string"),
                "o_orderstatus",
                F.round("o_totalprice", 2).cast("string"),
                "o_orderpriority",
            ).alias("line"),
        )
    )
    parsed = raw.withColumn(
        "c",
        F.from_csv(
            "line", "k long, status string, price double, priority string"
        ),
    )
    return parsed.select(
        "o_orderkey",
        "line",
        F.col("c.k").alias("k"),
        F.col("c.status").alias("status"),
        F.col("c.price").alias("price"),
        F.col("c.priority").alias("priority"),
    ).orderBy("o_orderkey")
