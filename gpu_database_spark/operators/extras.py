"""Extended operator coverage: statistical aggregates, pivot/unpivot,
ordered string aggregation, ntile/first/last windows, bit ops, date
arithmetic, edit-distance strings, map columns, from_json structs, and
Arrow-vectorized pandas UDFs.

Rounds out SURVEY.md §2B so a user of any mainstream OLAP surface
finds the operator here, each gated by the DuckDB oracle where
semantics are engine-portable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Statistical aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_numeric_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_discount, l_tax), 8) AS cov_disc_tax,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS median_qty,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/correlation/covariance + exact interpolated
    percentiles (Spark `percentile` == DuckDB `quantile_cont`).
    Moments rounded: both engines accumulate doubles, and the rounding
    absorbs last-bit drift. At 100 TB use approx_percentile instead of
    exact percentile (constant-memory sketch) — see agg_approx_distinct
    for the sketch-family pattern."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("cov_disc_tax"),
            F.round(F.percentile("l_quantity", 0.5), 6).alias("median_qty"),
            F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot / ordered string agg
# ---------------------------------------------------------------------------


@register(
    "pivot_status_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority x status. Explicit value list =
    one pass, no distinct-values pre-query (the scale-safe form)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT p_partkey, metric, val FROM (
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'price' AS metric, p_retailprice AS val FROM part
    ) WHERE p_partkey <= 50
    ORDER BY p_partkey, metric
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide -> long via stack()."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return (
        p.select(
            "p_partkey",
            F.expr(
                "stack(2, 'size', CAST(p_size AS DOUBLE), 'price', p_retailprice) AS (metric, val)"
            ),
        )
        .orderBy("p_partkey", "metric")
    )


@register(
    "listagg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): deterministic via
    array_sort(collect_list(...)) — collect_list alone is
    partition-order-dependent and would not be reproducible."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("n_regionkey")
    )


# ---------------------------------------------------------------------------
# More window shapes
# ---------------------------------------------------------------------------


@register(
    "window_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           first_value(c_custkey) OVER w AS richest,
           last_value(c_custkey)
             OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest,
           c_mktsegment
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """,
)
def window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles + first_value/last_value with an explicit full
    frame (last_value over the default frame is a classic trap — the
    default frame ends at CURRENT ROW)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        c.select(
            "c_custkey",
            "c_acctbal",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.first("c_custkey").over(w).alias("richest"),
            F.last("c_custkey").over(wfull).alias("poorest"),
            "c_mktsegment",
        )
        .orderBy("c_mktsegment", F.col("c_acctbal").desc(), "c_custkey")
    )


# ---------------------------------------------------------------------------
# Bit ops, date arithmetic, edit distance
# ---------------------------------------------------------------------------


@register(
    "agg_boolean",
    oracle="""
    SELECT o_orderstatus,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_and(o_orderpriority <> '5-LOW') AS none_low
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (ANY/EVERY): existence and invariant checks
    per group without count detours."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_and(F.col("o_orderpriority") != "5-LOW").alias("none_low"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "fn_try_cast",
    oracle="""
    SELECT s, TRY_CAST(s AS INTEGER) AS as_int,
           TRY_CAST(s AS DOUBLE) AS as_double,
           COALESCE(TRY_CAST(s AS INTEGER), -1) AS with_default
    FROM (VALUES ('42'), ('oops'), (''), ('-7'), ('1000000000000')) t(s)
    ORDER BY s
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant casting: TRY_CAST nulls out unparseable cells
    instead of failing the job — the dirty-data discipline for
    string-typed ingest columns (pairs with the PERMISSIVE CSV reader)."""
    # no decimal strings: DuckDB TRY_CAST('3.5' AS INT) rounds to 4 while
    # Spark nulls it — a real cross-engine semantic gap; the overflow row
    # nulls in both.
    df = spark.createDataFrame(
        [("42",), ("oops",), ("",), ("-7",), ("1000000000000",)], "s string"
    )
    return df.select(
        "s",
        F.expr("TRY_CAST(s AS INT)").alias("as_int"),
        F.expr("TRY_CAST(s AS DOUBLE)").alias("as_double"),
        F.coalesce(F.expr("TRY_CAST(s AS INT)"), F.lit(-1)).alias("with_default"),
    ).orderBy("s")


@register(
    "fn_bits",
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255 AS and8,
           l_orderkey | 4096 AS or_bit,
           xor(l_orderkey, l_partkey) AS xored,
           l_orderkey << 2 AS shl,
           l_orderkey >> 3 AS shr
    FROM lineitem WHERE l_orderkey <= 60 AND l_linenumber = 1
    ORDER BY l_orderkey
    """,
)
def fn_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit manipulation (the reference packs epoch/rts/wts into a u64
    word, src/cuda/metadatahelper.cuh:12-34 — these are the operators
    that packing would use)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") <= 60) & (F.col("l_linenumber") == 1)
    )
    return l.select(
        "l_orderkey",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("and8"),
        F.col("l_orderkey").bitwiseOR(F.lit(4096)).alias("or_bit"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("xored"),
        F.shiftleft("l_orderkey", 2).alias("shl"),
        F.shiftright("l_orderkey", 3).alias("shr"),
    ).orderBy("l_orderkey")


@register(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30
    FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: add_months, last_day, ISO day-of-week,
    day-of-year, date_add."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("due_date"),
        F.last_day(d).alias("month_end"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.date_add(d, 30).alias("plus30"),
    ).orderBy("o_orderkey")


@register(
    "fn_edit_distance",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS edit_dist,
           CAST(strpos(a.n_name, 'AN') AS BIGINT) AS an_pos
    FROM nation a JOIN nation b ON b.n_nationkey = a.n_nationkey + 1
    ORDER BY name_a
    """,
)
def fn_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance + substring position — the fuzzy-matching scalar
    family (levenshtein is also the final verifier in dedup stacks)."""
    n = load_table(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"))
    return (
        a.join(b, F.col("kb") == F.col("ka") + 1)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
            F.locate("AN", F.col("name_a")).cast("long").alias("an_pos"),
        )
        .orderBy("name_a")
    )


# ---------------------------------------------------------------------------
# Map columns & from_json structs
# ---------------------------------------------------------------------------


@register(
    "fn_explode_outer",
    oracle="""
    WITH docs(id, tags) AS (VALUES
        (1, ['a', 'b']),
        (2, CAST([] AS VARCHAR[])),
        (3, CAST(NULL AS VARCHAR[])),
        (4, ['c'])
    )
    SELECT id, t.tag
    FROM docs LEFT JOIN LATERAL (SELECT unnest(tags) AS tag) t ON TRUE
    ORDER BY id, tag NULLS FIRST
    """,
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: null-preserving row expansion — rows with empty or
    NULL arrays survive with a NULL element instead of vanishing (the
    plain-explode data-loss trap; the oracle states it as a lateral
    left join)."""
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None), (4, ["c"])],
        "id int, tags array<string>",
    )
    return df.select("id", F.explode_outer("tags").alias("tag")).orderBy(
        "id", F.col("tag").asc_nulls_first()
    )


@register(
    "fn_map_entries",
    oracle="""
    SELECT r_regionkey, k, v FROM (
        SELECT r_regionkey, 'name' AS k, r_name AS v FROM region
        UNION ALL
        SELECT r_regionkey, 'key_str' AS k, CAST(r_regionkey AS VARCHAR) AS v FROM region
    ) ORDER BY r_regionkey, k
    """,
)
def fn_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map columns: create_map -> explode to (key, value) rows (the
    oracle states the same relation without map types)."""
    r = load_table(spark, sf_dir, "region")
    m = F.create_map(
        F.lit("name"), F.col("r_name"),
        F.lit("key_str"), F.col("r_regionkey").cast("string"),
    )
    return (
        r.select("r_regionkey", F.explode(m).alias("k", "v"))
        .orderBy("r_regionkey", "k")
    )


@register(
    "fn_from_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled
    FROM events WHERE event_id < 200 ORDER BY event_id
    """,
)
def fn_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-ful JSON parsing: from_json into a typed struct (vs the
    path-extraction style of fn_json)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        (parsed.getField("k") * 2).alias("k_doubled"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Arrow-vectorized pandas UDFs (SURVEY.md §2B "UDF / UDAF")
# ---------------------------------------------------------------------------


def _discounted_price_udf():
    """Vectorized scalar pandas UDF: whole Arrow batches, ~10-100x a
    row-at-a-time Python UDF. Semantics chosen to be exactly
    reproducible in SQL so the oracle still gates it. (Defined lazily:
    pandas_udf needs an active session at decoration time.)"""

    @pandas_udf("double")
    def _discounted_price(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1.0 - discount) * (1.0 + tax)

    return _discounted_price


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow scalar pandas UDF (per-row double arithmetic is IEEE-
    deterministic, so the oracle hash still matches). Kept out of hot
    paths in every other query — builtins beat even Arrow UDFs."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    udf = _discounted_price_udf()
    return l.select(
        "l_orderkey",
        "l_linenumber",
        udf("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "fn_nested_structs",
    oracle="""
    SELECT o_orderkey,
           CAST(len(lines) AS BIGINT) AS n_lines,
           (lines[1]).l_quantity AS first_line_qty,
           (lines[-1]).l_partkey AS last_line_part,
           CAST((lines[1]).l_linenumber AS BIGINT) AS first_ln
    FROM (
        SELECT o_orderkey,
               list(struct_pack(l_linenumber := l_linenumber,
                                l_quantity := l_quantity,
                                l_partkey := l_partkey)
                    ORDER BY l_linenumber, l_quantity, l_partkey) AS lines
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey <= 200
        GROUP BY o_orderkey
    )
    ORDER BY o_orderkey
    """,
)
def fn_nested_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested (Dremel-style) shaping: nest each order's lines into an
    ordered ARRAY<STRUCT>, then navigate back out with element/field
    access — the record-assembly round trip columnar engines are built
    around. Outputs are scalars so the cross-engine hash stays
    representation-independent."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    l = load_table(spark, sf_dir, "lineitem")
    nested = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("l_linenumber", "l_quantity", "l_partkey"))
            ).alias("lines")
        )
    )
    first = F.element_at("lines", 1)
    last = F.element_at("lines", -1)
    return nested.select(
        "o_orderkey",
        F.size("lines").cast("long").alias("n_lines"),
        first.getField("l_quantity").alias("first_line_qty"),
        last.getField("l_partkey").alias("last_line_part"),
        first.getField("l_linenumber").cast("long").alias("first_ln"),
    ).orderBy("o_orderkey")


@register(
    "udf_grouped_map",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
               AS bal_rank,
           CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS group_size
    FROM customer
    ORDER BY c_nationkey, bal_rank
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: each nation's customers arrive as one
    pandas DataFrame; the UDF ranks them by balance. Integer outputs
    keep it oracle-exact (the same relation as a window row_number —
    which IS the better plan for this job; applyInPandas earns its keep
    when the per-group logic is genuinely imperative, e.g. model
    scoring or curve fitting per group)."""
    c = load_table(spark, sf_dir, "customer")

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["bal_rank"] = pdf.index + 1
        pdf["group_size"] = len(pdf)
        return pdf[["c_nationkey", "c_custkey", "bal_rank", "group_size"]]

    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(
            rank_group,
            schema="c_nationkey int, c_custkey long, bal_rank long, group_size long",
        )
        .orderBy("c_nationkey", "bal_rank")
    )


@register(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, word FROM (
        SELECT doc_id,
               generate_subscripts(words, 1) AS pos,
               unnest(words) AS word
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
              FROM documents)
    )
    WHERE doc_id < 20
    ORDER BY doc_id, pos
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row -> many output rows
    (here: positional tokenization, so the oracle can state it as
    unnest-with-ordinality). The UDTF surface is the escape hatch for
    row-expanding logic with real side effects/state; for plain
    splitting, posexplode is the builtin fast path — benchmarked
    side-by-side in tests."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, pos: long, word: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for i, w in enumerate(text.strip().split()):
                yield doc_id, i + 1, w

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.word
        FROM udtf_docs d, LATERAL tokenize_udtf(d.doc_id, d.text) t
        ORDER BY t.doc_id, t.pos
        """
    )


def _token_total_udf():
    """Grouped-aggregate pandas UDF: integer sum (exact, order-free)."""

    @pandas_udf("long")
    def _token_total(texts: pd.Series) -> int:
        return int(texts.str.split().str.len().sum())

    return _token_total


@register(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT lang,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF surface): token totals per
    language; integer arithmetic keeps it oracle-exact."""
    d = load_table(spark, sf_dir, "documents")
    udf = _token_total_udf()
    return (
        d.groupBy("lang")
        .agg(udf("text").alias("total_tokens"))
        .orderBy("lang")
    )


@register(
    "sink_merge_snapshot",
    oracle="""
    SELECT s_suppkey, s_name,
           CASE WHEN s_acctbal < 0 THEN 0.0 ELSE s_acctbal END AS bal
    FROM supplier WHERE s_suppkey % 7 <> 3
    UNION ALL
    SELECT CAST(-1 AS BIGINT), 'new_supplier', 42.0
    ORDER BY s_suppkey
    """,
)
def sink_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta-style MERGE sink exercised end-to-end through the
    driver contract: three committed snapshot versions — full load,
    matched-update + not-matched-insert, matched-delete — then the
    final snapshot read back from disk. The oracle states the net
    effect of the three merges in one SQL expression; matching it
    proves the sink's upsert/delete semantics AND the atomic
    version-pointer round trip (sources/writers.py: merge_upsert /
    read_snapshot)."""
    import os
    import shutil
    import tempfile

    from gpu_database_spark.sources import writers

    # keep scratch inside the repo tree (spark-warehouse discipline)
    scratch_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "_merge_sink_scratch",
    )
    os.makedirs(scratch_root, exist_ok=True)
    path = tempfile.mkdtemp(dir=scratch_root)
    try:
        s = load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name", F.col("s_acctbal").alias("bal")
        )
        writers.merge_upsert(spark, path, s, ["s_suppkey"])
        upd = s.filter(F.col("bal") < 0).withColumn("bal", F.lit(0.0)).unionByName(
            spark.createDataFrame(
                [(-1, "new_supplier", 42.0)], "s_suppkey long, s_name string, bal double"
            )
        )
        writers.merge_upsert(spark, path, upd, ["s_suppkey"])
        dels = s.filter(F.col("s_suppkey") % 7 == 3).withColumn("_del", F.lit(True))
        writers.merge_upsert(spark, path, dels, ["s_suppkey"], delete_col="_del")
        final = writers.read_snapshot(spark, path)
        # The snapshot must outlive its merge-scratch tempdir, but a
        # driver collect here is O(table) (VERDICT r9 #4) — instead
        # rewrite it once, executor-side, to a session-scoped result
        # path and hand back the lazy scan of that parquet.
        result = os.path.join(scratch_root, "latest_snapshot.parquet")
        final.write.mode("overwrite").parquet(result)
        return spark.read.parquet(result).orderBy("s_suppkey")
    finally:
        shutil.rmtree(path, ignore_errors=True)
