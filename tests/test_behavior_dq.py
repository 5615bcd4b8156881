"""Invariant + plan-shape tests for the behavior / data-quality /
rank-statistics operator batch (beyond the DuckDB oracle parity that
tests/test_oracle_parity.py already enforces for each)."""

from __future__ import annotations

import math

from gpu_database_spark.plans import inspect


def test_market_basket_probability_invariants(spark, sf_dir):
    from gpu_database_spark.operators.behavior import market_basket_lift

    rows = market_basket_lift(spark, sf_dir).collect()
    assert rows, "no brand pairs found"
    for r in rows:
        assert 0 < r.support <= 1
        assert r.support <= r.confidence <= 1 + 1e-9
        assert r.lift > 0
        assert r.brand_a < r.brand_b


def test_markov_rows_sum_to_one(spark, sf_dir):
    from gpu_database_spark.operators.behavior import markov_event_transitions

    rows = markov_event_transitions(spark, sf_dir).collect()
    by_cur: dict[str, float] = {}
    for r in rows:
        by_cur[r.cur] = by_cur.get(r.cur, 0.0) + r.p
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-4, f"row {cur} sums to {total}"


def test_attribution_accounts_for_every_purchase(spark, sf_dir):
    from pyspark.sql import functions as F

    from gpu_database_spark.operators.behavior import attribution_last_touch
    from gpu_database_spark.sources.catalog import load_table

    out = attribution_last_touch(spark, sf_dir)
    attributed = sum(r.n_purchases for r in out.collect())
    total = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert attributed == total


def test_acf_bounded(spark, sf_dir):
    from gpu_database_spark.operators.behavior import timeseries_acf

    rows = timeseries_acf(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9


def test_mannwhitney_matches_numpy_bruteforce(spark, sf_dir):
    """U statistic vs a direct O(n1*n2) numpy computation on the
    fixture sample — independent of both engines' SQL."""
    import numpy as np
    from pyspark.sql import functions as F

    from gpu_database_spark.operators.stattests import stat_mannwhitney_u
    from gpu_database_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    x = np.array(
        [r.value for r in e.filter(F.col("event_type") == "view").collect()]
    )
    y = np.array(
        [r.value for r in e.filter(F.col("event_type") == "purchase").collect()]
    )
    u1_brute = float(
        (x[:, None] > y[None, :]).sum() + 0.5 * (x[:, None] == y[None, :]).sum()
    )
    row = stat_mannwhitney_u(spark, sf_dir).collect()[0]
    assert row.n1 == len(x) and row.n2 == len(y)
    assert abs(row.u1 - u1_brute) < 1e-6
    assert abs(row.u1 + row.u2 - row.n1 * row.n2) < 1e-6


def test_gini_matches_numpy(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F

    from gpu_database_spark.operators.stattests import stat_gini_concentration
    from gpu_database_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    rev = np.sort(
        np.array(
            [
                r.r
                for r in o.groupBy("o_custkey")
                .agg(F.sum("o_totalprice").alias("r"))
                .collect()
            ]
        )
    )
    n = len(rev)
    i = np.arange(1, n + 1)
    g = 2 * (i * rev).sum() / (n * rev.sum()) - (n + 1) / n
    row = stat_gini_concentration(spark, sf_dir).collect()[0]
    assert row.n_customers == n
    assert abs(row.gini - g) < 1e-5
    assert 0 <= row.gini < 1


def test_entropy_mi_information_inequalities(spark, sf_dir):
    from gpu_database_spark.operators.stattests import stat_entropy_mi

    row = stat_entropy_mi(spark, sf_dir).collect()[0]
    assert row.h_x >= 0 and row.h_y >= 0 and row.h_xy >= 0
    # MI >= 0 and MI <= min(H(X), H(Y)); rounding gives 1e-5 slack
    assert row.mutual_info >= -1e-5
    assert row.mutual_info <= min(row.h_x, row.h_y) + 1e-5
    # joint entropy at most the sum of marginals
    assert row.h_xy <= row.h_x + row.h_y + 1e-5


def test_benford_shares_form_distribution(spark, sf_dir):
    from gpu_database_spark.operators.stattests import stat_benford_digits

    rows = stat_benford_digits(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set("123456789")
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    ben_total = sum(
        math.log10(1 + 1 / d) for d in range(1, 10)
    )  # == 1 by telescoping
    assert abs(ben_total - 1.0) < 1e-12


def test_dq_orphans_clean_on_fixture(spark, sf_dir):
    from gpu_database_spark.operators.dataquality import dq_referential_orphans

    rows = dq_referential_orphans(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.n_orphans == 0, f"{r.fk}: {r.n_orphans} orphans"
        assert r.n_checked > 0


def test_dq_profile_keys_unique(spark, sf_dir):
    from gpu_database_spark.operators.dataquality import dq_profile_table

    rows = {r.col: r for r in dq_profile_table(spark, sf_dir).collect()}
    # primary key column: distinct == rows, no nulls
    pk = rows["o_orderkey"]
    assert pk.n_distinct == pk.n_rows
    assert pk.n_nulls == 0
    # low-cardinality enum stays low
    assert rows["o_orderstatus"].n_distinct <= 5


def test_weighted_priority_sample_is_weight_biased_and_stable(spark, sf_dir):
    from pyspark.sql import functions as F

    from gpu_database_spark.llm.sampling import sample_weighted_priority
    from gpu_database_spark.sources.catalog import load_table

    a = sample_weighted_priority(spark, sf_dir).collect()
    b = sample_weighted_priority(spark, sf_dir).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b], "not deterministic"
    assert len(a) == 25
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sum(r.n_chars for r in a) / len(a)
    assert sample_mean > corpus_mean, "weighting did not bias toward long docs"


def test_bpe_merge_step_pairs_are_bigrams(spark, sf_dir):
    from gpu_database_spark.llm.textstats import text_bpe_merge_step

    rows = text_bpe_merge_step(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(len(r.pair) == 2 for r in rows)
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_zipf_slope_is_negative(spark, sf_dir):
    from gpu_database_spark.llm.textstats import text_zipf_fit

    row = text_zipf_fit(spark, sf_dir).collect()[0]
    # synthetic fixture vocabulary may be smaller than the 500 cap
    assert 0 < row.n_tokens <= 500
    assert row.zipf_slope < 0


# ---- plan-shape assertions: the 100 TB rule ----------------------------


def test_mannwhitney_prefix_sum_is_two_level(spark, sf_dir):
    """The sample-2 cumulative count must partition by the value
    bucket, never a global Window.orderBy(value)."""
    from gpu_database_spark.operators.stattests import stat_mannwhitney_u

    plan = inspect.simple_plan(stat_mannwhitney_u(spark, sf_dir))
    bad = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(value#" in ln
    ]
    assert not bad, f"global window over distinct values: {bad}"
    assert "_bkt" in plan


def test_gini_rank_is_bucketed(spark, sf_dir):
    """Customer-revenue ranks must come from the histogram-bucket
    plan (row_number within _bkt), not one global sort."""
    from gpu_database_spark.operators.stattests import stat_gini_concentration

    plan = inspect.simple_plan(stat_gini_concentration(spark, sf_dir))
    rn_lines = [
        ln
        for ln in plan.splitlines()
        if "row_number" in ln and "windowspecdefinition" in ln
    ]
    assert rn_lines, plan
    for ln in rn_lines:
        assert "_bkt" in ln, f"global-rank window: {ln}"


def test_market_basket_dims_broadcast(spark, sf_dir):
    """The three probability joins against the 25-brand table and the
    scalar total must be broadcasts; only the basket self-join and the
    item dedup may shuffle."""
    from gpu_database_spark.operators.behavior import market_basket_lift

    plan = inspect.simple_plan(market_basket_lift(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 3, plan


def test_asof_forward_strictly_after(spark, sf_dir):
    """Every picked rate must start strictly after the order date, and
    it must be the EARLIEST such rate (pandas merge_asof 'forward'
    semantics, checked directly against the rate schedule)."""
    import datetime

    from gpu_database_spark.operators.asof import join_asof_forward
    from gpu_database_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    base = datetime.datetime(1995, 1, 1)
    sched = [
        (base + datetime.timedelta(days=90 * i), round(1.0 + 0.01 * (i % 7), 2))
        for i in range(30)
    ]
    orders = {
        r.o_orderkey: r.o_orderdate
        for r in load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .collect()
    }
    for r in join_asof_forward(spark, sf_dir).collect():
        od = orders[r.o_orderkey]
        odt = datetime.datetime(od.year, od.month, od.day)
        nxt = [rate for vf, rate in sched if vf > odt]
        want = nxt[0] if nxt else None
        assert r.next_rate == want, (r.o_orderkey, od, r.next_rate, want)


def test_time_to_convert_nonnegative_and_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    from gpu_database_spark.operators.behavior import events_time_to_convert
    from gpu_database_spark.sources.catalog import load_table

    rows = events_time_to_convert(spark, sf_dir).collect()
    assert rows
    total_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert all(r.hours_to_convert >= 0 for r in rows)
    assert sum(r.n_purchases for r in rows) <= total_purchases


def test_cohort_ltv_cumulative_is_monotone(spark, sf_dir):
    from gpu_database_spark.operators.behavior import cohort_ltv

    rows = cohort_ltv(spark, sf_dir).collect()
    assert rows
    last: dict[int, float] = {}
    for r in rows:  # ordered by (cohort_week, age_w)
        prev = last.get(r.cohort_week, 0.0)
        assert r.cum_revenue >= prev - 1e-6
        assert abs(r.cum_revenue - prev - r.revenue) < 0.02
        last[r.cohort_week] = r.cum_revenue


def test_bigram_surprisal_nonnegative(spark, sf_dir):
    from gpu_database_spark.llm.textstats import text_bigram_surprisal

    rows = text_bigram_surprisal(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mean_surprisal >= 0
        assert r.n_bigrams > 0


def test_top_paths_counts_consistent(spark, sf_dir):
    from gpu_database_spark.operators.behavior import events_top_paths

    rows = events_top_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert len(r.path.split(">")) == 3
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_rfm_quintiles_cover_users(spark, sf_dir):
    from gpu_database_spark.operators.behavior import events_rfm_segmentation
    from gpu_database_spark.sources.catalog import load_table

    rows = events_rfm_segmentation(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 1 <= r.r_q <= 5 and 1 <= r.f_q <= 5 and 1 <= r.m_q <= 5


def test_pareto_classes_partition_revenue(spark, sf_dir):
    from gpu_database_spark.operators.behavior import pareto_abc_classification

    rows = {r.abc: r for r in pareto_abc_classification(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"}
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-4
    # A carries the bulk of revenue with fewer parts than C (Pareto)
    if "A" in rows and "C" in rows:
        assert rows["A"].revenue_share > rows["C"].revenue_share


def test_trend_slope_recovers_ols(spark, sf_dir):
    """Spot-check one brand's slope against numpy polyfit."""
    import numpy as np
    from pyspark.sql import functions as F

    from gpu_database_spark.operators.behavior import timeseries_trend_slope
    from gpu_database_spark.sources.catalog import load_table

    rows = timeseries_trend_slope(spark, sf_dir).collect()
    assert rows
    brand = rows[0].brand
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    monthly = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m")
        )
        .agg(F.sum("l_extendedprice").alias("y"))
        .collect()
    )
    x = np.array([r.m for r in monthly], dtype=float)
    y = np.array([r.y for r in monthly])
    slope = np.polyfit(x, y, 1)[0]
    got = rows[0].slope
    assert abs(got - slope) < max(1e-3, abs(slope) * 1e-3)


def test_jaccard_neighbors_bounded(spark, sf_dir):
    from gpu_database_spark.llm.graphrank import graph_jaccard_neighbors

    rows = graph_jaccard_neighbors(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.jaccard <= 1
        assert r.u < r.v
        assert r.n_common >= 1


def test_bucketed_row_number_matches_global_sort(spark):
    """The factored two-level rank (functions/ranks.py) must assign
    exactly the ranks a global ROW_NUMBER would, including on skewed
    and tied data, in both directions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpu_database_spark.functions.ranks import bucketed_row_number

    # skewed values (many ties at 0 and 7), deterministic
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.when(F.col("id") % 7 == 0, 0)
         .when(F.col("id") % 11 == 0, 7)
         .otherwise((F.col("id") * 37) % 500)).cast("double").alias("v"),
    )
    for ascending in (True, False):
        got = bucketed_row_number(
            df, "v", ["id"], F.floor(F.col("v") / 50), rank_col="i",
            ascending=ascending,
        )
        order = (
            [F.col("v").asc(), F.col("id").asc()]
            if ascending
            else [F.col("v").desc(), F.col("id").desc()]
        )
        want = df.withColumn("i", F.row_number().over(Window.orderBy(*order)))
        diff = (
            got.select("id", "i")
            .exceptAll(want.select("id", "i"))
            .count()
        )
        assert diff == 0, f"ascending={ascending}: {diff} rank mismatches"


def test_ewma_between_min_and_max(spark, sf_dir):
    """The smoothed level is a convex combination of observations, so
    it must lie within each series' [min, max]."""
    from pyspark.sql import functions as F

    from gpu_database_spark.operators.behavior import timeseries_ewma
    from gpu_database_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.expr("ts_ns div 3600000000000").alias("h")
    ).agg(F.avg("value").alias("v"))
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in hourly.groupBy("event_type")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    for r in timeseries_ewma(spark, sf_dir).collect():
        lo, hi = bounds[r.event_type]
        assert lo - 1e-6 <= r.ewma_level <= hi + 1e-6
        assert r.n_hours > 0


def test_left_mark_covers_all_customers(spark, sf_dir):
    from gpu_database_spark.operators.joins import join_left_mark
    from gpu_database_spark.sources.catalog import load_table

    rows = join_left_mark(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == n_cust
    flags = {r.has_urgent for r in rows}
    assert flags == {True, False}, "mark join should produce both flags"


def test_collation_halves_distinct_count(spark, sf_dir):
    from gpu_database_spark.functions.scalars import fn_collation

    row = fn_collation(spark, sf_dir).collect()[0]
    # upper-casing half the rows doubles the binary-distinct count
    # (every type now appears in both cases somewhere in the fixture)
    assert row.n_ci < row.n_binary <= 2 * row.n_ci
    assert row.n_uppercased > 0


def test_pca_power_matches_numpy_eigh(spark, sf_dir):
    """Distributed partial-Gram + power iteration must recover the
    same top eigenpair numpy.linalg.eigh finds on the collected data
    (up to sign, which the operator fixes deterministically)."""
    import numpy as np

    from gpu_database_spark.llm.similarity import embed_pca_power
    from gpu_database_spark.sources.catalog import load_table

    x = np.array(
        [
            r.embedding
            for r in load_table(spark, sf_dir, "embeddings").collect()
        ],
        dtype=np.float64,
    )
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / (len(x) - 1)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    rows = embed_pca_power(spark, sf_dir).collect()
    got = np.array([r.loading for r in sorted(rows, key=lambda r: r.component)])
    assert abs(rows[0].eigenvalue - vals[-1]) < 1e-6 * max(1e-3, vals[-1])
    # power iteration converges to the top eigenvector; near-degenerate
    # spectra limit attainable alignment, so require cos > 0.99
    assert abs(float(got @ top)) > 0.999, float(got @ top)
    assert abs(float(got @ got) - 1.0) < 1e-9


def test_null_safe_join_counts_null_bucket(spark, sf_dir):
    from gpu_database_spark.operators.joins import join_null_safe

    rows = {r.null_key: r for r in join_null_safe(spark, sf_dir).collect()}
    assert set(rows) == {True, False}, "need both null and non-null matches"
    assert rows[True].n_matches > 0
    # null bucket fan-out: every null order matches every null customer
    assert rows[True].n_matches % rows[True].n_orders == 0


def test_url_parse_fields_roundtrip(spark, sf_dir):
    from gpu_database_spark.functions.scalars import fn_url_parse

    rows = fn_url_parse(spark, sf_dir).collect()
    assert rows
    for r in rows[:20]:
        assert r.proto == "https"
        assert r.host.endswith(".example.com")
        assert r.path == f"/docs/{r.doc_id}"
        assert r.lang_param


def test_holt_forecast_consistent(spark, sf_dir):
    from gpu_database_spark.operators.behavior import timeseries_holt

    rows = timeseries_holt(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # level/trend are independently rounded to 6 dp; 24*trend
        # amplifies that rounding to ~1.3e-5
        assert abs(r.forecast_24h - (r.level + 24 * r.trend)) < 2e-5
        assert r.n_hours > 1


def test_cov_corr_matches_numpy(spark, sf_dir):
    import numpy as np

    from gpu_database_spark.operators.stattests import stat_cov_corr_matrix
    from gpu_database_spark.sources.catalog import load_table

    cols = ("l_quantity", "l_price_k", "l_discount", "l_tax")
    data = load_table(spark, sf_dir, "lineitem").collect()
    x = np.array(
        [
            [r.l_quantity, r.l_extendedprice / 1000, r.l_discount, r.l_tax]
            for r in data
        ]
    )
    cov = np.cov(x, rowvar=False)
    corr = np.corrcoef(x, rowvar=False)
    idx = {c: i for i, c in enumerate(cols)}
    rows = stat_cov_corr_matrix(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        i, j = idx[r.x], idx[r.y]
        assert abs(r.cov - cov[i, j]) < max(1e-4, abs(cov[i, j]) * 1e-5)
        assert abs(r.corr - corr[i, j]) < 1e-5
        assert -1 <= r.corr <= 1


def test_funnel_yield_monotone(spark, sf_dir):
    from gpu_database_spark.llm.curation import corpus_funnel_yield

    rows = corpus_funnel_yield(spark, sf_dir).collect()
    assert [r.stage for r in rows] == [
        "ingest", "lang_gate", "quality_gate", "exact_dedup", "hash_sample",
    ]
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True), "stages can only lose docs"
    for r in rows:
        assert 0 < r["yield"] <= 1.0


def test_maxsim_bounded_by_query_bag(spark, sf_dir):
    from gpu_database_spark.llm.similarity import sim_maxsim_multivector

    rows = sim_maxsim_multivector(spark, sf_dir).collect()
    assert rows
    scores = [r.maxsim for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # each of the n query vectors contributes a cosine in [-1, 1]
        assert abs(r.maxsim) <= r.n_query_vecs + 1e-6


def test_weighted_median_matches_numpy(spark, sf_dir):
    import numpy as np

    from gpu_database_spark.operators.aggregates import agg_weighted_median
    from gpu_database_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    rows = {r.flag: r for r in agg_weighted_median(spark, sf_dir).collect()}
    flags = {r.l_returnflag for r in li}
    assert set(rows) == flags
    for flag in flags:
        sub = sorted(
            (r.l_extendedprice, r.l_quantity) for r in li if r.l_returnflag == flag
        )
        prices = np.array([p for p, _ in sub])
        wts = np.array([w for _, w in sub], dtype=np.int64)
        cw = np.cumsum(wts)
        want = prices[np.searchsorted(cw, cw[-1] / 2)]
        got = rows[flag]
        assert got.weighted_median == want, (flag, got.weighted_median, want)
        assert got.total_weight == int(wts.sum())


def test_interval_binned_join_is_hash_not_nested_loop(spark, sf_dir):
    """The binning rewrite's whole point: the interval predicate must
    run as an equi hash join on the bin, never a nested-loop."""
    from gpu_database_spark.operators.joins import join_interval_binned

    plan = inspect.simple_plan(join_interval_binned(spark, sf_dir))
    assert "NestedLoop" not in plan, plan
    assert "HashJoin" in plan, plan


def test_weighted_median_prefix_is_bucketed(spark, sf_dir):
    """Cumulative weights must partition by (flag, price-bucket) —
    a per-flag Window.orderBy(price) would sort every distinct price
    in one task per flag (3 tasks total at any scale)."""
    from gpu_database_spark.operators.aggregates import agg_weighted_median

    plan = inspect.simple_plan(agg_weighted_median(spark, sf_dir))
    running = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "price" in ln
    ]
    assert running, plan
    for ln in running:
        assert "_bkt" in ln, f"per-flag global price window: {ln}"


def test_rfm_ranks_are_bucketed(spark, sf_dir):
    """All three RFM metric ranks must come from the histogram-bucket
    plan — no global single-partition row_number."""
    from gpu_database_spark.operators.behavior import events_rfm_segmentation

    plan = inspect.simple_plan(events_rfm_segmentation(spark, sf_dir))
    rn_lines = [
        ln
        for ln in plan.splitlines()
        if "row_number" in ln and "windowspecdefinition" in ln
    ]
    assert rn_lines, plan
    for ln in rn_lines:
        assert "_rk_bkt" in ln, f"global-rank window: {ln}"


def test_audience_overlap_hll_tracks_exact(spark, sf_dir):
    """The sketch matrix must estimate every exact pairwise audience
    overlap within HLL(lgK=14) tolerance (relative error ~0.8% at one
    sigma; allow 5% plus small-count slack)."""
    from gpu_database_spark.operators.behavior import (
        audience_overlap_hll,
        audience_overlap_jaccard,
    )

    exact = {
        (r.type_a, r.type_b): r
        for r in audience_overlap_jaccard(spark, sf_dir).collect()
    }
    est = {
        (r.type_a, r.type_b): r
        for r in audience_overlap_hll(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for k, r in est.items():
        x = exact[k]
        union = x.n_a + x.n_b - x.n_both
        assert abs(r.est_union - union) <= max(0.05 * union, 3), (k, r, x)
        assert abs(r.est_both - x.n_both) <= max(0.10 * union, 5), (k, r, x)
