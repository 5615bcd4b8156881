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
