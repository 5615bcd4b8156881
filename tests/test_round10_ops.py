"""Round-10 regression tests: the r9 ADVICE edge cases.

1. markov_stationary_distribution on a chain with an ABSORBING state
   (an event type that appears only as a transition target): the
   driver loop must not KeyError, and must drop that state's mass
   exactly like the oracle's LEFT JOIN onto the source-keyed states.
2. stat_friedman_test on input where NO user holds every event type:
   both engines must return ZERO rows (not a divide-by-zero row).
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    """Write a minimal events.parquet into a throwaway sf_dir."""
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    return sf_dir


def _ts(i: int) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=i)


def test_markov_sink_state_no_crash_and_drops_mass(spark, tmp_path):
    """'churn' appears only as a target: 1 user, view -> click ->
    view -> churn. Sources are {view, click}; churn must be absent
    from the output and its inbound mass dropped each round, matching
    the oracle's LEFT JOIN semantics."""
    from gpu_database_spark.operators.behavior import (
        markov_stationary_distribution,
    )

    rows = [
        (1, _ts(0), 7, "view", 1.0, "{}"),
        (2, _ts(1), 7, "click", 1.0, "{}"),
        (3, _ts(2), 7, "view", 1.0, "{}"),
        (4, _ts(3), 7, "churn", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = markov_stationary_distribution(spark, sf_dir)
    got = {r.state: r for r in out.collect()}
    assert set(got) == {"view", "click"}, got
    # Mass leaks out through the absorbing state each round, so the
    # surviving states must sum to strictly less than 1.
    total = sum(r.stationary_p for r in got.values())
    assert 0.0 < total < 1.0, total
    assert got["view"].n_transitions_out == 2
    assert got["click"].n_transitions_out == 1


def test_markov_sink_state_matches_oracle(spark, tmp_path):
    """Same fixture, cross-engine: the driver loop and the DuckDB
    power-iteration oracle must agree bit-for-bit after 8dp rounding."""
    import duckdb

    from gpu_database_spark import registry
    from gpu_database_spark.operators.behavior import (
        markov_stationary_distribution,
    )
    from tests.oracle_utils import assert_query_matches_oracle

    rows = [
        (1, _ts(0), 7, "view", 1.0, "{}"),
        (2, _ts(1), 7, "click", 1.0, "{}"),
        (3, _ts(2), 7, "view", 1.0, "{}"),
        (4, _ts(3), 7, "churn", 1.0, "{}"),
        # second user keeps some recurrent mass so pi isn't trivial
        (5, _ts(0), 8, "view", 1.0, "{}"),
        (6, _ts(1), 8, "click", 1.0, "{}"),
        (7, _ts(2), 8, "view", 1.0, "{}"),
        (8, _ts(3), 8, "click", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'events.parquet')}/*.parquet')"
    )
    df = markov_stationary_distribution(spark, sf_dir)
    sql = registry.oracle_sql()["markov_stationary_distribution"]
    assert_query_matches_oracle(df, con, sql, name="markov_sink_state")
    con.close()


def test_friedman_degenerate_returns_empty(spark, tmp_path):
    """No user has all event types -> full_blocks is empty -> both
    engines return ZERO rows (previously: a one-row divide-by-zero)."""
    import duckdb

    from gpu_database_spark import registry
    from gpu_database_spark.operators.stattests import stat_friedman_test
    from tests.oracle_utils import assert_query_matches_oracle

    rows = [
        (1, _ts(0), 1, "view", 1.0, "{}"),
        (2, _ts(1), 2, "click", 2.0, "{}"),
        (3, _ts(2), 3, "purchase", 3.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    df = stat_friedman_test(spark, sf_dir)
    assert df.count() == 0
    assert df.columns == ["n_blocks", "k_treatments", "friedman_chi2", "dof"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'events.parquet')}/*.parquet')"
    )
    sql = registry.oracle_sql()["stat_friedman_test"]
    assert_query_matches_oracle(df, con, sql, name="friedman_degenerate")
    con.close()


def test_round_half_up_half_boundary():
    """The 8dp rounding used driver-side must be half-away-from-zero
    (DuckDB round), not banker's (Python round)."""
    from gpu_database_spark.operators.behavior import (
        markov_stationary_distribution,  # noqa: F401 - module import
    )
    import gpu_database_spark.operators.behavior as b

    # exact half at 8dp: 0.000000125 -> 0.00000013 away-from-zero
    assert b.math.floor(abs(0.125e-6) * 1e8 + 0.5) / 1e8 == 0.13e-6


def _clone_table(spark, src_df, key_col, clones, offset=10_000_000):
    out = src_df
    for i in range(1, clones + 1):
        out = out.unionAll(
            src_df.withColumn(
                key_col, F.col(key_col) + F.lit(offset * i)
            )
        )
    return out


def test_er_fuzzy_match_clone_collapse_matches_naive(spark, sf_dir, tmp_path):
    """er_fuzzy_match's collapsed plan (Levenshtein once per distinct
    name pair, member expansion after) must emit EXACTLY the naive
    quadratic rule's pairs on a duplicate-heavy part table."""
    from gpu_database_spark.operators.maintenance import er_fuzzy_match
    from gpu_database_spark.sources.catalog import load_table

    base = load_table(spark, sf_dir, "part").limit(200)
    amplified = _clone_table(spark, base, "p_partkey", clones=3)
    amplified.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "part.parquet")
    )
    got = er_fuzzy_match(spark, str(tmp_path)).collect()

    p = amplified.select(
        "p_partkey", "p_name", "p_brand", "p_type",
        F.concat(
            F.split(F.col("p_name"), " ").getItem(1),
            F.lit("|"),
            F.col("p_brand"),
        ).alias("block_key"),
    )
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    want = (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(dist <= 3)
        .select(
            F.col("a.block_key").alias("block_key"),
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("dist"),
            (F.col("a.p_type") == F.col("b.p_type")).alias("same_type"),
        )
        .orderBy("block_key", "key_a", "key_b")
        .limit(100)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # the clone-amplified frame must actually exercise both branches
    assert any(r.dist == 0 for r in got), "no clone pairs in fixture"


def test_sim_pairs_blocked_clone_collapse_matches_naive(spark, sf_dir, tmp_path):
    """sim_pairs_blocked's collapsed plan (one dot product per
    distinct-vector pair + one self-cosine per clone group) must emit
    EXACTLY the naive per-member pair join's rows, bit-for-bit, on a
    table where every embedding is duplicated."""
    from gpu_database_spark.llm.similarity import (
        dot,
        l2_norm,
        lsh_bucket_array,
        sim_pairs_blocked,
    )
    from gpu_database_spark.sources.catalog import load_table

    base = load_table(spark, sf_dir, "embeddings").limit(150)
    amplified = _clone_table(spark, base, "vec_id", clones=2, offset=100_000)
    amplified.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    got = sorted(tuple(r) for r in sim_pairs_blocked(spark, str(tmp_path)).collect())

    normed = amplified.select(
        "vec_id", "label", "embedding",
        l2_norm(F.col("embedding")).alias("nrm"),
        F.element_at(lsh_bucket_array("embedding"), 1).cast("long").alias("bucket"),
    )
    a = normed.select(
        F.col("vec_id").alias("va"), "label", "bucket",
        F.col("embedding").alias("ea"), F.col("nrm").alias("na"),
    )
    b = normed.select(
        F.col("vec_id").alias("vb"), F.col("label").alias("label_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("embedding").alias("eb"), F.col("nrm").alias("nb"),
    )
    sim = F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    want = sorted(
        tuple(r)
        for r in (
            a.join(
                b,
                (F.col("label") == F.col("label_b"))
                & (F.col("bucket") == F.col("bucket_b"))
                & (F.col("va") < F.col("vb")),
            )
            .select("va", "vb", "label", "bucket", sim.alias("cos_sim"))
            .filter(F.col("cos_sim") > 0.3)
        ).collect()
    )
    assert got == want
    # clone pairs (cosine exactly 1.0 at 6dp) must be present
    assert any(r[4] == 1.0 for r in got), "no clone pairs in fixture"


# ---- round-10 operator batch: numpy/pure-python ground-truth gates ----


def test_wilcoxon_matches_python_replica(spark, duck, sf_dir):
    """W+ and z must equal a textbook average-rank signed-rank
    replica computed independently from the same per-user means."""
    import numpy as np

    from gpu_database_spark.operators.stattests import (
        stat_wilcoxon_signed_rank,
    )

    cell = duck.execute(
        """
        SELECT CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value
                      ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
               / NULLIF(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END), 0)
               -
               CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                      ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
               / NULLIF(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END), 0)
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY user_id
        """
    ).fetchall()
    d = np.array([r[0] for r in cell if r[0] is not None])
    d = d[d != 0]
    ad = np.abs(d)
    order = np.argsort(ad, kind="stable")
    ranks = np.empty(len(ad))
    # average ranks over ties
    sorted_ad = ad[order]
    i = 0
    while i < len(sorted_ad):
        j = i
        while j < len(sorted_ad) and sorted_ad[j] == sorted_ad[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n = len(d)
    w_plus = ranks[d > 0].sum()
    _, t_counts = np.unique(ad, return_counts=True)
    ties = float((t_counts.astype(np.int64) ** 3 - t_counts).sum())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / np.sqrt(var)

    row = stat_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    assert row.n_pairs == n
    assert abs(row.w_plus - w_plus) < 1e-6, (row.w_plus, w_plus)
    assert abs(row.z - z) < 1e-6, (row.z, z)


def test_theil_sen_matches_numpy_median(spark, duck, sf_dir):
    """The reported slope must equal numpy's median of all pairwise
    slopes of the daily series, per event type."""
    import numpy as np

    from gpu_database_spark.operators.behavior import timeseries_theil_sen

    daily = duck.execute(
        """
        SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[tuple[int, float]]] = {}
    for et, day, v in daily:
        series.setdefault(et, []).append((day, v))
    got = {r.event_type: r for r in timeseries_theil_sen(spark, sf_dir).collect()}
    for et, pts in series.items():
        slopes = [
            (v2 - v1) / (d2 - d1)
            for i, (d1, v1) in enumerate(pts)
            for (d2, v2) in pts[i + 1:]
        ]
        s = np.sort(np.array(slopes))
        m = len(s)
        med = (s[(m - 1) // 2] + s[m // 2]) / 2.0
        assert got[et].n_pairs == m
        assert abs(got[et].theil_sen_slope - med) < 1e-7, (et, med)


def test_ljung_box_matches_numpy(spark, duck, sf_dir):
    """Q must equal n(n+2) * Sigma rho_k^2/(n-k) with rho_k the
    per-lag Pearson autocorrelation of the hourly count series."""
    import numpy as np

    from gpu_database_spark.operators.behavior import timeseries_ljung_box

    hourly = duck.execute(
        """
        SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
               CAST(COUNT(*) AS DOUBLE)
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for et, _, v in hourly:
        series.setdefault(et, []).append(v)
    got = {r.event_type: r for r in timeseries_ljung_box(spark, sf_dir).collect()}
    for et, vs in series.items():
        v = np.array(vs)
        n = len(v)
        q = 0.0
        for k in (1, 2, 3):
            rho = np.corrcoef(v[:-k], v[k:])[0, 1]
            q += rho * rho / (n - k)
        q *= n * (n + 2)
        assert got[et].n == n
        assert abs(got[et].q_stat - q) < 1e-4, (et, got[et].q_stat, q)


def test_runs_test_matches_python_replica(spark, duck, sf_dir):
    """Run count, expectation and z must match a direct replay of the
    daily above/below-mean sign sequence."""
    import math as pymath

    from gpu_database_spark.operators.stattests import stat_runs_test

    daily = duck.execute(
        """
        SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for et, _, v in daily:
        series.setdefault(et, []).append(v)
    got = {r.event_type: r for r in stat_runs_test(spark, sf_dir).collect()}
    for et, vs in series.items():
        # engines sum DECIMAL(27,6) casts of the doubles; replicate by
        # quantizing each double at 6dp before the exact sum
        from decimal import Decimal

        mu = float(sum(Decimal(f"{x:.6f}") for x in vs)) / len(vs)
        signs = [1 if x > mu else 0 for x in vs if x != mu]
        runs = sum(
            1 for i, sg in enumerate(signs) if i == 0 or sg != signs[i - 1]
        )
        n1, n2 = sum(signs), len(signs) - sum(signs)
        e_r = 1 + 2.0 * n1 * n2 / (n1 + n2)
        var = (
            2.0 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2)
            / (n1 + n2 - 1)
        )
        z = (runs - e_r) / pymath.sqrt(var)
        assert got[et].n_runs == runs, (et, got[et].n_runs, runs)
        assert got[et].n_above == n1 and got[et].n_below == n2
        assert abs(got[et].z - z) < 1e-5, (et, got[et].z, z)


def test_wilcoxon_rank_windows_are_bucketed(spark, sf_dir):
    """stat_wilcoxon_signed_rank's |d| prefix sums must partition by
    the value bucket — never a global window over the user-count-
    sized difference stream."""
    from gpu_database_spark.operators.stattests import (
        stat_wilcoxon_signed_rank,
    )
    from gpu_database_spark.plans import inspect

    plan = inspect.simple_plan(stat_wilcoxon_signed_rank(spark, sf_dir))
    heavy = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(ad#" in ln and "_bkt" not in ln
    ]
    assert not heavy, f"unbucketed |d| window: {heavy}"
    assert "_bkt" in plan


def test_cross_correlation_is_single_scan(spark, sf_dir):
    """Both daily series must come out of ONE conditional-aggregate
    pass over events — not one scan per series."""
    from gpu_database_spark.operators.behavior import (
        timeseries_cross_correlation,
    )
    from gpu_database_spark.plans import inspect

    plan = inspect.simple_plan(timeseries_cross_correlation(spark, sf_dir))
    assert plan.count("Scan parquet") <= 1, plan


def test_cochran_q_matches_python_replica(spark, duck, sf_dir):
    """Q must match a direct replay over the informative last-day
    incidence blocks."""
    from gpu_database_spark.operators.stattests import stat_cochran_q

    rows = duck.execute(
        """
        WITH last_day AS (
            SELECT MAX(epoch_ns(ts) // 86400000000000) AS d FROM events
        )
        SELECT DISTINCT user_id, event_type
        FROM events CROSS JOIN last_day
        WHERE epoch_ns(ts) // 86400000000000 = d
        """
    ).fetchall()
    k = duck.execute(
        "SELECT COUNT(DISTINCT event_type) FROM events"
    ).fetchone()[0]
    by_user: dict[int, set] = {}
    for u, t in rows:
        by_user.setdefault(u, set()).add(t)
    blocks = {u: ts for u, ts in by_user.items() if 0 < len(ts) < k}
    n = sum(len(ts) for ts in blocks.values())
    r2 = sum(len(ts) ** 2 for ts in blocks.values())
    cj: dict[str, int] = {}
    for ts in blocks.values():
        for t in ts:
            cj[t] = cj.get(t, 0) + 1
    c2 = sum(v * v for v in cj.values())
    q = (k - 1) * (k * c2 - n * n) / (k * n - r2)
    row = stat_cochran_q(spark, sf_dir).collect()[0]
    assert row.n_blocks == len(blocks)
    assert abs(row.cochran_q - q) < 1e-6, (row.cochran_q, q)


def test_bartlett_matches_numpy(spark, duck, sf_dir):
    """The Bartlett statistic must match a numpy replica from raw
    per-group samples (up to the engines' 6dp term quantization)."""
    import math as pymath

    import numpy as np

    from gpu_database_spark.operators.stattests import stat_bartlett_test

    rows = duck.execute("SELECT event_type, value FROM events").fetchall()
    groups: dict[str, list[float]] = {}
    for t, v in rows:
        groups.setdefault(t, []).append(v)
    k = len(groups)
    nn = sum(len(g) for g in groups.values())
    ssq_within = sum(
        float(np.var(np.array(g), ddof=0)) * len(g) for g in groups.values()
    )
    sum_ln = sum(
        (len(g) - 1) * pymath.log(float(np.var(np.array(g), ddof=1)))
        for g in groups.values()
    )
    sum_inv = sum(1.0 / (len(g) - 1) for g in groups.values())
    b = ((nn - k) * pymath.log(ssq_within / (nn - k)) - sum_ln) / (
        1 + (sum_inv - 1.0 / (nn - k)) / (3 * (k - 1))
    )
    row = stat_bartlett_test(spark, sf_dir).collect()[0]
    assert row.k_groups == k and row.n == nn
    assert abs(row.bartlett_stat - b) < 1e-3, (row.bartlett_stat, b)


def test_funnel_time_constrained_tightens_unconstrained(spark, sf_dir):
    """Window-constrained step counts can never exceed the
    unconstrained funnel's, and the conversion rates must be
    consistent with the counts."""
    from gpu_database_spark.operators.analytics import (
        events_funnel_time_constrained,
        funnel_view_click_purchase,
    )

    tc = events_funnel_time_constrained(spark, sf_dir).collect()[0]
    un = funnel_view_click_purchase(spark, sf_dir).collect()[0]
    assert tc.step_view == un.step_view
    assert tc.step_click_1h <= un.step_click
    assert tc.step_purchase_24h <= tc.step_click_1h
    assert abs(
        tc.view_to_click_rate - round(tc.step_click_1h / tc.step_view, 6)
    ) < 1e-9


def test_bpe_train_matches_python_reference(spark, duck, sf_dir):
    """The learned merge table must equal a pure-Python reference BPE
    trainer's, round for round, on the same word frequencies."""
    from gpu_database_spark.llm.textstats import (
        BPE_ROUNDS,
        text_bpe_train_merges,
    )

    rows = duck.execute(
        r"""
        SELECT w, COUNT(*) FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        ) WHERE length(w) BETWEEN 2 AND 20 GROUP BY w
        """
    ).fetchall()
    syms = {w: list(w) for w, _ in rows}
    freq = dict(rows)
    expected = []
    for rank in range(1, BPE_ROUNDS + 1):
        counts: dict[tuple, int] = {}
        for w, s in syms.items():
            f = freq[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, l, r, l + r, cnt))
        for w, s in syms.items():
            out = []
            for tok in s:
                if out and out[-1] == l and tok == r:
                    out[-1] = l + r
                else:
                    out.append(tok)
            syms[w] = out
    got = [tuple(x) for x in text_bpe_train_merges(spark, sf_dir).collect()]
    assert got == expected, (got[:3], expected[:3])


def test_profile_drift_handles_one_sided_types(spark, tmp_path):
    """A type present in only one half must yield NULL stats and a
    TRUE drift verdict in both engines (Spark runs ANSI — an
    unguarded /0 would throw where DuckDB yields NULL)."""
    import duckdb

    from gpu_database_spark import registry
    from gpu_database_spark.operators.dataquality import dq_profile_drift
    from tests.oracle_utils import assert_query_matches_oracle

    rows = [
        # 'legacy' only in the first half; 'launch' only in the second
        (1, _ts(0), 1, "legacy", 5.0, "{}"),
        (2, _ts(1), 2, "legacy", 7.0, "{}"),
        (3, _ts(100), 1, "steady", 1.0, "{}"),
        (4, _ts(900), 1, "steady", 1.0, "{}"),
        (5, _ts(998), 3, "launch", 2.0, "{}"),
        (6, _ts(999), 4, "launch", 4.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in dq_profile_drift(spark, sf_dir).collect()}
    assert got["legacy"].n_b == 0 and got["legacy"].mean_b is None
    assert got["legacy"].drifted is True
    assert got["launch"].n_a == 0 and got["launch"].volume_ratio is None
    assert got["launch"].drifted is True
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'events.parquet')}/*.parquet')"
    )
    sql = registry.oracle_sql()["dq_profile_drift"]
    assert_query_matches_oracle(
        dq_profile_drift(spark, sf_dir), con, sql, name="drift_one_sided"
    )
    con.close()
