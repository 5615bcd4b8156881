"""Round-9 serial-replica tests: every new operator's math checked
against an independent driver-side Python/numpy implementation on the
collected fixture (the DuckDB oracle proves cross-engine parity; these
prove both engines compute the RIGHT statistic)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_jarque_bera_matches_numpy_moments(spark, sf_dir):
    """Skewness/kurtosis/JB must equal the textbook population-moment
    formulas computed by numpy on the collected cent values."""
    import numpy as np

    from gpu_database_spark.operators.stattests import stat_jarque_bera
    from gpu_database_spark.sources.catalog import load_table

    vals = np.array(
        [
            r.c
            for r in load_table(spark, sf_dir, "events")
            .select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
            .collect()
        ],
        dtype=np.float64,
    )
    n = len(vals)
    m = vals.mean()
    v = ((vals - m) ** 2).mean()
    sk = ((vals - m) ** 3).mean() / v**1.5
    ku = ((vals - m) ** 4).mean() / v**2
    jb = n / 6 * (sk**2 + (ku - 3) ** 2 / 4)

    row = stat_jarque_bera(spark, sf_dir).collect()[0]
    assert row.n == n
    assert row.skewness == pytest.approx(sk, abs=2e-6)
    assert row.kurtosis == pytest.approx(ku, abs=2e-6)
    assert row.jb_stat == pytest.approx(jb, rel=1e-5)


def test_regression_eval_matches_numpy(spark, sf_dir):
    """RMSE/MAE/MAPE/R2 against numpy on the collected (y, yhat)."""
    import numpy as np

    from gpu_database_spark.llm.features import ml_eval_regression
    from gpu_database_spark.sources.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.expr("l_extendedprice * (1 - l_discount) * (1 + l_tax)").alias(
                "y"
            ),
            F.col("l_extendedprice").alias("yhat"),
        )
        .collect()
    )
    y = np.array([r.y for r in rows])
    yhat = np.array([r.yhat for r in rows])
    res = y - yhat
    r = ml_eval_regression(spark, sf_dir).collect()[0]
    assert r.n == len(y)
    assert r.rmse == pytest.approx(float(np.sqrt((res**2).mean())), rel=1e-9)
    assert r.mae == pytest.approx(float(np.abs(res).mean()), rel=1e-9)
    # APE terms quantize at 6dp in the exact-sum discipline; x100
    # scaling puts the worst-case mean quantization near 5e-5
    assert r.mape_pct == pytest.approx(
        float(100 * np.abs(res / y).mean()), abs=1e-4
    )
    ss_res = float((res**2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert r.r2 == pytest.approx(1 - ss_res / ss_tot, abs=1e-6)


def test_mrr_matches_python_replica(spark, sf_dir):
    """MRR/recall@k/precision@k against a dict-and-sort replica."""
    from gpu_database_spark.llm.features import MRR_K, MRR_REL_BAL, ml_eval_mrr
    from gpu_database_spark.sources.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_acctbal", "c_custkey")
        .collect()
    )
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r.c_nationkey, []).append(r)
    rrs, recs, precs = [], [], []
    for members in groups.values():
        members.sort(key=lambda r: (-r.c_acctbal, -r.c_custkey))
        rel = [r.c_acctbal > MRR_REL_BAL for r in members]
        n_rel = sum(rel)
        if n_rel == 0:
            continue
        first = rel.index(True) + 1
        hits = sum(rel[:MRR_K])
        rrs.append(round(1.0 / first, 8))
        recs.append(round(hits / n_rel, 8))
        precs.append(round(hits / MRR_K, 8))
    got = ml_eval_mrr(spark, sf_dir).collect()[0]
    assert got.n_groups == len(rrs)
    assert got.mrr == pytest.approx(sum(rrs) / len(rrs), abs=1e-6)
    assert got.recall_at_k == pytest.approx(sum(recs) / len(recs), abs=1e-6)
    assert got.precision_at_k == pytest.approx(
        sum(precs) / len(precs), abs=1e-6
    )


def test_pacf_matches_durbin_levinson(spark, sf_dir):
    """PACF lags 1-3 against a numpy Durbin-Levinson on the same
    hourly series (same autocovariance estimator, same mean)."""
    import numpy as np

    from gpu_database_spark.operators.behavior import timeseries_pacf
    from gpu_database_spark.sources.catalog import load_table

    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.expr("ts_ns div 3600000000000").alias("h"))
        .agg(F.avg("value").alias("v"))
        .orderBy("event_type", "h")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append(r.v)
    got = {r.event_type: r for r in timeseries_pacf(spark, sf_dir).collect()}
    for et, vs in series.items():
        x = np.array(vs)
        m = x.mean()
        d = x - m
        gam = [float((d[k:] * d[: len(d) - k]).sum()) for k in range(4)]
        r1, r2, r3 = gam[1] / gam[0], gam[2] / gam[0], gam[3] / gam[0]
        phi11 = r1
        phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
        phi21 = phi11 - phi22 * phi11
        v2 = (1 - r1 * r1) * (1 - phi22 * phi22)
        phi33 = (r3 - phi21 * r2 - phi22 * r1) / v2
        row = got[et]
        assert row.pacf1 == pytest.approx(phi11, abs=5e-5), et
        assert row.pacf2 == pytest.approx(phi22, abs=5e-5), et
        assert row.pacf3 == pytest.approx(phi33, abs=5e-5), et


def test_survival_km_matches_product_limit(spark, sf_dir):
    """S(t) against a literal product-limit fold over the collected
    per-user lifetimes, and structural invariants (monotone
    non-increasing, censored users never counted as deaths)."""
    from gpu_database_spark.operators.behavior import (
        KM_CENSOR_DAYS,
        cohort_survival_km,
    )
    from gpu_database_spark.sources.catalog import load_table

    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("MIN(ts_ns div 86400000000000)").alias("fd"),
            F.expr("MAX(ts_ns div 86400000000000)").alias("ld"),
        )
        .collect()
    )
    horizon = max(r.ld for r in per_user)
    lifetimes = [
        (r.ld - r.fd + 1, r.ld <= horizon - KM_CENSOR_DAYS) for r in per_user
    ]
    times = sorted({t for t, _ in lifetimes})
    at_risk = len(lifetimes)
    s = 1.0
    expect = {}
    for t in times:
        d = sum(1 for tt, ch in lifetimes if tt == t and ch)
        c = sum(1 for tt, ch in lifetimes if tt == t and not ch)
        if d > 0:
            s *= 1 - d / at_risk
        expect[t] = (at_risk, d, c, s)
        at_risk -= d + c
    got = cohort_survival_km(spark, sf_dir).collect()
    prev = 1.0
    for row in got:
        n_risk, d, c, s_exp = expect[row.t_days]
        assert row.n_at_risk == n_risk
        assert row.n_churned == d and row.n_censored == c
        assert row.survival == pytest.approx(s_exp, abs=2e-4)
        assert row.survival <= prev + 1e-9  # monotone non-increasing
        prev = row.survival


def test_assortativity_matches_numpy_corrcoef(spark, sf_dir):
    """Edge-wise (out-degree, in-degree) Pearson against numpy."""
    import numpy as np

    from gpu_database_spark.llm.graphrank import (
        graph_degree_assortativity,
        synth_edges,
    )
    from gpu_database_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    edges = synth_edges(d).collect()
    outd: dict[int, int] = {}
    ind: dict[int, int] = {}
    for e in edges:
        outd[e.src] = outd.get(e.src, 0) + 1
        ind[e.dst] = ind.get(e.dst, 0) + 1
    xs = np.array([outd[e.src] for e in edges], dtype=float)
    ys = np.array([ind[e.dst] for e in edges], dtype=float)
    r = graph_degree_assortativity(spark, sf_dir).collect()[0]
    assert r.n_edges == len(edges)
    assert r.assortativity == pytest.approx(
        float(np.corrcoef(xs, ys)[0, 1]), abs=2e-6
    )


def test_js_divergence_matches_dict_replica(spark, sf_dir):
    """JSD against a pure-python two-distribution fold; bounds check
    (0 <= JSD <= 1 bit) and the zero-term convention."""
    from gpu_database_spark.llm.textstats import text_js_divergence
    from gpu_database_spark.sources.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.lower(F.trim("text")).alias("t"))
        .collect()
    )
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for r in rows:
        grp = ca if int(r.source[3:]) % 2 == 0 else cb
        for w in r.t.split(" "):
            grp[w] = grp.get(w, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for w in set(ca) | set(cb):
        p, q = ca.get(w, 0) / na, cb.get(w, 0) / nb
        m2 = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log2(p / m2)
        if q > 0:
            jsd += 0.5 * q * math.log2(q / m2)
    got = text_js_divergence(spark, sf_dir).collect()[0]
    assert got.n_tokens_a == na and got.n_tokens_b == nb
    assert got.vocab_union == len(set(ca) | set(cb))
    assert 0.0 <= got.js_divergence <= 1.0
    assert got.js_divergence == pytest.approx(jsd, abs=2e-5)


def test_burstiness_function_words_rank_low(spark, sf_dir):
    """Sanity on the statistic itself: VMR = s2/tot - tot/N against a
    dict replica, and the computed values must be non-negative."""
    from gpu_database_spark.llm.textstats import (
        BURST_MIN_TOTAL,
        text_burstiness,
    )
    from gpu_database_spark.sources.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select(F.lower(F.trim("text")).alias("t"))
        .collect()
    )
    n_docs = len(rows)
    per_word: dict[str, list[int]] = {}
    for r in rows:
        counts: dict[str, int] = {}
        for w in r.t.split(" "):
            counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            per_word.setdefault(w, []).append(c)
    got = text_burstiness(spark, sf_dir).collect()
    assert got, "burstiness report empty"
    for row in got:
        cs = per_word[row.w]
        tot = sum(cs)
        s2 = sum(c * c for c in cs)
        assert tot >= BURST_MIN_TOTAL
        assert row.total_count == tot and row.doc_freq == len(cs)
        assert row.burstiness == pytest.approx(
            s2 / tot - tot / n_docs, abs=1e-5
        )
        # zero-inclusive variance/mean ratio is >= mean-free bound
        assert row.burstiness >= -1e-9


def test_inflight_concurrency_matches_interval_replica(spark, sf_dir):
    """Peak in-flight counts against a brute-force per-day interval
    containment count on the collected spans (the O(n*days) check the
    sweep-line avoids)."""
    from gpu_database_spark.operators.behavior import (
        timeseries_inflight_concurrency,
    )
    from gpu_database_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("s")
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("e"))
        .collect()
    )
    got = timeseries_inflight_concurrency(spark, sf_dir).collect()
    for row in got[:5]:  # brute-force the top days only (O(n) each)
        import datetime

        day = datetime.date.fromisoformat(row.day)
        # sweep-line convention: -1 lands ON the end day, so an
        # interval is "open" on `day` iff start <= day < end... the
        # prefix includes this day's -1, i.e. open = start <= day AND
        # end > day, PLUS same-day zero-length handled by net
        expect = sum(1 for r in spans if r.s <= day and r.e > day)
        # rows whose span both started and ended by `day` net to zero;
        # in_flight counts starts minus ends up to and including day
        starts = sum(1 for r in spans if r.s <= day)
        ends = sum(1 for r in spans if r.e <= day)
        assert row.in_flight == starts - ends
        assert row.in_flight <= expect + 1  # same-day spans boundary


def test_interarrival_mean_matches_replica(spark, sf_dir):
    """Bucketed gap census against a per-user sorted replica."""
    from gpu_database_spark.operators.behavior import events_interarrival
    from gpu_database_spark.sources.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts_ns", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts_ns, r.event_id))
    buckets: dict[int, list[int]] = {}
    for evs in by_user.values():
        evs.sort()
        for (t0, _), (t1, _) in zip(evs, evs[1:]):
            gap = (t1 - t0) // 1_000_000_000
            buckets.setdefault(len(str(gap)), []).append(gap)
    got = {r.magnitude: r for r in events_interarrival(spark, sf_dir).collect()}
    assert set(got) == set(buckets)
    for mag, gaps in buckets.items():
        row = got[mag]
        assert row.n_gaps == len(gaps)
        assert row.min_gap_s == min(gaps) and row.max_gap_s == max(gaps)
        assert row.mean_gap_s == pytest.approx(
            sum(gaps) / len(gaps), abs=1e-6
        )


def test_functional_deps_verdicts(spark, sf_dir):
    """Key-determined pairs must HOLD with zero violations; the
    many-to-many pairs must fail with consistent violation counts."""
    from gpu_database_spark.operators.dataquality import dq_functional_deps

    rows = {r.fd: r for r in dq_functional_deps(spark, sf_dir).collect()}
    assert rows["o_orderkey->o_custkey"].holds
    assert rows["o_orderkey->o_orderdate"].holds
    assert rows["o_orderkey->o_custkey"].n_violating_rows == 0
    # a status has several priorities on any non-trivial data
    assert not rows["o_orderstatus->o_orderpriority"].holds
    for r in rows.values():
        assert r.n_violating_values <= r.n_determinant_values
        assert (r.n_violating_values == 0) == bool(r.holds)


def test_power_sample_size_monotone_and_formula(spark, sf_dir):
    """Bigger lifts need fewer samples; spot-check the closed form."""
    from gpu_database_spark.operators.stattests import (
        _MDE_LIFTS,
        stat_power_sample_size,
    )

    rows = stat_power_sample_size(spark, sf_dir).collect()
    assert [r.lift for r in rows] == list(_MDE_LIFTS)
    sizes = [r.n_per_arm for r in rows]
    assert sizes == sorted(sizes, reverse=True)  # monotone decreasing
    r0 = rows[0]
    p = r0.baseline_rate
    p2 = p * (1 + r0.lift)
    za, zb = 1.959963985, 0.841621234
    f = za * math.sqrt(2 * p * (1 - p)) + zb * math.sqrt(
        p * (1 - p) + p2 * (1 - p2)
    )
    assert r0.n_per_arm == pytest.approx(
        math.ceil(f * f / ((p * r0.lift) ** 2)), abs=2
    )


def test_markov_stationary_matches_eigenvector(spark, sf_dir):
    """The 30-round power iteration must agree with the dominant left
    eigenvector of the transition matrix (numpy eig, normalized to
    sum 1) — and with the long-run flow balance pi = pi P."""
    import numpy as np

    from gpu_database_spark.operators.behavior import (
        markov_stationary_distribution,
    )

    rows = markov_stationary_distribution(spark, sf_dir).collect()
    states = [r.state for r in rows]
    pi = np.array([r.stationary_p for r in rows])
    assert pi.sum() == pytest.approx(1.0, abs=1e-6)

    # rebuild P from the same fixture through the sibling query
    from gpu_database_spark.operators.behavior import markov_event_transitions

    t = markov_event_transitions(spark, sf_dir).collect()
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for r in t:
        P[idx[r.cur], idx[r.nxt]] = r.p
    # dominant left eigenvector
    vals, vecs = np.linalg.eig(P.T)
    v = np.real(vecs[:, np.argmax(np.real(vals))])
    v = v / v.sum()
    assert np.abs(pi - v).max() < 1e-5
    # fixpoint property
    assert np.abs(pi @ P - pi).max() < 1e-5
