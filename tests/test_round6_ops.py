"""Invariant tests for the round-6 operators, beyond the DuckDB parity
gate (tests/test_oracle_parity.py covers value-exactness; these pin the
semantic properties a hash compare can't explain on failure)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gpu_database_spark import registry


def _q(name):
    return registry.queries()[name]


# ---------------------------------------------------------------- semdedup


def test_semdedup_families_match_unionfind(spark, sf_dir):
    """The family census must equal a serial union-find over the SAME
    thresholded kNN edge set: family ids are min-members, counts and
    char sums agree per family."""
    from gpu_database_spark.llm.dedup import N_HASHES, SEM_MIN_MATCH

    edges = (
        _q("text_knn_graph")(spark, sf_dir)
        .filter(F.col("est_jaccard") * N_HASHES >= SEM_MIN_MATCH)
        .collect()
    )
    assert edges, "fixture should produce thresholded kNN edges"
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r in edges:
        union(r.doc_id, r.neighbor_id)
    fams: dict[int, set[int]] = {}
    for x in list(parent):
        fams.setdefault(find(x), set()).add(x)
    fams = {k: v for k, v in fams.items() if len(v) >= 2}

    from gpu_database_spark.sources.catalog import load_table

    chars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    got = {r.family_id: r for r in _q("semdedup_pipeline")(spark, sf_dir).collect()}
    assert set(got) == set(fams)
    for fid, members in fams.items():
        assert fid == min(members)
        assert got[fid].n_members == len(members)
        assert got[fid].n_removed == len(members) - 1
        assert got[fid].chars_removed == sum(chars[m] for m in members if m != fid)


# ------------------------------------------------------------- stat tests


def test_welch_ttest_matches_numpy(spark, sf_dir):
    """t statistic and Welch df agree with a direct numpy computation
    on the collected samples (sample variance, ddof=1)."""
    import numpy as np

    from gpu_database_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    a = np.array([r.value for r in e if r.event_type == "view"])
    b = np.array([r.value for r in e if r.event_type == "purchase"])
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se2 = v1 / len(a) + v2 / len(b)
    t_exp = (a.mean() - b.mean()) / math.sqrt(se2)
    df_exp = se2 * se2 / (
        (v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1)
    )
    r = _q("stat_welch_ttest")(spark, sf_dir).collect()[0]
    assert r.n1 == len(a) and r.n2 == len(b)
    assert abs(r.t_stat - t_exp) < 1e-4
    assert abs(r.welch_df - df_exp) < 0.5
    assert r.significant_05 == (abs(t_exp) > 1.96)


def test_chi2_matches_numpy(spark, sf_dir):
    """chi2 agrees with the direct contingency-table formula."""
    from collections import Counter

    from gpu_database_spark.sources.catalog import load_table

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).collect()
    obs = Counter((r.o_orderstatus, r.o_orderpriority) for r in rows)
    rt = Counter()
    ct = Counter()
    for (s, p), c in obs.items():
        rt[s] += c
        ct[p] += c
    n = sum(obs.values())
    chi2 = sum(
        (c - rt[s] * ct[p] / n) ** 2 / (rt[s] * ct[p] / n) for (s, p), c in obs.items()
    )
    r = _q("stat_chi2_independence")(spark, sf_dir).collect()[0]
    assert r.n == n
    assert r.dof == (len(rt) - 1) * (len(ct) - 1)
    assert abs(r.chi2 - chi2) < 1e-4


# -------------------------------------------------------------- bloom join


def test_bloom_prefilter_equals_plain_semijoin(spark, sf_dir):
    """The bloom prefilter must be semantically invisible: output equals
    the plain exact semi-join aggregate."""
    from gpu_database_spark.functions.compat import dsum
    from gpu_database_spark.sources.catalog import load_table

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    plain = (
        l.join(urgent, l.l_orderkey == urgent.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    got = _q("join_bloom_prefilter")(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in plain]


def test_bloom_prefilter_plan_broadcasts_both_sides(spark, sf_dir):
    """Neither join may shuffle the fact table: two broadcast semi
    joins, no sort-merge/shuffled-hash join anywhere."""
    from gpu_database_spark.plans import inspect

    df = _q("join_bloom_prefilter")(spark, sf_dir)
    plan = inspect.simple_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert not inspect.has_shuffle_join(df), plan


# --------------------------------------------------------------------- cdc


def test_cdc_apply_matches_serial_fold(spark, sf_dir):
    """Applying the changelog serially in ts order per key must produce
    the same final state."""
    from gpu_database_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_ns", "value"
    ).collect()
    state: dict[int, tuple] = {}
    counts: dict[int, int] = {}
    for r in sorted(ev, key=lambda r: (r.ts_ns, r.event_id)):
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
        if r.event_id % 10 == 0:
            state.pop(r.user_id, None)
        else:
            state[r.user_id] = (r.value, r.ts_ns)
    got = {r.user_id: r for r in _q("cdc_apply_changelog")(spark, sf_dir).collect()}
    assert set(got) == set(state)
    for uid, (val, ts) in state.items():
        assert got[uid].current_value == val
        assert got[uid].updated_at_ns == ts
        assert got[uid].n_changes == counts[uid]


# -------------------------------------------------------------- containment


def test_containment_bounds_and_relation_to_intersection(spark, sf_dir):
    """0 <= containment <= 1; n_common <= min(|A|,|B|); the two
    directions reconstruct the same intersection; is_contained matches
    the threshold rule."""
    from gpu_database_spark.llm.dedup import CONTAIN_THRESHOLD

    rows = _q("dedup_containment")(spark, sf_dir).collect()
    assert rows
    assert any(r.is_contained for r in rows), "fixture has near-contained pairs"
    for r in rows:
        assert 0 <= r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 <= r.contain_a_in_b <= 1.0
        assert 0.0 <= r.contain_b_in_a <= 1.0
        assert abs(r.contain_a_in_b * r.n_a - r.n_common) < 1e-4
        assert abs(r.contain_b_in_a * r.n_b - r.n_common) < 1e-4
        assert r.is_contained == (
            r.n_common / r.n_a >= CONTAIN_THRESHOLD
            or r.n_common / r.n_b >= CONTAIN_THRESHOLD
        )


# --------------------------------------------------------------- surprisal


def test_unigram_surprisal_matches_serial_lm(spark, sf_dir):
    """Per-doc mean NLL agrees with a serial unigram LM built from the
    same whitespace tokenization."""
    from collections import Counter

    from gpu_database_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.strip().split() for r in docs}
    vocab = Counter(w for ws in toks.values() for w in ws)
    total = sum(vocab.values())
    got = {r.doc_id: r for r in _q("text_unigram_surprisal")(spark, sf_dir).collect()}
    assert set(got) == set(toks)
    for doc_id, ws in list(toks.items())[:50]:
        exp = sum(-math.log(vocab[w] / total) for w in ws) / len(ws)
        assert got[doc_id].n_tokens == len(ws)
        assert abs(got[doc_id].mean_nll - exp) < 1e-4, doc_id


def test_surprisal_rare_tokens_score_higher(spark, sf_dir):
    """Sanity: a doc made of hapax tokens must outscore a doc made of
    the corpus's most common token (monotonicity of the score)."""
    rows = _q("text_unigram_surprisal")(spark, sf_dir).collect()
    scores = [r.mean_nll for r in rows]
    assert max(scores) > min(scores) > 0
