"""Invariant tests for the round-5 operators, beyond the DuckDB parity
gate (tests/test_oracle_parity.py covers value-exactness; these pin the
semantic properties a hash compare can't explain on failure)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_database_spark import registry


def _q(name):
    return registry.queries()[name]


def test_scd2_intervals_partition_timeline(spark, sf_dir):
    """Per user: intervals are disjoint, contiguous (next valid_from =
    prev valid_to + 1), and exactly one open (is_current) row exists."""
    rows = _q("scd2_user_history")(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from_day)
        assert sum(1 for r in ivs if r.is_current) == 1, user
        assert ivs[-1].is_current and ivs[-1].valid_to_day == 99999, user
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to_day == b.valid_from_day - 1, (user, a, b)


def test_ks_same_distribution_is_small(spark, sf_dir):
    """KS of a sample against itself must be 0; the registered query's
    D must lie in [0, 1] and agree with its drift flag."""
    r = _q("stat_ks_test")(spark, sf_dir).collect()[0]
    assert 0.0 <= r.d_stat <= 1.0
    assert r.drifted == (r.d_stat > r.critical_05)
    assert r.n1 > 0 and r.n2 > 0


def test_asof_tolerance_staleness_rule(spark, sf_dir):
    """Every stale row in join_asof_tolerance is exactly a row whose
    prevailing (no-tolerance) match is older than the tolerance — or
    has no match at all."""
    tol = _q("join_asof_tolerance")(spark, sf_dir)
    prev = _q("join_asof_prevailing")(spark, sf_dir)
    t = {r.o_orderkey: r for r in tol.collect()}
    p = {r.o_orderkey: r for r in prev.collect()}
    assert set(t) == set(p)
    n_stale = sum(1 for r in t.values() if r.is_stale)
    assert 0 < n_stale < len(t)  # fixture straddles the tolerance
    for k, r in t.items():
        if not r.is_stale:
            assert r.fx_rate == p[k].fx_rate, k


def test_ivm_delta_join_equals_full_recompute(spark, sf_dir):
    """The delta-rule output must equal J_new - J_old computed naively
    (per-segment counts of the full joins)."""
    from gpu_database_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    old = (
        o.filter(F.col("o_orderkey") % 10 != 0)
        .join(
            c.filter(F.col("c_custkey") % 13 != 0),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .count()
    )
    new = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .count()
    )
    old_n = {r.c_mktsegment: r["count"] for r in old.collect()}
    new_n = {r.c_mktsegment: r["count"] for r in new.collect()}
    delta = {
        r.c_mktsegment: r.n_delta_rows
        for r in _q("ivm_delta_join")(spark, sf_dir).collect()
    }
    for seg, n in delta.items():
        assert n == new_n[seg] - old_n.get(seg, 0), seg


def test_watermark_audit_counts_match_replay(spark, sf_dir):
    """n_late recomputed with a driver-side replay of one event type
    matches the distributed high-water computation."""
    from gpu_database_spark.sources.catalog import load_table

    out = {r.event_type: r for r in _q("stream_watermark_audit")(spark, sf_dir).collect()}
    etype = sorted(out)[0]
    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == etype)
        .select("event_id", "ts_ns")
        .orderBy("event_id")
        .collect()
    )
    hw, late = 0, 0
    for r in rows:
        hw = max(hw, r.ts_ns)
        if hw - r.ts_ns > 2 * 3600 * 1_000_000_000:
            late += 1
    assert out[etype].n_late == late
    assert out[etype].n_events == len(rows)


def test_compaction_groups_respect_target(spark, sf_dir):
    """Each compaction group's size stays within target + max single
    file (greedy first-fit bound) and groups tile the file list."""
    rows = _q("layout_compaction_planner")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.group_rows <= 8 + 5  # COMPACT_TARGET + max file size
        assert r.first_file <= r.last_file
    total_files = sum(r.n_files for r in rows)
    assert total_files == 25  # every nation row planned exactly once


def test_dedup_ngram_spans_flags_planted_duplicate(spark, sf_dir):
    """Docs sharing an 8-word span are flagged with dup_ratio > 0 and
    exact-duplicate docs (same text) get dup_ratio 1.0."""
    import duckdb

    con = duckdb.connect()
    dups = con.execute(
        f"""SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')
            WHERE text IN (SELECT text FROM read_parquet('{sf_dir}/documents.parquet')
                           GROUP BY text HAVING COUNT(*) >= 2)
              AND len(string_split_regex(trim(text), '\\s+')) >= 8"""
    ).fetchall()
    flagged = {
        r.doc_id: r.dup_ratio
        for r in _q("dedup_ngram_spans")(spark, sf_dir).collect()
    }
    for (doc_id,) in dups:
        assert flagged.get(doc_id) == 1.0, doc_id
    con.close()
