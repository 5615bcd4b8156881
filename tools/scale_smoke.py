#!/usr/bin/env python
"""Scaling smoke one decade above the sweep ladder.

Seven subsets: `--subset scan` (default, the scan-bound TPC-H/OLAP
headliners over fixtures/sf1.0 vs fixtures/sf10, collect-actioned),
`--subset llm` (the near-dup/similarity/text pipeline over the
constant-density fixtures/llm_sf1 vs fixtures/llm_sf10, noop-write
actioned — see LLM_BOUND below), and the `rank`, `graph`, `stream`,
`aria`, and `mm` families (noop-actioned; see their list comments).
Each writes its own SCALE_*_sf10.json artifact. Original scan-bound
rationale:

r10 VERDICT ask #3: the 100 TB story rested on plan-shape asserts and
the sf0.1 -> sf1.0 curve (3.0x wall for 10x data); superlinear tails
hide below that ladder's ceiling. This tool times the SCAN-BOUND
headline subset (TPC-H 22 + the join/agg/window/top-k shapes whose
cost is data volume, not fixed-size model math) at fixtures/sf10
(100 id-shifted copies of sf0.1 — 60M-row lineitem; build with
`python tools/make_sf1.py --copies 100 --name sf10`) AND at
fixtures/sf1.0 in the same session/flags, so the sf1->sf10 decade is
measured under identical conditions and each query gets a scaling
ratio, not just a wall time.

Writes SCALE_sf10.json at the repo root:

    {"subset": "scan-bound", "sf_small": ..., "sf_big": ...,
     "queries": {name: {"sec_sf1": s, "sec_sf10": s, "ratio": r}},
     "errors": {...}, "total_sf1": s, "total_sf10": s,
     "wall_ratio": r, "superlinear": [names with ratio > CAP]}

A ratio near 10 is linear; rows meaningfully above LINEAR_SLACK*10
are flagged (plan fix or a SCALING.md entry — never silently capped).
Spark-side timings only: no DuckDB oracle runs here (correctness at
sf1.0 is the parity sweep's job; this tool measures the ENGINE's
scaling).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "fixtures", "sf1.0")
SF10 = os.path.join(REPO, "fixtures", "sf10")
LLM_SF1 = os.path.join(REPO, "fixtures", "llm_sf1")
LLM_SF10 = os.path.join(REPO, "fixtures", "llm_sf10")

# Scan-bound subset: queries whose work grows with the fact tables.
# Deliberately excludes model-sized / iterative queries (PCA, BPE,
# pagerank, ANN index builds) whose cost is rounds or dimensions.
SCAN_BOUND = [
    # TPC-H, all 22 — the canonical scan/join/agg ladder
    *[f"q{i}_" for i in range(1, 23)],
    # joins
    "join_broadcast_dim",
    "join_skew_salted",
    "join_asof_prevailing",
    "join_interval_binned",
    "join_bloom_prefilter",
    # aggregates / windows / top-k
    "agg_distinct_exact",
    "agg_rollup",
    "agg_percentile_exact",
    "window_rank",
    "window_running_sum",
    "window_gap_islands",
    "topk_global",
    "topk_per_group",
    "topk_heavy_hitters_2pass",
    # scan-heavy text/dedup (single-pass shapes)
    "dedup_exact",
    "text_token_stats",
    "text_quality_score",
    "sessionize_lag_cumsum",
    "events_rfm_segmentation",
]

# LLM-family subset (--subset llm): the near-dup / similarity / text
# pipeline over documents+embeddings — the training-data-curation core
# of the engine. Runs against fixtures/llm_sf1 vs fixtures/llm_sf10
# (build with `tools/make_sf1.py --llm-distinct`): CONSTANT-DENSITY
# copies (word-bijection doc tags, per-copy orthogonal sign-flips of
# embeddings) so candidate-pair counts grow ~linearly with volume and
# the decade ratio measures the engine, not a fixture's clone
# pathology (measured LSH pair expansions: 13,323 at 10 copies ->
# 131,546 at 100 — 9.9x for 10x rows). Excludes model-sized /
# iterative queries (PCA, BPE trainer, recall report) per the same
# rule as SCAN_BOUND; er_fuzzy_match runs over the unmodified `part`
# copies — 100x name clones — deliberately, as the clone-collapse
# stress row. Pair-level outputs reach ~1M rows at 100 copies, so
# this subset executes plans via a `noop`-format write (full plan,
# no driver transfer) instead of collect().
LLM_BOUND = [
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_lsh_pairs",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_url_canonicalize",
    "dedup_passage_exact",
    "dedup_ngram_spans",
    "dedup_decontaminate",
    "dedup_decontaminate_ngram",
    "text_ngram_novelty",  # lang-census novelty (dedup.py) — gram-keyed groupBy-min
    "semdedup_pipeline",
    "sim_norms",
    "sim_topk_cosine",
    "sim_pairs_blocked",
    "sim_maxsim_multivector",
    "sim_ann_lsh",
    # round-12 second half: the composed index + its exact-reranked
    # production layout and the bounded-output pair contract — their
    # corpus-side costs (centroid assignment, PQ encode, ADC over
    # probed lists, shortlist fetch) are data-bound, so the decade
    # measures them; the KMeans/Lloyd trainer runs once per session
    # and is the same fixed-size model both sides of the decade.
    "sim_ann_ivf_pq",
    "sim_ann_ivf_pq_rerank",
    "sim_pairs_topk",
    "embed_quantize_int8",
    "text_lang_id",
    "text_fingerprint",
    "text_winnowing",
    "text_tfidf_top_terms",
    "text_inverted_index",
    "text_bm25_search",
    "text_repetition_filter",
    "text_compression_ratio",
    "text_dsir_weights",
    "er_fuzzy_match",
]

# Rank/stat subset (--subset rank, r11 VERDICT ask #6): the queries
# built on the grouped/bucketed histogram-rank plans and one-pass
# sufficient-statistic folds — the family the round-11 rank-frame and
# multi-consumer-materialization fixes touched (RFM 8.4->3.7s, spearman
# 51.6->37.0s at sf10, measured informally then; this subset pins the
# decade as a committed artifact so the next rank-plan regression is
# caught the way join_interval_binned's was). Outputs are mostly tiny
# census tables, but feat_quantile_normalize / window_percentiles emit
# per-row results — so the subset runs noop-write actioned like llm.
RANK_BOUND = [
    "stat_spearman_rho",
    "stat_mannwhitney_u",
    "stat_kruskal_wallis",
    "stat_wilcoxon_signed_rank",
    "stat_gini_concentration",
    "stat_robust_means",
    "stat_brown_forsythe",
    "stat_friedman_test",
    "stat_exact_quantiles_distributed",
    "ml_eval_auc",
    "ml_eval_auc_grouped",
    "ml_eval_ndcg",
    "ml_eval_average_precision",
    "ml_lift_deciles",
    "feat_quantile_normalize",
    "feat_scale_robust",
    "window_percentiles",
    "agg_weighted_median",
    "pareto_abc_classification",
    "events_rfm_segmentation",
]

# Graph subset (--subset graph, round 12): the iterative Pregel-style
# loops (pagerank, HITS, k-core, LPA, BFS hops) plus the neighborhood
# joins (triangles, Adamic-Adar, Jaccard, clustering coefficient) and
# the markov chain pair. The synthetic link graph draws N_LINKS
# md5-derived out-edges per document over the whole id space, so edges
# grow linearly with documents at constant degree — iteration counts
# are fixed (pagerank/HITS) or grow ~log n (k-core/LPA/BFS), so every
# row should land near-linear; density-quadratic neighborhood
# intermediates (the join_interval_binned failure mode) would surface
# here as ratio >> 10. Outputs are top-k/censuses but LPA emits
# per-node labels — noop-write actioned like llm/rank.
#
# Fixture caveat (honest accounting): the id-SHIFTED copies leave gaps
# in the doc_id space (50k docs over a 95k id range at sf1.0), and
# synth_edges draws dst = md5 % (max_id+1) — the symmetric graph is
# ~25% thinner than on the dense-id testdata ladder, so the k=4 core
# empties (graph_kcore rows 0->0 here, non-empty at every testdata
# SF). The peel COST is still real — 12 rounds over the full round-0
# edge set — so the decade ratio stands; the non-vacuous output
# evidence for kcore lives on the testdata ladder and in its oracle.
GRAPH_BOUND = [
    "graph_pagerank",
    "graph_hits_authority",
    "graph_kcore",
    "graph_label_propagation",
    "graph_shortest_hops",
    "graph_triangle_count",
    "graph_adamic_adar",
    "graph_jaccard_neighbors",
    "graph_clustering_coefficient",
    "graph_degree_assortativity",
    "graph_degree_stats",
    "markov_event_transitions",
    "markov_stationary_distribution",
]

# Streaming subset (--subset stream, r12 VERDICT ask #7): the
# watermark/window family — batch twins of the Structured Streaming
# jobs plus stream_soak_census, the TRUE readStream -> watermark ->
# append-sink soak (3 chronological availableNow files + late replays
# + sentinel flush), timed at BOTH scales. The decade's point for
# streaming is the STATE story, not just wall time: window-keyed state
# is bounded by the CALENDAR horizon (windows in flight under the
# watermark), not input volume — the id-shifted copies keep `ts`
# unchanged, so every horizon-keyed query must emit EXACTLY the same
# window set at sf10 as at sf1 (rows_ratio == 1.0, enforced below via
# STREAM_HORIZON_KEYED and recorded as state_horizon_check in the
# artifact). Per-entity queries (sessions per user, view-click pairs)
# legitimately grow with input and are excluded from that check.
STREAM_BOUND = [
    "stream_tumbling_hourly",
    "stream_sliding_2h",
    "stream_session_windows",
    "stream_dedup_first",
    "stream_hypertable_rollup",
    "stream_rate_per_minute",
    "stream_join_view_click",
    "stream_watermark_audit",
    "stream_lateness_histogram",
    "stream_soak_census",
]

# Aria subset (--subset aria, round 13): the reference's OWN core —
# the KV surface (point lookup / multiget / scan / count / merge
# upsert / anti-join delete / bulk load, SURVEY §2A #1-#13) and every
# stage of the deterministic batch protocol (reserve, conflict flags,
# commit decision, install, key-op chain, metadata pack, epoch
# census), timed across the sf1 -> sf10 decade. The ops fixture maps
# lineitem into a 211-key hot keyspace, so every reservation/install
# aggregate is a heavily-skewed tiny-key groupBy — exactly the shape
# partial (map-side) aggregation must flatten; a superlinear row here
# would mean the combine stopped combining. aria_run_batch and
# aria_snapshot_asof are HORIZON-BOUNDED by construction (bounded
# replay of txn_id <= 3000, the MVCC device): their work and output
# must NOT grow with corpus volume — enforced below via
# ARIA_HORIZON_KEYED the way the stream subset pins watermark state.
ARIA_BOUND = [
    "kv_point_lookup",
    "kv_multiget",
    "kv_scan_project",
    "kv_count",
    "kv_upsert_merge",
    "kv_delete_anti",
    "kv_bulk_load",
    "aria_reserve",
    "aria_conflict_flags",
    "aria_commit_decision",
    "aria_install",
    "aria_key_op_chain",
    "aria_metadata_pack",
    "aria_epoch_loop_census",
    "aria_run_batch",
    "aria_snapshot_asof",
]

# Multimodal subset (--subset mm, round 13): the Arrow-lane media
# pipeline — binary payload synthesis from documents, stdlib decode
# (real PNG/WAV at the seeded doc_ids, deterministic fakes elsewhere),
# dHash banding, feature extraction, frame sampling. Every stage is a
# single mapInPandas/applyInPandas pass over (doc-derived) media rows
# plus at most one banded self-join (phash candidates), so the decade
# should land near-linear; a superlinear row here would mean the
# banding degenerated (all payloads in one band) or an Arrow batch
# stopped streaming. Completes per-family decade coverage: with this,
# all seven declared families (scan/llm/rank/graph/stream/aria/mm)
# carry committed sf1->sf10 evidence.
MM_BOUND = [
    "mm_media_meta",
    "mm_extract_features",
    "mm_frame_sample",
    "mm_image_phash",
    "mm_audio_energy",
]

# Bounded-replay queries: the txn_id <= 3000 horizon lands entirely in
# the unshifted first fixture copy, so the capped batch — and hence
# the commit/abort output — must be IDENTICAL at sf1 and sf10 (replay
# cost tracks the horizon, not corpus volume).
ARIA_HORIZON_KEYED = {
    "aria_run_batch",
    "aria_snapshot_asof",
}

# Output rows == live state keys for these: window/calendar-keyed, so
# the sf1 and sf10 row counts must be IDENTICAL (state tracks the
# watermark horizon, not input size).
STREAM_HORIZON_KEYED = {
    "stream_tumbling_hourly",
    "stream_sliding_2h",
    "stream_hypertable_rollup",
    "stream_rate_per_minute",
    "stream_watermark_audit",
    "stream_soak_census",
}

QUERY_TIMEOUT_SEC = float(os.environ.get("SPARK_GRAFT_QUERY_TIMEOUT", "300"))
LINEAR_SLACK = 2.0  # flag ratios above LINEAR_SLACK * (data growth)


def resolve_names(registry, patterns: list[str]) -> list[str]:
    qs = registry.queries()
    names: list[str] = []
    for pat in patterns:
        if pat in qs:
            names.append(pat)
            continue
        hit = [n for n in qs if n.startswith(pat)]
        assert len(hit) == 1, (pat, hit)
        names.append(hit[0])
    return names


def timed(spark, fn, sf_dir: str, group: str, action: str) -> tuple[float, int]:
    import threading

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    sc = spark.sparkContext
    sc.setJobGroup(group, group, interruptOnCancel=True)
    done = threading.Event()

    def watchdog() -> None:
        if not done.wait(QUERY_TIMEOUT_SEC):
            sc.cancelJobGroup(group)
            while not done.wait(2.0):
                sc.cancelJobGroup(group)

    th = threading.Thread(target=watchdog, daemon=True)
    th.start()
    try:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if action == "noop":
            # full plan execution, zero driver transfer — for subsets
            # whose outputs are pair-level (~1M rows at 100 copies).
            # An Observation rides the same pass to record the OUTPUT
            # row count: a time ratio is only judgeable next to the
            # output's own growth (the cosine-pair queries' declared
            # output is inherently superlinear on dense corpora).
            obs = Observation()
            df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
                "overwrite"
            ).format("noop").save()
            n_rows = int(obs.get["rows"])
        else:
            n_rows = len(df.collect())
        elapsed = time.perf_counter() - t0
    finally:
        done.set()
        sc.setJobGroup("scale-idle", "scale-idle")
    if elapsed > QUERY_TIMEOUT_SEC:
        raise TimeoutError(f"{group}: exceeded {QUERY_TIMEOUT_SEC}s cap")
    return elapsed, n_rows


SUBSETS = {
    # subset -> (patterns, small dir, big dir, action, artifact name)
    "scan": (SCAN_BOUND, SF1, SF10, "collect", "SCALE_sf10.json"),
    "llm": (LLM_BOUND, LLM_SF1, LLM_SF10, "noop", "SCALE_llm_sf10.json"),
    "rank": (RANK_BOUND, SF1, SF10, "noop", "SCALE_rank_sf10.json"),
    "graph": (GRAPH_BOUND, SF1, SF10, "noop", "SCALE_graph_sf10.json"),
    "stream": (STREAM_BOUND, SF1, SF10, "noop", "SCALE_stream_sf10.json"),
    "aria": (ARIA_BOUND, SF1, SF10, "noop", "SCALE_aria_sf10.json"),
    "mm": (MM_BOUND, SF1, SF10, "noop", "SCALE_mm_sf10.json"),
}


def main() -> None:
    from gpu_database_spark import registry
    from gpu_database_spark.functions.materialize import release_all
    from gpu_database_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--subset", choices=sorted(SUBSETS), default="scan")
    args = ap.parse_args()
    patterns, small_dir, big_dir, action, artifact = SUBSETS[args.subset]

    if not os.path.isdir(big_dir):
        raise SystemExit(
            f"{big_dir} missing — build it with tools/make_sf1.py first "
            "(--copies 100 --name sf10, or --llm-distinct for the llm "
            "fixtures)"
        )
    spark = get_spark(app_name="gpu-database-spark-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = resolve_names(registry, patterns)

    # JVM/codegen warmup at the small fixture
    qs[names[0]](spark, "/root/testdata/sf0.001").collect()

    growth = 10.0  # sf1.0 -> sf10 data growth
    out: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in names:
        fn = qs[name]
        row: dict[str, float] = {}
        try:
            sec1, rows1 = timed(spark, fn, small_dir, f"{name}@sf1", action)
            sec10, rows10 = timed(spark, fn, big_dir, f"{name}@sf10", action)
            row["sec_sf1"], row["sec_sf10"] = round(sec1, 3), round(sec10, 3)
            row["rows_sf1"], row["rows_sf10"] = rows1, rows10
            # guard tiny denominators: ratios below 0.2s of sf1 time say
            # more about fixed overhead than scaling
            base = max(row["sec_sf1"], 0.2)
            row["ratio"] = round(row["sec_sf10"] / base, 2)
            row["rows_ratio"] = round(rows10 / max(rows1, 1), 2)
            out[name] = row
            print(
                f"{name}: sf1 {row['sec_sf1']}s sf10 {row['sec_sf10']}s "
                f"ratio {row['ratio']} rows {rows1}->{rows10}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"{name} FAILED: {errors[name]}", file=sys.stderr, flush=True)
        finally:
            release_all(spark)
    spark.stop()

    total1 = round(sum(r["sec_sf1"] for r in out.values()), 2)
    total10 = round(sum(r["sec_sf10"] for r in out.values()), 2)
    # A query is superlinear only against the larger of data growth and
    # its own OUTPUT growth: when the declared result is itself
    # quadratic (dense cosine-pair corpora), time tracking the output
    # is the correct behavior, not a plan defect.
    superlinear = sorted(
        n for n, r in out.items()
        if r["ratio"] > LINEAR_SLACK * max(growth, r.get("rows_ratio", 0.0))
        and r["sec_sf10"] > 5.0
    )
    # Streaming state check: horizon-keyed outputs (== live state keys)
    # must be byte-identical in COUNT across the decade — state grows
    # with the watermark horizon, never with input volume.
    state_horizon_check = None
    if args.subset == "aria":
        # Bounded-replay check: the horizon-capped batch is the same
        # batch at both scales, so outputs must match exactly and the
        # sf10 wall must not track corpus volume.
        state_horizon_check = {}
        for n in sorted(ARIA_HORIZON_KEYED & set(out)):
            ok = out[n]["rows_sf1"] == out[n]["rows_sf10"]
            state_horizon_check[n] = {
                "rows_sf1": out[n]["rows_sf1"],
                "rows_sf10": out[n]["rows_sf10"],
                "replay_bounded_by_horizon": ok,
            }
            if not ok:
                errors[f"{n}@replay_horizon"] = (
                    f"horizon-bounded replay output grew with input: "
                    f"{out[n]['rows_sf1']} -> {out[n]['rows_sf10']}"
                )
                print(errors[f"{n}@replay_horizon"], file=sys.stderr, flush=True)
    if args.subset == "stream":
        state_horizon_check = {}
        for n in sorted(STREAM_HORIZON_KEYED & set(out)):
            ok = out[n]["rows_sf1"] == out[n]["rows_sf10"]
            state_horizon_check[n] = {
                "rows_sf1": out[n]["rows_sf1"],
                "rows_sf10": out[n]["rows_sf10"],
                "state_bounded_by_horizon": ok,
            }
            if not ok:
                errors[f"{n}@state_horizon"] = (
                    f"horizon-keyed state grew with input: "
                    f"{out[n]['rows_sf1']} -> {out[n]['rows_sf10']}"
                )
                print(errors[f"{n}@state_horizon"], file=sys.stderr, flush=True)

    result = {
        "subset": f"{args.subset}-bound",
        "action": action,
        "sf_small": 1.0,
        "sf_big": 10.0,
        "n_queries": len(out),
        "queries": out,
        "errors": errors,
        "total_sf1": total1,
        "total_sf10": total10,
        "wall_ratio": round(total10 / total1, 2) if total1 else None,
        "superlinear": superlinear,
    }
    if state_horizon_check is not None:
        result["state_horizon_check"] = state_horizon_check
    with open(os.path.join(REPO, artifact), "w") as f:
        json.dump(result, f, indent=1)
    print(
        json.dumps(
            {
                "total_sf1": total1,
                "total_sf10": total10,
                "wall_ratio": result["wall_ratio"],
                "n_queries": len(out),
                "n_err": len(errors),
                "superlinear": superlinear,
            }
        )
    )


if __name__ == "__main__":
    main()
