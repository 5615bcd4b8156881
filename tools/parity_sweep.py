#!/usr/bin/env python
"""Full Spark-vs-DuckDB oracle parity sweep at an arbitrary scale factor.

The verification driver gates at sf0.01; this sweep re-runs EVERY
oracled query at a larger SF to flush out scale-dependent divergence
the small fixture can't see. It has already earned its keep: at
sf0.1 it exposed the shortest-string double->decimal hazard (a
cross-moment term above ~1e11 rounds differently in Spark's
BigDecimal.valueOf path than in DuckDB's exact-binary conversion —
see functions/compat.py), which three queries were then hardened
against by centering/rescaling their moment terms.

    python tools/parity_sweep.py [sf_dir] [--json OUT.json]

Prints one OK/FAIL line per query and a final "DONE fails: [...]".
Exit code 1 if any query fails. With --json, also writes a machine-
readable record {sf_dir, n_ok, n_fail, fails, total_sec, queries:
{name: {status, sec}}} — the per-round SWEEP_r{N}.json artifact that
separates engine drift from environment drift in bench comparisons
(VERDICT r9 #6): unlike BENCH_r{N}.json this runs EVERY oracled query
in ONE fresh session with per-query seconds pinned."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# ---------------------------------------------------------------------------
# Sketch-family tolerance gates (r10 VERDICT ask #4): the rows-only
# sketch queries have pytest accuracy gates; mirroring those bounds
# here makes the SWEEP artifact itself certify that every estimate is
# within its guarantee of the exact value computed in the SAME run —
# at whatever SF the sweep runs, not just the pytest fixture.

def _check_approx_distinct(rows, con):
    exact = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey),"
            " COUNT(DISTINCT l_orderkey) FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        xp, xo = exact[r["l_returnflag"]]
        # rsd=0.01 requested; allow 5 sigma + small-count slack
        assert abs(r["approx_parts"] - xp) <= max(0.05 * xp, 5), (dict(r.asDict()), xp)
        assert abs(r["approx_orders"] - xo) <= max(0.05 * xo, 5), (dict(r.asDict()), xo)


def _check_approx_percentile(rows, con):
    # accuracy=1000 -> rank error <= 0.001; allow 5x guarantee slack:
    # the returned element must sit between the exact p-/+0.005 quantiles
    for p, col in ((0.5, "approx_median"), (0.99, "approx_p99")):
        lo_p, hi_p = max(p - 0.005, 0.0), min(p + 0.005, 1.0)
        bounds = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                f"SELECT l_returnflag, quantile_disc(l_extendedprice, {lo_p}),"
                f" quantile_disc(l_extendedprice, {hi_p})"
                " FROM lineitem GROUP BY 1"
            ).fetchall()
        }
        for r in rows:
            lo, hi = bounds[r["l_returnflag"]]
            assert lo <= r[col] <= hi, (r["l_returnflag"], col, r[col], lo, hi)


def _check_hll_sketch_merge(rows, con):
    # exact counts ride along in the result; gate est vs exact at 5%
    assert rows
    for r in rows:
        assert abs(r["est_nd"] - r["exact_nd"]) / max(r["exact_nd"], 1) < 0.05, (
            dict(r.asDict())
        )


def _check_audience_overlap_hll(rows, con):
    exact = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            """
            WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
            SELECT a.event_type, b.event_type,
                   COUNT(DISTINCT a.user_id),
                   COUNT(DISTINCT b.user_id),
                   COUNT(DISTINCT CASE WHEN a.user_id = b.user_id
                                       THEN a.user_id END)
            FROM du a JOIN du b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    # the exact query above only yields pairs with nonzero overlap; fill
    # the rest from per-type counts
    per_type = dict(
        con.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        k = (r["type_a"], r["type_b"])
        if k in exact:
            n_a, n_b, n_both = exact[k]
        else:
            n_a, n_b, n_both = per_type[k[0]], per_type[k[1]], 0
        union = n_a + n_b - n_both
        assert abs(r["est_union"] - union) <= max(0.05 * union, 3), (k, union, dict(r.asDict()))
        assert abs(r["est_both"] - n_both) <= max(0.10 * union, 5), (k, n_both, dict(r.asDict()))


def _check_count_min_sketch(rows, con):
    # CMS guarantee: exact <= estimate <= exact + eps*N (eps=0.001)
    n_total = sum(r["exact_n"] for r in rows)
    for r in rows:
        assert r["cms_estimate"] >= r["exact_n"], dict(r.asDict())
        assert r["cms_estimate"] <= r["exact_n"] + 0.001 * n_total + 1, dict(r.asDict())


def _check_ann_recall_report(rows, con):
    # deployment-gate thresholds: all four families present, and
    # per-family recall floors on the evaluation query sample. The
    # panel is 20 queries x top-5 = 100 hits (round-12, ADVICE r11 #4:
    # widened from 5 queries / 0.04 granularity). Measured on the
    # wider panel across sf0.001/0.01/0.1/1.0: lsh 0.37-1.0,
    # ivf 0.45-1.0, pq 0.16-1.0, ivf_pq 0.12-1.0 — the pq/ivf_pq dips
    # at sf0.1 are a property of the weakly-clustered random fixture
    # (8 nibble codes can't separate what barely clusters), NOT an
    # index defect, so an any-SF floor at the pytest fixture-scale
    # level (0.25) is unattainable by measurement; floors sit under
    # the per-family minima with margin and still fail loudly on a
    # broken index (a scrambled codebook scores ~0.05).
    by = {r["method"]: r for r in rows}
    assert set(by) == {"lsh", "ivf", "pq", "ivf_pq", "ivf_pq_rerank"}, sorted(by)
    for r in by.values():
        assert 0.0 <= r["recall_at_k"] <= 1.0, dict(r.asDict())
        assert r["n_queries"] > 0, dict(r.asDict())
    assert by["lsh"]["recall_at_k"] >= 0.2, dict(by["lsh"].asDict())
    assert by["ivf"]["recall_at_k"] >= 0.3, dict(by["ivf"].asDict())
    assert by["pq"]["recall_at_k"] >= 0.1, dict(by["pq"].asDict())
    assert by["ivf_pq"]["recall_at_k"] >= 0.08, dict(by["ivf_pq"].asDict())
    # exact shortlist re-ranking erases ADC quantization error, so the
    # deployment layout must clear a floor well above raw ivf_pq's
    assert by["ivf_pq_rerank"]["recall_at_k"] >= 0.25, dict(
        by["ivf_pq_rerank"].asDict()
    )
    assert (
        by["ivf_pq_rerank"]["recall_at_k"] >= by["ivf_pq"]["recall_at_k"]
    ), (by["ivf_pq_rerank"]["recall_at_k"], by["ivf_pq"]["recall_at_k"])


# ---------------------------------------------------------------------------
# Round-12 (VERDICT r11 ask #2): the remaining rows-only queries ride
# the sweep too, each with its pytest gate mirrored at the sweep's SF —
# recall floors for the ANN family, serial replicas for BPE/compression,
# a numpy eigen check for PCA, census identities for the multimodal
# family and the streaming soak. With these, SWEEP_r{N}.json carries a
# status for every declared query.


def _ann_ground_truth(con, metric: str) -> dict[int, set]:
    """Exact top-K per evaluation query vector (vec_id < N_QUERIES):
    per-candidate cosine DESC or L2 ASC, cid tiebreak — the brute-force
    baseline every ANN family is graded against (sim_topk_cosine's
    rule)."""
    from gpu_database_spark.llm.similarity import N_QUERIES, TOP_K

    order = (
        "round(list_cosine_similarity(qv, cv), 6) DESC"
        if metric == "cos"
        else "list_distance(qv, cv) ASC"
    )
    rows = con.execute(
        f"""
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings)
        SELECT qid, cid FROM (
            SELECT qid, cid,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY {order}, cid) AS rk
            FROM q JOIN c ON qid <> cid
        ) WHERE rk <= {TOP_K}
        """
    ).fetchall()
    gt: dict[int, set] = {}
    for qid, cid in rows:
        gt.setdefault(qid, set()).add(cid)
    return gt


def _check_ann_recall(metric: str, floor: float):
    def check(rows, con):
        from gpu_database_spark.llm.similarity import TOP_K

        assert rows, "ANN query returned no rows"
        gt = _ann_ground_truth(con, metric)
        hits = sum(1 for r in rows if r["cid"] in gt.get(r["qid"], ()))
        recall = hits / (len(gt) * TOP_K)
        assert recall >= floor, (metric, recall, floor)
        assert {r["qid"] for r in rows} <= set(gt)

    return check


# Binding ANN floors on the CLUSTERED fixture (r12 VERDICT ask #2):
# the driver's near-uniform embeddings cap even a good index at recall
# ~0.16, so the sf-dir floors above sit at 0.08-0.3 — a band a real
# index regression can hide inside. Each ANN family therefore ALSO
# runs against the seeded mixture-of-Gaussians corpus
# (tools/make_sf1.py --clustered, generated on demand), where measured
# recalls are lsh 0.98 / ivf 1.00 / pq 0.30 / ivf_pq 0.30 /
# ivf_pq_rerank 1.00. Floors sit just under measurement; pq's 0.30 is
# the honest ADC-quantization ceiling among 40 near-identical
# cluster-mates — which is exactly what the rerank stage exists to
# fix, so the rerank gate also demands a +0.4 separation over raw
# ivf_pq.
CLUSTERED_FLOORS: dict[str, tuple[str, float]] = {
    "sim_ann_lsh": ("cos", 0.9),
    "sim_ann_ivf": ("cos", 0.85),
    "sim_ann_pq": ("l2", 0.2),
    "sim_ann_ivf_pq": ("l2", 0.2),
    "sim_ann_ivf_pq_rerank": ("l2", 0.9),
}


def _clustered_recall(spark, fn, metric: str) -> float:
    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_sf1 import FIXDIR, make_clustered_embeddings

    from gpu_database_spark.llm.similarity import TOP_K

    cdir = make_clustered_embeddings(os.path.join(FIXDIR, "emb_clustered"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{cdir}/embeddings.parquet')"
    )
    rows = fn(spark, cdir).collect()
    gt = _ann_ground_truth(con, metric)
    hits = sum(1 for r in rows if r["cid"] in gt.get(r["qid"], ()))
    return hits / (len(gt) * TOP_K)


def _check_quantile_audit(rows, con):
    assert rows and all(r["within_guarantee"] for r in rows), [
        dict(r.asDict()) for r in rows if not r["within_guarantee"]
    ]
    assert all(r["n"] > 0 for r in rows)


def _check_pca_power(rows, con):
    import numpy as np

    x = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT CAST(embedding AS DOUBLE[]) FROM embeddings"
                " ORDER BY vec_id"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / (len(x) - 1)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    got = np.array(
        [r["loading"] for r in sorted(rows, key=lambda r: r["component"])]
    )
    # looser than the pytest fixture gate (1e-6 relative): an any-SF
    # deployment gate against near-degenerate spectra — still catches
    # a wrong component outright (this check found the 300-iteration
    # solve returning alignment 0.21 at sf0.1; now 3000 iterations)
    assert abs(rows[0]["eigenvalue"] - vals[-1]) < 1e-4 * max(1e-3, vals[-1])
    assert abs(float(got @ top)) > 0.999, float(got @ top)
    assert abs(float(got @ got) - 1.0) < 1e-9


def _check_bpe_train(rows, con):
    from gpu_database_spark.llm.textstats import BPE_ROUNDS

    freq_rows = con.execute(
        r"""
        SELECT w, COUNT(*) FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        ) WHERE length(w) BETWEEN 2 AND 20 GROUP BY w
        """
    ).fetchall()
    syms = {w: list(w) for w, _ in freq_rows}
    freq = dict(freq_rows)
    expected = []
    for rank in range(1, BPE_ROUNDS + 1):
        counts: dict[tuple, int] = {}
        for w, s in syms.items():
            f = freq[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, left, right, left + right, cnt))
        for w, s in syms.items():
            out = []
            for tok in s:
                if out and out[-1] == left and tok == right:
                    out[-1] = left + right
                else:
                    out.append(tok)
            syms[w] = out
    assert [tuple(r) for r in rows] == expected, (rows[:2], expected[:2])


def _check_compression_ratio(rows, con):
    import zlib

    agg: dict[str, list] = {}
    for source, text in con.execute(
        "SELECT source, text FROM documents"
    ).fetchall():
        raw = (text or "").encode("utf-8")
        ratio = len(zlib.compress(raw, 6)) / len(raw) if raw else 1.0
        r8 = round(ratio, 8)
        a = agg.setdefault(source, [0, 0, 0])  # n, micro_sum, flagged
        a[0] += 1
        a[1] += round(r8 * 1e8)
        a[2] += 1 if r8 < 0.30 else 0
    assert {r["source"] for r in rows} == set(agg)
    for r in rows:
        n, micro, flagged = agg[r["source"]]
        assert r["n_docs"] == n and r["n_flagged"] == flagged, dict(r.asDict())
        assert abs(r["mean_ratio"] - micro / 1e8 / n) < 2e-6, dict(r.asDict())


def _doc_counts(con):
    return dict(
        con.execute(
            "SELECT doc_id % 3, COUNT(*) FROM documents GROUP BY 1"
        ).fetchall()
    )


def _check_mm_extract_features(rows, con):
    by_type = _doc_counts(con)
    totals = {"image": 0, "audio": 0, "video": 0}
    for r in rows:
        totals[r["media_type"]] += r["n_media"]
    assert totals == {
        "image": by_type.get(0, 0),
        "audio": by_type.get(1, 0),
        "video": by_type.get(2, 0),
    }, (totals, by_type)
    png = [r for r in rows if r["codec"] == "png"]
    assert len(png) == 1 and png[0]["n_media"] == 3, png  # the SEEDED_PNGS
    wav = [r for r in rows if r["codec"] == "wav"]
    assert len(wav) == 1 and wav[0]["n_media"] == 3, wav  # the SEEDED_WAVS


def _check_mm_frame_sample(rows, con):
    n_video = _doc_counts(con).get(2, 0)
    per_media: dict[int, int] = {}
    for r in rows:
        assert r["frame_idx"] >= 0
        per_media[r["media_id"]] = per_media.get(r["media_id"], 0) + 1
    assert len(per_media) == n_video, (len(per_media), n_video)
    assert all(c <= 9 for c in per_media.values())  # ceil(n/8) stepping


def _check_mm_audio_energy(rows, con):
    n_audio = _doc_counts(con).get(1, 0)
    assert sum(r["n_media"] for r in rows) == n_audio
    for r in rows:
        assert 0.0 <= r["avg_silence_ratio"] <= 1.0, dict(r.asDict())
        assert r["avg_energy"] >= 0.0 and r["total_windows"] >= r["n_media"]
    # the SEEDED_WAVS take the REAL stdlib-wave path at driver scale:
    # doc_ids 1/7 mono (codec wav; id 1's middle window is silent by
    # construction -> group silence avg 1/6), doc_id 4 stereo downmix
    by_codec = {r["codec"]: r for r in rows}
    assert by_codec["wav"]["n_media"] == 2, dict(by_codec["wav"].asDict())
    assert by_codec["wav"]["avg_silence_ratio"] > 0.0
    assert by_codec["wav-ch2"]["n_media"] == 1
    assert by_codec["wav-ch2"]["avg_silence_ratio"] == 0.0  # clears the gate


def _check_mm_image_phash(rows, con):
    assert len(rows) == 1
    r = rows[0]
    n_docs = sum(_doc_counts(con).values())
    assert r["n_media"] == n_docs, (r["n_media"], n_docs)
    assert r["n_png_decoded"] == 3  # the SEEDED_PNGS take the real path
    assert r["n_confirmed_pairs"] >= 1  # the seeded near-dup pair
    assert r["n_confirmed_pairs"] <= r["n_candidate_pairs"]


def _check_stream_soak(rows, con):
    assert rows, "soak census returned no windows"
    assert all(r["delta"] == 0 for r in rows), [
        dict(r.asDict()) for r in rows if r["delta"] != 0
    ]
    assert sum(r["n_streamed"] for r in rows) > 0


SKETCH_CHECKS = {
    "agg_approx_distinct": _check_approx_distinct,
    "agg_approx_percentile": _check_approx_percentile,
    "agg_hll_sketch_merge": _check_hll_sketch_merge,
    "audience_overlap_hll": _check_audience_overlap_hll,
    "agg_count_min_sketch": _check_count_min_sketch,
    "sim_ann_recall_report": _check_ann_recall_report,
    # round-12 additions: every remaining rows-only query. Per-query
    # ANN floors graded against each family's NATIVE metric (PQ
    # approximates L2, so its ground truth is L2 top-k, unlike the
    # cosine-graded recall report); measured minima across
    # sf0.001-1.0 on the 20-query panel: lsh 0.37, ivf 0.45,
    # pq(L2) 0.20, ivf_pq(L2) 0.18 — floors sit under them with margin.
    "sim_ann_lsh": _check_ann_recall("cos", 0.2),
    "sim_ann_ivf": _check_ann_recall("cos", 0.25),
    "sim_ann_pq": _check_ann_recall("l2", 0.12),
    "sim_ann_ivf_pq": _check_ann_recall("l2", 0.1),
    # exact shortlist re-rank: measured 0.40-0.62 across sf0.001-0.1
    # vs the exact-L2 baseline (vs raw ivf_pq's 0.12-0.26)
    "sim_ann_ivf_pq_rerank": _check_ann_recall("l2", 0.3),
    "agg_approx_quantile_audit": _check_quantile_audit,
    "embed_pca_power": _check_pca_power,
    "text_bpe_train_merges": _check_bpe_train,
    "text_compression_ratio": _check_compression_ratio,
    "mm_extract_features": _check_mm_extract_features,
    "mm_frame_sample": _check_mm_frame_sample,
    "mm_audio_energy": _check_mm_audio_energy,
    "mm_image_phash": _check_mm_image_phash,
    "stream_soak_census": _check_stream_soak,
}


def main() -> int:
    import duckdb

    from gpu_database_spark.session import get_spark
    from oracle_utils import assert_query_matches_oracle

    import __spark_entry__ as e

    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    skip: set[str] = set()
    if "--skip" in args:
        # oracle-infeasible-at-this-SF queries (e.g. er_golden_record's
        # recursive-CTE oracle is quadratic by construction and only
        # runs at fixture scale — its large-SF evidence is Spark-side)
        i = args.index("--skip")
        skip = set(args[i + 1].split(","))
        del args[i : i + 2]
    only: set[str] | None = None
    if "--only" in args:
        # targeted re-certification after a local change; the committed
        # per-round artifacts always come from unfiltered runs
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark(app_name="parity-sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    fails: list[str] = []
    record: dict[str, dict] = {}
    t_start = time.time()
    for name, fn in sorted(qs.items()):
        if only is not None and name not in only:
            continue
        if name not in osql:
            if name in SKETCH_CHECKS and name not in skip:
                # rows-only sketch query: no hash oracle exists, but the
                # estimate must sit inside its guarantee of the exact
                # value computed in this same run (status: ok-bound)
                try:
                    t0 = time.time()
                    SKETCH_CHECKS[name](fn(spark, sf_dir).collect(), con)
                    rec: dict = {"status": "ok-bound"}
                    if name in CLUSTERED_FLOORS:
                        metric, floor = CLUSTERED_FLOORS[name]
                        cr = _clustered_recall(spark, fn, metric)
                        assert cr >= floor, (
                            f"clustered-fixture recall {cr:.3f} < floor "
                            f"{floor} — a real index regression"
                        )
                        rec["clustered_recall"] = round(cr, 4)
                    sec = round(time.time() - t0, 2)
                    rec["sec"] = sec
                    record[name] = rec
                    print(f"OK~  {name} {sec:.1f}s (tolerance bound)", flush=True)
                except Exception as ex:  # noqa: BLE001
                    fails.append(name)
                    record[name] = {
                        "status": "fail",
                        "sec": round(time.time() - t0, 2),
                        "err": str(ex)[:300],
                    }
                    print(f"FAIL {name}: {str(ex)[:300]}", flush=True)
                finally:
                    from gpu_database_spark.functions.materialize import release_all

                    try:
                        release_all(spark)
                    except Exception as ex:  # noqa: BLE001
                        print(f"release_all failed: {str(ex)[:120]}", flush=True)
            continue
        if name in skip:
            record[name] = {"status": "skipped", "sec": 0.0}
            print(f"SKIP {name}", flush=True)
            continue
        try:
            t0 = time.time()
            assert_query_matches_oracle(fn(spark, sf_dir), con, osql[name], name=name)
            sec = round(time.time() - t0, 2)
            record[name] = {"status": "ok", "sec": sec}
            print(f"OK   {name} {sec:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            record[name] = {
                "status": "fail",
                "sec": round(time.time() - t0, 2),
                "err": str(ex)[:300],
            }
            print(f"FAIL {name}: {str(ex)[:300]}", flush=True)
        finally:
            from gpu_database_spark.functions.materialize import release_all

            try:  # don't pin checkpoint blocks across the whole sweep
                release_all(spark)
            except Exception as ex:  # noqa: BLE001 — never abort the sweep
                print(f"release_all failed: {str(ex)[:120]}", flush=True)
    # The comparative gate on the clustered fixture: exact re-ranking
    # must recover what ADC quantization blurs (measured 1.00 vs 0.30).
    crs = {
        n: r["clustered_recall"]
        for n, r in record.items()
        if "clustered_recall" in r
    }
    if {"sim_ann_ivf_pq", "sim_ann_ivf_pq_rerank"} <= set(crs) and not (
        crs["sim_ann_ivf_pq_rerank"] >= crs["sim_ann_ivf_pq"] + 0.4
    ):
        fails.append("ann_rerank_clustered_separation")
        print(
            "FAIL ann_rerank_clustered_separation: "
            f"rerank {crs['sim_ann_ivf_pq_rerank']} vs "
            f"ivf_pq {crs['sim_ann_ivf_pq']}",
            flush=True,
        )
    print("DONE fails:", fails)
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    # A filtered run is marked as such so a targeted
                    # re-cert can never masquerade as (or clobber) a
                    # committed full-sweep artifact (r12 ADVICE #1).
                    **({"only": sorted(only)} if only is not None else {}),
                    **({"skipped": sorted(skip)} if skip else {}),
                    "n_ok": sum(1 for r in record.values() if r["status"] == "ok"),
                    "n_ok_bound": sum(
                        1 for r in record.values() if r["status"] == "ok-bound"
                    ),
                    "n_fail": len(fails),
                    "fails": fails,
                    "total_sec": round(time.time() - t_start, 1),
                    "queries": record,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}", flush=True)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
