"""LLM-pipeline operator properties beyond the DuckDB oracle:
LSH recall vs the exact baseline, dedup self-consistency, multimodal
Arrow plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_database_spark.llm import dedup, multimodal, similarity


def test_ann_lsh_recall_vs_exact(spark, sf_dir):
    """Bucketed ANN must findreasonable overlap with exact top-k for
    the same queries (8-bit hyperplane signatures on 64-dim vectors
    are coarse; demand >0 overlap and per-query validity, and that
    every ANN hit's cosine matches the exact scorer)."""
    exact = similarity.sim_topk_cosine(spark, sf_dir).collect()
    approx = similarity.sim_ann_lsh(spark, sf_dir).collect()
    exact_pairs = {(r.qid, r.cid): r.cos_sim for r in exact}
    hits = 0
    for r in approx:
        if (r.qid, r.cid) in exact_pairs:
            hits += 1
            assert abs(exact_pairs[(r.qid, r.cid)] - r.cos_sim) < 1e-9
    assert hits > 0, "LSH found no exact-top-k neighbors at all"
    # every approx row is a real candidate with a sane score
    assert all(-1.0 <= r.cos_sim <= 1.0 for r in approx)


def test_ann_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with nprobe=3 of k=16 lists must recover a solid share of the
    exact top-k (random 64-dim data clusters weakly; demand >=20% recall
    and score consistency with the exact scorer)."""
    exact = similarity.sim_topk_cosine(spark, sf_dir).collect()
    approx = similarity.sim_ann_ivf(spark, sf_dir).collect()
    exact_pairs = {(r.qid, r.cid): r.cos_sim for r in exact}
    hits = sum(1 for r in approx if (r.qid, r.cid) in exact_pairs)
    for r in approx:
        if (r.qid, r.cid) in exact_pairs:
            assert abs(exact_pairs[(r.qid, r.cid)] - r.cos_sim) < 1e-9
    assert hits >= len(exact) * 0.2, f"IVF recall too low: {hits}/{len(exact)}"


def test_minhash_detects_planted_near_dup(spark, sf_dir):
    """Plant a near-duplicate pair and an unrelated doc; the MinHash+LSH
    pipeline must bucket the planted pair together."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from every hunter"
    )
    near = base.replace("hide", "flee")  # one word differs
    other = "completely different text about spark shuffles and parquet row groups"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_estimates_jaccard():
    """Statistical soundness of the md5-chunk minhash family: the
    fraction of agreeing signature rows estimates Jaccard similarity.
    Pure-python replica of the engine's hash construction (md5 hex
    chunks of s and 'x:'+s) over synthetic shingle sets with known
    overlap."""
    import hashlib

    def chunks(s: str) -> list[str]:
        m1 = hashlib.md5(s.encode()).hexdigest()
        m2 = hashlib.md5(f"x:{s}".encode()).hexdigest()
        return [m1[i : i + 8] for i in range(0, 32, 8)] + [
            m2[i : i + 8] for i in range(0, 32, 8)
        ]

    def signature(shingles: set[str]) -> list[str]:
        cols = [chunks(s) for s in shingles]
        return [min(c[h] for c in cols) for h in range(8)]

    # many independent 8-hash signatures -> tight estimate
    agree = total = 0
    for trial in range(200):
        base = {f"sh-{trial}-{i}" for i in range(40)}
        other = {f"sh-{trial}-{i}" for i in range(20, 60)}  # |inter|=20 |union|=60
        sa, sb = signature(base), signature(other)
        agree += sum(1 for x, y in zip(sa, sb) if x == y)
        total += 8
    est = agree / total
    true_jaccard = 20 / 60
    assert abs(est - true_jaccard) < 0.05, f"estimate {est:.3f} vs {true_jaccard:.3f}"


def test_exact_dedup_finds_planted_copies(spark):
    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa")], "doc_id long, text string"
    )
    groups = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_n = {r.n: r.keeper for r in groups}
    assert by_n[3] == 1 and by_n[1] == 2


def test_connected_components_vs_union_find(spark):
    """Min-label propagation must match a plain union-find on a planted
    graph with chains, a triangle, and singletons."""
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    nodes = list(range(1, 5)) + [10, 11, 12, 20, 21, 30, 31]
    ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
    edf = spark.createDataFrame(edges, "a long, b long")
    got = {
        (r.id, r.component)
        for r in dedup.connected_components(ndf, edf).collect()
    }
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in nodes}
    assert got == want


def test_multimodal_feature_extraction_plumbing(spark, sf_dir):
    """mapInPandas schema/batch plumbing: every media row gets features,
    deterministic across runs, schema as declared."""
    media = multimodal.media_table(spark, sf_dir)
    feats = multimodal.extract_features(media)
    assert feats.schema == multimodal.FEATURE_SCHEMA
    n_media = media.count()
    rows1 = sorted(tuple(r) for r in feats.collect())
    rows2 = sorted(tuple(r) for r in feats.collect())
    assert rows1 == rows2
    assert len(rows1) == n_media
    images = [r for r in rows1 if r[1] == "image"]
    assert all(r[5] == 1 for r in images), "images must have exactly 1 frame"


def test_frame_sample_bounded(spark, sf_dir):
    fs = multimodal.mm_frame_sample(spark, sf_dir)
    agg = fs.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert agg and all(1 <= r.n <= 9 for r in agg)


def test_ann_pq_recall_vs_exact(spark, sf_dir):
    """PQ/ADC top-10 must overlap the exact L2 top-10; uniform random
    64-dim data is PQ's worst case (no cluster structure for the
    codebook to exploit), so the gate is calibrated like IVF's."""
    import numpy as np
    import pyarrow.parquet as pq

    from gpu_database_spark.llm.similarity import (
        N_QUERIES,
        PQ_TOP_K,
        sim_ann_pq,
    )

    rows = sim_ann_pq(spark, sf_dir).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.qid, set()).add(r.cid)
    assert set(got) == set(range(N_QUERIES))
    assert all(len(v) == PQ_TOP_K for v in got.values())

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    E = np.vstack(t.embedding.values).astype(np.float64)
    ids = t.vec_id.values
    hits, total = 0, 0
    for q in range(N_QUERIES):
        qv = E[ids == q][0]
        d = ((E - qv) ** 2).sum(1)
        d[ids == q] = np.inf
        exact = set(ids[np.argsort(d, kind="stable")[:PQ_TOP_K]])
        hits += len(exact & got[q])
        total += PQ_TOP_K
    assert hits >= total * 0.25, f"PQ recall too low: {hits}/{total}"


def test_ann_recall_report_consistent(spark, sf_dir):
    """The recall report must cover all five index families, count
    every evaluation query, and agree with the per-method gates."""
    from gpu_database_spark.llm.similarity import (
        N_QUERIES,
        sim_ann_recall_report,
    )

    rows = {r.method: r for r in sim_ann_recall_report(spark, sf_dir).collect()}
    assert set(rows) == {"lsh", "ivf", "pq", "ivf_pq", "ivf_pq_rerank"}
    for r in rows.values():
        assert r.n_queries == N_QUERIES
        assert 0.0 <= r.recall_at_k <= 1.0
    assert rows["lsh"].recall_at_k > 0 and rows["pq"].recall_at_k > 0
    # exact re-ranking of the ADC shortlist can only improve on raw
    # ADC ordering over the same candidate set
    assert rows["ivf_pq_rerank"].recall_at_k >= rows["ivf_pq"].recall_at_k


def test_ann_ivf_pq_rerank_exactness_and_recall(spark, sf_dir):
    """IVFADC+R: (a) the returned exact_d2 must EQUAL the true
    squared-L2 distance for every returned pair (the re-rank stage
    touches real float vectors — any drift means the shortlist join
    fetched the wrong rows), and (b) exact-L2 recall@5 must clear a
    floor well above raw IVF+PQ's (measured 0.5 vs 0.16 at sf0.001,
    0.40-0.62 across sf0.001-0.1)."""
    import numpy as np
    import pyarrow.parquet as pq

    from gpu_database_spark.llm.similarity import (
        N_QUERIES,
        PQ_TOP_K,
        TOP_K,
        sim_ann_ivf_pq_rerank,
    )

    rows = sim_ann_ivf_pq_rerank(spark, sf_dir).collect()
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    E = np.vstack(t.embedding.values).astype(np.float64)
    ids = list(t.vec_id.values)
    vec = {int(v): E[i] for i, v in enumerate(ids)}

    got: dict[int, set[int]] = {}
    for r in rows:
        assert 1 <= r.rk <= PQ_TOP_K and r.qid != r.cid
        true_d2 = float(((vec[r.qid] - vec[r.cid]) ** 2).sum())
        assert abs(r.exact_d2 - true_d2) < 1e-6, (r.qid, r.cid)
        got.setdefault(r.qid, set()).add(r.cid)
    assert set(got) == set(range(N_QUERIES))

    hits, total = 0, 0
    for q in range(N_QUERIES):
        d = ((E - vec[q]) ** 2).sum(1)
        d[[i for i, v in enumerate(ids) if v == q]] = np.inf
        exact = {
            int(ids[i]) for i in np.argsort(d, kind="stable")[:TOP_K]
        }
        hits += len(exact & got[q])
        total += TOP_K
    assert hits >= total * 0.3, f"rerank recall too low: {hits}/{total}"


def test_ann_ivf_pq_candidates_and_recall(spark, sf_dir):
    """IVF+PQ must (a) return at most PQ_TOP_K rows per query drawn
    only from the probed lists, and (b) keep recall in the same band
    as plain PQ on its candidate subset — composing the coarse index
    must not corrupt the ADC scoring."""
    import numpy as np
    import pyarrow.parquet as pq

    from gpu_database_spark.llm.similarity import (
        N_QUERIES,
        PQ_TOP_K,
        sim_ann_ivf_pq,
    )

    rows = sim_ann_ivf_pq(spark, sf_dir).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.qid, set()).add(r.cid)
    assert set(got) == set(range(N_QUERIES))
    # nprobe lists cover a fraction of the corpus; each query still
    # has enough candidates at fixture scale to fill top-k
    assert all(1 <= len(v) <= PQ_TOP_K for v in got.values())

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    E = np.vstack(t.embedding.values).astype(np.float64)
    ids = t.vec_id.values
    hits, total = 0, 0
    for q in range(N_QUERIES):
        qv = E[ids == q][0]
        d = ((E - qv) ** 2).sum(1)
        d[ids == q] = np.inf
        exact = set(ids[np.argsort(d, kind="stable")[:PQ_TOP_K]])
        hits += len(exact & got[q])
        total += PQ_TOP_K
    # uniform random data + nprobe=3/16 lists: the coarse filter costs
    # some recall vs full-corpus PQ; demand a nonzero floor
    assert hits >= total * 0.1, f"IVF+PQ recall too low: {hits}/{total}"


def test_pairs_topk_contract_and_blocked_consistency(spark, sf_dir):
    """sim_pairs_topk's bounded-output contract: <= K contiguous ranks
    per vector ordered by cosine desc (nid tiebreak), and every emitted
    pair is one of sim_pairs_blocked's pairs — the capped variant may
    only ever SUBSET the full thresholded listing."""
    from gpu_database_spark.llm.similarity import (
        PAIRS_TOP_K,
        sim_pairs_blocked,
        sim_pairs_topk,
    )

    rows = sim_pairs_topk(spark, sf_dir).collect()
    assert rows, "capped listing is empty at fixture scale"
    per_q: dict[int, list] = {}
    for r in rows:
        assert r.qid != r.nid and r.cos_sim > 0.3
        per_q.setdefault(r.qid, []).append(r)
    for q, rs in per_q.items():
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= PAIRS_TOP_K
        ordered = sorted(rs, key=lambda r: (-r.cos_sim, r.nid))
        assert [r.nid for r in ordered] == [r.nid for r in rs], q

    full = {
        frozenset((r.va, r.vb))
        for r in sim_pairs_blocked(spark, sf_dir).collect()
    }
    assert all(frozenset((r.qid, r.nid)) in full for r in rows)


def test_ann_clustered_fixture_floors_bind(spark):
    """Binding recall gates on the seeded mixture-of-Gaussians corpus
    (r12 VERDICT ask #2). The driver's near-uniform embeddings cap even
    a GOOD index at recall ~0.16, so the sf-dir gates sit at 0.08-0.3 —
    a real index regression can pass them. On clustered data (50
    Gaussians, within-cluster cosine ~0.89, cross ~0.00) the measured
    recalls are lsh 0.98 / ivf 1.00 / pq 0.30 / ivf_pq 0.30 /
    ivf_pq_rerank 1.00; floors pinned just under. pq's 0.30 is the
    honest ADC-quantization ceiling among ~40 near-identical
    cluster-mates — the failure mode the exact-rerank stage exists to
    fix, so rerank must also separate from raw ivf_pq by >= 0.4."""
    import os
    import sys

    import duckdb

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools"),
    )
    from make_sf1 import FIXDIR, make_clustered_embeddings

    cdir = make_clustered_embeddings(os.path.join(FIXDIR, "emb_clustered"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{cdir}/embeddings.parquet')"
    )

    def ground_truth(metric: str) -> dict[int, set]:
        order = (
            "round(list_cosine_similarity(qv, cv), 6) DESC"
            if metric == "cos"
            else "list_distance(qv, cv) ASC"
        )
        rows = con.execute(
            f"""
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < {similarity.N_QUERIES}),
            c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings)
            SELECT qid, cid FROM (
                SELECT qid, cid,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY {order}, cid) AS rk
                FROM q JOIN c ON qid <> cid
            ) WHERE rk <= {similarity.TOP_K}
            """
        ).fetchall()
        gt: dict[int, set] = {}
        for qid, cid in rows:
            gt.setdefault(qid, set()).add(cid)
        return gt

    floors = {
        "sim_ann_lsh": ("cos", 0.9, similarity.sim_ann_lsh),
        "sim_ann_ivf": ("cos", 0.85, similarity.sim_ann_ivf),
        "sim_ann_pq": ("l2", 0.2, similarity.sim_ann_pq),
        "sim_ann_ivf_pq": ("l2", 0.2, similarity.sim_ann_ivf_pq),
        "sim_ann_ivf_pq_rerank": ("l2", 0.9, similarity.sim_ann_ivf_pq_rerank),
    }
    recalls: dict[str, float] = {}
    for name, (metric, floor, fn) in floors.items():
        gt = ground_truth(metric)
        rows = fn(spark, cdir).collect()
        hits = sum(1 for r in rows if r.cid in gt.get(r.qid, ()))
        recalls[name] = hits / (len(gt) * similarity.TOP_K)
        assert recalls[name] >= floor, (name, recalls[name], floor)
    assert (
        recalls["sim_ann_ivf_pq_rerank"] >= recalls["sim_ann_ivf_pq"] + 0.4
    ), recalls


def test_decontaminate_ngram_planted_leak(spark, sf_dir):
    """A train doc sharing one verbatim 4-gram with the benchmark pool
    must be flagged; a disjoint doc must not. Exercises the exact
    n-gram algebra (_word_ngrams + broadcast bench join) on planted
    text, plus the short-doc edge rule."""
    bench_text = "alpha beta gamma delta epsilon zeta"
    leaked = "noise words then alpha beta gamma delta closing remark"
    clean = "entirely unrelated tokens about shuffle partitions and rows"
    docs = spark.createDataFrame(
        [(1, bench_text), (30, leaked), (31, clean)],
        "doc_id long, text string",
    )
    ng = dedup._word_ngrams(docs, dedup.DECONTAM_NGRAM)
    bench = ng.filter(F.col("doc_id") < 25).select("g").distinct()
    hits = {
        r.doc_id
        for r in ng.filter(F.col("doc_id") >= 25)
        .join(bench, "g")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert hits == {30}
    # Short-doc edge rule: fewer words than the width -> one gram, the
    # full text (same convention as shingles()).
    short = spark.createDataFrame([(9, "just two")], "doc_id long, text string")
    rows = dedup._word_ngrams(short, dedup.DECONTAM_NGRAM).collect()
    assert [(r.doc_id, r.g) for r in rows] == [(9, "just two")]


def test_decontaminate_ngram_fixture_non_vacuous(spark, sf_dir):
    """On the fixture corpus the gate must actually separate: some
    train docs contaminated, some clean, and the flag must equal
    n_hit_ngrams >= 1 row-by-row."""
    rows = dedup.dedup_decontaminate_ngram(spark, sf_dir).collect()
    assert rows, "no train docs"
    flagged = [r for r in rows if r.contaminated]
    clean = [r for r in rows if not r.contaminated]
    assert flagged and clean, (len(flagged), len(clean))
    for r in rows:
        assert r.contaminated == (r.n_hit_ngrams >= 1)
        assert 0 <= r.n_hit_ngrams <= r.n_ngrams
        assert abs(r.contaminated_frac - r.n_hit_ngrams / r.n_ngrams) < 1e-6



def test_keep_best_quality_prefers_quality_over_min_id(spark):
    """In a planted near-dup cluster whose LONGEST member has the
    LARGEST doc_id, quality-aware survivorship must flip the keeper
    away from keep-min; singletons keep themselves."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from every hunter"
    )
    longer = base + " carrying extra provenance metadata worth keeping"
    docs = spark.createDataFrame(
        [(1, base), (2, longer), (7, "tiny unrelated doc")],
        "doc_id long, text string",
    )
    lsh = dedup.lsh_candidate_pairs(docs).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    assert {(r.a, r.b) for r in lsh.collect()} == {(1, 2)}
    comp = dedup.connected_components(
        docs.select(F.col("doc_id").alias("id")), lsh
    ).select(F.col("component").alias("cluster_id"), F.col("id").alias("doc_id"))
    from pyspark.sql import Window
    scored = comp.join(
        docs.select(
            "doc_id",
            F.size(dedup.words_col(F.col("text"))).cast("long").alias("quality"),
        ),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    rows = {
        r.doc_id: r
        for r in scored.select(
            "cluster_id", "doc_id", "quality",
            (F.row_number().over(w) == 1).alias("is_keeper"),
        ).collect()
    }
    assert rows[2].is_keeper and not rows[1].is_keeper  # quality beats min-id
    assert rows[1].cluster_id == rows[2].cluster_id == 1
    assert rows[7].is_keeper  # singleton keeps itself
