"""PageRank vs a dense numpy power-iteration oracle on the same graph."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gpu_database_spark.llm.graphrank import (
    DAMPING,
    N_ITERS,
    pagerank,
    synth_edges,
)
from gpu_database_spark.sources.catalog import load_table


def _numpy_pagerank(n, edge_list, n_iters):
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        inbound = np.zeros(n)
        for s, d in edge_list:
            inbound[d] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = (1 - DAMPING) / n + DAMPING * (inbound + dangling / n)
    return r


def test_pagerank_matches_numpy(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = synth_edges(d)
    got = {r.id: r.rank for r in pagerank(nodes, edges, N_ITERS).collect()}

    n = int(d.agg(F.max("doc_id")).collect()[0][0]) + 1
    edge_list = [(r.src, r.dst) for r in edges.collect()]
    want = _numpy_pagerank(n, edge_list, N_ITERS)

    assert len(got) == n
    total = sum(got.values())
    assert abs(total - 1.0) < 1e-9, f"ranks must sum to 1, got {total}"
    worst = max(abs(got[i] - want[i]) for i in range(n))
    assert worst < 1e-12, f"max |spark - numpy| = {worst}"


def test_pagerank_ranks_hubs_first(spark, sf_dir):
    """The query's top-50 must be ordered by rank and favor high
    in-degree nodes overall (rank correlates with in-degree on a
    uniform random graph)."""
    from gpu_database_spark.registry import queries

    rows = queries()["graph_pagerank"](spark, sf_dir).collect()
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    mean_top_deg = sum(r.in_deg for r in rows[:10]) / 10
    mean_tail_deg = sum(r.in_deg for r in rows[-10:]) / 10
    assert mean_top_deg >= mean_tail_deg


def test_kcore_matches_serial_peeling(spark, sf_dir):
    """Distributed k-core == serial Python peeling on the same graph."""
    from collections import defaultdict

    from gpu_database_spark.llm.graphrank import KCORE_K, synth_edges
    from gpu_database_spark.sources.catalog import load_table
    from gpu_database_spark import registry

    d = load_table(spark, sf_dir, "documents")
    edge_rows = {(r.src, r.dst) for r in synth_edges(d).collect()}
    adj = defaultdict(set)
    for s, t in edge_rows:
        adj[s].add(t)
        adj[t].add(s)
    alive = {r.doc_id for r in d.select("doc_id").collect()}
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < KCORE_K}
        if not drop:
            break
        alive -= drop
    got = {r.doc_id: r.core_degree for r in registry.queries()["graph_kcore"](spark, sf_dir).collect()}
    assert set(got) == alive
    for n in alive:
        assert got[n] == len(adj[n] & alive), n


def test_label_propagation_matches_serial_replica(spark, sf_dir):
    """The distributed synchronous LPA must produce the identical
    label assignment as a serial Python replay of the same rounds
    (self-vote, most-frequent label, ties to the smallest)."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from gpu_database_spark.llm.graphrank import (
        LPA_ITERS,
        label_propagation,
        synth_edges,
    )
    from gpu_database_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    edges = synth_edges(d.select(F.col("id").alias("doc_id")))
    got = {
        r.id: r.lbl for r in label_propagation(d, edges).collect()
    }

    nbrs = defaultdict(set)
    for r in edges.collect():
        nbrs[r.src].add(r.dst)
        nbrs[r.dst].add(r.src)
    ids = [r.id for r in d.collect()]
    lbl = {i: i for i in ids}
    for _ in range(LPA_ITERS):
        new = {}
        for i in ids:
            c = Counter(lbl[j] for j in nbrs[i])
            c[lbl[i]] += 1
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[i] = best[0]
        lbl = new
    assert got == lbl


def test_hits_matches_numpy(spark, sf_dir):
    """Distributed HITS must agree with a dense numpy replica of the
    same sum-normalized recursion to float tolerance."""
    import numpy as np
    from pyspark.sql import functions as F

    from gpu_database_spark.llm.graphrank import HITS_ITERS, hits, synth_edges
    from gpu_database_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    edges = synth_edges(d.select(F.col("id").alias("doc_id")))
    got = {r.id: (r.authority, r.hub) for r in hits(d, edges).collect()}

    ids = sorted(r.id for r in d.collect())
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for r in edges.collect():
        A[idx[r.src], idx[r.dst]] = 1.0
    a = np.ones(n)
    h = np.ones(n)
    for _ in range(HITS_ITERS):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    for v in ids:
        ga, gh = got[v]
        assert abs(ga - a[idx[v]]) < 1e-9
        assert abs(gh - h[idx[v]]) < 1e-9
