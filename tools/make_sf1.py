#!/usr/bin/env python
"""Synthesize sf1.0 / sf10 fixtures by deterministic NX replication.

The driver generates /root/testdata/sf{0.001,0.01,0.1} with its own
(seeded, out-of-repo) generator; a true sf1.0 isn't available locally.
For the magnitude-driven hash hazards the sf1.0 sweep exists to catch
(rank sums past BIGINT midpoints, cross-moment terms past ~1e11, the
double->DECIMAL shortest-string boundary), what matters is ROW COUNT
and SUM MAGNITUDE, not the exact generator: this tool builds sf1.0 as
ten id-shifted copies of sf0.1 —

* every key column shifts by copy_index * OFFSET (one power of 10
  above the sf0.1 max, so copies never collide and FK joins stay
  consistent: lineitem/orders/customer/supplier/part shift together);
* document text for copies 1-9 gets a ' vK' suffix so near-dup LSH
  buckets keep sf0.1-like sizes instead of 100x-ing pair counts with
  exact clones;
* region/nation (fixed dimensions) copy as-is; everything else keeps
  its values so per-row semantics are untouched.

Output: /root/repo/fixtures/sf1.0/{table}.parquet (single file each,
gitignored — regenerate with `python tools/make_sf1.py`). Sweep with
`python tools/parity_sweep.py /root/repo/fixtures/sf1.0`.

sf10 (r10 VERDICT ask #3 — one decade above the sweep ladder, for the
scan-bound scaling smoke): `python tools/make_sf1.py --copies 100
--name sf10` builds 100 id-shifted copies (60M-row lineitem, ~2 GB
parquet). Every OFFSET below exceeds its key family's sf0.1 max, so
any copy count keeps copies collision-free and FK-consistent.
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

# id offsets: one power of 10 above the sf0.1 max of each key family
O_OFF = 1_000_000   # o_orderkey / l_orderkey   (max 149,999)
C_OFF = 100_000     # c_custkey / o_custkey     (max 14,999)
S_OFF = 10_000      # s_suppkey / l_suppkey     (max 999)
P_OFF = 100_000     # p_partkey / l_partkey     (max 19,999)
D_OFF = 10_000      # doc_id                    (max 4,999)
V_OFF = 10_000      # vec_id                    (max 1,999)
E_OFF = 1_000_000   # event_id                  (max 99,999)
U_OFF = 10_000      # user_id                   (max 1,499)

TABLES: dict[str, str | None] = {
    "region": None,   # fixed dimension: copy once, unshifted
    "nation": None,
    "customer": f"c_custkey + k * {C_OFF} AS c_custkey, "
                "c_name, c_nationkey, c_acctbal, c_mktsegment",
    "supplier": f"s_suppkey + k * {S_OFF} AS s_suppkey, "
                "s_name, s_nationkey, s_acctbal",
    "part": f"p_partkey + k * {P_OFF} AS p_partkey, "
            "p_name, p_brand, p_type, p_size, p_retailprice",
    "orders": f"o_orderkey + k * {O_OFF} AS o_orderkey, "
              f"o_custkey + k * {C_OFF} AS o_custkey, "
              "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    "lineitem": f"l_orderkey + k * {O_OFF} AS l_orderkey, "
                f"l_partkey + k * {P_OFF} AS l_partkey, "
                f"l_suppkey + k * {S_OFF} AS l_suppkey, "
                "l_linenumber, l_quantity, l_extendedprice, l_discount, "
                "l_tax, l_returnflag, l_linestatus, l_shipdate",
    "events": f"event_id + k * {E_OFF} AS event_id, ts, "
              f"user_id + k * {U_OFF} AS user_id, event_type, value, props",
    "documents": f"doc_id + k * {D_OFF} AS doc_id, "
                 "CASE WHEN k = 0 THEN text "
                 "     ELSE text || ' v' || CAST(k AS VARCHAR) END AS text, "
                 "lang, source, n_chars",
    "embeddings": f"vec_id + k * {V_OFF} AS vec_id, embedding, label",
}


# --llm-distinct overrides for constant-DENSITY scaling fixtures.
#
# The default ' vK' document suffix leaves most word-3-gram shingles —
# and therefore most minhashes — unchanged, so all K copies of a doc
# land in the same LSH band buckets: candidate-pair counts grow with
# K^2, not K (measured: sf0.1 -> 10-copy sf1.0 = 673x pair expansions
# for 10x rows). That is a legitimate clone-heavy stress fixture, but
# it cannot measure the ENGINE's volume scaling for the near-dup
# family. These projections make copies mutually DISSIMILAR while
# preserving each copy's internal duplicate structure exactly:
#
# * documents: suffix the copy tag onto every non-final word
#   (' ' -> 'vK '), a per-copy BIJECTION of the vocabulary: shingle
#   k-gram structure is exactly preserved within a copy (so
#   within-copy Jaccard/minhash collision rates match the source
#   corpus), while cross-copy shingle sets are disjoint. An earlier
#   interleave variant (' ' -> ' vK ') was rejected: inserting a
#   token between words leaves only 2 source words per 3-gram
#   shingle, inflating collision rates to word-bigram levels
#   (measured 3,010-doc LSH buckets vs the source max of 8).
#   n_chars is recomputed (the source invariant is
#   n_chars = length(text)).
#   Two bounded edge cases of the tagging (acceptable for a scaling
#   fixture, like the single-word-doc caveat below): (a) cross-copy
#   disjointness assumes no SOURCE token already has the tagged form —
#   a source word 'carv1' collides with copy-1's tagging of 'car'
#   (the synthetic vocabulary contains no such tokens today); (b) the
#   regex rewrites the separator, so each doc's FINAL word stays
#   untagged — shingles touching the document boundary keep one
#   source token, slightly perturbing within-copy shingle structure
#   at the last k-1 positions only.
# * embeddings: per-copy random SIGN-FLIP of each dimension (a
#   diagonal orthogonal transform): within-copy cosine geometry is
#   exactly preserved; cross-copy cosine ~ N(0, 1/sqrt(64)) — far
#   below any near-dup threshold. Copy 0 is the identity.
LLM_DISTINCT: dict[str, str] = {
    "documents": f"doc_id + k * {D_OFF} AS doc_id, "
                 "CASE WHEN k = 0 THEN text "
                 "     ELSE regexp_replace(text, ' ', "
                 "          'v' || CAST(k AS VARCHAR) || ' ', 'g') "
                 "END AS text, "
                 "lang, source, "
                 "CAST(length(CASE WHEN k = 0 THEN text "
                 "     ELSE regexp_replace(text, ' ', "
                 "          'v' || CAST(k AS VARCHAR) || ' ', 'g') "
                 "END) AS BIGINT) AS n_chars",
    "embeddings": f"vec_id + k * {V_OFF} AS vec_id, "
                  "CASE WHEN k = 0 THEN embedding "
                  "     ELSE list_transform(embedding, (x, i) -> "
                  "          CAST(x * (1 - 2 * CAST(hash(k * 131 + i) % 2 "
                  "               AS INT)) AS FLOAT)) "
                  "END AS embedding, "
                  "label",
}


# ---------------------------------------------------------------------------
# Clustered embeddings (r12 VERDICT ask #2): the driver's embeddings
# fixture is near-uniform random, so even a GOOD index measures recall
# ~0.16 and the ANN gates had to pin floors at 0.08-0.3 — a band a real
# index regression can hide inside. This synthesizes a seeded
# mixture-of-Gaussians corpus (same schema: vec_id BIGINT,
# embedding FLOAT[], label INTEGER) where near neighbors are REAL:
# k centers with N(0,1) dims, each vector = its center + sigma*noise,
# every draw a Box-Muller transform of md5-derived uniforms — fully
# deterministic, no RNG state, reproducible from the SQL text alone.
# Recall floors measured on this fixture sit at 0.6-0.9, so the gates
# in tools/parity_sweep.py / tests/test_llm.py finally bind.

CLUSTERED_N = 2000   # matches sf0.1's corpus size
CLUSTERED_D = 64
CLUSTERED_K = 50     # ~40 vectors per cluster
CLUSTERED_SIGMA = 0.35


def _bm(tag: str) -> str:
    """Box-Muller N(0,1) from two md5-derived U(0,1) draws keyed by
    a seed expression (DuckDB SQL fragment; {tag} interpolates the
    per-draw key)."""
    u = (
        "((CAST(('0x' || substr(md5(%s), 1, 8)) AS BIGINT) + 0.5)"
        " / 4294967296.0)"
    )
    u1, u2 = u % f"{tag} || '_a'", u % f"{tag} || '_b'"
    return f"(sqrt(-2 * ln({u1})) * cos(2 * pi() * {u2}))"


def make_clustered_embeddings(dst_dir: str) -> str:
    """Write fixtures/<dst>/embeddings.parquet (idempotent) and return
    the directory path."""
    os.makedirs(dst_dir, exist_ok=True)
    out = os.path.join(dst_dir, "embeddings.parquet")
    if os.path.exists(out):
        return dst_dir
    center = _bm("'c' || c || '_' || i")
    noise = _bm("'n' || v || '_' || i")
    duckdb.connect().execute(
        f"""
        COPY (
            SELECT v AS vec_id,
                   list(CAST(ctr + {CLUSTERED_SIGMA} * nz AS FLOAT)
                        ORDER BY i) AS embedding,
                   CAST(v % 5 AS INTEGER) AS label
            FROM (
                SELECT v, i, {center} AS ctr, {noise} AS nz
                FROM (SELECT v, i, v % {CLUSTERED_K} AS c
                      FROM range({CLUSTERED_N}) t(v),
                           range({CLUSTERED_D}) s(i))
            )
            GROUP BY v ORDER BY v
        ) TO '{out}' (FORMAT PARQUET)
        """
    )
    return dst_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--name", default="sf1.0", help="fixtures/<name>/")
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset (default: all)"
    )
    ap.add_argument(
        "--llm-distinct", action="store_true",
        help="constant-density documents/embeddings copies (see above)"
    )
    ap.add_argument(
        "--clustered", action="store_true",
        help="synthesize fixtures/<name>/embeddings.parquet as a seeded "
             "mixture-of-Gaussians corpus instead of replicating (for "
             "the binding ANN recall gates; see make_clustered_embeddings)"
    )
    args = ap.parse_args()
    if args.clustered:
        d = make_clustered_embeddings(os.path.join(FIXDIR, args.name))
        print(f"clustered embeddings -> {d}")
        return
    dst = os.path.join(FIXDIR, args.name)
    only = set(args.tables.split(",")) if args.tables else None
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, proj in TABLES.items():
        if only and table not in only:
            continue
        if args.llm_distinct and table in LLM_DISTINCT:
            proj = LLM_DISTINCT[table]
        src = f"read_parquet('{SRC}/{table}.parquet')"
        out = os.path.join(dst, f"{table}.parquet")
        if proj is None:
            sql = f"COPY (SELECT * FROM {src}) TO '{out}' (FORMAT PARQUET)"
        else:
            sql = (
                f"COPY (SELECT {proj} FROM {src}, range({args.copies}) r(k)) "
                f"TO '{out}' (FORMAT PARQUET)"
            )
        con.execute(sql)
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
