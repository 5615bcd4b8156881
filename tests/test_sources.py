"""Source/sink round-trips: CSV, JSONL, partitioned parquet (with
directory pruning), bucketed tables (shuffle-free joins)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gpu_database_spark.plans import inspect
from gpu_database_spark.sources import readers, writers
from gpu_database_spark.sources.catalog import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_round_trip(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    p = os.path.join(str(tmp_path), "nation_csv")
    writers.write_csv(n, p)
    back = readers.read_csv(
        spark, p, "n_nationkey INT, n_name STRING, n_regionkey INT"
    )
    assert _rows(back) == _rows(n)


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    r = load_table(spark, sf_dir, "region")
    p = os.path.join(str(tmp_path), "region_jsonl")
    writers.write_jsonl(r, p)
    back = readers.read_jsonl(spark, p, "r_regionkey INT, r_name STRING")
    assert _rows(back.select("r_regionkey", "r_name")) == _rows(r)


def test_partitioned_parquet_prunes_directories(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    p = os.path.join(str(tmp_path), "docs_by_lang")
    writers.write_parquet_partitioned(d, p, ["lang"])
    langs = [r.lang for r in d.select("lang").distinct().collect()]
    assert set(os.listdir(p)) >= {f"lang={lang}" for lang in langs}
    back = readers.read_parquet(spark, p).filter(F.col("lang") == langs[0])
    plan = inspect.formatted_plan(back)
    assert "PartitionFilters" in plan
    assert back.count() == d.filter(F.col("lang") == langs[0]).count()


def test_sorted_write_round_trip_and_clustering(spark, sf_dir, tmp_path):
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )
    p = os.path.join(str(tmp_path), "lineitem_sorted")
    writers.write_sorted_parquet(l, p, ["l_shipdate"], n_files=4)
    back = readers.read_parquet(spark, p)
    assert back.count() == l.count()
    # clustered: each output file covers a narrow, mostly disjoint
    # shipdate range (files sorted by their min overlap only at edges)
    import pyspark.sql.functions as SF

    stats = (
        back.withColumn("f", SF.input_file_name())
        .groupBy("f")
        .agg(SF.min("l_shipdate").alias("lo"), SF.max("l_shipdate").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(stats) == 4
    for prev, cur in zip(stats, stats[1:]):
        assert prev.hi <= cur.lo, "range partitions overlap"


def test_compact_parquet(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    p = os.path.join(str(tmp_path), "nation_many_files")
    n.repartition(10).write.parquet(p)
    before = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(before) >= 10
    writers.compact_parquet(spark, p, 2)
    after = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(after) <= 2
    assert _rows(readers.read_parquet(spark, p)) == _rows(n)


def test_csv_permissive_malformed_rows(spark, tmp_path):
    """PERMISSIVE CSV mode: malformed cells null out instead of failing
    the scan (dirty-ingest behavior at the edge of the pipeline)."""
    p = os.path.join(str(tmp_path), "dirty.csv")
    with open(p, "w") as f:
        f.write("k,v\n1,10\n2,not_a_number\n3,30\n")
    df = readers.read_csv(spark, p, "k INT, v INT")
    rows = {r.k: r.v for r in df.collect()}
    assert rows == {1: 10, 2: None, 3: 30}


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    writers.write_bucketed_table(
        o.select("o_orderkey", "o_totalprice"), "orders_b", "o_orderkey", 4
    )
    writers.write_bucketed_table(
        l.select("l_orderkey", "l_quantity"), "lineitem_b", "l_orderkey", 4
    )
    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        assert inspect.exchange_count(j) == 0, inspect.simple_plan(j)
        assert j.count() == o.join(l, o.o_orderkey == l.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")

def test_merge_upsert_sink(spark, tmp_path):
    """Delta-style MERGE sink: insert/update/delete across committed
    snapshots, atomic pointer, time travel, vacuum."""
    p = str(tmp_path / "merged")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    v1 = writers.merge_upsert(spark, p, base, ["k"])
    assert v1 == 1
    assert _rows(writers.read_snapshot(spark, p)) == [
        (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)
    ]
    # matched-update (k=2), not-matched-insert (k=4), NULL value carried
    upd = spark.createDataFrame(
        [(2, "B", None), (4, "d", 40.0)], "k long, name string, v double"
    )
    v2 = writers.merge_upsert(spark, p, upd, ["k"])
    assert v2 == 2
    assert _rows(writers.read_snapshot(spark, p)) == [
        (1, "a", 10.0), (2, "B", None), (3, "c", 30.0), (4, "d", 40.0)
    ]
    # matched delete via delete_col; delete flag on a missing key is a no-op
    dels = spark.createDataFrame(
        [(3, "x", 0.0, True), (9, "y", 0.0, True), (1, "A", 11.0, False)],
        "k long, name string, v double, _del boolean",
    )
    v3 = writers.merge_upsert(spark, p, dels, ["k"], delete_col="_del")
    assert v3 == 3
    assert _rows(writers.read_snapshot(spark, p)) == [
        (1, "A", 11.0), (2, "B", None), (4, "d", 40.0)
    ]
    # time travel to v1; vacuum keeps the last keep_versions snapshots
    assert _rows(writers.read_snapshot(spark, p, version=1)) == _rows(base)
    assert writers.snapshot_versions(p) == [1, 2, 3]
    v4 = writers.merge_upsert(spark, p, upd, ["k"], keep_versions=2)
    assert writers.snapshot_versions(p) == [3, 4] and v4 == 4


def test_merge_upsert_schema_mismatch_rejected(spark, tmp_path):
    import pytest

    p = str(tmp_path / "m2")
    writers.merge_upsert(
        spark, p, spark.createDataFrame([(1, "a")], "k long, s string"), ["k"]
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        writers.merge_upsert(
            spark, p, spark.createDataFrame([(1, 2.0)], "k long, other double"), ["k"]
        )


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round trip preserves values; filters reach the ORC scan
    (PushedFilters in the physical plan)."""
    import io
    from contextlib import redirect_stdout

    from gpu_database_spark.sources import readers

    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    n.write.orc(path)
    back = readers.read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))
    filtered = readers.read_orc(spark, path, columns=["n_nationkey", "n_name"]).filter(
        "n_nationkey = 3"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan and "IsNotNull(n_nationkey)" in plan
    assert filtered.count() == 1


def test_binary_file_source_roundtrip(spark, tmp_path):
    """binaryFile ingest: bytes come back exactly, with per-file
    metadata — the multimodal corpus front door."""
    from gpu_database_spark.sources import readers

    blobs = {f"img_{i}.bin": bytes([i]) * (10 + i) for i in range(5)}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)
    (tmp_path / "ignore.txt").write_text("not a blob")

    df = readers.read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(blobs)
    for name, data in blobs.items():
        assert bytes(rows[name].content) == data
        assert rows[name].length == len(data)


def test_events_schema_contract_every_sf(spark):
    """The engine's event-time contract: load_table('events') must yield
    BOTH ``ts`` (timestamp_ntz, us precision) and ``ts_ns`` (long,
    epoch-nanos = unix_micros(ts)*1000) regardless of how the fixture
    physically encodes ts (TIMESTAMP(NANOS)-as-bigint or timestamp[us]).
    A silent fixture re-encode broke 12 queries in round 4 — this test
    makes the next one fail loudly in-repo."""
    import os

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        ev = load_table(spark, d, "events")
        types = dict(ev.dtypes)
        assert types.get("ts") == "timestamp_ntz", (sf, types)
        assert types.get("ts_ns") == "bigint", (sf, types)
        bad = ev.filter(
            F.unix_micros(F.col("ts").cast("timestamp")) * 1000 != F.col("ts_ns")
        ).count()
        assert bad == 0, f"{sf}: ts/ts_ns disagree on {bad} rows"
