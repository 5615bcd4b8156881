"""Custom Python DataSource (sources/pysource.py): batch determinism,
filter pushdown pruning, streaming replayability."""

from __future__ import annotations

from gpu_database_spark.sources.pysource import (
    SynthDocsReader,
    register_synthdocs,
)


def test_synthdocs_batch_deterministic(spark):
    register_synthdocs(spark)
    df = (
        spark.read.format("synthdocs")
        .option("n_rows", 500)
        .option("n_partitions", 7)
        .option("seed", 42)
        .load()
    )
    rows1 = sorted(map(tuple, df.collect()))
    assert len(rows1) == 500
    # identical on re-read and at a different partitioning
    df2 = (
        spark.read.format("synthdocs")
        .option("n_rows", 500)
        .option("n_partitions", 3)
        .option("seed", 42)
        .load()
    )
    assert sorted(map(tuple, df2.collect())) == rows1
    r = rows1[0]
    assert r[0] == 0 and r[4] == len(r[1])  # n_chars consistency


def test_synthdocs_filter_pushdown_prunes_partitions(spark):
    """doc_id range predicates must reach the reader and drop whole
    partitions before generation; results stay correct."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    register_synthdocs(spark)
    df = (
        spark.read.format("synthdocs")
        .option("n_rows", 1000)
        .option("n_partitions", 10)
        .load()
        .filter("doc_id >= 300 AND doc_id < 400")
    )
    got = sorted(r.doc_id for r in df.collect())
    assert got == list(range(300, 400))

    # unit-level: the reader narrows its range and prunes partitions
    rd = SynthDocsReader({"n_rows": "1000", "n_partitions": "10"})
    leftover = list(
        rd.pushFilters(
            [GreaterThanOrEqual(("doc_id",), 300), LessThan(("doc_id",), 400)]
        )
    )
    assert leftover == []
    parts = rd.partitions()
    assert len(parts) == 1 and (parts[0].start, parts[0].end) == (300, 400)

    rd2 = SynthDocsReader({"n_rows": "1000", "n_partitions": "10"})
    assert list(rd2.pushFilters([EqualTo(("doc_id",), 7)])) == []
    p2 = rd2.partitions()
    assert len(p2) == 1 and (p2[0].start, p2[0].end) == (7, 8)


def test_synthdocs_downstream_operators_run(spark):
    """Connector output feeds the existing corpus operators unchanged."""
    from pyspark.sql import functions as F

    from gpu_database_spark.llm.curation import pack_census
    from gpu_database_spark.llm.textstats import token_count

    register_synthdocs(spark)
    docs = spark.read.format("synthdocs").option("n_rows", 300).load()
    toks = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tok")
    )
    census = pack_census(toks)
    total = census.agg(F.sum("tokens_started")).collect()[0][0]
    exact = toks.agg(F.sum("n_tok")).collect()[0][0]
    assert total == exact > 0


def test_synthdocs_stream_matches_batch(spark, tmp_path):
    """The micro-batch stream, drained with availableNow, emits exactly
    the batch rows — offsets advance deterministically."""
    register_synthdocs(spark)
    stream = (
        spark.readStream.format("synthdocs")
        .option("n_rows", 250)
        .option("rows_per_batch", 64)
        .option("seed", 9)
        .load()
    )
    # availableNow falls back to one micro-batch for Python stream
    # sources (Spark 4.1) — run free and poll until the source drains.
    import time as _time

    q = (
        stream.writeStream.format("memory")
        .queryName("t_synthdocs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if spark.table("t_synthdocs").count() >= 250:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.table("t_synthdocs").collect())
    batch = (
        spark.read.format("synthdocs")
        .option("n_rows", 250)
        .option("seed", 9)
        .load()
    )
    assert got == sorted(tuple(r) for r in batch.collect())
    assert len(got) == 250
