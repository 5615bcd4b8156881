"""Custom connectors via the Python DataSource API (Spark 4).

The reference's ingest edge is a host loop that materializes rows and
bulk-loads them (``src/database/ycsb/db.h:42-53``). The Spark-native
equivalent of "a source the engine doesn't ship" is a user-defined
DataSource: ``synthdocs`` generates a documents-shaped corpus
DETERMINISTICALLY on the executors — every partition derives its rows
from (seed, doc_id) alone, so no driver materialization, any
partition count, bit-identical output anywhere.

Two readers:

* batch (``spark.read.format("synthdocs")``) — splits the id range
  into ``n_partitions`` input partitions; supports **filter pushdown**
  (Spark 4.1 ``pushFilters``): comparisons on ``doc_id`` prune whole
  partitions before any row is generated, the custom-source analogue
  of parquet row-group pruning.
* micro-batch stream (``spark.readStream.format("synthdocs")``) —
  a SimpleDataSourceStreamReader advancing ``rows_per_batch`` ids per
  micro-batch with replayable offsets (same (seed, id) derivation, so
  a restarted query regenerates identical batches — exactly-once by
  determinism).

Rows are cheap synthetic text (md5-derived), matching the fixture
``documents`` schema so every downstream operator (dedup, quality,
packing) runs on connector output unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_LANGS = ("en", "de", "fr", "es", "it")
_WORDS = (
    "data spark shuffle join scan filter window batch stream merge "
    "vector token corpus sample split pack dedup hash bucket"
).split()


def _row(seed: int, i: int) -> tuple:
    """One synthetic document, a pure function of (seed, doc_id)."""
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    n_words = 5 + int(h[:2], 16) % 40
    words = [
        _WORDS[int(h[(2 + k) % 30] + h[(3 + k) % 30], 16) % len(_WORDS)]
        for k in range(n_words)
    ]
    text = " ".join(words)
    return (
        i,
        text,
        _LANGS[int(h[30], 16) % len(_LANGS)],
        f"src{int(h[31], 16) % 5}",
        len(text),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 0))
        self.lo, self.hi = 0, self.n_rows  # id range after pushdown

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume doc_id range comparisons by narrowing [lo, hi);
        everything else is returned for Spark to re-apply. Pruning
        happens in partitions() — a fully-pruned partition never runs."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("doc_id",):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self):
        """Fixed-width id slices, clipped to the pushed-down range —
        empty slices are dropped, so a selective predicate skips whole
        generator tasks (observable as fewer scan partitions)."""
        width = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        parts = []
        for s in range(0, self.n_rows, width):
            lo = max(s, self.lo)
            hi = min(s + width, self.hi)
            if lo < hi:
                parts.append(_RangePartition(lo, hi, self.seed))
        return parts or [_RangePartition(0, 0, self.seed)]

    def read(self, part: _RangePartition):
        for i in range(part.start, part.end):
            yield _row(part.seed, i)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Replayable micro-batch source: offset = next doc_id. read()
    advances by rows_per_batch; readBetweenOffsets() regenerates any
    window bit-identically (determinism = exactly-once on replay)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("n_rows", 1000))
        self.seed = int(options.get("seed", 0))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        end = {"next": hi}
        return iter([_row(self.seed, i) for i in range(lo, hi)]), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(self.seed, i) for i in range(start["next"], end["next"])])


class SynthDocsDataSource(DataSource):
    """spark.read.format("synthdocs").option("n_rows", N) — see module
    docstring. Register with spark.dataSource.register(SynthDocsDataSource)."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


def register_synthdocs(spark) -> None:
    from gpu_database_spark.session import tune_session

    tune_session(spark)  # enables spark.sql.python.filterPushdown
    spark.dataSource.register(SynthDocsDataSource)
