"""gpu_database_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
``lvhaodong0114/gpu-database`` (a GPU-resident KV store executing
YCSB-style transaction batches under the Aria deterministic
concurrency-control protocol; see SURVEY.md) as idiomatic Spark
DataFrame / SQL programs, and extends them with the OLAP and
LLM-data-pipeline surface a 100 TB training-data platform needs.

Design stance (SURVEY.md §7): declare logical plans with the
DataFrame API, let Catalyst/Tungsten/AQE pick physical strategy;
Python UDFs only where built-ins genuinely cannot express the
semantics (and then Arrow-batched).

Layout:
    sources/    parquet/csv/json readers, fixture catalog, sinks
    operators/  relational operators (KV parity, joins, aggs,
                windows, set ops, sorts) and the Aria engine
    functions/  scalar/hashing/text/vector expression builders
    plans/      plan-inspection helpers (pushed filters, broadcast,
                codegen) used by tests to keep physical plans honest
    streaming/  Structured Streaming jobs + their batch equivalents
    llm/        dedup, similarity search, text analysis, multimodal
"""

__version__ = "0.1.0"
