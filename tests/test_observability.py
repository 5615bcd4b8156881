"""Pipeline observability: df.observe() metrics ride along the query
(no second scan) — the production pattern for row-count/quality
telemetry on 100 TB jobs where a separate .count() doubles the IO."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from gpu_database_spark.sources.catalog import load_table


def test_observe_metrics_ride_along(spark, sf_dir):
    obs = Observation("lineitem_scan")
    l = load_table(spark, sf_dir, "lineitem")
    out = (
        l.observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(F.when(F.col("l_discount") > 0.1, 1).otherwise(0)).alias(
                "suspicious_discounts"
            ),
        )
        .filter(F.col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .count()
    )
    result = {r.l_returnflag: r["count"] for r in out.collect()}
    assert result and sum(result.values()) > 0
    got = obs.get
    assert got["rows_seen"] == l.count()  # observed BEFORE the filter
    assert got["suspicious_discounts"] == 0  # fixture discounts cap at 0.1
