"""Seeded randomized properties for the skew-safe rank helper and the
forward as-of join — deterministic random cases (no hypothesis: one
Spark job per example is the cost driver, so a few well-chosen seeds
beat hundreds of shrunk ones)."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.ranks import bucketed_row_number


def _random_case(seed: int, n: int) -> list[tuple[int, float]]:
    rng = random.Random(seed)
    vals = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.3:
            v = float(rng.choice([0.0, -7.5, 3.25]))  # heavy ties
        elif kind < 0.6:
            v = rng.uniform(-1000, 1000)  # negatives: negative buckets
        else:
            v = rng.uniform(0, 50)  # dense small bucket
        vals.append((i, v))
    return vals


def test_bucketed_rank_random_cases_match_global(spark):
    for seed in (7, 42, 1337):
        rows = _random_case(seed, 2000)
        df = spark.createDataFrame(rows, "id long, v double")
        got = bucketed_row_number(
            df, "v", ["id"], F.floor(F.col("v") / 37), rank_col="i"
        )
        want = df.withColumn(
            "i", F.row_number().over(Window.orderBy("v", "id"))
        )
        diff = got.select("id", "i").exceptAll(want.select("id", "i")).count()
        assert diff == 0, f"seed {seed}: {diff} mismatches"


def test_asof_forward_shape_vs_pandas(spark):
    """The forward union+carry shape (as used by join_asof_forward)
    against pandas merge_asof(direction='forward', allow_exact_matches
    =False) on random keyed series."""
    rng = random.Random(99)
    left = [(k, rng.randint(0, 1000)) for k in range(3) for _ in range(60)]
    right = [
        (k, rng.randint(0, 1000), round(rng.uniform(1, 2), 3))
        for k in range(3)
        for _ in range(25)
    ]
    l_df = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    r_df = spark.createDataFrame(right, "k long, t long, val double")
    # dedupe right on (k, t): keep max val — a total order, mirroring
    # the tiebreak pandas needs for a deterministic compare
    r_best = r_df.groupBy("k", "t").agg(F.max("val").alias("val"))

    l_aug = l_df.select(
        "k", F.col("t").alias("_t"), F.lit(1).alias("_src"), "lid",
        F.lit(None).cast("double").alias("val"),
    )
    r_aug = r_best.select(
        "k", F.col("t").alias("_t"), F.lit(0).alias("_src"),
        F.lit(None).cast("long").alias("lid"), "val",
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("_t").asc(), F.col("_src").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    got = {
        r.lid: r.nxt
        for r in l_aug.unionByName(r_aug)
        .select(
            "_src", "lid", F.first("val", ignorenulls=True).over(w).alias("nxt")
        )
        .filter(F.col("_src") == 1)
        .collect()
    }

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        columns=["lid", "k", "t"],
    ).sort_values("t", kind="stable")
    rp = (
        pd.DataFrame(right, columns=["k", "t", "val"])
        .groupby(["k", "t"], as_index=False)["val"]
        .max()
        .sort_values("t", kind="stable")
    )
    want_df = pd.merge_asof(
        lp, rp, on="t", by="k", direction="forward", allow_exact_matches=False
    )
    for _, row in want_df.iterrows():
        w_val = None if pd.isna(row["val"]) else float(row["val"])
        assert got[row["lid"]] == w_val, (row["lid"], got[row["lid"]], w_val)


def test_grouped_bucketed_row_number_matches_per_group_sort(spark):
    """Per-group ranks from the (group, bucket)-partitioned plan must
    equal a straight per-group sort's row_number."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpu_database_spark.functions.ranks import grouped_bucketed_row_number

    df = spark.range(20_000).select(
        (F.col("id") % 7).alias("g"),
        ((F.col("id") * 2654435761) % 1000).cast("double").alias("v"),
        F.col("id"),
    )
    got = grouped_bucketed_row_number(
        df, ["g"], "v", ["id"], F.floor(F.col("v") / 50), rank_col="i"
    )
    want = df.withColumn(
        "j", F.row_number().over(Window.partitionBy("g").orderBy("v", "id"))
    )
    mism = got.join(want, ["g", "v", "id"]).filter(F.col("i") != F.col("j"))
    assert mism.count() == 0
