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


def test_wilcoxon_signed_rank_random_frames_match_naive(spark, tmp_path):
    """stat_wilcoxon_signed_rank's bucketed two-level 'below' prefix
    must reproduce a naive Python signed-rank computation on random
    paired frames written as throwaway events fixtures — including
    heavy |d| ties and all-positive / all-negative splits."""
    import datetime
    import math
    import os

    from gpu_database_spark.operators.stattests import (
        stat_wilcoxon_signed_rank,
    )

    base_ts = datetime.datetime(2026, 1, 1)
    for seed in (11, 23):
        rng = random.Random(seed)
        rows = []
        eid = 0
        diffs = []
        for u in range(160):
            kind = rng.random()
            if kind < 0.25:
                d = rng.choice([2.0, -2.0, 0.5])  # tie-heavy |d|
            elif kind < 0.35:
                d = 0.0  # exact zero pair: must drop
            else:
                d = rng.uniform(-30, 30)
            diffs.append(d)
            # one view at value d, one purchase at value 0 -> mean
            # difference is exactly d for this user
            for et, v in (("view", d), ("purchase", 0.0)):
                rows.append(
                    (
                        eid,
                        base_ts + datetime.timedelta(seconds=eid),
                        u,
                        et,
                        float(v),
                        "{}",
                    )
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )
        sf_dir = os.path.join(str(tmp_path), f"wsr{seed}")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sf_dir, "events.parquet")
        )

        nz = [d for d in diffs if d != 0.0]
        order = sorted(range(len(nz)), key=lambda i: abs(nz[i]))
        ranks = [0.0] * len(nz)
        i = 0
        while i < len(order):
            j = i
            while (
                j < len(order)
                and abs(nz[order[j]]) == abs(nz[order[i]])
            ):
                j += 1
            for t in range(i, j):
                ranks[order[t]] = (i + 1 + j) / 2.0
            i = j
        n = len(nz)
        w_plus = sum(r for r, d in zip(ranks, nz) if d > 0)
        tie_counts: dict[float, int] = {}
        for d in nz:
            tie_counts[abs(d)] = tie_counts.get(abs(d), 0) + 1
        ties = sum(t**3 - t for t in tie_counts.values())
        var = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
        z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)

        row = stat_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
        assert row.n_pairs == n, (seed, row.n_pairs, n)
        assert abs(row.w_plus - w_plus) < 1e-6, (seed, row.w_plus, w_plus)
        assert abs(row.z - z) < 1e-6, (seed, row.z, z)
