#!/usr/bin/env python
"""Per-query optimization profiler (rounds 13+).

For each named query: capture .explain("formatted") to
plans/<round>/<name>_<tag>.txt, then time N collect() runs (same action
the bench uses) plus one noop-sink run, and print per-query timings with
exchange counts. Usage:

    python tools/profile_queries.py --tag before q1_pricing_summary ...
    python tools/profile_queries.py --tag before --top 20   # slowest 20 from BENCH_DETAIL.json

The explain is captured BEFORE execution (initial AQE plan — what the
optimizer promises); timings use a warmed session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", dest="round_dir", default="r14")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        detail = json.load(open(os.path.join(HERE, "BENCH_DETAIL.json")))
        ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
        for k, _ in ranked[: args.top]:
            if k not in names and k != "aria_ycsb_batch":
                names.append(k)

    from gpu_database_spark.session import get_spark
    from gpu_database_spark import registry
    from gpu_database_spark.plans import inspect
    from gpu_database_spark.functions.materialize import release_all

    spark = get_spark(app_name="profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # Warm the JVM exactly like bench.py does; derive the warmup dir
    # from the SF_DIR root so the tool works wherever the fixtures live
    # (ADVICE r13: the hardcoded /root/testdata/sf0.001 crashed in
    # environments without that exact path).
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    qs["q1_pricing_summary"](spark, warm_dir).collect()
    qs["mm_extract_features"](spark, warm_dir).collect()
    release_all(spark)

    plan_dir = os.path.join(HERE, "plans", args.round_dir)
    os.makedirs(plan_dir, exist_ok=True)

    results = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        # Build once for the plan snapshot (un-executed: initial plan).
        t_build0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t_build0
        with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(inspect.formatted_plan(df))
        release_all(spark)

        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            times.append(time.perf_counter() - t0)
            release_all(spark)
        # noop-sink run (guide 1.4): computation without collect-to-driver
        df2 = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t0
        ex = inspect.exchange_count(df2)
        release_all(spark)
        results[name] = {
            "build_s": round(t_build, 3),
            "collect_min_s": round(min(times), 3),
            "collect_all": [round(t, 3) for t in times],
            "noop_s": round(t_noop, 3),
            "exchanges_final": ex,
        }
        print(
            f"{name:40s} build {t_build:6.2f}  collect_min {min(times):6.2f} "
            f"noop {t_noop:6.2f}  ex {ex}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
