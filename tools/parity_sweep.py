#!/usr/bin/env python
"""Full Spark-vs-DuckDB oracle parity sweep at an arbitrary scale factor.

The verification driver gates at sf0.01; this sweep re-runs EVERY
oracled query at a larger SF to flush out scale-dependent divergence
the small fixture can't see. It has already earned its keep: at
sf0.1 it exposed the shortest-string double->decimal hazard (a
cross-moment term above ~1e11 rounds differently in Spark's
BigDecimal.valueOf path than in DuckDB's exact-binary conversion —
see functions/compat.py), which three queries were then hardened
against by centering/rescaling their moment terms.

    python tools/parity_sweep.py [sf_dir] [--json OUT.json]

Prints one OK/FAIL line per query and a final "DONE fails: [...]".
Exit code 1 if any query fails. With --json, also writes a machine-
readable record {sf_dir, n_ok, n_fail, fails, total_sec, queries:
{name: {status, sec}}} — the per-round SWEEP_r{N}.json artifact that
separates engine drift from environment drift in bench comparisons
(VERDICT r9 #6): unlike BENCH_r{N}.json this runs EVERY oracled query
in ONE fresh session with per-query seconds pinned."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import duckdb

    from gpu_database_spark.session import get_spark
    from oracle_utils import assert_query_matches_oracle

    import __spark_entry__ as e

    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    skip: set[str] = set()
    if "--skip" in args:
        # oracle-infeasible-at-this-SF queries (e.g. er_golden_record's
        # recursive-CTE oracle is quadratic by construction and only
        # runs at fixture scale — its large-SF evidence is Spark-side)
        i = args.index("--skip")
        skip = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark(app_name="parity-sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    fails: list[str] = []
    record: dict[str, dict] = {}
    t_start = time.time()
    for name, fn in sorted(qs.items()):
        if name not in osql:
            continue
        if name in skip:
            record[name] = {"status": "skipped", "sec": 0.0}
            print(f"SKIP {name}", flush=True)
            continue
        try:
            t0 = time.time()
            assert_query_matches_oracle(fn(spark, sf_dir), con, osql[name], name=name)
            sec = round(time.time() - t0, 2)
            record[name] = {"status": "ok", "sec": sec}
            print(f"OK   {name} {sec:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            record[name] = {
                "status": "fail",
                "sec": round(time.time() - t0, 2),
                "err": str(ex)[:300],
            }
            print(f"FAIL {name}: {str(ex)[:300]}", flush=True)
        finally:
            from gpu_database_spark.functions.materialize import release_all

            try:  # don't pin checkpoint blocks across the whole sweep
                release_all(spark)
            except Exception as ex:  # noqa: BLE001 — never abort the sweep
                print(f"release_all failed: {str(ex)[:120]}", flush=True)
    print("DONE fails:", fails)
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_ok": sum(1 for r in record.values() if r["status"] == "ok"),
                    "n_fail": len(fails),
                    "fails": fails,
                    "total_sec": round(time.time() - t_start, 1),
                    "queries": record,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}", flush=True)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
