#!/usr/bin/env python
"""Judge-reproducible full driver-contract verify (VERDICT r11 ask #8).

Runs exactly what the verification driver runs, over the ENTIRE
declared surface instead of the driver's 50-query rotation window:
a VANILLA SparkSession (no engine confs — exercises tune_session's
runtime conf-setting), the entry() smoke at sf0.001, then every
queries() entry at sf0.01 — hash-compared against its oracle_sql()
via DuckDB when oracled, rows-only (>0 rows returned) otherwise.

    python tools/verify_all.py [--json VERIFY_r12.json] [--sf SF_DIR]

Writes {sf_dir, n_oracled, n_rows_only, n_fail, fails, total_sec,
queries: {name: {status, sec[, rows][, err]}}} — the per-round
VERIFY_r{N}.json artifact committed alongside the sweeps.
"""

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
    from pyspark.sql import SparkSession

    from oracle_utils import assert_query_matches_oracle

    import __spark_entry__ as e

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]

    # vanilla on purpose: the driver does not apply engine confs
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-all")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    smoke = e.entry(spark).collect()
    print(f"SMOKE rows: {len(smoke)}", flush=True)
    assert smoke, "entry() returned no rows"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    fails: list[str] = []
    record: dict[str, dict] = {}
    t_start = time.time()
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            df = fn(spark, sf)
            if name in osql:
                assert_query_matches_oracle(df, con, osql[name], name=name)
                record[name] = {
                    "status": "ok",
                    "sec": round(time.time() - t0, 2),
                }
                print(f"OK   {name}", flush=True)
            else:
                n_rows = df.count()
                assert n_rows > 0, f"rows-only query returned {n_rows} rows"
                record[name] = {
                    "status": "ok-rows",
                    "rows": n_rows,
                    "sec": round(time.time() - t0, 2),
                }
                print(f"ROWS {name} {n_rows}", flush=True)
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

            try:
                release_all(spark)
            except Exception as ex:  # noqa: BLE001
                print(f"release_all failed: {str(ex)[:120]}", flush=True)
    print("DONE fails:", fails)
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf,
                    "n_oracled": sum(
                        1 for r in record.values() if r["status"] == "ok"
                    ),
                    "n_rows_only": sum(
                        1 for r in record.values() if r["status"] == "ok-rows"
                    ),
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
