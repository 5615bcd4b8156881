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

    python tools/parity_sweep.py [sf_dir]     # default /root/testdata/sf0.1

Prints one OK/FAIL line per query and a final "DONE fails: [...]".
Exit code 1 if any query fails.
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

    from gpu_database_spark.session import get_spark
    from oracle_utils import assert_query_matches_oracle

    import __spark_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
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
    for name, fn in sorted(qs.items()):
        if name not in osql:
            continue
        try:
            t0 = time.time()
            assert_query_matches_oracle(fn(spark, sf_dir), con, osql[name], name=name)
            print(f"OK   {name} {time.time() - t0:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"FAIL {name}: {str(ex)[:300]}", flush=True)
        finally:
            from gpu_database_spark.functions.materialize import release_all

            try:  # don't pin checkpoint blocks across the whole sweep
                release_all(spark)
            except Exception as ex:  # noqa: BLE001 — never abort the sweep
                print(f"release_all failed: {str(ex)[:120]}", flush=True)
    print("DONE fails:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
