"""Driver-simulation sweep: run every registry entry exactly the way the
external correctness harness does — fresh plain SparkSession (no repo
configs), DuckDB oracle side-by-side, order-insensitive compare.

    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01] \
        [--tz America/New_York] [--only name1,name2]

Exit code 0 iff every oracle-backed entry matches. ``--tz`` sets a
foreign session time zone to prove the engine's session contract re-pins
UTC per entry (the hostile-caller probe); ``--sf-dir`` at sf0.1 catches
scale-dependent nondeterminism the small factors can't.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tz", default=None, help="foreign session TZ probe")
    ap.add_argument("--only", default=None, help="comma-separated entry names")
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.master(f"local[{args.cpus}]").appName("driver-sim")
    if args.tz:
        builder = builder.config("spark.sql.session.timeZone", args.tz)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    queries, oracles = e.queries(), e.oracle_sql()
    names = sorted(args.only.split(",") if args.only else queries)

    def norm(p: pd.DataFrame) -> pd.DataFrame:
        p = p.reindex(sorted(p.columns), axis=1)
        if len(p):
            p = p.sort_values(by=list(p.columns), na_position="first", kind="mergesort")
        return p.reset_index(drop=True)

    fails: list[str] = []
    for name in names:
        try:
            sp = norm(queries[name](spark, args.sf_dir).toPandas())
        except Exception as ex:  # noqa: BLE001 — a sweep reports, never aborts
            fails.append(name)
            print(f"  {name}: ERROR -> {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"  {name}: rows-only ({len(sp)} rows)")
            continue
        try:
            du = norm(con.sql(oracles[name]).df())
        except Exception as ex:  # noqa: BLE001 — a sweep reports, never aborts
            # An oracle that ERRORS where the Spark side ran is itself a
            # parity failure (hostile-fixture sweeps hit these — e.g. a
            # DuckDB stddev overflow on planted Inf): report and go on.
            fails.append(name)
            print(f"  {name}: ORACLE-ERROR -> {str(ex)[:200]}")
            continue
        try:
            pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=True)
            print(f"  {name}: MATCH ({len(sp)} rows)", flush=True)
        except AssertionError as ex:
            fails.append(name)
            print(f"  {name}: MISMATCH -> {str(ex)[:200]}")
    print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
