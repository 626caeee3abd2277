"""End-to-end lakehouse table-log walkthrough, as a user would run it:
atomic commits, metadata-only overwrite, snapshot isolation, time
travel, a CDC merge, and a VACUUM retention sweep — the Delta/Iceberg
mechanism demonstrated hermetically on plain parquet (this container
ships no table-format jars; `operators/tablelog.py` documents the
deploy-time swap and the object-store caveat).

The reference ETL overwrote object-store keys in place, so a reader
could observe a half-written layer; every step below is the engine's
answer to that failure mode. Run it:

    python examples/lakehouse_table_log.py [sf_dir]

(defaults to /root/testdata/sf0.001; the table starts from the nation
fixture and applies a synthetic change batch.)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from projetos_etl_spark.operators.cdc import apply_cdc
from projetos_etl_spark.operators.tablelog import commit, current_version, read, vacuum
from projetos_etl_spark.session import get_spark
from projetos_etl_spark.sources.io import load_table


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="lakehouse-table-log-example")
    table = tempfile.mkdtemp(prefix="tablelog_example_")

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )

    # 1. Two atomic appends -> versions 1 and 2. A reader between the
    #    two sees exactly v1's file list; there is no torn state.
    v1 = commit(nation.filter(F.col("n_regionkey") < 2), table, mode="append")
    v2 = commit(nation.filter(F.col("n_regionkey") >= 2), table, mode="append")
    n_v1, n_v2 = read(spark, table, v1).count(), read(spark, table, v2).count()
    print(f"append commits: v{v1} ({n_v1} rows) -> v{v2} ({n_v2} rows)")

    # 2. CDC merge: rename one nation, delete another, insert a new one;
    #    latest-change-per-key wins. The merged snapshot publishes as an
    #    OVERWRITE commit — metadata-only, the old files stay for time
    #    travel until vacuum retires them.
    base = read(spark, table)
    changes = spark.createDataFrame(
        [
            (0, "RENAMED_NATION", 0, 1, "U"),
            (1, None, None, 2, "D"),
            (99, "NEW_NATION", 3, 3, "I"),
        ],
        "n_nationkey int, n_name string, n_regionkey int, seq int, op string",
    )
    merged = apply_cdc(base, changes, key="n_nationkey")
    v3 = commit(merged, table, mode="overwrite")
    snap = read(spark, table, v3)
    print(
        f"cdc merge -> v{v3}: {snap.count()} rows "
        f"(renamed={snap.filter(F.col('n_name') == 'RENAMED_NATION').count()}, "
        f"deleted key 1 present={snap.filter(F.col('n_nationkey') == 1).count()}, "
        f"inserted key 99 present={snap.filter(F.col('n_nationkey') == 99).count()})"
    )

    # 3. Time travel: every retained manifest reconstructs its version
    #    by file list — no data copies. v2 still shows the pre-merge row.
    old = read(spark, table, v2)
    print(
        f"time travel to v{v2}: key 1 present={old.filter(F.col('n_nationkey') == 1).count()}, "
        f"{old.count()} rows"
    )

    # 4. VACUUM: keep the newest 2 manifests, delete data files only
    #    they no longer reference (age gate 0 — single-writer demo).
    audit = vacuum(table, keep_last=2, min_age_seconds=0.0)
    print(
        f"vacuum: versions {audit['versions_before']}->{audit['versions_after']}, "
        f"deleted {audit['files_deleted']} of {audit['files_before']} data files"
    )

    # 5. Retained snapshots still resolve after the sweep; the current
    #    version is unchanged.
    assert read(spark, table, v2).count() == n_v2
    assert current_version(table) == v3
    print(f"post-vacuum: v{v2} still readable, current=v{current_version(table)}")
    print("TABLE LOG OK")

    shutil.rmtree(table)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
