"""Micro-bench for the r13 optimization loop: time named registry
entries with the exact bench.py methodology (sf0.001 warm-up, noop sink,
N timed runs, median + min) without paying for the whole headline list.

    python tools/r13_time.py ml_kmeans_lloyd,ml_logreg_gd [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projetos_etl_spark.registry import all_queries  # noqa: E402
from projetos_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark(app_name="r13-time")
    reg = all_queries()
    print(f"load_avg_start={os.getloadavg()}")
    for name in names:
        n_warm = 4 if name.startswith("stream_") else 1
        for _ in range(n_warm):
            reg[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"r13-time: {name}")
            t0 = time.perf_counter()
            reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: median={sorted(ts)[len(ts)//2]} min={min(ts)} runs={ts}")
    print(f"load_avg_end={os.getloadavg()}")


if __name__ == "__main__":
    main()
