"""The distributed-rank recipe, end to end — how to compute EXACT global
window results (ranks, ntile buckets, running sums) without the
single-reducer sort that an un-partitioned ``Window.orderBy`` plans.

This is the recipe users will copy when a global window shows up on a
big table. Both instances below are registry entries whose oracles pin
them to the EXACT single-window answer — the scale variants are not
approximations:

  deciles      ``win_ntile`` (single-partition window: fine on bounded
               outputs, a single-reducer sort on a 100 TB fact table)
               vs ``win_ntile_scale``: ``repartitionByRange`` on the
               unique total sort key -> per-range ``row_number`` over
               parallel local sorts -> broadcast cumulative partition
               COUNTS as offsets (a <=#partitions-row aggregate), then
               ntile's bucket arithmetic as pure integer expressions.
  concurrency  ``win_max_concurrency`` vs ``win_max_concurrency_scale``:
               the same split applied to a running SUM (+1/-1 session
               deltas) — prefix sums compose across ranges because + is
               associative, so per-partition local running sums plus
               broadcast per-partition TOTALS give the global level.

The general shape: (1) one range shuffle on a total ordering key that is
UNIQUE (boundaries then affect placement, never rank); (2) the window
runs per-range-partition, in parallel; (3) the only single-partition
work left is over per-partition aggregates — #partitions rows, constant
metadata at any input scale.

Run it:

    python examples/distributed_rank_recipes.py [sf_dir]

(defaults to /root/testdata/sf0.001; any sf dir works.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from projetos_etl_spark.plans.inspect import explain_str
from projetos_etl_spark.registry.windows import (
    win_max_concurrency,
    win_max_concurrency_scale,
    win_ntile,
    win_ntile_scale,
)
from projetos_etl_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="distributed-rank-recipes")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"== distributed-rank recipes ({sf_dir}) ==")

    # 1. Exact global deciles: single-partition window vs the recipe.
    exact = win_ntile(spark, sf_dir)
    scale = win_ntile_scale(spark, sf_dir)
    mismatches = (
        exact.alias("a")
        .join(scale.alias("b"), "o_orderkey")
        .filter(F.col("a.decile") != F.col("b.decile"))
        .count()
    )
    n = exact.count()
    print(f"deciles: {n} orders ranked; assignments identical: {mismatches == 0}")

    # The plans tell the scale story: the naive variant sorts the WHOLE
    # table in one partition (SinglePartition exchange feeding the
    # window); the recipe's input-sized exchange is rangepartitioning,
    # and its only single-partition work is over per-partition counts.
    naive_plan = explain_str(exact)
    scale_plan = explain_str(scale)
    print(f"naive plan has SinglePartition exchange: {'SinglePartition' in naive_plan}")
    print(f"scale plan range-partitions the input:   {'rangepartitioning' in scale_plan}")

    # 2. Peak concurrency: the same split over a running sum.
    peak_exact = win_max_concurrency(spark, sf_dir).collect()[0]
    peak_scale = win_max_concurrency_scale(spark, sf_dir).collect()[0]
    same = (
        peak_exact["max_concurrent"] == peak_scale["max_concurrent"]
        and peak_exact["first_peak_ts"] == peak_scale["first_peak_ts"]
    )
    print(
        f"concurrency: peak={peak_scale['max_concurrent']} at "
        f"{peak_scale['first_peak_ts']}; exact/scale identical: {same}"
    )

    if mismatches == 0 and same:
        print("DISTRIBUTED RANK OK")
    spark.stop()
    if mismatches != 0 or not same:
        raise SystemExit(1)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
