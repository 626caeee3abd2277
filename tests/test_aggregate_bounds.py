"""Quantitative bound for the one registry entry with no value oracle:
approx_count_distinct (VERDICT r1 item 3). HLL++ at rsd=0.02 must land
within 3*rsd of the exact count at both test scales."""

from __future__ import annotations

import os

import pytest

from projetos_etl_spark.registry.aggregates import agg_count_distinct_approx

SCALES = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf_dir", SCALES, ids=[os.path.basename(s) for s in SCALES])
def test_approx_count_distinct_within_3_rsd(spark, sf_dir):
    rows = agg_count_distinct_approx(spark, sf_dir).collect()
    assert rows, "entry returned no groups"
    # The entry computes the 3-rsd band flag itself (oracle pins it true).
    assert all(r.est_within_band for r in rows), [
        (r[0], r.exact_parts) for r in rows if not r.est_within_band
    ]


@pytest.mark.parametrize("sf_dir", SCALES, ids=[os.path.basename(s) for s in SCALES])
def test_percentile_approx_rank_error(spark, sf_dir):
    """percentile_approx(accuracy=1000) guarantees rank error <= n/1000;
    translate that into a value-band check: the estimate must lie
    between the exact quantiles at 0.5 +/- 2/1000."""
    from projetos_etl_spark.registry.aggregates import agg_percentile_approx
    from projetos_etl_spark.sources.io import load_table

    import pyspark.sql.functions as F

    rows = agg_percentile_approx(spark, sf_dir).collect()
    assert rows
    # The entry computes its own (wider, 0.495-0.505) band flag; it must
    # hold everywhere — the oracle pins it true, so a regression here
    # would also hash-mismatch at the driver.
    assert all(r.est_within_band for r in rows)
    orders = load_table(spark, sf_dir, "orders")
    for r in rows:
        band = (
            orders.filter(F.col("o_orderstatus") == r[0])
            .agg(
                F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx"),
                F.expr("percentile(o_totalprice, 0.498)").alias("lo"),
                F.expr("percentile(o_totalprice, 0.502)").alias("hi"),
            )
            .collect()[0]
        )
        assert band.lo <= band.approx <= band.hi, (
            f"group {r[0]!r}: approx {band.approx} outside "
            f"[{band.lo}, {band.hi}] (exact {r.exact_median})"
        )
