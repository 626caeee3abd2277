"""Unit tests for scan/sink helpers: gating behavior for unavailable
backends (excel/JDBC), hermetic file:// HTTP source, partitioned layer
layout, and CSV quoting round-trip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from projetos_etl_spark.medallion import bronze_ingest_excel, source_http
from projetos_etl_spark.sources.io import scan_csv, sink_partitioned

SF = "/root/testdata/sf0.001"


def test_scan_excel_gated_without_openpyxl(spark, tmp_path):
    pytest.importorskip("pandas")
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present — gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="openpyxl"):
        bronze_ingest_excel(spark, str(tmp_path / "missing.xlsx"))


def test_source_http_file_url_roundtrip(spark, tmp_path):
    spool = str(tmp_path / "spool.parquet")
    df = source_http(spark, f"file://{SF}/region.parquet", spool)
    assert df.count() == spark.read.parquet(f"{SF}/region.parquet").count()
    assert os.path.getsize(spool) > 0


def test_sink_partitioned_layout(spark, tmp_path):
    out = str(tmp_path / "layer")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    sink_partitioned(orders, out, ["o_orderstatus"])
    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    statuses = {r[0] for r in orders.select("o_orderstatus").distinct().collect()}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}
    # Pruned read-back returns exactly the partition's rows.
    n_f = orders.filter(F.col("o_orderstatus") == "F").count()
    assert (
        spark.read.parquet(out).filter(F.col("o_orderstatus") == "F").count() == n_f
    )


def test_scan_csv_explicit_schema_quoting(spark, tmp_path):
    out = str(tmp_path / "csv")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("s", T.StringType())]
    )
    df = spark.createDataFrame([(1, 'comma, "quote"'), (2, None)], schema)
    df.write.option("header", True).csv(out)
    back = scan_csv(spark, out, schema)
    assert {tuple(r) for r in back.collect()} == {(1, 'comma, "quote"'), (2, None)}
    assert back.schema == schema
