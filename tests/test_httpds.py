"""Custom httpfile Data Source tests: executor-side fetch over file://
URLs (hermetic stand-in for http://), multi-URL partitioning, CSV and
JSON-lines parsing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from projetos_etl_spark.sources.httpds import HttpFileDataSource

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def registered(spark):
    from projetos_etl_spark.session import ship_package

    ship_package(spark)
    spark.dataSource.register(HttpFileDataSource)
    return spark


def _write_csv(path, rows):
    with open(path, "w") as f:
        f.write("k,name,score\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def test_csv_over_file_url(registered, tmp_path):
    _write_csv(tmp_path / "a.csv", [(1, "x", 1.5), (2, "y", 2.5)])
    df = (
        registered.read.format("httpfile")
        .schema(SCHEMA)
        .option("url", f"file://{tmp_path}/a.csv")
        .load()
    )
    assert sorted(tuple(r) for r in df.collect()) == [(1, "x", 1.5), (2, "y", 2.5)]


def test_multi_url_is_partition_parallel(registered, tmp_path):
    _write_csv(tmp_path / "a.csv", [(1, "x", 1.0)])
    _write_csv(tmp_path / "b.csv", [(2, "y", 2.0)])
    df = (
        registered.read.format("httpfile")
        .schema(SCHEMA)
        .option("url", f"file://{tmp_path}/a.csv,file://{tmp_path}/b.csv")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 2


def test_jsonl_format(registered, tmp_path):
    with open(tmp_path / "d.jsonl", "w") as f:
        for d in [{"k": 5, "name": "j", "score": 0.5}, {"k": 6, "name": None, "score": 1.25}]:
            f.write(json.dumps(d) + "\n")
    df = (
        registered.read.format("httpfile")
        .schema(SCHEMA)
        .option("url", f"file://{tmp_path}/d.jsonl")
        .option("format", "jsonl")
        .load()
    )
    assert sorted((tuple(r) for r in df.collect()), key=str) == [
        (5, "j", 0.5),
        (6, None, 1.25),
    ]


def test_permissive_ragged_and_bad_rows(registered, tmp_path):
    """ADVICE r1: a short row or an unparseable numeric must null-fill,
    never kill the partition (PERMISSIVE posture, like the CSV scans)."""
    from pyspark.sql import types as T

    p = tmp_path / "ragged.csv"
    p.write_text("a,b,c\n1,x,2.5\n2,y\n3,z,not_a_number\njunk\n")
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    df = (
        registered.read.format("httpfile")
        .schema(schema)
        .option("url", f"file://{p}")
        .load()
    )
    rows = sorted(tuple(r) for r in df.collect() if r[0] is not None)
    assert rows == [(1, "x", 2.5), (2, "y", None), (3, "z", None)]
    # the 'junk' line: lands in column a, fails the long cast -> all-NULL
    assert df.count() == 4
