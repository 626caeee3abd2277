"""Fixture-encoding drift guard (VERDICT r3 item #4).

Round 3 lost 34 registry entries, the bench, and the test suite to ONE
silent fixture change: the driver regenerated ``events.parquet`` with
``ts`` as TIMESTAMP(MICROS) where the engine assumed TIMESTAMP(NANOS).
This module pins the *loaded* Spark schema of all ten fixture tables —
the engine-facing contract — so the next physical-encoding drift (props
becoming a struct, dates becoming DATE32, ...) surfaces as one named,
self-explaining test failure instead of dozens of cryptic analysis
errors scattered across the registry.

If this test fails after a fixture regeneration: the fixtures changed,
not the engine. Update the expectation below AND audit every operator
that reads the changed column (``grep`` the column name across
``projetos_etl_spark/registry/``), then re-run the full parity suite.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from projetos_etl_spark.sources.io import TABLES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# The engine-facing contract: dtypes as loaded by ``load_table`` (i.e.
# after scan-time normalization such as events.ts → TimestampType).
EXPECTED_LOADED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    # ts is TimestampType here BY CONTRACT whatever the physical encoding
    # (nanos-as-long or micros) — normalize_ts_cols adapts at scan time.
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}

#: Physical encodings the adaptive events scan knows how to normalize.
SUPPORTED_EVENTS_TS_PHYSICAL = {"int64", "timestamp[ns]", "timestamp[us]", "timestamp[ms]"}


def test_fixture_tables_enumerated():
    assert set(EXPECTED_LOADED) == set(TABLES)


@pytest.mark.parametrize("table", TABLES)
def test_loaded_schema_matches_contract(spark, table):
    got = load_table(spark, SF_DIR, table).dtypes
    assert got == EXPECTED_LOADED[table], (
        f"FIXTURE DRIFT on '{table}': loaded schema {got} != contracted "
        f"{EXPECTED_LOADED[table]}. The driver likely regenerated "
        f"{SF_DIR}/{table}.parquet with a new physical encoding — update "
        "EXPECTED_LOADED and audit every registry operator touching the "
        "changed columns (see module docstring)."
    )


def test_events_ts_physical_encoding_supported():
    """The scan adapts to nanos-as-long and micros/millis timestamps; a
    genuinely new physical type for events.ts must fail HERE, loudly,
    with instructions — not deep inside 30 registry operators."""
    phys = str(pq.read_schema(f"{SF_DIR}/events.parquet").field("ts").type)
    assert phys in SUPPORTED_EVENTS_TS_PHYSICAL, (
        f"events.ts physical type '{phys}' is outside the encodings "
        f"normalize_ts_cols handles ({sorted(SUPPORTED_EVENTS_TS_PHYSICAL)}); "
        "extend projetos_etl_spark/sources/io.py:normalize_ts_cols."
    )


def test_documents_text_is_single_line(spark):
    """scan_csv_multiline_quoted's newline-injection round-trip (and its
    oracle over the original view) is exact ONLY while the fixture text
    contains no embedded newlines or double quotes; if the generator
    ever changes that, fail HERE with a pointer, not in the entry."""
    from pyspark.sql import functions as F

    n_bad = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("text").contains("\n") | F.col("text").contains('"'))
        .count()
    )
    assert n_bad == 0, (
        f"FIXTURE DRIFT: {n_bad} documents.text rows now contain newlines "
        "or quotes — rework scan_csv_multiline_quoted's injection scheme "
        "(registry/sources.py) to a reversible encoding."
    )
