"""Contract for the seeded fixture regenerator (tools/gen_fixtures.py).

The seed-robustness probe (VERDICT r10 item 3) is only valid if the
regenerated corpus is drop-in compatible with the driver corpus: same
tables, same schemas, referentially intact joins — and it must actually
carry the high key bits the probe exists to exercise (the Morton-class
latent survived nine rounds because no seed-42 key reached bit 14).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tools.gen_fixtures import generate

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("seedgen") / "sf_seed99")
    generate(seed=99, scale=1, out=out)
    return out


def test_schemas_match_the_driver_corpus(corpus):
    for t in TABLES:
        want = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        got = pq.read_schema(os.path.join(corpus, f"{t}.parquet"))
        assert got.names == want.names, t
        for name in want.names:
            assert got.field(name).type == want.field(name).type, (t, name)


def test_key_bases_exceed_bit_14(corpus):
    for t, col in (
        ("customer", "c_custkey"), ("orders", "o_orderkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
    ):
        tab = pq.read_table(os.path.join(corpus, f"{t}.parquet"), columns=[col])
        lo = min(tab.column(col).to_pylist())
        assert lo >= (1 << 14), (t, lo)


def test_foreign_keys_resolve(corpus):
    def keys(t, c):
        return set(
            pq.read_table(os.path.join(corpus, f"{t}.parquet"), columns=[c])
            .column(c).to_pylist()
        )

    custs = keys("customer", "c_custkey")
    assert keys("orders", "o_custkey") <= custs
    ords = keys("orders", "o_orderkey")
    li = pq.read_table(os.path.join(corpus, "lineitem.parquet"))
    assert set(li.column("l_orderkey").to_pylist()) <= ords
    assert set(li.column("l_partkey").to_pylist()) <= keys("part", "p_partkey")
    assert set(li.column("l_suppkey").to_pylist()) <= keys("supplier", "s_suppkey")


def test_events_span_stays_inside_the_spine_cap(corpus):
    from projetos_etl_spark.registry.prep import SPINE_SPAN_CAP_HOURS

    ts = pq.read_table(
        os.path.join(corpus, "events.parquet"), columns=["ts"]
    ).column("ts").to_pylist()
    span_hours = (max(ts) - min(ts)).total_seconds() / 3600
    assert span_hours < SPINE_SPAN_CAP_HOURS


def test_documents_nchars_and_embedding_norms(corpus):
    import numpy as np

    d = pq.read_table(os.path.join(corpus, "documents.parquet"))
    assert all(
        len(t) == n
        for t, n in zip(d.column("text").to_pylist(), d.column("n_chars").to_pylist())
    )
    e = pq.read_table(os.path.join(corpus, "embeddings.parquet"))
    v = np.array(e.column("embedding").to_pylist(), dtype=np.float64)
    assert v.shape[1] == 64
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
