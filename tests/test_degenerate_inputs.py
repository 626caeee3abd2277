"""Degenerate-input hardening: the real registry entries driven against
hostile fixtures the standard testdata never produces.

Spark 4 runs ANSI mode by default, so ANY division whose divisor goes
to zero RAISES (DIVIDE_BY_ZERO) instead of yielding NULL — a single
degenerate group anywhere in 100 TB (a singleton category, a constant
feature, a zero embedding, a one-class label column) would kill the
whole job. Every case here crashed or would crash before the guards;
the convention after them: an undefined statistic is NULL (cosine of a
zero vector is 0.0, quantization codes of a constant vector are 0 —
both pinned in the entries' oracles too).

These tests call the REAL entry functions on tiny parquet tables
written with the production schemas, so a regression in the entry
itself (not a test-local copy) fails here.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from projetos_etl_spark.registry import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


_TS0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _write(tmp_path, name: str, table: pa.Table) -> None:
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def _orders(tmp_path, rows):
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
                "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
                "o_orderdate": pa.array([_TS0] * len(rows), pa.timestamp("us")),
                "o_orderpriority": pa.array([r[4] for r in rows], pa.string()),
            }
        ),
    )


def _events(tmp_path, rows):
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
    )


def _embeddings(tmp_path, vecs):
    _write(
        tmp_path,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i % 2 for i in range(len(vecs))], pa.int32()),
            }
        ),
    )


def test_loo_encode_singleton_category_is_null(spark, queries, tmp_path):
    _orders(
        tmp_path,
        [
            (1, 1, "O", 10.0, "1-URGENT"),
            (2, 1, "O", 30.0, "1-URGENT"),
            (3, 1, "O", 99.0, "5-LOW"),  # singleton: LOO undefined
        ],
    )
    rows = {
        r["o_orderkey"]: r["loo_mean_price"]
        for r in queries["feat_target_encode_loo"](spark, str(tmp_path)).collect()
    }
    assert rows[1] == 30.0 and rows[2] == 10.0
    assert rows[3] is None  # not a crash, not the row's own value


def test_scale_normalize_constant_segment_is_null(spark, queries, tmp_path):
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_name": pa.array(["a", "b", "c"], pa.string()),
                "c_nationkey": pa.array([0, 0, 0], pa.int32()),
                "c_acctbal": pa.array([500.0, 500.0, 500.0], pa.float64()),
                "c_mktsegment": pa.array(["FLAT"] * 3, pa.string()),
            }
        ),
    )
    got = queries["feat_scale_normalize"](spark, str(tmp_path)).collect()
    assert len(got) == 3
    assert all(r["minmax"] is None and r["zscore"] is None for r in got)


def test_rolling_zscore_constant_history_yields_no_rows_not_a_crash(
    spark, queries, tmp_path
):
    # 12 identical values: every trailing window has sd == 0. The guarded
    # z is NULL there, the filter drops it; before the guard the PROJECTED
    # division raised under ANSI even though the filter would discard it.
    _events(
        tmp_path,
        [
            (i, _TS0 + datetime.timedelta(minutes=i), 7, "view", 5.0)
            for i in range(12)
        ],
    )
    assert queries["anomaly_zscore_rolling"](spark, str(tmp_path)).count() == 0


def test_auc_single_class_is_null(spark, queries, tmp_path):
    _events(
        tmp_path,
        [
            (i, _TS0 + datetime.timedelta(minutes=i), 1, "purchase", float(i))
            for i in range(5)
        ],
    )
    row = queries["eval_auc_roc"](spark, str(tmp_path)).collect()[0]
    assert row["n_neg"] == 0 and row["auc"] is None


def test_js_divergence_all_equal_timestamps_is_null(spark, queries, tmp_path):
    # Every event <= the median cut: the late half is empty, q undefined.
    _events(tmp_path, [(i, _TS0, 1, "view", 1.0) for i in range(6)])
    row = queries["quality_js_divergence"](spark, str(tmp_path)).collect()[0]
    assert row["js_divergence_nats"] is None


def test_ks_one_empty_side_is_null(spark, queries, tmp_path):
    _orders(tmp_path, [(i, 1, "O", float(i), "1-URGENT") for i in range(4)])
    row = queries["quality_ks_two_sample"](spark, str(tmp_path)).collect()[0]
    assert row["n_b"] == 0 and row["ks_stat"] is None


def test_var_merge_singleton_group_is_null(spark, queries, tmp_path):
    _events(
        tmp_path,
        [(0, _TS0, 1, "solo", 42.0)]
        + [
            (i, _TS0 + datetime.timedelta(hours=i), 1, "pair", float(i))
            for i in range(1, 3)
        ],
    )
    rows = {
        r["event_type"]: r["var_value"]
        for r in queries["incremental_var_merge"](spark, str(tmp_path)).collect()
    }
    assert rows["solo"] is None
    assert rows["pair"] == pytest.approx(0.5)


def test_zipf_single_type_vocab_is_null(spark, queries, tmp_path):
    _write(
        tmp_path,
        "documents",
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["spark spark spark spark"], pa.string()),
                "lang": pa.array(["en"], pa.string()),
                "source": pa.array(["web"], pa.string()),
                "n_chars": pa.array([23], pa.int64()),
            }
        ),
    )
    row = queries["text_zipf_fit"](spark, str(tmp_path)).collect()[0]
    assert row["vocab_size"] == 1
    assert row["zipf_slope"] is None  # one point defines no line


def test_quantize_constant_vector_codes_are_zero(spark, queries, tmp_path):
    # 64-dim (declared-dimension) vectors: quantize operates on the
    # well-formed corpus only since r10 — the constant-vector pin is
    # about the zero RANGE, not about ragged shapes.
    _embeddings(
        tmp_path, [[float(i) for i in range(64)], [0.5] * 64]
    )
    rows = {
        r["vec_id"]: r for r in queries["emb_quantize_int8"](spark, str(tmp_path)).collect()
    }
    assert rows[1]["scale_min"] == rows[1]["scale_max"] == 0.5
    import hashlib

    assert rows[1]["q_md5"] == hashlib.md5(b",".join([b"0"] * 64)).hexdigest()


def test_cosine_zero_vector_scores_zero_not_crash(spark, queries, tmp_path):
    # vec 0 is a query (vec_id < N_QUERIES); vec 2 is all zeros — its
    # similarity is defined as 0.0, so it ranks below every real match
    # instead of killing the retrieval job.
    _embeddings(
        tmp_path,
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.9, 0.1, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [-1.0, 0.0, 0.0, 0.0],
        ],
    )
    got = queries["sim_search_topk"](spark, str(tmp_path)).collect()
    by_neighbor = {
        r["neighbor_id"]: r["cosine_sim"] for r in got if r["query_id"] == 0
    }
    assert by_neighbor[2] == 0.0
    assert by_neighbor[1] > 0.9 and by_neighbor[3] == -1.0


def test_json_extract_non_numeric_value_is_null(spark, queries, tmp_path):
    # '$.k' holds a string and one row is malformed JSON: both must yield
    # NULL k (dropped by the >= filter), never an ANSI cast failure.
    _events_props = [
        (1, _TS0, 1, "view", 1.0, '{"k": 99}'),
        (2, _TS0, 1, "view", 1.0, '{"k": "not-a-number"}'),
        (3, _TS0, 1, "view", 1.0, "{broken"),
    ]
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array([r[0] for r in _events_props], pa.int64()),
                "ts": pa.array([r[1] for r in _events_props], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in _events_props], pa.int64()),
                "event_type": pa.array([r[3] for r in _events_props], pa.string()),
                "value": pa.array([r[4] for r in _events_props], pa.float64()),
                "props": pa.array([r[5] for r in _events_props], pa.string()),
            }
        ),
    )
    got = queries["fn_json_extract"](spark, str(tmp_path)).collect()
    assert [(r["event_id"], r["k_val"]) for r in got] == [(1, 99)]
    variant = queries["fn_variant_extract"](spark, str(tmp_path)).collect()
    assert variant[0]["n_events"] == 3 and variant[0]["k_total"] == 99


# -- zero embedding vectors through the trained ANN tiers --------------------
#
# _l2_normalize used to divide by an unguarded norm: a single all-zeros
# embedding anywhere in the corpus raised ANSI DIVIDE_BY_ZERO inside
# quantizer TRAINING (_train_sample(normalize=True)) and the PQ encode /
# exact-rerank stages — killing every IVF/LSH/PQ retrieval job.  The
# convention now matches cosine(): a zero vector normalizes to the zero
# vector, so its similarity to anything is 0.0 and it ranks below every
# real match.  These drive the REAL registry entries on a 64-d corpus
# with a planted zero vector (deterministic: seeded fixture, seeded
# hyperplanes/codebooks, sequential F.aggregate folds).


def _zero_vector_corpus(tmp_path):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(48, 64)).astype(np.float32)
    vecs[45] = 0.0  # outside the planted-probe id range [0, 40)
    _embeddings(tmp_path, [[float(x) for x in v] for v in vecs])


def test_ann_contract_tiers_survive_zero_vector(spark, queries, tmp_path):
    _zero_vector_corpus(tmp_path)
    for entry in ("sim_search_ivf", "sim_search_pq_adc", "sim_search_ivf_pq"):
        rows = queries[entry](spark, str(tmp_path)).collect()
        assert len(rows) == 10, entry
        assert all(r["k_returned"] == 5 for r in rows), entry
        assert all(r["ranks_contiguous"] for r in rows), entry
        # The rerank recomputes exact cosine: the zero-vector convention
        # must agree between the tier's reported score and cosine().
        assert all(r["scores_exact"] for r in rows), entry


def test_lsh_survives_zero_vector(spark, queries, tmp_path):
    _zero_vector_corpus(tmp_path)
    rows = queries["sim_search_lsh_bucketed"](spark, str(tmp_path)).collect()
    assert rows and all(r["cosine_sim"] is not None for r in rows)
    for r in rows:
        if r["neighbor_id"] == 45:  # the zero vector, if bucketed with a query
            assert r["cosine_sim"] == 0.0


def test_l2_normalize_zero_vector_is_zero_vector(spark):
    from pyspark.sql import functions as F

    from projetos_etl_spark.operators.cosine import _l2_normalize

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [3.0, 0.0, 4.0])], "id long, v array<double>"
    )
    got = {
        r["id"]: r["nv"]
        for r in df.select("id", _l2_normalize(F.col("v")).alias("nv")).collect()
    }
    assert got[1] == [0.0, 0.0, 0.0]
    assert got[2] == pytest.approx([0.6, 0.0, 0.8])


def test_parquet_stats_audit_raises_diagnostic_on_missing_flag_stats(
    spark, queries, tmp_path
):
    # A footer carrying l_orderkey stats but NO l_returnflag stats used
    # to die with AttributeError on .null_count; the audit's convention
    # is the explicit pruning-unsafe ValueError either way (r8 ADVICE).
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2], pa.int64()),
                "l_returnflag": pa.array(["N", "R"], pa.string()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
        write_statistics=["l_orderkey"],
    )
    with pytest.raises(ValueError, match="l_returnflag"):
        queries["quality_parquet_stats_audit"](spark, str(tmp_path))


def test_l2_normalize_partially_null_vector_propagates_null(spark):
    # A NULL *element* (norm undefined) means "corrupt upstream" — the
    # whole vector propagates NULL so non-null filters exclude it; it
    # must NOT collapse to all-zeros and masquerade as the legitimate
    # zero-vector convention (r8 ADVICE).
    from pyspark.sql import functions as F

    from projetos_etl_spark.operators.cosine import _l2_normalize

    df = spark.createDataFrame(
        [(1, [1.0, None, 2.0]), (2, None), (3, [3.0, 0.0, 4.0])],
        "id long, v array<double>",
    )
    got = {
        r["id"]: r["nv"]
        for r in df.select("id", _l2_normalize(F.col("v")).alias("nv")).collect()
    }
    assert got[1] is None  # corrupt, not [0, 0, 0]
    assert got[2] is None  # whole-NULL stays NULL
    assert got[3] == pytest.approx([0.6, 0.0, 0.8])


# -- NULL-holed planted-probe id range through the ANN contract audit --------
#
# The abstention gate used to check only the GLOBAL non-null count; a
# corpus with plenty of vectors whose probe id range [0, 2*N_PROBES) was
# NULL-holed built ~0 planted probes, measured a noise recall, and
# flipped planted_recall_ok on the Spark side while the oracle pinned
# TRUE — a spurious driver mismatch on exactly the inputs the NULL
# hardening claims to cover (r8 ADVICE).  Both engines now also gate on
# the count of CONSTRUCTIBLE probe pairs (>= PROBE_FLOOR).


def _probe_holed_corpus(tmp_path, null_ids):
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = [
        None if i in null_ids else [float(x) for x in rng.normal(size=64)]
        for i in range(100)
    ]
    _embeddings(tmp_path, vecs)


def test_ann_contract_abstains_when_probe_range_null_holed(spark, queries, tmp_path):
    # ids 10..39 NULL: global non-null count = 70 (old gate passes) but
    # zero probe pairs are constructible (i needs BOTH i and i+20
    # non-null) while queries vec_id < 10 still exist — the exact
    # spurious-mismatch shape. Both engines must abstain.
    _probe_holed_corpus(tmp_path, set(range(10, 40)))
    import duckdb

    from projetos_etl_spark.registry import all_oracle_sql

    oracles = all_oracle_sql()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    for entry in ("sim_search_ivf", "sim_search_pq_adc", "sim_search_ivf_pq"):
        assert queries[entry](spark, str(tmp_path)).count() == 0, entry
        assert len(con.sql(oracles[entry]).df()) == 0, entry


# -- wrong-dimension (ragged) embedding vectors ------------------------------
#
# The ragged cousin of the NULL-holed state: a truncated or empty array
# from a failed upstream parse. Before the well_formed guard, ONE such
# vector crashed quantizer training / cell assignment / PQ encoding
# (np.array / np.stack over a ragged sample raises ValueError) and the
# PCA Gram pass — the literal "one malformed vector in 100 TB kills the
# retrieval job" failure. The rule now mirrors NULL handling: excluded
# from index/query/probe legs in BOTH engines (oracle: len(embedding) =
# EMB_DIM); the exact/LSH tiers need no exclusion (their folds NULL out
# on mismatched lengths and cosine pins that to 0.0).


def _ragged_corpus(tmp_path, ragged_ids, ragged_dim=32):
    import numpy as np

    rng = np.random.default_rng(13)
    vecs = [
        [float(x) for x in rng.normal(size=ragged_dim)] if i in ragged_ids
        else [float(x) for x in rng.normal(size=64)]
        for i in range(60)
    ]
    for i in ragged_ids:
        if i % 2:  # mix truncated and EMPTY arrays
            vecs[i] = []
    _embeddings(tmp_path, vecs)


def _oracle_frame(con, sql):
    p = con.sql(sql).df()
    p = p.reindex(sorted(p.columns), axis=1)
    if len(p):
        p = p.sort_values(by=list(p.columns), na_position="first", kind="mergesort")
    return p.reset_index(drop=True)


def test_trained_tiers_survive_ragged_vectors(spark, queries, tmp_path):
    import duckdb
    import pandas as pd

    from projetos_etl_spark.registry import all_oracle_sql

    # Ragged vectors OUTSIDE the probe/query ranges: the tiers must run
    # (not ValueError in numpy), exclude the malformed rows, and still
    # hash-match their oracles.
    _ragged_corpus(tmp_path, ragged_ids={45, 46, 52})
    oracles = all_oracle_sql()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    for entry in ("sim_search_ivf", "sim_search_pq_adc", "sim_search_ivf_pq"):
        sp = queries[entry](spark, str(tmp_path)).toPandas()
        sp = sp.reindex(sorted(sp.columns), axis=1)
        sp = sp.sort_values(by=list(sp.columns), na_position="first",
                            kind="mergesort").reset_index(drop=True)
        du = _oracle_frame(con, oracles[entry])
        pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=True)
        assert len(sp) == 10 and sp["planted_recall_ok"].all(), entry


def test_trained_tiers_ragged_probe_pair_is_dropped(spark, queries, tmp_path):
    # A ragged vector INSIDE the probe range behaves like a NULL hole:
    # that pair is dropped from the recall denominator, the audit still
    # runs (19 >= PROBE_FLOOR pairs) and stays green.
    _ragged_corpus(tmp_path, ragged_ids={25})
    rows = queries["sim_search_ivf"](spark, str(tmp_path)).collect()
    assert len(rows) == 10
    assert all(r["planted_recall_ok"] for r in rows)


def test_pca_survives_ragged_vectors_and_scores_them_null(spark, queries, tmp_path):
    import duckdb
    import pandas as pd

    from projetos_etl_spark.registry import all_oracle_sql

    _ragged_corpus(tmp_path, ragged_ids={7, 20})
    sp = (
        queries["emb_pca_top_component"](spark, str(tmp_path))
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    by_id = dict(zip(sp["vec_id"], sp["pc1_score"]))
    assert pd.isna(by_id[7]) and pd.isna(by_id[20])  # no d-space position
    assert pd.notna(by_id[0]) and pd.notna(by_id[59])
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    du = con.sql(all_oracle_sql()["emb_pca_top_component"]).df()
    du = du.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=True)


def test_exact_tier_pins_ragged_similarity_to_zero(spark, queries, tmp_path):
    # brute-force cosine needs no exclusion: zip_with NULL-pads the
    # mismatched fold and cosine() pins the NULL to 0.0 similarity, so
    # a ragged neighbor ranks below every real match instead of
    # crashing the scan.
    _ragged_corpus(tmp_path, ragged_ids={45})
    rows = queries["sim_search_topk"](spark, str(tmp_path)).collect()
    assert len(rows) == 50
    for r in rows:
        if r["neighbor_id"] == 45:
            assert r["cosine_sim"] == 0.0


def test_ann_contract_runs_with_holes_above_probe_floor(spark, queries, tmp_path):
    # Only 5 of 20 probe pairs holed (ids 25..29 NULL): 15 >= PROBE_FLOOR
    # pairs survive, so the audit RUNS — over an honest denominator —
    # and every clause still holds.
    _probe_holed_corpus(tmp_path, set(range(25, 30)))
    rows = queries["sim_search_ivf"](spark, str(tmp_path)).collect()
    assert len(rows) == 10
    assert all(
        r["k_returned"] == 5
        and r["ranks_contiguous"]
        and r["scores_exact"]
        and r["planted_recall_ok"]
        for r in rows
    )


# -- r10: the full malformed-vector family, across every consumer ------------
#
# r9 closed the ragged story for the trained tiers + PCA (exclusion);
# r10 closes it for the EXACT-tier consumers and the third malformation
# class (r9 ADVICE): a correct-LENGTH vector with a NULL ELEMENT. Three
# classes, one convention (operators/cosine.well_formed +
# registry/_sqlvec.sql_well_formed):
#
# - trained tiers / trainers / quantizer (IVF, PQ, IVF+PQ, k-means,
#   PCA moments, int8 quantize): malformed vectors are EXCLUDED in
#   both engines — any of the three classes crashes or NaN-poisons the
#   numpy kernels otherwise;
# - exact/LSH scorers (topk, range, LSH rerank, ndcg, kNN, hard
#   negatives, dedup cosine, matryoshka): malformed vectors PIN to 0.0
#   similarity via the fold-NULL convention, mirrored in DuckDB by
#   registry/_sqlvec.sql_cosine (the old list_sum oracles computed a
#   PARTIAL dot where Spark folds to NULL -> 0.0 — the r10 fix) —
#   EXCEPT two vectors malformed the same way (equal short lengths),
#   whose fold is clean in both engines and scores their real cosine;
# - the norm audit REPORTS all three classes (n_malformed) instead of
#   excluding them.
#
# The standing fixture axis for this family is sf_ragged
# (tools/make_degenerate_fixtures.py); these tests pin the same shapes
# hermetically.

_EMPTY_IDS = {0, 29}
_TRUNC_IDS = {13, 39}
_HOLED_IDS = {17, 23}


def _malformed_corpus(tmp_path, n=60):
    import numpy as np

    rng = np.random.default_rng(13)
    vecs = [[float(x) for x in rng.normal(size=64)] for _ in range(n)]
    for i in _EMPTY_IDS:
        vecs[i] = []
    for i in _TRUNC_IDS:
        vecs[i] = vecs[i][:32]
    for i in _HOLED_IDS:
        vecs[i][i % 64] = None
    _embeddings(tmp_path, vecs)


def test_well_formed_excludes_all_three_malformation_classes(spark, tmp_path):
    from projetos_etl_spark.operators.cosine import well_formed

    _malformed_corpus(tmp_path)
    kept = (
        spark.read.parquet(f"{tmp_path}/embeddings.parquet")
        .filter(well_formed("embedding", 64))
        .select("vec_id")
        .collect()
    )
    kept_ids = {r["vec_id"] for r in kept}
    assert kept_ids == set(range(60)) - _EMPTY_IDS - _TRUNC_IDS - _HOLED_IDS


_MALFORMED_CONSUMERS = [
    # the r10 seven (exact-tier consumers)
    "eval_ndcg_at_k",
    "ml_knn_classify",
    "emb_matryoshka_overlap",
    "sim_hard_negative_mining",
    "dedup_embedding_cosine",
    "emb_norm_outlier_audit",
    "emb_quantize_int8",
    # the other exact/LSH scorers sharing the fold convention
    "sim_search_topk",
    "sim_range_search",
    "sim_search_lsh_bucketed",
    # trainers (exclusion side), incl. the r9 ADVICE holed-vector path
    "ml_kmeans_lloyd",
    "emb_pca_top_component",
    "sim_search_ivf",
    "sim_search_pq_adc",
    "sim_search_ivf_pq",
]


@pytest.mark.parametrize("entry", _MALFORMED_CONSUMERS)
def test_embedding_consumers_match_oracles_on_malformed_corpus(
    spark, queries, tmp_path, entry
):
    # Every embedding consumer must RUN (no numpy ValueError, no DuckDB
    # empty-list_reduce error, no NaN poison) and hash-match its oracle
    # over a corpus holding all three malformation classes at once —
    # including a malformed QUERY id (vec_id 0 is empty).
    import duckdb
    import pandas as pd

    from projetos_etl_spark.registry import all_oracle_sql

    _malformed_corpus(tmp_path)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    sp = queries[entry](spark, str(tmp_path)).toPandas()
    sp = sp.reindex(sorted(sp.columns), axis=1)
    if len(sp):
        sp = sp.sort_values(
            by=list(sp.columns), na_position="first", kind="mergesort"
        )
    sp = sp.reset_index(drop=True)
    du = _oracle_frame(con, all_oracle_sql()[entry])
    pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=True)


def test_norm_audit_reports_malformed_vectors(spark, queries, tmp_path):
    _malformed_corpus(tmp_path)
    row = queries["emb_norm_outlier_audit"](spark, str(tmp_path)).collect()[0]
    assert row["n_vectors"] == 60
    assert row["n_malformed"] == len(_EMPTY_IDS | _TRUNC_IDS | _HOLED_IDS)
    # the two EMPTY vectors audit as zero vectors (0.0-seeded fold)
    assert row["n_zero_vectors"] == len(_EMPTY_IDS)


def test_quantize_excludes_malformed_vectors(spark, queries, tmp_path):
    _malformed_corpus(tmp_path)
    got = queries["emb_quantize_int8"](spark, str(tmp_path)).collect()
    ids = {r["vec_id"] for r in got}
    assert ids == set(range(60)) - _EMPTY_IDS - _TRUNC_IDS - _HOLED_IDS


def test_kmeans_skips_malformed_seed(spark, tmp_path):
    # vec_id 0 is EMPTY: with dim declared, seeding starts at the first
    # WELL-FORMED ids in both engines (the oracle twin's well_formed
    # gate precedes its ORDER BY vec_id LIMIT k) — without the gate the
    # empty seed centroid would NULL every distance fold against it.
    from projetos_etl_spark.operators.kmeans import kmeans_lloyd

    _malformed_corpus(tmp_path)
    emb = spark.read.parquet(f"{tmp_path}/embeddings.parquet")
    cents = kmeans_lloyd(emb, "vec_id", "embedding", 4, iters=1, dim=64)
    assert set(cents) == {1, 2, 3, 4}  # 0 malformed -> skipped
    assert all(len(c) == 64 for c in cents.values())


def test_identically_truncated_duplicates_still_pair(spark, queries, tmp_path):
    # Two vectors malformed the SAME way (equal 32-dim truncation of
    # near-identical content) fold cleanly in both engines and keep
    # their real cosine — dedup still catches dups among uniformly
    # malformed shards, and the oracle (sql_cosine's greatest-len
    # series) agrees because equal lengths leave no NULL-padded slot.
    import duckdb
    import numpy as np
    import pandas as pd

    from projetos_etl_spark.registry import all_oracle_sql

    rng = np.random.default_rng(7)
    vecs = [[float(x) for x in rng.normal(size=64)] for _ in range(20)]
    vecs[11] = vecs[3][:32]
    vecs[12] = list(vecs[11])  # identical truncated twin -> cosine 1.0
    _embeddings(tmp_path, vecs)
    sp = (
        queries["dedup_embedding_cosine"](spark, str(tmp_path))
        .toPandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    pairs = set(zip(sp["vec_a"], sp["vec_b"]))
    assert (11, 12) in pairs
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    du = _oracle_frame(con, all_oracle_sql()["dedup_embedding_cosine"])
    sp = sp.reindex(sorted(sp.columns), axis=1)
    sp = sp.sort_values(by=list(sp.columns), kind="mergesort").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=True)


# -- r10: non-finite readings (events.value) + hostile text ------------------
#
# Second and third hostile families of r10 (standing axes sf_nan /
# sf_hostiletext in tools/make_degenerate_fixtures.py). Convention for
# numerics (functions/finite.py): a NaN/Inf reading is a CORRUPT
# reading — excluded like NULL from moments, medians, tiers, cents
# casts, and fills; engines otherwise crash (ANSI bigint/decimal casts,
# DuckDB stddev overflow) or silently diverge (NaN ordering). For text:
# degenerate documents produce NULL ratio metrics via try_divide (one
# empty doc used to DIVIDE_BY_ZERO-abort the corpus pass), and the CSV
# round-trip preserves NULL vs '' vs whitespace exactly.

_NAN, _INF, _NINF = float("nan"), float("inf"), float("-inf")


def _nan_events(tmp_path):
    import datetime

    rows = []
    eid = 0
    for hour in range(60):
        for user in range(3):
            v = float(100 + (eid * 37) % 313)
            if eid % 17 == 0:
                v = _NAN
            elif eid % 23 == 0:
                v = _INF
            elif eid % 29 == 0:
                v = _NINF
            elif eid % 31 == 0:
                v = None
            rows.append(
                (
                    eid,
                    _TS0 + datetime.timedelta(hours=hour, minutes=user),
                    user,
                    ["purchase", "signup", "error"][eid % 3],
                    v,
                )
            )
            eid += 1
    _events(tmp_path, rows)


def test_finite_gate_maps_nonfinite_to_null(spark):
    from projetos_etl_spark.functions.finite import finite

    df = spark.createDataFrame(
        [(_NAN,), (_INF,), (_NINF,), (1.5,), (None,)], "v double"
    )
    got = [r["f"] for r in df.select(finite("v").alias("f")).collect()]
    assert got == [None, None, None, 1.5, None]


_NAN_CONSUMERS = [
    "anomaly_zscore_rolling",
    "feat_impute_missing",
    "incremental_var_merge",
    "ts_autocorr_lag",
    "ts_interpolate_linear",
    "ts_resample_ffill",
    "ts_stl_decompose",
    "ts_ohlc_bars",
    "udaf_grouped",
    "udf_scalar",
    "win_rolling_median",
]


def _assert_entry_matches_oracle(spark, queries, tmp_path, entry, view_sql):
    import duckdb
    import pandas as pd

    from projetos_etl_spark.registry import all_oracle_sql

    con = duckdb.connect()
    con.sql(view_sql)
    sp = queries[entry](spark, str(tmp_path)).toPandas()
    sp = sp.reindex(sorted(sp.columns), axis=1)
    if len(sp):
        sp = sp.sort_values(
            by=list(sp.columns), na_position="first", kind="mergesort"
        )
    sp = sp.reset_index(drop=True)
    du = _oracle_frame(con, all_oracle_sql()[entry])
    pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=True)
    return sp


@pytest.mark.parametrize("entry", _NAN_CONSUMERS)
def test_value_consumers_match_oracles_with_nonfinite_readings(
    spark, queries, tmp_path, entry
):
    _nan_events(tmp_path)
    sp = _assert_entry_matches_oracle(
        spark,
        queries,
        tmp_path,
        entry,
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')",
    )
    assert len(sp) > 0, "hermetic corpus must actually exercise the entry"


def test_streaming_sinks_survive_nonfinite_readings(spark, queries, tmp_path):
    # The headline crash of the family: one NaN reading ANSI-aborted
    # the foreachBatch upsert sink (round(NaN*100)::bigint). Both
    # streaming entries must RUN over the hostile corpus and still
    # hash-match their batch oracles.
    _nan_events(tmp_path)
    for entry in ("stream_upsert_tablelog", "stream_custom_stateful_profile"):
        sp = _assert_entry_matches_oracle(
            spark,
            queries,
            tmp_path,
            entry,
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')",
        )
        assert len(sp) == 3, entry  # one profile row per user


def test_udf_scalar_nan_has_no_tier(spark, queries, tmp_path):
    _nan_events(tmp_path)
    rows = {r["event_id"]: r["tier"] for r in queries["udf_scalar"](
        spark, str(tmp_path)).collect()}
    assert rows[0] is None          # NaN: no tier (not 'low', not 'high')
    assert rows[23] == "high"       # +Inf outranks every threshold
    assert rows[29] == "low"        # -Inf under every threshold
    assert rows[31] is None         # NULL propagates


def _hostile_documents(tmp_path):
    texts = {
        0: "",
        1: "   ",
        2: "the of and a short doc",
        3: "héllo wörld ß 你好 mixed unicode tokens here",
        4: "double  spaced  tokens  here and the rest of it",
        5: None,
        6: "a perfectly ordinary document with the usual words in it "
           "and enough length to be counted as real content for gates",
    }
    pa_texts = [texts[i] for i in range(7)]
    _write(
        tmp_path,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(7), pa.int64()),
                "text": pa.array(pa_texts, pa.string()),
                "lang": pa.array(["en"] * 7, pa.string()),
                "source": pa.array(["src0"] * 7, pa.string()),
                "n_chars": pa.array(
                    [len(t) if t is not None else 0 for t in pa_texts],
                    pa.int64(),
                ),
            }
        ),
    )


_TEXT_CONSUMERS = [
    "text_quality_score",
    "text_tokens_bpe_regex",
    "pipeline_quality_gate_fused",
    "scan_csv_multiline_quoted",
    "text_fingerprint",
]


@pytest.mark.parametrize("entry", _TEXT_CONSUMERS)
def test_text_consumers_match_oracles_on_hostile_documents(
    spark, queries, tmp_path, entry
):
    _hostile_documents(tmp_path)
    _assert_entry_matches_oracle(
        spark,
        queries,
        tmp_path,
        entry,
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')",
    )


def test_empty_doc_quality_metrics_are_null_not_a_crash(
    spark, queries, tmp_path
):
    _hostile_documents(tmp_path)
    rows = {
        r["doc_id"]: r
        for r in queries["text_quality_score"](spark, str(tmp_path)).collect()
    }
    assert rows[0]["space_ratio"] is None  # empty doc: undefined ratio
    assert rows[0]["passes_quality"] == 0  # undefined never passes
    assert rows[6]["space_ratio"] is not None
    bpe = {
        r["doc_id"]: r
        for r in queries["text_tokens_bpe_regex"](spark, str(tmp_path)).collect()
    }
    assert bpe[0]["chars_per_token"] is None  # zero tokens: no budget
    assert bpe[1]["chars_per_token"] is None  # whitespace-only too


def test_csv_roundtrip_preserves_empty_and_whitespace_text(
    spark, queries, tmp_path
):
    # The silent-corruption case: default CSV options read '' back as
    # NULL and the WRITER trims whitespace-only fields. The entry's
    # digest already pins exactness vs the original table through the
    # oracle; this asserts the two hostile states specifically by
    # total_chars (0-len and 3-len rows contribute 0 + 3).
    _hostile_documents(tmp_path)
    row = queries["scan_csv_multiline_quoted"](spark, str(tmp_path)).collect()[0]
    assert row["n_docs"] == 7  # count(*) counts the NULL-text row too
    expected_chars = sum(
        len(t)
        for t in [
            "",
            "   ",
            "the of and a short doc",
            "héllo wörld ß 你好 mixed unicode tokens here",
            "double  spaced  tokens  here and the rest of it",
            "a perfectly ordinary document with the usual words in it "
            "and enough length to be counted as real content for gates",
        ]
    )
    assert row["total_chars"] == expected_chars


def test_spine_operators_refuse_corrupt_timestamp_spans(
    spark, queries, tmp_path
):
    # One epoch-zero (or far-future) stamp would densify a 3-day series
    # into a ~470k-hour synthetic spine PER USER — measured grinding a
    # whole sweep on one task. The spine operators fail FAST and name
    # the corrupt series instead (SPINE_SPAN_CAP_HOURS).
    rows = [
        (i, _TS0 + datetime.timedelta(hours=i), 1, "view", float(i))
        for i in range(24)
    ]
    rows.append((99, datetime.datetime(1970, 1, 1), 1, "view", 1.0))
    _events(tmp_path, rows)
    for entry in ("ts_resample_ffill", "ts_interpolate_linear"):
        with pytest.raises(ValueError, match="corrupt timestamp"):
            queries[entry](spark, str(tmp_path)).collect()


def test_spine_operators_allow_sane_spans(spark, queries, tmp_path):
    _events(
        tmp_path,
        [
            (i, _TS0 + datetime.timedelta(hours=3 * i), 1, "view", float(i))
            for i in range(10)
        ],
    )
    assert queries["ts_resample_ffill"](spark, str(tmp_path)).count() == 28
    assert queries["ts_interpolate_linear"](spark, str(tmp_path)).count() == 28


# -- r10: hostile events (timestamps + props JSON) ---------------------------


def _hostile_events_fixture(tmp_path):
    import json as _json

    rows = []
    for i in range(80):
        ts = _TS0 + datetime.timedelta(minutes=i)
        if i % 11 == 0:
            ts = _TS0  # mass-duplicate timestamp
        elif i % 13 == 0:
            ts = ts.replace(microsecond=123456)
        rows.append((i, ts, i % 3, "view", float(i)))
    _events(tmp_path, rows)
    # overwrite props with hostile payloads
    tab = pq.read_table(str(tmp_path / "events.parquet"))
    props = []
    for i in range(80):
        if i % 7 == 0:
            props.append("{bad json")
        elif i % 11 == 0:
            props.append("[]")
        elif i % 13 == 0:
            props.append('{"k": "not_a_number"}')
        elif i % 17 == 0:
            props.append("")
        else:
            props.append(_json.dumps({"k": i}))
    idx = tab.schema.get_field_index("props")
    tab = tab.set_column(idx, tab.schema.field("props"),
                         pa.array(props, pa.string()))
    pq.write_table(tab, str(tmp_path / "events.parquet"))


@pytest.mark.parametrize(
    "entry", ["fn_json_extract", "fn_variant_extract", "ts_ohlc_bars"]
)
def test_hostile_events_match_oracles(spark, queries, tmp_path, entry):
    # Malformed JSON must NULL-and-continue in BOTH engines (DuckDB's
    # json_extract errors without the json_valid gate), and duplicate
    # timestamps must resolve OHLC open/close identically (the
    # (ts, event_id) anchor — ts alone let each engine pick a different
    # simultaneous tick).
    _hostile_events_fixture(tmp_path)
    _assert_entry_matches_oracle(
        spark,
        queries,
        tmp_path,
        entry,
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')",
    )


def test_ohlc_duplicate_timestamp_tiebreak_is_event_id(
    spark, queries, tmp_path
):
    # Three ticks at the SAME instant: open = lowest event_id's value,
    # close = highest event_id's value, deterministically.
    _events(
        tmp_path,
        [
            (5, _TS0, 1, "tick", 50.0),
            (2, _TS0, 1, "tick", 20.0),
            (9, _TS0, 1, "tick", 90.0),
        ],
    )
    row = queries["ts_ohlc_bars"](spark, str(tmp_path)).collect()[0]
    assert row["open"] == 20.0 and row["close"] == 90.0
    assert row["high"] == 90.0 and row["low"] == 20.0 and row["n_ticks"] == 3


# ---------------------------------------------------------------------------
# Hostile RELATIONAL values (r10 probe, SCALE.md "hostile family six"):
# negative money through the currency-string medallion roundtrip, and
# join keys big enough to reach the Morton interleave's high bits. The
# standing fixture axis is sf_hostilerel (tools/make_degenerate_fixtures.py);
# these pins are the hermetic versions of the two bugs that probe caught.
# ---------------------------------------------------------------------------


def _lineitem(tmp_path, rows):
    """rows: (okey, pkey, skey, lineno, qty, extprice, disc, tax, rf, ls, ship)."""
    _write(
        tmp_path,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
                "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
                "l_discount": pa.array([r[6] for r in rows], pa.float64()),
                "l_tax": pa.array([r[7] for r in rows], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
                "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
                "l_shipdate": pa.array([r[10] for r in rows], pa.timestamp("us")),
            }
        ),
    )


def test_brl_renders_negative_cents_sign_correct(spark):
    # -123 cents is 'R$-0,001.23'; the old floor-ladder on the raw
    # negative rendered 'R$-1,998.77' (floor toward -inf), which the
    # conform re-parse turned into -1998.77 — a 1000x corruption.
    import pyspark.sql.functions as F

    from projetos_etl_spark.medallion import clean_currency_col
    from projetos_etl_spark.registry.medallion import _brl

    df = spark.createDataFrame([(-123,), (123,), (-100000,), (0,), (None,)],
                               "cents long")
    out = df.select(
        _brl(F.col("cents")).alias("s"),
        clean_currency_col(_brl(F.col("cents"))).alias("back"),
    ).collect()
    got = {r["s"]: r["back"] for r in out}
    assert got["R$-0,001.23"] == -1.23
    assert got["R$0,001.23"] == 1.23
    assert got["R$-1,000.00"] == -1000.0
    assert got["R$0,000.00"] == 0.0
    assert got[None] is None


def test_silver_conform_negative_money_matches_oracle(spark, queries, tmp_path):
    # One negative-quantity line (a return) among normal lines: every
    # money measure (gross/sales/cogs/profit) must survive the
    # render -> scrub -> cast roundtrip sign-correct in both engines.
    ship = datetime.datetime(1995, 3, 1)
    _lineitem(
        tmp_path,
        [
            (1, 10, 5, 1, 17.0, 912.34, 0.04, 0.02, "N", "O", ship),
            (2, 11, 6, 1, -3.0, 450.00, 0.00, 0.01, "R", "F", ship),
            (3, 12, 7, 1, 25.0, 100.10, 0.07, 0.03, "A", "F", ship),
        ],
    )
    sp = _assert_entry_matches_oracle(
        spark,
        queries,
        tmp_path,
        "medallion_silver_conform",
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet')",
    )
    neg = sp[sp["units_sold"] == -3.0].iloc[0]
    assert neg["gross_sales"] == -1350.0
    assert neg["cogs"] == -810.0
    assert neg["profit"] == -540.0


def test_zorder_oracle_interleave_matches_engine_above_bit14(
    spark, queries, tmp_path
):
    # A custkey with bits 14/15 set (>= 49152) reaches the interleave's
    # top nibble. DuckDB parses `a | b << 1` as `(a | b) << 1` (one
    # shared bitwise precedence level), which put dim-1's bits on dim-2's
    # positions — zbucket 10 instead of 5 — until the oracle spelled the
    # shift through the parenthesizing renderer.
    _orders(
        tmp_path,
        [
            (1, 50000, "O", 100.0, "1-URGENT"),
            (2, 50001, "O", 100.0, "1-URGENT"),
        ],
    )
    sp = _assert_entry_matches_oracle(
        spark,
        queries,
        tmp_path,
        "maintenance_zorder_stats",
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')",
    )
    # custkey 50000 bit15=1 -> z bit 30, bit14=1 -> z bit 28; the fixture
    # day (2024-01-01 = 19723 days, bit14=1) -> z bit 29: bucket 0b0111.
    assert list(sp["zbucket"]) == [7]


# ---------------------------------------------------------------------------
# Family seven: NULL KEY columns (r10 probe, SCALE.md). sf_nulls holes only
# payload columns; the sf_nullkeys axis holes keys and timestamps — the
# probe caught 30 diverging entries. These pins are the hermetic versions
# of the representative bug classes.
# ---------------------------------------------------------------------------

_H = datetime.timedelta(hours=1)


def test_asof_null_ts_and_null_key_never_match(spark, queries, tmp_path):
    # One user with a real error and a NULL-ts error: the NULL-ts error
    # must never be anyone's match (before the fix, Spark's NULLS-FIRST
    # sort forward-filled it into the entire key). A NULL-ts purchase
    # and a NULL-user purchase match nothing but are KEPT (left-join
    # semantics).
    _events(
        tmp_path,
        [
            (1, _TS0 + 2 * _H, 7, "purchase", 1.0),
            (2, None, 7, "error", 0.0),          # NULL-ts error: no match ever
            (3, _TS0 + 1 * _H, 7, "error", 0.0),  # the real match
            (4, None, 7, "purchase", 1.0),        # NULL-ts purchase -> NULL
            (5, _TS0 + 2 * _H, None, "purchase", 1.0),  # NULL-user -> NULL
        ],
    )
    rows = {
        r["event_id"]: r["last_error_ts"]
        for r in queries["join_asof_events"](spark, str(tmp_path)).collect()
    }
    assert rows[1] is not None and rows[1].startswith("2024-01-01 01:00:00")
    assert rows[4] is None
    assert rows[5] is None


def test_window_sequence_null_ts_is_positionless(spark, queries, tmp_path):
    # The NULL-ts row's delta is NULL, and it does NOT shift anyone
    # else's lag (before the fix Spark handed lag() the NULL-ts row
    # first; DuckDB last).
    _events(
        tmp_path,
        [
            (1, _TS0, 7, "view", 10.0),
            (2, None, 7, "view", 99.0),
            (3, _TS0 + _H, 7, "view", 30.0),
        ],
    )
    rows = {
        r["event_id"]: r["delta"]
        for r in queries["win_lag_delta"](spark, str(tmp_path)).collect()
    }
    assert rows[1] is None          # first timed event: no predecessor
    assert rows[2] is None          # positionless
    assert rows[3] == 20.0          # 30 - 10: the NULL-ts row is invisible


def test_referential_orphans_exclude_null_fk(spark, queries, tmp_path):
    # One real orphan (custkey 999 has no parent), one NULL FK: the
    # orphan count is 1, not 2 — NULL points at nothing, which is a
    # missing-attribution defect, not an orphan (and the NOT IN /
    # left-anti spellings disagree on it).
    _orders(
        tmp_path,
        [
            (1, 5, "O", 10.0, "1-URGENT"),
            (2, 999, "O", 10.0, "1-URGENT"),
            (3, None, "O", 10.0, "1-URGENT"),
        ],
    )
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([5], pa.int64()),
                "c_name": pa.array(["a"], pa.string()),
                "c_nationkey": pa.array([0], pa.int64()),
                "c_mktsegment": pa.array(["BUILDING"], pa.string()),
                "c_acctbal": pa.array([0.0], pa.float64()),
            }
        ),
    )
    # lineitem/part/supplier edges need tables to exist; give them
    # empty-but-schemaed stand-ins via the real fixture shapes.
    _lineitem(tmp_path, [])
    for name, schema in (
        ("part", {"p_partkey": pa.int64(), "p_name": pa.string(),
                  "p_brand": pa.string(), "p_type": pa.string(),
                  "p_size": pa.int32(), "p_retailprice": pa.float64()}),
        ("supplier", {"s_suppkey": pa.int64(), "s_name": pa.string(),
                      "s_nationkey": pa.int64(), "s_acctbal": pa.float64()}),
    ):
        _write(tmp_path, name,
               pa.table({k: pa.array([], t) for k, t in schema.items()}))
    out = {
        r["relation"]: r["orphan_keys"]
        for r in queries["quality_referential_integrity"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["orders.o_custkey -> customer"] == 1


def test_checksum_renders_nulls_not_drops_them(spark, queries, tmp_path):
    # Two tables differing ONLY in a NULL hole must checksum
    # differently — a checksum that skips NULL-holed rows is blind to
    # exactly the corruption it exists to catch.
    _orders(tmp_path, [(1, 5, "O", 10.0, "1-URGENT"),
                       (2, 6, "O", 10.0, "2-HIGH")])
    a = queries["quality_table_checksum"](spark, str(tmp_path)).collect()[0]
    _orders(tmp_path, [(1, 5, "O", 10.0, "1-URGENT"),
                       (2, None, "O", 10.0, "2-HIGH")])
    b = queries["quality_table_checksum"](spark, str(tmp_path)).collect()[0]
    assert a["n_rows"] == b["n_rows"] == 2
    assert a["checksum"] != b["checksum"]


def test_graph_null_key_is_not_a_vertex(spark, queries, tmp_path):
    _orders(tmp_path, [(1, 5, "O", 10.0, "1-URGENT"),
                       (2, None, "O", 10.0, "1-URGENT")])
    _lineitem(
        tmp_path,
        [
            (1, 10, 3, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _TS0),
            (2, 11, None, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _TS0),
        ],
    )
    rows = queries["graph_degree_stats"](spark, str(tmp_path)).collect()
    # Only the (c5, s3) edge exists: one customer vertex, one supplier
    # vertex, each degree 1 — the NULL custkey and NULL suppkey minted
    # no phantom vertices.
    assert sum(r["n_vertices"] for r in rows) == 2
    assert all(r["degree"] == 1 for r in rows)


def test_sessionize_drops_null_ts_rows(spark):
    from projetos_etl_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [(7, _TS0, 1.0), (7, None, 2.0), (7, _TS0 + _H, 3.0)],
        "user_id long, ts timestamp, value double",
    )
    out = sessionize(df, key="user_id", ts_col="ts", gap_seconds=3600 * 4)
    rows = out.collect()
    assert len(rows) == 2           # the NULL-ts row has no gap relation
    assert all(r["session_id"] == 1 for r in rows)


def test_collect_sorted_positionless_only_user_digests_null(
    spark, queries, tmp_path
):
    # r10 ADVICE: a user whose EVERY event is un-timestamped has no
    # sequence at all. DuckDB's list(...) FILTER over zero qualifying
    # rows is NULL (md5(NULL) = NULL); a naive Spark collect_list gives
    # an empty array (md5('') = d41d8...). Both engines must emit NULL.
    _events(
        tmp_path,
        [
            (1, None, 7, "view", 1.0),      # user 7: positionless only
            (2, None, 7, "click", 2.0),
            (3, _TS0, 8, "view", 3.0),      # user 8: a real sequence
            (4, None, 8, "click", 4.0),     # ...plus one positionless
        ],
    )
    rows = {
        r["user_id"]: (r["n_events"], r["seq_md5"])
        for r in queries["agg_collect_sorted"](spark, str(tmp_path)).collect()
    }
    assert rows[7][0] == 2 and rows[7][1] is None
    assert rows[8][0] == 2 and rows[8][1] is not None


def test_rolling_distinct_null_type_is_not_a_type(spark, queries, tmp_path):
    # r10 ADVICE: COUNT(DISTINCT event_type) skips NULLs, so the
    # first-occurrence-flag decomposition must not flag the NULL-type
    # partition's first row (both the unbounded scale tier and the
    # bounded collect_set variant agree).
    _events(
        tmp_path,
        [
            (1, _TS0, 7, "view", 1.0),
            (2, _TS0 + _H, 7, None, 2.0),       # NULL type: not distinct
            (3, _TS0 + 2 * _H, 7, "click", 3.0),
        ],
    )
    for entry in ("win_rolling_distinct_unbounded", "win_rolling_distinct"):
        rows = {
            r["event_id"]: r["n_types_so_far"]
            for r in queries[entry](spark, str(tmp_path)).collect()
        }
        assert rows == {1: 1, 2: 1, 3: 2}, entry


def test_distinct_rollups_keep_the_untyped_group(spark, queries, tmp_path):
    # r11 probe (NULL event_type plant): the UNTYPED group survives
    # GROUP BY on both engines, so the sketch/bitmap tier JOINS must be
    # null-safe or the group silently drops from the Spark side only
    # (family seven, mechanism 3 — plain aggregation keeps NULL groups).
    _events(
        tmp_path,
        [
            (1, _TS0, 7, "view", 1.0),
            (2, _TS0, 8, None, 2.0),
            (3, _TS0 + 25 * _H, 8, None, 3.0),   # next day, same user
        ],
    )
    hll = {
        r["event_type"]: r["n_users_exact"]
        for r in queries["agg_hll_sketch_rollup"](spark, str(tmp_path)).collect()
    }
    assert hll == {"view": 1, None: 1}
    bm = {
        r["event_type"]: (r["n_users_exact"], r["n_users_bitmap"], r["max_daily"])
        for r in queries["bitmap_distinct_rollup"](spark, str(tmp_path)).collect()
    }
    assert bm == {"view": (1, 1, 1), None: (1, 1, 1)}


def test_auc_excludes_unlabeled_rows(spark, queries, tmp_path):
    # r11 probe: Spark's `type != 'purchase'` NULLs the unlabeled tally
    # term while the oracle's CASE ELSE counted it as a NEGATIVE; the
    # convention (an unlabeled row is not in the eval set) excludes it
    # on both engines. With the unlabeled high-score row excluded the
    # one (pos, neg) pair ranks perfectly.
    _events(
        tmp_path,
        [
            (1, _TS0, 7, "purchase", 10.0),
            (2, _TS0, 7, "view", 5.0),
            (3, _TS0, 7, None, 20.0),   # unlabeled: would flip AUC to 0.5
        ],
    )
    row = queries["eval_auc_roc"](spark, str(tmp_path)).collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (1, 1, 1.0)


def test_sliding_topk_ranks_the_untyped_group_last_on_ties(
    spark, queries, tmp_path
):
    # r11 probe: the leaderboard keeps the untyped group (plain
    # streaming aggregation, like its tumbling siblings) but its rank
    # tie-break must pin NULLS LAST on both engines — unpinned, Spark
    # parks NULL first and DuckDB last, swapping ranks on every tie.
    _events(
        tmp_path,
        [
            (1, _TS0, 7, "view", 1.0),
            (2, _TS0, 7, "view", 1.0),
            (3, _TS0, 8, None, 1.0),
            (4, _TS0, 8, None, 1.0),
            (5, _TS0, 9, "click", 1.0),
        ],
    )
    rows = {
        r["event_type"]: r["rank"]
        for r in queries["stream_sliding_topk"](spark, str(tmp_path)).collect()
    }
    assert rows == {"view": 1, None: 2, "click": 3}


def test_keyness_excludes_unattributed_documents(spark, queries, tmp_path):
    # r11 probe (NULL documents.source plant): an unattributed document
    # belongs to NEITHER keyness subcorpus. Spark's NULL `isin` flag
    # silently dropped its tokens from both tallies while the oracle's
    # `CASE ... ELSE 0` counted them as REFERENCE — now both engines
    # exclude it. 'tok' appears 10x in focus, 10x in attributed
    # reference, and 5x in the NULL-source doc: excluded, the counts
    # are exactly (10, 10).
    _write(
        tmp_path,
        "documents",
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [" ".join(["tok"] * 10),
                     " ".join(["tok"] * 10),
                     " ".join(["tok"] * 5)],
                    pa.string(),
                ),
                "lang": pa.array(["en", "en", "en"], pa.string()),
                "source": pa.array(["src0", "web", None], pa.string()),
                "n_chars": pa.array([39, 39, 19], pa.int64()),
            }
        ),
    )
    rows = {
        r["token"]: (r["n_focus"], r["n_ref"])
        for r in queries["text_keyness_g2"](spark, str(tmp_path)).collect()
    }
    assert rows == {"tok": (10, 10)}


# ---------------------------------------------------------------------------
# Family eight: NULL CATEGORICAL attributes (r11 probe, sf_nullcats —
# SCALE.md round 11). GROUP BY keeps a NULL category on both engines, so
# every divergence here is a mixed-plan bug: a CASE whose ELSE swallows
# NULL, a pivot with no column for it, a NULL-skipping concat, a tier
# join. Hermetic pins for the representative mechanisms; the axis sweep
# covers all seven diverging entries.
# ---------------------------------------------------------------------------


def test_q12_null_priority_counts_in_neither_column(spark, queries, tmp_path):
    # An unprioritized order is neither high nor low: Spark's old
    # otherwise(1) counted it low while the oracle's NOT IN yielded
    # NULL -> ELSE 0. Both predicates are three-valued now.
    _orders(
        tmp_path,
        [
            (1, 5, "O", 10.0, "1-URGENT"),
            (2, 5, "O", 10.0, "5-LOW"),
            (3, 5, "O", 10.0, None),
        ],
    )
    _lineitem(
        tmp_path,
        [(k, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
          datetime.datetime(1997, 6, 1)) for k in (1, 2, 3)],
    )
    row = queries["q12_priority_pivot"](spark, str(tmp_path)).collect()[0]
    assert (row["high_line_count"], row["low_line_count"]) == (1, 1)


def test_surrogate_key_refuses_incomplete_natural_key(spark, queries, tmp_path):
    # concat_ws SKIPS a NULL piece, so ("a", NULL) would mint the same
    # key as a hypothetical name-only row; both engines now emit NULL
    # for an incomplete natural key and count collisions over MINTED
    # keys only.
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_name": pa.array(["a", "a", "b"], pa.string()),
                "c_nationkey": pa.array([7, None, 7], pa.int64()),
                "c_mktsegment": pa.array(["BUILDING"] * 3, pa.string()),
                "c_acctbal": pa.array([0.0] * 3, pa.float64()),
            }
        ),
    )
    row = queries["fn_surrogate_key"](spark, str(tmp_path)).collect()[0]
    assert (row["n_rows"], row["n_distinct_keys"], row["n_collisions"]) == (3, 2, 0)


def test_percentile_band_contract_holds_on_small_groups(
    spark, queries, tmp_path
):
    # The old value-band (exact 0.495/0.505 interpolated quantiles) is
    # an interval containing NO data point whenever 0.01*(n-1) < 1, so
    # the flag was structurally FALSE for small groups like the planted
    # NULL-status group. The rank-window contract holds at any n.
    _orders(
        tmp_path,
        [
            (1, 5, None, 10.0, "5-LOW"),
            (2, 5, None, 20.0, "5-LOW"),
            (3, 5, None, 30.0, "5-LOW"),
            (4, 5, None, 40.0, "5-LOW"),
            (5, 5, "O", 15.0, "5-LOW"),
        ],
    )
    rows = {
        r["o_orderstatus"]: (r["n"], r["est_within_band"])
        for r in queries["agg_percentile_approx"](spark, str(tmp_path)).collect()
    }
    assert rows == {None: (4, True), "O": (1, True)}


def test_unpivot_roundtrip_gates_the_declared_status_domain(
    spark, queries, tmp_path
):
    # A NULL status has no pivot column: Spark's declared-domain pivot
    # drops it, and the oracle now reshapes the same gated table instead
    # of minting a NULL metric row the wide form never held. The NULL
    # PRIORITY group stays (plain GROUP BY key).
    _orders(
        tmp_path,
        [
            (1, 5, "O", 10.0, "1-URGENT"),
            (2, 5, None, 10.0, "1-URGENT"),
            (3, 5, "F", 10.0, None),
        ],
    )
    rows = {
        (r["priority"], r["metric"]): r["n_orders"]
        for r in queries["unpivot_melt"](spark, str(tmp_path)).collect()
    }
    assert rows == {("1-URGENT", "status_O"): 1, (None, "status_F"): 1}


# ---------------------------------------------------------------------------
# Family nine: deliberate TIES (r12 probe, sf_ties — SCALE.md round 12).
# An order-insensitive compare only sees a tie when it changes VALUES:
# rank numbers assigned differently, a top-k boundary selecting a
# different tied member, an argmax picking whichever row a partial saw
# first, a session split at EXACTLY the gap. The standing convention
# the axis pins: every ordered selection tie-breaks to a key column on
# BOTH engines, and boundary comparisons are verified empirically, not
# assumed. Hermetic pins for the representative mechanisms; the axis
# sweep covers all three diverging entries.
# ---------------------------------------------------------------------------


def test_argmax_tie_breaks_to_highest_orderkey(spark, queries, tmp_path):
    # Two tied-price orders for one customer: a bare max_by picks
    # whichever its partial aggregate saw first (partitioning-dependent,
    # and the engines disagreed). The (price, orderkey) struct key is a
    # total order: highest price, then highest orderkey — and an
    # all-NULL-price customer stays NULL/NULL (the when-guard keeps
    # NULL prices out of the struct so max_by still skips them).
    _orders(
        tmp_path,
        [
            (1, 5, "O", 400.0, "5-LOW"),
            (2, 5, "O", 400.0, "5-LOW"),
            (3, 5, "O", 100.0, "5-LOW"),
            (4, 9, "O", None, "5-LOW"),
        ],
    )
    rows = {
        r["o_custkey"]: (r["biggest_order"], r["biggest_total"])
        for r in queries["agg_argmax"](spark, str(tmp_path)).collect()
    }
    assert rows == {5: (2, 400.0), 9: (None, None)}


def test_session_window_merges_exact_gap_boundary(spark, queries, tmp_path):
    # Verified against session_window directly: an event at EXACTLY
    # prev_ts + gap MERGES (its half-open [ts, ts+gap) window touches
    # the running session's end), so a new session needs a STRICTLY
    # greater gap. The oracle's is_new predicate is `>`; hour-truncated
    # sf_ties events were the first fixture with exact 4h gaps.
    _events(
        tmp_path,
        [
            (1, _TS0, 1, "click", 1.0),
            (2, _TS0 + datetime.timedelta(hours=4), 1, "click", 2.0),
            (3, _TS0 + datetime.timedelta(hours=8, seconds=1), 1, "click", 4.0),
        ],
    )
    rows = sorted(
        (r["session_start"], r["n_events"])
        for r in queries["stream_session_window"](spark, str(tmp_path)).collect()
    )
    assert rows == [
        ("2024-01-01 00:00:00.000000", 2),
        ("2024-01-01 08:00:01.000000", 1),
    ]


def test_ntile_parks_unpriced_orders_last(spark, queries, tmp_path):
    # sf_nulls (extended r12 with o_totalprice holes) mechanism: Spark's
    # default NULLS FIRST would put every unpriced order in decile 1
    # while DuckDB's default puts them last. Pinned asc_nulls_last on
    # both the plain window and the distributed-rank twin (whose range
    # partitioner AND local sort must agree or global ranks are wrong).
    _orders(
        tmp_path,
        [
            (1, 5, "O", 20.0, "5-LOW"),
            (2, 5, "O", None, "5-LOW"),
            (3, 5, "O", 10.0, "5-LOW"),
        ],
    )
    for entry in ("win_ntile", "win_ntile_scale"):
        deciles = {
            r["o_orderkey"]: r["decile"]
            for r in queries[entry](spark, str(tmp_path)).collect()
        }
        assert deciles == {3: 1, 1: 2, 2: 3}, entry


def test_stump_and_ks_exclude_unpriced_orders(spark, queries, tmp_path):
    # Declared-domain drop: an unpriced order has no position on a
    # threshold grid or an ECDF — unfiltered, the NULL group sorted to
    # opposite ends of each engine's cumulative window and every
    # running count shifted.
    _orders(
        tmp_path,
        [
            (1, 5, "O", 10.0, "1-URGENT"),
            (2, 5, "O", 20.0, "1-URGENT"),
            (3, 5, "O", None, "1-URGENT"),
            (4, 5, "O", 30.0, "5-LOW"),
            (5, 5, "O", None, "5-LOW"),
        ],
    )
    stump = queries["ml_decision_stump"](spark, str(tmp_path)).collect()[0]
    assert stump["n_left"] + stump["n_right"] == 3
    ks = queries["quality_ks_two_sample"](spark, str(tmp_path)).collect()[0]
    assert (ks["n_a"], ks["n_b"]) == (2, 1)


def test_bootstrap_replicate_mean_is_integer_exact(spark, queries, tmp_path):
    # One order per status: every replicate mean is EXACTLY the order's
    # price (cents-integer sum, one division) or NULL (zero total
    # weight), so the CI bounds can only be the price itself or NULL —
    # any accumulation-order noise would show a third value.
    _orders(
        tmp_path,
        [(1, 5, "O", 123.45, "5-LOW"), (2, 6, "F", 67.89, "5-LOW")],
    )
    for r in queries["sample_poisson_bootstrap"](spark, str(tmp_path)).collect():
        want = {"O": 123.45, "F": 67.89}[r["status"]]
        assert r["ci_hi"] in (want, None)
        assert r["ci_lo"] in (want, None)
        assert r["n_replicates"] == 64


# ---------------------------------------------------------------------------
# Family ten: EXTREME-MAGNITUDE readings (r12 probe, sf_extremes —
# SCALE.md round 12). The overflow-from-FINITE-inputs gap sf_nan left:
# a 1e300 reading passes an isfinite check and then overflows INSIDE
# the second-moment aggregates (Spark answers +Inf/NaN, DuckDB RAISES
# "out of range"), and a ±1e300 pair makes every plain sum an
# accumulation-order function (1e300 + x − 1e300 is 0 or x depending
# on partial order — no rounding grain survives that). Convention:
# functions/finite.py's gate also excludes abs(v) >= MAG_CAP (1e75,
# fourth-moment-safe); denormals and signed zeros are legitimate IEEE
# values and flow through value logic unharmed.
# ---------------------------------------------------------------------------


def test_finite_gate_caps_absurd_magnitudes(spark):
    from projetos_etl_spark.functions.finite import MAG_CAP, finite

    assert MAG_CAP == 1e75
    df = spark.createDataFrame(
        [(1e300,), (-1e300,), (1.5e154,), (1e75,), (9.9e74,), (5e-324,),
         (-0.0,), (1e-300,), (2.5,)],
        "v double",
    )
    got = [r["f"] for r in df.select(finite("v").alias("f")).collect()]
    assert got == [None, None, None, None, 9.9e74, 5e-324, -0.0, 1e-300, 2.5]


def _extreme_events(tmp_path):
    # 360 hours = 15 days: ts_week_over_week's lag-7-days needs > 7
    # daily rows or the entry is vacuously unexercised.
    import datetime

    rows = []
    eid = 0
    for hour in range(360):
        for user in range(3):
            v = float(100 + (eid * 37) % 313)
            if eid % 17 == 0:
                v = 1e300
            elif eid % 23 == 0:
                v = -1e300
            elif eid % 29 == 0:
                v = 1.5e154  # only its SQUARE overflows
            elif eid % 31 == 0:
                v = 5e-324  # denormal
            elif eid % 37 == 0:
                v = -0.0
            rows.append(
                (
                    eid,
                    _TS0 + datetime.timedelta(hours=hour, minutes=user),
                    user,
                    ["purchase", "signup", "error"][eid % 3],
                    v,
                )
            )
            eid += 1
    _events(tmp_path, rows)


_EXTREME_CONSUMERS = [
    "agg_time_decayed_sum",
    "incremental_agg_merge",
    "scan_csv_badrecords",  # caught only by the DENSITY-scaled rerun
    "stream_custom_stateful_profile",
    "stream_static_join_enrich",
    "ts_autocorr_lag",
    "ts_ewma_anomaly",
    "ts_week_over_week",
    "udaf_grouped",
]


@pytest.mark.parametrize("entry", _EXTREME_CONSUMERS)
def test_value_consumers_match_oracles_with_extreme_readings(
    spark, queries, tmp_path, entry
):
    # The eight entries the sf_extremes sweep caught diverging, each
    # re-driven on a hermetic corpus dense in the hostile classes. The
    # two stream entries and the stateful profile cover the numpy-side
    # gate (streaming/stateful.py carries MAG_CAP explicitly).
    _extreme_events(tmp_path)
    sp = _assert_entry_matches_oracle(
        spark,
        queries,
        tmp_path,
        entry,
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')",
    )
    assert len(sp) > 0, "hermetic corpus must actually exercise the entry"
