"""Empty-input hardening: the real registry entries driven against a
fixture set where EVERY table has zero rows (production schemas intact).

At 100 TB an empty input is an everyday state, not an anomaly: a date
filter that matches nothing, a partition that hasn't landed, a rerun of
an increment that produced no rows. The r8 audit swept all 326 entries
against zero-row tables with their DuckDB oracles side-by-side
(tools/driver_sim.py --sf-dir <empty fixtures>): 307 already matched;
these tests pin the 18 that crashed or diverged before the fixes, plus
the conventions they settled on (see SCALE.md's empty-input section):

- grouping sets: Spark's Expand emits NO rows on empty input where the
  SQL standard emits the global () row — the oracles mirror Spark via
  ``HAVING count(*) > 0`` (provably a no-op on non-empty input);
- trained operators (k-means, logreg, PCA, IVF/PQ tiers): an empty
  corpus trains nothing and returns an EMPTY result — the job survives;
- layer read-backs pin their schema (an empty increment writes no data
  files, so schema inference has nothing to see);
- digests of an empty corpus are NULL, not md5('');
- the medallion keeps its deliberate reference-parity raise (ref op
  #14) — pinned in tests/test_medallion.py, NOT relaxed here.

Each test writes the zero-row parquet tables with the production
schemas copied from the standard fixtures, so schema drift fails here
too.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from projetos_etl_spark.registry import all_queries

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def queries():
    return all_queries()


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(SRC_SF, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def test_grouping_sets_emit_no_rows_on_empty(spark, queries, empty_sf):
    # Spark semantics (which the oracles now mirror): the Expand-based
    # grouping-sets implementation produces nothing from nothing — the
    # standard's global () row does not appear.
    for entry in ("agg_cube", "agg_rollup", "agg_grouping_sets", "agg_grouping_id"):
        assert queries[entry](spark, empty_sf).count() == 0, entry


def test_trained_operators_return_empty_not_crash(spark, queries, empty_sf):
    # Every trainer (Lloyd k-means, gradient descent, PCA power
    # iteration, IVF/PQ quantizers) used to crash driver-side (numpy on
    # an empty sample, float * None gradients, float / None moments).
    for entry in (
        "ml_kmeans_lloyd",
        "ml_logreg_gd",
        "emb_pca_top_component",
        "sim_search_ivf",
        "sim_search_pq_adc",
        "sim_search_ivf_pq",
    ):
        assert queries[entry](spark, empty_sf).count() == 0, entry


def test_layer_readbacks_pin_schema_on_empty(spark, queries, empty_sf):
    # Partitioned writes of an empty table produce no data files; the
    # read-back must return the empty slice, not UNABLE_TO_INFER_SCHEMA.
    for entry in (
        "sink_partitioned_prune",
        "sink_dynamic_partition_overwrite",
        "maintenance_retention_sweep",
    ):
        assert queries[entry](spark, empty_sf).count() == 0, entry


def test_compaction_of_empty_table_is_one_empty_file(spark, queries, empty_sf, tmp_path):
    # Cross-engine the file counts are NULL below the 64-fragment regime
    # (writer/AQE internals — a Spark version bump may flip them, so the
    # ORACLE no longer pins the empty table; r8 ADVICE).
    row = queries["maintenance_compact_small_files"](spark, empty_sf).collect()[0]
    assert (row["files_before"], row["files_after"], row["n_rows"]) == (None, None, 0)
    # The empty-table physical behavior this Spark version exhibits —
    # one schema-bearing part file on both the fragmented write and the
    # compacted rewrite, so the layer stays readable — is pinned HERE,
    # local to the version under test.
    empty = spark.read.parquet(f"{empty_sf}/orders.parquet")
    for tag, n_part in (("frag", 64), ("compact", 4)):
        out = str(tmp_path / tag)
        empty.repartition(n_part).write.mode("overwrite").parquet(out)
        parts = [f for f in os.listdir(out) if f.startswith("part-")]
        assert len(parts) == 1, (tag, parts)
        assert spark.read.parquet(out).count() == 0, tag


def test_empty_corpus_digest_is_null(spark, queries, empty_sf):
    row = queries["scan_csv_multiline_quoted"](spark, empty_sf).collect()[0]
    assert row["n_docs"] == 0
    assert row["corpus_md5"] is None  # undefined, not md5('')


def test_footer_stats_audit_on_empty_file(spark, queries, empty_sf):
    row = queries["quality_parquet_stats_audit"](spark, empty_sf).collect()[0]
    assert row["n_rows"] == 0
    assert row["min_orderkey"] is None and row["max_orderkey"] is None
    assert row["n_null_returnflag"] == 0


def test_jdbc_roundtrip_of_empty_warehouse_table(spark, queries, empty_sf):
    assert queries["scan_jdbc_roundtrip"](spark, empty_sf).count() == 0


def test_streaming_upsert_with_no_events_commits_nothing(spark, queries, empty_sf):
    got = queries["stream_upsert_tablelog"](spark, empty_sf)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "user_id", "n_events", "sum_value", "last_ts", "multi_commit",
    ]


def test_kmeans_seeds_min_k_n_clusters(spark):
    # Between empty and full: fewer rows than k seeds that many
    # clusters — the exact ORDER BY id LIMIT k seeding the SQL oracle
    # replays — instead of raising.
    from projetos_etl_spark.operators.kmeans import kmeans_lloyd

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vid long, vec array<double>"
    )
    cents = kmeans_lloyd(df, "vid", "vec", k=5, iters=2)
    assert len(cents) == 2
    assert kmeans_lloyd(df.limit(0), "vid", "vec", k=5, iters=2) == {}


# -- single-row / degenerate-size inputs (the second audit axis) -------------


@pytest.fixture(scope="module")
def onerow_sf(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_onerow")
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC_SF, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 1), str(d / f"{t}.parquet"))
    return str(d)


def test_undefined_statistics_are_null_on_one_row(spark, queries, onerow_sf):
    # One row: zero variance, a one-sided median split, a single-valued
    # column, all-zero bootstrap weights — every statistic that divides
    # by these degrades to NULL (matching SQL x/0 -> NULL), never an
    # ANSI DIVIDE_BY_ZERO.
    corr = queries["agg_corr_matrix"](spark, onerow_sf).collect()
    assert len(corr) == 6 and all(r["corr"] is None for r in corr)

    chi = queries["quality_chisq_categorical_drift"](spark, onerow_sf).collect()[0]
    assert chi["n_second_half"] == 0 and chi["chi_squared"] is None

    ent = queries["quality_entropy_profile"](spark, onerow_sf).collect()[0]
    assert ent["n_distinct"] == 1 and ent["normalized_entropy"] is None


def test_bootstrap_keeps_null_replicates_in_order_statistics(
    spark, queries, onerow_sf
):
    # A single-row group draws weight 0 on some (here: all) replicates;
    # their means are NULL and must stay IN the sorted 64-slot array
    # (DuckDB list() keeps NULLs; collect_list would drop them and the
    # CI indexes crash or shift).
    row = queries["sample_poisson_bootstrap"](spark, onerow_sf).collect()[0]
    assert row["n_replicates"] == 64
    assert row["boot_mean"] is None
    assert row["ci_lo"] is None and row["ci_hi"] is None


def test_pca_scores_null_when_no_direction_exists(spark, queries, tmp_path):
    # Constant corpus with n > 1: covariance is all-zero, so the top
    # component is undefined -> NULL scores (the oracle's replay
    # propagates the same NULL through its 0-norm division).
    import pyarrow as pa

    v = [0.5] * 64
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(3), pa.int64()),
                "embedding": pa.array([v, v, v], pa.list_(pa.float32())),
                "label": pa.array([0, 1, 0], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = queries["emb_pca_top_component"](spark, str(tmp_path)).collect()
    assert len(rows) == 3 and all(r["pc1_score"] is None for r in rows)


def test_ann_contract_abstains_below_probe_range(spark, queries, onerow_sf):
    # The planted-probe audit needs vec_ids [0, 2*N_PROBES); below that
    # both engines return an empty contract instead of pinning clauses
    # a tiny corpus cannot satisfy.
    for entry in ("sim_search_ivf", "sim_search_pq_adc", "sim_search_ivf_pq"):
        assert queries[entry](spark, onerow_sf).count() == 0, entry


def test_single_parity_stream_commits_once(spark, queries, onerow_sf):
    # Epochs split on event_id parity; one row is one parity, so only
    # one epoch commits and multi_commit is honestly False.
    row = queries["stream_upsert_tablelog"](spark, onerow_sf).collect()[0]
    assert row["n_events"] == 1 and row["multi_commit"] is False


def test_compaction_counts_null_below_fragment_count(spark, queries, onerow_sf):
    # n < 64 (empty table included): physical file counts are writer/AQE
    # internals, not a contract — both engines report NULL (pinned 64->4
    # only at n >= 64).
    row = queries["maintenance_compact_small_files"](spark, onerow_sf).collect()[0]
    assert row["n_rows"] == 1
    assert row["files_before"] is None and row["files_after"] is None


# -- NULL-holed payload columns (the third audit axis) ------------------------


@pytest.fixture(scope="module")
def nulls_sf(tmp_path_factory) -> str:
    """sf0.001 with every 10th value/text/embedding/o_totalprice NULL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = tmp_path_factory.mktemp("sf_nulls")
    nullify = {
        "events": ["value"],
        "documents": ["text"],
        "embeddings": ["embedding"],
        "orders": ["o_totalprice"],
    }
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC_SF, f"{t}.parquet"))
        for col in nullify.get(t, []):
            idx = tab.schema.get_field_index(col)
            mask = pa.array([i % 10 == 0 for i in range(tab.num_rows)])
            tab = tab.set_column(
                idx,
                tab.schema.field(col),
                pc.if_else(
                    mask,
                    pa.nulls(tab.num_rows, tab.schema.field(col).type),
                    tab.column(col).combine_chunks(),
                ),
            )
        pq.write_table(tab, str(d / f"{t}.parquet"))
    return str(d)


def test_python_kernels_propagate_null(spark, queries, nulls_sf):
    # Row UDF, UDTF, and both mapInPandas media kernels receive SQL NULL
    # as None and must answer NULL, not crash (None >= 300, None.split,
    # len(None), bytes(None) all raised before).
    tiers = {r["event_id"]: r["tier"] for r in queries["udf_scalar"](spark, nulls_sf).collect()}
    assert None in set(tiers.values()) and "high" in set(tiers.values())

    chunks = queries["udtf_chunk_lateral"](spark, nulls_sf).collect()
    null_docs = [r for r in chunks if r["chunk"] is None]
    assert null_docs and all(r["chunk_id"] == 0 for r in null_docs)

    feats = {r["doc_id"]: r for r in queries["multimodal_decode_features"](spark, nulls_sf).collect()}
    assert feats[0]["n_bytes"] is None and feats[1]["n_bytes"] is not None

    out = {r["doc_id"]: r for r in queries["multimodal_transcode_roundtrip"](spark, nulls_sf).collect()}
    assert out[0]["out_md5"] is None and out[1]["out_md5"] is not None


def test_rank_metrics_exclude_unscored_rows(spark, queries, nulls_sf):
    # Engines sort NULL to opposite ends of a rank window (Spark NULLS
    # FIRST, DuckDB NULLS LAST): AUC/calibration exclude unscored rows
    # entirely, so n_pos + n_neg < total row count here.
    auc = queries["eval_auc_roc"](spark, nulls_sf).collect()[0]
    assert auc["n_pos"] + auc["n_neg"] == 900  # 1000 events, 100 NULL values
    assert auc["auc"] is not None

    bins = queries["eval_calibration_bins"](spark, nulls_sf).collect()
    assert sum(r["n"] for r in bins) == 900


def test_mergeable_avg_counts_only_nonnull_values(spark, queries, tmp_path):
    import datetime

    import pyarrow as pa

    ts0 = datetime.datetime(2024, 1, 1)

    def at(sec):
        return ts0 + datetime.timedelta(seconds=sec)

    # the NULL tick is the EARLIEST, so naive min_by would open NULL
    rows = [(1, at(0), 1, "view", None, "{}"), (2, at(1), 1, "view", 10.0, "{}"),
            (3, at(2), 1, "view", 20.0, "{}")]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    row = queries["incremental_agg_merge"](spark, str(tmp_path)).collect()[0]
    # avg over the two non-NULL values, not sum/count(*) = 10.
    assert row["n_events"] == 3 and row["avg_value"] == pytest.approx(15.0)

    bar = queries["ts_ohlc_bars"](spark, str(tmp_path)).collect()[0]
    # the NULL tick is not a price: open anchors on the first NON-NULL.
    assert bar["open"] == pytest.approx(10.0) and bar["close"] == pytest.approx(20.0)
    assert bar["n_ticks"] == 3


def test_null_vectors_excluded_from_training_and_index(spark, queries, nulls_sf):
    # vec 0 is NULL: it can be neither a query nor a neighbor in the
    # trained tiers; the audit runs over the 9 valid queries.
    for entry in ("sim_search_ivf", "sim_search_pq_adc", "sim_search_ivf_pq"):
        rows = queries[entry](spark, nulls_sf).collect()
        assert len(rows) == 9, entry
        assert all(r["scores_exact"] for r in rows), entry

    # PCA: NULL vectors carry no moments but still appear with NULL score.
    scores = {r["vec_id"]: r["pc1_score"] for r in queries["emb_pca_top_component"](spark, nulls_sf).collect()}
    assert scores[0] is None and scores[1] is not None

    # k-means trains on the non-null corpus without crashing.
    assert queries["ml_kmeans_lloyd"](spark, nulls_sf).count() == 4 * 64
