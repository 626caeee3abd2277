"""Benchmark runner (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is forced to full execution with the ``noop`` sink (real
distributed write path, no driver collect bottleneck, nothing kept).

Stability (VERDICT r1 item 6): each query is timed THREE times and the
median reported — single runs on this box vary up to 3x under system
contention, which makes regressions unreadable. The raw per-run timings
(``queries_runs``) and the medallion layer-write vs gold-compute split
(``write_split``) are spooled to ``BENCH_LOCAL.json`` next to this
script; the stdout line carries medians AND per-query MINS (r8 VERDICT
item 4: the min is the contention-free floor, so a contended run of
this script self-adjudicates instead of producing phantom regressions)
plus errors + regression names, shrink-cascaded so it fits the
recording harness's 2000-char tail buffer (VERDICT r4 item 2).  The
``regressions`` list is computed on the MIN basis (current min vs the
previous round's min where recorded, else its median) — r7 and r8 both
shipped driver artifacts whose median-basis "regressions" were pure
host contention (load-avg 2.5-5.1 during the run), gone in the quiet
re-run.

Streaming entries get extra warm-up passes: the state-store/micro-batch
code path JIT-decays over ~4 executions (measured 12.9s -> 2.4s for the
SAME single-micro-batch query within one session, quiet box — SCALE.md
r9), so a single warm-up left the timed runs on the decay curve and
made ``stream_tumbling_count`` hypersensitive to contention (r8 VERDICT
item 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projetos_etl_spark.registry import all_queries
from projetos_etl_spark.session import get_spark

#: Headline queries: one per major operator family, heaviest variants.
BENCH_QUERIES = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "gold_sales_mart",
    "join_broadcast",
    "join_asof_events",
    "join_left",
    # aggregation / window / scalar families
    "agg_rollup",
    "win_running_sum",
    "fn_json_extract",
    # round 2 additions: correlated-threshold TPC-H shape + time-series
    # regularization (hourly spine + forward fill). The headline total
    # therefore grows vs BENCH_r01 by these two queries' cost — compare
    # per-query, not the raw total, across rounds.
    "q17_small_quantity_revenue",
    "ts_resample_ffill",
    # LLM-data ops
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_connected_components",
    "text_rolling_hash",
    "text_contamination_ngram",
    "text_unigram_logprob",
    "sim_search_topk",
    # round 3 additions: ANN compression tier, exact bitmap rollup,
    # blocked fuzzy matching, iterative graph rank — compare per-query
    # (the delta block reports this), not the raw total, across rounds.
    "sim_search_pq_adc",
    "bitmap_distinct_rollup",
    "er_blocking_join",
    "graph_pagerank",
    # round 4 additions: composed IVF+PQ ANN end-state, second-order LM
    # quality scoring, LSH+exact-verify dedup tier, and the feature-
    # engineering representatives (compare per-query across rounds, as
    # above).
    "sim_search_ivf_pq",
    "text_perplexity_bigram",
    "dedup_minhash_verified",
    "feat_quantile_bucketize",
    "anomaly_zscore_rolling",
    "maintenance_zorder_stats",
    "join_interval_overlap",
    # continuing-r4 additions: runtime bloom-filter join pruning, exact
    # weighted median (pre-agg + window over distinct values), and
    # oriented-edge triangle counting (compare per-query across rounds).
    "join_bloom_prune",
    "agg_weighted_median",
    "graph_triangle_count",
    # round 5 additions: distributed PCA (Arrow-batched Gram partials +
    # driver power iteration), corpus collocations (two word-keyed
    # shuffles), one-pass Poisson bootstrap (64x replicate explode), and
    # the hub-capped bipartite projection (compare per-query across
    # rounds, as above).
    "emb_pca_top_component",
    "text_bigram_pmi",
    "sample_poisson_bootstrap",
    "graph_bipartite_projection",
    # late round-5: in-engine iterative ML (per-iteration aggregate
    # jobs — these benchmark the synchronous-iteration floor the same
    # way graph_pagerank does).
    "ml_logreg_gd",
    "ml_kmeans_lloyd",
    # round 6 additions: the late-r5 snapshot entries, now benched —
    # exact split-point search over the distinct-cents candidate grid,
    # the t-closeness privacy audit, and train/holdout JS divergence
    # (compare per-query across rounds, as above). NOTE: from r6 the
    # sim_search_pq_adc / sim_search_ivf_pq entries also run their
    # contract audit (exact-rerank recheck + planted-probe search), so
    # their rows are not comparable to pre-r6 rounds.
    "ml_decision_stump",
    "privacy_t_closeness_audit",
    "quality_js_divergence",
    # round 6 additions: integer-exact iterative graph ops, the per-key
    # EWMA fold, KN smoothing off one bigram shuffle, and the two-epoch
    # streaming merge into the table log (compare per-query across
    # rounds, as above).
    "graph_label_propagation",
    "ts_ewma_anomaly",
    "corpus_kneser_ney_bigram",
    "stream_upsert_tablelog",
    # round 7 additions: representatives of the previously un-benched r6
    # families — iterative k-core peeling, the broadcast-LM held-out
    # perplexity pass, the integer-exact STL decomposition, the nearest
    # as-of join, and the r7 distributed-rank decile twin (compare
    # per-query across rounds, as above).
    "graph_kcore_decomposition",
    "eval_heldout_perplexity",
    "ts_stl_decompose",
    "join_asof_nearest",
    "win_ntile_scale",
    # r7 addition: the second distributed-scan twin — peak concurrency
    # via per-range-partition prefix sums + broadcast offsets (compare
    # per-query across rounds, as above).
    "win_max_concurrency_scale",
    # warehouse maintenance
    "cdc_apply_changes",
    # end-to-end medallion with real layer writes
    "medallion_gold_profit_mart",
    # structured streaming (windowed agg through a real streaming query)
    "stream_tumbling_count",
]


#: Optional parallel-scaling spot-check (VERDICT r13 item 8): at sf0.1
#: every headline query is fixed-cost bound, so the 8-vs-32-core block
#: cannot evidence the parallel design. When $SPARK_GRAFT_SCALE_DIR
#: names a LARGER corpus (e.g. tools/gen_fixtures.py --scale 1000 ~ sf1)
#: the bench ADDITIONALLY times these data-bound representatives there —
#: scan/aggregate/shuffle-bound first, one iterative fixpoint — so a
#: core-count pair of runs shows ratios approaching the core ratio. The
#: env is unset in the driver contract, so the driver's runs and stdout
#: line are byte-identical; results land in BENCH_LOCAL.json (full) and
#: a compact "scale_probe" block (budget cascade applies).
#: Scan/join/aggregate-bound representatives: these are the paths whose
#: wall-clock is data volume, so core-ratio speedups are observable once
#: the corpus outgrows the per-stage fixed cost (~GB scale). The
#: iterative fixpoints and the 3-group weighted median are deliberately
#: NOT probed: the former cost minutes x 10 rounds at probe scale, the
#: latter is the documented skew-bound shape — their scale posture is
#: evidenced by plan shape (pre-partitioned single-shuffle rounds), not
#: by this block.
SCALE_PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    "feat_quantile_bucketize",
    "dedup_exact",
    "text_rolling_hash",
]
SCALE_PROBE_RUNS = 2


def _run_scale_probe(spark, registry: dict) -> dict | None:
    """Time SCALE_PROBE_QUERIES at $SPARK_GRAFT_SCALE_DIR with the bench
    methodology (noop sink, min of SCALE_PROBE_RUNS)."""
    probe_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR")
    if not probe_dir or not os.path.isdir(probe_dir):
        return None
    queries: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in SCALE_PROBE_QUERIES:
        if name not in registry:
            continue
        ts: list[float] = []
        for _ in range(SCALE_PROBE_RUNS):
            spark.sparkContext.setJobDescription(f"scale-probe: {name}")
            t0 = time.perf_counter()
            try:
                registry[name](spark, probe_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001 — probe must not kill the bench
                errors[name] = f"{type(e).__name__}: {e}"[:200]
                break
            ts.append(round(time.perf_counter() - t0, 3))
        if ts:
            queries[name] = min(ts)
            runs[name] = ts
    return {"dir": probe_dir, "queries_min": queries, "runs": runs, "errors": errors}


def _loadavg() -> list[float] | None:
    """1/5/15-minute load averages, None where the OS lacks them.
    Recorded at bench start AND end (VERDICT r7 item 6): bench is
    contention-sensitive (a concurrent sweep once inflated every query a
    uniform ~1.4x), so the artifact itself must carry enough to
    adjudicate contention after the fact — load near the core count
    during the run means the numbers measure the HOST, not the engine."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except (OSError, AttributeError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    load_start = _loadavg()
    spark = get_spark(app_name="projetos-etl-spark-bench")

    registry = all_queries()
    names = [n for n in BENCH_QUERIES if n in registry]

    # Warm-up: run every bench query once at the smallest scale factor.
    # This compiles the same whole-stage-codegen shapes and JIT-warms the
    # JVM on ~1% of the data, so the timed pass measures engine
    # throughput rather than one-time codegen/JIT cost (~2.5x inflation
    # otherwise). Falls back to the target sf if sf0.001 is absent.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    # Crash isolation (VERDICT r3 item #2): in r3 ONE analysis error in
    # warm-up destroyed the entire round's bench artifact, losing numbers
    # for 26 healthy queries. A failing query is recorded as an error row
    # and excluded from warm-up/timing/totals; the rest still report.
    errors: dict[str, str] = {}
    # Streaming queries JIT-warm over ~4 executions (state-store +
    # micro-batch scheduler paths compile lazily; see module docstring),
    # so they get extra warm-up passes at the small sf — otherwise the
    # timed runs sit on the decay curve and measure JIT, not the engine.
    STREAM_WARMUPS = 4
    for name in names:
        try:
            n_warm = STREAM_WARMUPS if name.startswith("stream_") else 1
            for _ in range(n_warm):
                registry[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 — any one query must not kill the run
            errors[name] = f"{type(e).__name__}: {e}"[:500]
    names = [n for n in names if n not in errors]

    from projetos_etl_spark import medallion

    N_RUNS = 3
    runs: dict[str, list[float]] = {n: [] for n in names}
    split_runs: dict[str, list[dict[str, float]]] = {}
    for _ in range(N_RUNS):
        for name in names:
            t0 = time.perf_counter()
            try:
                registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:500]
                continue
            elapsed = time.perf_counter() - t0
            runs[name].append(round(elapsed, 3))
            if name == "medallion_gold_profit_mart":
                w = medallion.last_write_seconds()
                split_runs.setdefault(name, []).append(
                    {"write": round(w, 3), "compute": round(max(elapsed - w, 0.0), 3)}
                )

    timings = {n: sorted(ts)[len(ts) // 2] for n, ts in runs.items() if ts}
    # The median is the headline (robust to one bad run), but this box's
    # run-to-run variance across SESSIONS can exceed 2x under host
    # contention — the min is the contention-free floor and the steadier
    # cross-round statistic. From r9 the mins ship in the driver-visible
    # stdout line too (and drive the `regressions` list); `value` stays
    # the median sum so the series remains comparable with earlier
    # rounds.
    timings_min = {n: min(ts) for n, ts in runs.items() if ts}
    # The reported split is the component-wise median across runs, so it
    # decomposes a number of the same robustness as the headline median
    # (a single run's split can disagree with the median total).
    write_split = {
        name: {
            comp: sorted(s[comp] for s in splits)[len(splits) // 2]
            for comp in ("write", "compute")
        }
        for name, splits in split_runs.items()
    }
    delta = _delta_vs_previous(timings, timings_min)
    # Capture the headline run's end load BEFORE the optional scale
    # probe: minutes of probe work would otherwise sit between the
    # timed runs and the reading, making the contention-adjudication
    # fields describe the probe, not the bench (r14 review finding).
    load_end = _loadavg()
    scale_probe = _run_scale_probe(spark, registry)
    # Full per-run detail goes to a LOCAL file, committed as round
    # evidence; the stdout line stays COMPACT. The recording harness
    # captures only the last 2000 chars of stdout (BENCH_r04.json came
    # back `parsed: null` because the single detail-laden line overflowed
    # that buffer), so the final printed line must stay well under it.
    detail = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "queries_runs": runs,
        "write_split": write_split,
        "write_split_runs": split_runs,
        "errors": errors,
        "delta": delta,
        "load_avg_start": load_start,
        "load_avg_end": load_end,
        "ncpus": os.cpu_count(),
        "sf": sf,
    }
    if scale_probe is not None:
        detail["scale_probe"] = scale_probe
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError as e:
        print(f"warn: could not write BENCH_LOCAL.json: {e}", file=sys.stderr)
    compact = {
        "metric": "headline_queries_total",
        "value": detail["value"],
        "value_min": round(sum(timings_min.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "errors": errors,
        "delta_vs": (delta or {}).get("vs"),
        "regressions": (delta or {}).get("regressions"),
        "regressions_basis": (delta or {}).get("regressions_basis"),
        "load_avg": {"start": load_start, "end": detail["load_avg_end"]},
        "sf": sf,
    }
    if scale_probe is not None:
        # Unset in the driver contract, so this key never appears in
        # driver-recorded lines; locally the budget cascade still rules.
        compact["scale_probe"] = {
            "dir": scale_probe["dir"],
            "queries_min": scale_probe["queries_min"],
        }
    print(_compact_line(compact, timings, timings_min))


#: Recording-harness tail-buffer budget for the stdout line; the
#: cascade below guarantees the printed JSON never exceeds it.
LINE_BUDGET = 1800


def _compact_line(
    compact: dict, timings: dict[str, float], timings_min: dict[str, float]
) -> str:
    """Serialize the driver-visible stdout line, shrinking in stages so
    it NEVER overflows the recording harness's tail buffer (the r4
    `parsed: null` artifact failure). Factored out of main() so the
    cascade — especially the final fallback — is unit-testable
    (tests/test_bench_artifact.py)."""
    line = json.dumps(compact)
    if len(line) > LINE_BUDGET:  # stage 1: 2dp per-query seconds
        compact["queries"] = {n: round(t, 2) for n, t in timings.items()}
        compact["queries_min"] = {n: round(t, 2) for n, t in timings_min.items()}
        line = json.dumps(compact)
    if len(line) > LINE_BUDGET:
        # Stage 2: drop the fastest queries from BOTH dicts (kept names
        # stay aligned so every reported query carries median AND min)
        # until the line fits; full detail is always in BENCH_LOCAL.json.
        order = sorted(timings, key=lambda n: -timings[n])
        keep = len(order)
        while len(line) > LINE_BUDGET and keep > 10:
            keep -= 1
            kept = order[:keep]
            compact["queries"] = {n: round(timings[n], 2) for n in kept}
            compact["queries_min"] = {
                n: round(timings_min[n], 2) for n in kept if n in timings_min
            }
            compact["queries_truncated_to_slowest"] = keep
            line = json.dumps(compact)
    if len(line) > LINE_BUDGET:
        # Final fallback: a line dominated by long regressions/errors
        # lists can still overflow after the query-dropping loop bottoms
        # out at keep=10 (r9 ADVICE). Collapse the unbounded list fields
        # to counts — the full detail is always in BENCH_LOCAL.json —
        # and, if a pathological sf/path string STILL overflows, drop
        # the per-query dicts entirely: a parseable headline beats a
        # truncated rich one.
        for field in ("regressions", "errors"):
            v = compact.get(field)
            if isinstance(v, (list, dict)) and v:
                compact[field] = f"<{len(v)} entries: see BENCH_LOCAL.json>"
        line = json.dumps(compact)
        if len(line) > LINE_BUDGET:
            compact.pop("queries", None)
            compact.pop("queries_min", None)
            compact.pop("scale_probe", None)  # local-only block, full copy in BENCH_LOCAL.json
            compact["queries_truncated_to_slowest"] = 0
            line = json.dumps(compact)
    return line


def _regression_flag(ratio: float, base_s: float, cur_s: float) -> bool:
    """Noise-floored min-basis regression flag (VERDICT r10 item 4):
    sub-2s entries and sub-0.5s deltas sit inside the host-drift
    envelope (the r10 five-session table moved identical-code min-sums
    101.4->118.0s; the only single-session flags ever raised on this
    basis were 1-2s streaming entries drifting ~0.3s). Such entries
    only flag when the min-basis ratio exceeds 2x — a real regression
    of a fast entry still shows; a ~0.3s host-noise echo no longer
    does."""
    if ratio <= 1.3:
        return False
    if ratio > 2.0:
        return True
    return base_s >= 2.0 and (cur_s - base_s) >= 0.5


def _delta_vs_previous(
    timings: dict[str, float], timings_min: dict[str, float]
) -> dict | None:
    """Per-query ratio vs the most recent recorded BENCH_r{N}.json, with
    >1.3x slowdowns called out — so a reader sees regressions in the
    bench artifact itself instead of recomputing across rounds. Only
    same-sf artifacts are compared (ratios across sf are meaningless).

    ``ratio`` stays median-basis for series continuity; ``regressions``
    is computed MIN-basis (current min vs the previous artifact's min
    where it recorded one, else its median) — a contended run inflates
    medians ~uniformly but leaves mins near the floor, so min-basis
    regressions survive the exact contention that manufactured r7/r8's
    phantom ones. A real regression shows up in the min too."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    prev_name, prev = None, None
    # Measurement-bug fix (r14): the driver also records LOW-CORE-COUNT
    # artifacts (BENCH_r13_c8.json) for the scaling block; the round-int
    # sort tie-broke toward them, so this 32-core run's delta (and its
    # `regressions` flags) compared against 8-core minimums — which at
    # this sf are FASTER (fixed-cost bound), i.e. phantom regressions
    # waiting to fire. Core-count-suffixed artifacts are excluded from
    # the baseline pick; the comparison series stays main-run-to-main-run.
    candidates = [
        p
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if not re.search(r"_c\d+\.json$", os.path.basename(p))
    ]
    for path in sorted(
        candidates,
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        reverse=True,
    ):
        try:
            with open(path) as f:
                cand = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        # Driver-recorded artifacts wrap this script's JSON line under
        # "parsed" (alongside rc/tail); a local run of this script emits
        # the line bare. Accept both — r3's delta block silently compared
        # against nothing because it only looked at the top level.
        if isinstance(cand.get("parsed"), dict):
            cand = cand["parsed"]
        if cand.get("sf") == sf and cand.get("queries"):
            prev_name, prev = os.path.basename(path), cand["queries"]
            prev_min = cand.get("queries_min") or {}
            break
    if prev is None:
        return None
    ratios = {
        n: round(timings[n] / prev[n], 3)
        for n in timings
        if n in prev and prev[n] > 0
    }
    # Min-basis floor comparison: vs the previous round's min where the
    # artifact recorded one (r9+), else its median (r8 and earlier).
    base = {n: prev_min.get(n, prev.get(n)) for n in timings_min}
    ratios_min = {
        n: round(timings_min[n] / base[n], 3)
        for n in timings_min
        if base.get(n)
    }
    return {
        "vs": prev_name,
        "ratio": ratios,
        "ratio_min": ratios_min,
        "regressions": sorted(
            n
            for n, r in ratios_min.items()
            if _regression_flag(r, base[n], timings_min[n])
        ),
        "regressions_basis": "min_vs_prev_min_or_median_noise_floored",
        "new_queries": sorted(n for n in timings if n not in prev),
    }


if __name__ == "__main__":
    main()
