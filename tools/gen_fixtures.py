"""Seeded regeneration of the driver fixture corpus (VERDICT r10 item 3).

Every sweep through round 10 ran the driver's seed-42 parquet under
``/root/testdata`` — and the Z-order oracle's broken Morton interleave
survived NINE rounds precisely because no seed-42 custkey ever reached
bit 14.  This tool regenerates the full ten-table corpus (schemas and
value domains profiled from ``/root/testdata/sf0.001`` on 2026-08-16,
documented in FIXTURES.md §B) at ANY seed, so the full driver_sim sweep
can be replayed on fixture draws the engine has never seen:

    python tools/gen_fixtures.py --seed 43 --out /tmp/sf_seed43 --scale 10
    python tools/driver_sim.py --sf-dir /tmp/sf_seed43

Two deliberate deviations from the seed-42 draws, both latent-hunting:

- **Key offsets.**  Each key family (custkey, orderkey, partkey,
  suppkey) starts at a seeded random base in ``[2^14, 2^18)`` instead
  of 0, so key bits 14-17 always carry real data — the class of bug the Morton
  probe found lives exactly in bits the small-sf dense keys never set.
  Foreign keys reference the offset domain, so the join graph is intact.
- **Fresh categorical mixes.**  Category values come from the profiled
  seed-42 domains (same strings, same types) but with independently
  drawn skews, so group cardinalities and per-group orderings differ.

Everything else matches the driver corpus contract: unit-norm 64-dim
embeddings, ``documents.n_chars == len(text)``, events spanning ~30
days from 2024-01-01 (far under SPINE_SPAN_CAP_HOURS), TPC-H date
ranges 1995-2001, JSON ``props`` of the ``{"k": <int>}`` shape.
Row counts are the sf0.001 counts times ``--scale``.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["cold", "small", "large", "fast", "slow", "big"]
PNOUN = ["widget", "bolt", "gear", "valve", "wheel"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

EPOCH_95 = np.datetime64("1995-01-01")
EPOCH_EVENTS = np.datetime64("2024-01-01T00:00:00")


def _money(rng: np.random.RandomState, lo: float, hi: float, n: int):
    return np.round(rng.uniform(lo, hi, n), 2)


def _skewed_choice(rng: np.random.RandomState, values, n: int):
    """Draw with a fresh random skew so group mixes differ per seed."""
    w = rng.dirichlet(np.ones(len(values)) * 2.0)
    return rng.choice(values, n, p=w)


def _ts_days(days: np.ndarray) -> pa.Array:
    return pa.array(
        (EPOCH_95 + days.astype("timedelta64[D]")).astype("datetime64[us]"),
        pa.timestamp("us"),
    )


def generate(seed: int, scale: int, out: str) -> None:
    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)
    # Seeded key bases: force key bits above the dense small-sf range.
    # The floor of 2^14 is deliberate — the Morton-probe class lives in
    # bits the seed-42 dense keys never set, so every regenerated corpus
    # must carry keys with bit 14+ high (seed-42 already covers dense
    # low-bit keys exhaustively).
    kb = {
        k: int(rng.randint(1 << 14, 1 << 18))
        for k in ("cust", "ord", "part", "supp")
    }

    n_cust, n_supp, n_part = 150 * scale, 10 * scale, 200 * scale
    n_ord, n_line = 1500 * scale, 6000 * scale
    n_ev, n_doc, n_emb = 1000 * scale, 500 * scale, 500 * scale

    def write(name: str, data: dict) -> None:
        pq.write_table(pa.table(data), os.path.join(out, f"{name}.parquet"))

    write("region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS, pa.string()),
    })
    write("nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array(rng.randint(0, 5, 25), pa.int32()),
    })

    custkeys = kb["cust"] + np.arange(n_cust, dtype=np.int64)
    write("customer", {
        "c_custkey": pa.array(custkeys, pa.int64()),
        "c_name": pa.array([f"Customer#{k:09d}" for k in custkeys], pa.string()),
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(_money(rng, -999.99, 9999.99, n_cust)),
        "c_mktsegment": pa.array(_skewed_choice(rng, SEGMENTS, n_cust), pa.string()),
    })

    suppkeys = kb["supp"] + np.arange(n_supp, dtype=np.int64)
    write("supplier", {
        "s_suppkey": pa.array(suppkeys, pa.int64()),
        "s_name": pa.array([f"Supplier#{k:09d}" for k in suppkeys], pa.string()),
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(_money(rng, -999.99, 9999.99, n_supp)),
    })

    partkeys = kb["part"] + np.arange(n_part, dtype=np.int64)
    write("part", {
        "p_partkey": pa.array(partkeys, pa.int64()),
        "p_name": pa.array(
            [f"{rng.choice(PADJ)} {rng.choice(PNOUN)}" for _ in range(n_part)],
            pa.string(),
        ),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.randint(1, 26, n_part)], pa.string()
        ),
        "p_type": pa.array(_skewed_choice(rng, PTYPES, n_part), pa.string()),
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(_money(rng, 900.0, 920.0, n_part)),
    })

    orderkeys = kb["ord"] + np.arange(n_ord, dtype=np.int64)
    write("orders", {
        "o_orderkey": pa.array(orderkeys, pa.int64()),
        "o_custkey": pa.array(rng.choice(custkeys, n_ord), pa.int64()),
        "o_orderstatus": pa.array(_skewed_choice(rng, STATUSES, n_ord), pa.string()),
        "o_totalprice": pa.array(_money(rng, 1000.0, 500000.0, n_ord)),
        "o_orderdate": _ts_days(rng.randint(0, 2405, n_ord)),  # 1995..2001-08
        "o_orderpriority": pa.array(
            _skewed_choice(rng, PRIORITIES, n_ord), pa.string()
        ),
    })

    write("lineitem", {
        "l_orderkey": pa.array(rng.choice(orderkeys, n_line), pa.int64()),
        "l_partkey": pa.array(rng.choice(partkeys, n_line), pa.int64()),
        "l_suppkey": pa.array(rng.choice(suppkeys, n_line), pa.int64()),
        "l_linenumber": pa.array(rng.randint(1, 8, n_line), pa.int32()),
        "l_quantity": pa.array(rng.randint(1, 51, n_line).astype(float)),
        "l_extendedprice": pa.array(_money(rng, 900.0, 105000.0, n_line)),
        "l_discount": pa.array(np.round(rng.randint(0, 11, n_line) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.randint(0, 9, n_line) / 100.0, 2)),
        "l_returnflag": pa.array(
            _skewed_choice(rng, RETURNFLAGS, n_line), pa.string()
        ),
        "l_linestatus": pa.array(
            _skewed_choice(rng, LINESTATUSES, n_line), pa.string()
        ),
        "l_shipdate": _ts_days(rng.randint(1, 2500, n_line)),
    })

    n_users = 15 * scale
    ev_ts = np.sort(rng.uniform(0, 30 * 86400, n_ev))  # ~30 days, micro precision
    write("events", {
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64), pa.int64()),
        "ts": pa.array(
            (EPOCH_EVENTS + (ev_ts * 1e6).astype("timedelta64[us]")),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(rng.randint(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(_skewed_choice(rng, EVENT_TYPES, n_ev), pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev) + 0.01, 2)),
        "props": pa.array(
            [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_ev)],
            pa.string(),
        ),
    })

    texts = [
        " ".join(rng.choice(VOCAB, rng.randint(10, 100)))
        for _ in range(n_doc)
    ]
    # Plant a handful of exact duplicates so exact/near dedup has work.
    for i in range(0, n_doc, 97):
        texts[i] = texts[(i + 13) % n_doc]
    write("documents", {
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(_skewed_choice(rng, LANGS, n_doc), pa.string()),
        "source": pa.array(
            [f"src{i}" for i in rng.randint(0, 20, n_doc)], pa.string()
        ),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

    vecs = rng.normal(0, 1, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", {
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64), pa.int64()),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(rng.randint(0, 10, n_emb), pa.int32()),
    })
    print(f"seed={seed} scale={scale} key bases={kb} -> {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--scale", type=int, default=10,
                    help="multiplier on the sf0.001 row counts (10 = sf0.01)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    generate(args.seed, args.scale, args.out)


if __name__ == "__main__":
    main()
