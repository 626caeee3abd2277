"""Build the degenerate fixture sets the r8 audit swept (SCALE.md):

    python tools/make_degenerate_fixtures.py [--src /root/testdata/sf0.001] \
        [--out-base /tmp]

Writes five sibling fixture directories, each with all ten tables in the
production schemas:

- ``sf_empty``       every table zero rows (schema intact) — the
                     "filter matched nothing" state;
- ``sf_factsempty``  dims present, the five fact tables empty — the
                     "today's partition hasn't landed" state;
- ``sf_onerow``      every table exactly its first row — the
                     zero-variance / one-sided-split state;
- ``sf_nulls``       every 10th events.value / documents.text /
                     embeddings.embedding NULL — the "failed upstream
                     parse" state;
- ``sf_ragged``      malformed vectors planted in the 64-d embeddings
                     corpus (the r9 hostile-probe shape, made a standing
                     axis in r10): vec_id % 29 == 0 -> EMPTY vector,
                     else vec_id % 13 == 0 -> TRUNCATED to 32 dims,
                     else vec_id % 17 == 0 -> one NULL ELEMENT planted
                     at position vec_id % 64 — the three ways a parsed
                     embedding can be the wrong shape without being
                     NULL. One such vector used to crash quantizer
                     training / PCA (np ragged ValueError, None->NaN
                     Gram poison); the well_formed convention
                     (operators/cosine.py) excludes all three, and the
                     exact-tier consumers pin their fold-NULL semantics
                     against the DuckDB twins on exactly this axis;
- ``sf_nan``         non-finite readings planted in events.value
                     (event_id % 37 -> NaN, % 41 -> +Inf, % 53 -> -Inf)
                     — the "0/0 or overflow upstream" state. One NaN
                     used to ABORT the streaming-upsert sink and the
                     STL job (ANSI integer casts), overflow DuckDB's
                     stddev on Inf, and silently diverge medians /
                     maxima / tier CASEs across engines; the finite
                     gate (functions/finite.py) pins the convention;
- ``sf_hostiletext`` degenerate documents.text planted by doc_id
                     (% 23 -> EMPTY string, % 31 -> whitespace-only,
                     % 19 -> doubled inner spaces, % 43 -> non-ASCII
                     prefix). One empty doc used to DIVIDE_BY_ZERO-abort
                     the quality/token-budget passes, and the CSV
                     round-trip silently corrupted ''/whitespace rows;
- ``sf_hostileevents`` hostile events.ts + events.props planted by
                     event_id: ts % 37 -> sub-second micros, % 41 ->
                     mass-DUPLICATE timestamp, % 53 -> .999999 micros
                     on a shared second; props % 37 -> malformed JSON,
                     % 41 -> '[]', % 43 -> 'null', % 47 -> non-numeric
                     $.k, % 53 -> ''. Duplicate ts caught the OHLC
                     tie-break divergence; malformed JSON crashed the
                     DuckDB oracles where Spark NULLs-and-continues.
                     (Epoch-zero / far-future stamps are deliberately
                     NOT planted: the spine operators now REFUSE spans
                     over SPINE_SPAN_CAP_HOURS with a named diagnostic
                     — registry/prep.py — pinned hermetically instead.)
- ``sf_nullkeys``   NULL KEY columns — the gap sf_nulls deliberately
                     left (it holes only payload columns). Planted by
                     stable ids: events.ts NULL (event_id % 31, an
                     unparseable upstream stamp), events.user_id NULL
                     (% 43, an unattributed event), orders.o_custkey
                     NULL (o_orderkey % 29), lineitem.l_suppkey NULL
                     (l_orderkey % 83), documents.lang NULL (doc_id
                     % 37), documents.source NULL (doc_id % 53 —
                     r11: an unattributed document; 8 entries group
                     or join on source); r11 adds events.event_type NULL
                     (event_id % 41 — COUNT(DISTINCT) skips NULL
                     types but a first-occurrence row_number flag
                     would not) and one POSITIONLESS-ONLY user (the
                     smallest user_id gets ts NULLed on EVERY event:
                     an empty filtered sequence digests to NULL in
                     DuckDB but md5('') in a naive Spark
                     collect_list). The r10 probe of this axis caught THIRTY
                     diverging entries ("family seven", SCALE.md): a
                     NULL-ts right row forward-filled into a whole
                     as-of key, Spark/DuckDB sorted NULL ts to
                     opposite ends of every ordered window, NOT IN
                     vs left-anti disagreed on NULL orphans, phantom
                     NULL graph vertices, NaN f1 on the unlabeled
                     class, a median split stranding NULL-ts rows in
                     neither micro-batch, and NULL-ts rows parked
                     forever in __HIVE_DEFAULT_PARTITION__ past every
                     retention sweep.
- ``sf_hostilerel`` hostile RELATIONAL values in orders/lineitem,
                     keyed on the order keys (r10 "family six"):
                     orders  % 37 -> o_orderdate epoch 1970-01-01,
                             % 41 -> 2250-06-01 far future,
                             % 43 -> ORPHAN o_custkey (1e9 + key),
                             % 53 -> negative o_totalprice;
                     lineitem % 47 -> ORPHAN l_orderkey (2e9 + key),
                             % 59/61 -> epoch / far-future l_shipdate,
                             % 67 -> NEGATIVE l_quantity (a return),
                             % 71 -> out-of-domain l_discount 1.5,
                             % 73/79 -> orphan l_suppkey / l_partkey.
                     One negative quantity used to corrupt every money
                     measure 1000x through the medallion currency-string
                     roundtrip (floor-ladder on negative cents), and one
                     orphan custkey >= 16384 exposed the DuckDB bitwise-
                     precedence bug in the Z-order oracle (`a | b << 1`
                     parses as `(a | b) << 1`). Epoch/far-future ORDER
                     dates are in-domain here (no spine operator runs on
                     orders): date filters, year partitions, and the
                     business-day closed form must simply agree.
- ``sf_nullcats``   NULL CATEGORICAL attributes (r11 family eight) —
                     the enum-like GROUP BY / pivot / CASE / partition
                     columns no earlier axis holed: c_mktsegment
                     (c_custkey % 31), c_nationkey (% 41),
                     o_orderstatus (o_orderkey % 47), o_orderpriority
                     (% 59), l_returnflag (l_orderkey % 89),
                     l_linestatus (% 97), p_brand (p_partkey % 43),
                     p_type (% 61), s_nationkey (s_suppkey % 7),
                     embeddings.label (vec_id % 53).

Then sweep each with the driver simulator:

    python tools/driver_sim.py --sf-dir /tmp/sf_nulls

Expected: 326/326 MATCH on sf_onerow, sf_nulls, sf_ragged, sf_nan,
sf_hostiletext, sf_hostileevents, sf_hostilerel, and sf_nullkeys;
325/326 on the two empty axes
(the one failure is
``medallion_gold_profit_mart``'s deliberate reference-parity
empty-input guard — SURVEY.md §2A op #14). The conventions each axis
pins are tabulated in SCALE.md's round-8/round-10 sections and asserted
entry-by-entry in tests/test_empty_inputs.py (empty/onerow/nulls) and
tests/test_degenerate_inputs.py (ragged/nan/hostile-text)."""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
FACTS = {"orders", "lineitem", "events", "documents", "embeddings"}
NULLIFY = {
    "events": ["value"],
    "documents": ["text"],
    "embeddings": ["embedding"],
}


def _ragged_embeddings(tab: pa.Table) -> pa.Table:
    """Plant the three non-NULL malformation classes keyed on vec_id
    (not row position) so the pattern is stable under row reordering.
    Precedence empty > truncated > null-element keeps each vector in
    exactly one class. At the default sf0.001 source (vec_ids 0..499)
    this leaves >= PROBE_FLOOR constructible planted-probe pairs, so the
    ANN contract audits stay ACTIVE (non-abstained) over the holed
    corpus — the point of the axis."""
    idx = tab.schema.get_field_index("embedding")
    vec_ids = tab.column("vec_id").to_pylist()
    vecs = tab.column("embedding").to_pylist()
    out = []
    for vid, v in zip(vec_ids, vecs):
        if v is None:
            out.append(None)
        elif vid % 29 == 0:
            out.append([])
        elif vid % 13 == 0:
            out.append(v[:32])
        elif vid % 17 == 0:
            holed = list(v)
            holed[vid % len(holed)] = None
            out.append(holed)
        else:
            out.append(v)
    return tab.set_column(
        idx,
        tab.schema.field("embedding"),
        pa.array(out, type=tab.schema.field("embedding").type),
    )


def _nonfinite_events(tab: pa.Table) -> pa.Table:
    """Plant NaN/+Inf/-Inf readings in events.value keyed on event_id
    (stable under row reordering); existing NULLs stay NULL."""
    idx = tab.schema.get_field_index("value")
    ids = tab.column("event_id").to_pylist()
    vals = tab.column("value").to_pylist()
    out = []
    for i, v in zip(ids, vals):
        if v is None:
            out.append(None)
        elif i % 37 == 0:
            out.append(float("nan"))
        elif i % 41 == 0:
            out.append(float("inf"))
        elif i % 53 == 0:
            out.append(float("-inf"))
        else:
            out.append(v)
    return tab.set_column(
        idx, tab.schema.field("value"), pa.array(out, tab.schema.field("value").type)
    )


def _hostile_documents(tab: pa.Table) -> pa.Table:
    """Plant degenerate text in documents.text keyed on doc_id; NULLs
    stay NULL (precedence empty > whitespace > doubled-space >
    non-ASCII keeps each doc in one class)."""
    idx = tab.schema.get_field_index("text")
    ids = tab.column("doc_id").to_pylist()
    texts = tab.column("text").to_pylist()
    out = []
    for i, t in zip(ids, texts):
        if t is None:
            out.append(None)
        elif i % 23 == 0:
            out.append("")
        elif i % 31 == 0:
            out.append("   ")
        elif i % 19 == 0:
            out.append(t.replace(" ", "  ", 3))
        elif i % 43 == 0:
            out.append("héllo wörld ß 你好 " + t[:40])
        else:
            out.append(t)
    return tab.set_column(
        idx, tab.schema.field("text"), pa.array(out, pa.string())
    )


def _hostile_events(tab: pa.Table) -> pa.Table:
    """Plant hostile timestamps AND malformed props, keyed on event_id
    (independent columns of one table -> one combined axis)."""
    import datetime

    ids = tab.column("event_id").to_pylist()
    ts = tab.column("ts").to_pylist()
    first_real = next(t for t in ts if t is not None)
    out_ts = []
    for i, t in zip(ids, ts):
        if t is None:
            out_ts.append(None)
        elif i % 37 == 0:
            out_ts.append(t.replace(microsecond=123456))
        elif i % 41 == 0:
            out_ts.append(first_real)  # mass duplicate
        elif i % 53 == 0:
            out_ts.append(first_real + datetime.timedelta(microseconds=999999))
        else:
            out_ts.append(t)
    idx = tab.schema.get_field_index("ts")
    tab = tab.set_column(
        idx, tab.schema.field("ts"), pa.array(out_ts, tab.schema.field("ts").type)
    )
    props = tab.column("props").to_pylist()
    out_p = []
    for i, p in zip(ids, props):
        if p is None:
            out_p.append(None)
        elif i % 37 == 0:
            out_p.append("{bad json")
        elif i % 41 == 0:
            out_p.append("[]")
        elif i % 43 == 0:
            out_p.append("null")
        elif i % 47 == 0:
            out_p.append('{"k": "not_a_number"}')
        elif i % 53 == 0:
            out_p.append("")
        else:
            out_p.append(p)
    idx = tab.schema.get_field_index("props")
    return tab.set_column(
        idx, tab.schema.field("props"), pa.array(out_p, pa.string())
    )


def _hostile_orders(tab: pa.Table) -> pa.Table:
    """Plant hostile relational values in orders, keyed on o_orderkey
    (precedence top-down keeps each row in exactly one class)."""
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    far = datetime.datetime(2250, 6, 1)
    keys = tab.column("o_orderkey").to_pylist()
    od = tab.column("o_orderdate").to_pylist()
    ck = tab.column("o_custkey").to_pylist()
    tp = tab.column("o_totalprice").to_pylist()
    n_od, n_ck, n_tp = [], [], []
    for k, d, c, p in zip(keys, od, ck, tp):
        nd, nc, np_ = d, c, p
        if k % 37 == 0:
            nd = epoch
        elif k % 41 == 0:
            nd = far
        elif k % 43 == 0:
            nc = 1_000_000_000 + k  # orphan FK: no such customer
        elif k % 53 == 0:
            np_ = None if p is None else -abs(p)
        n_od.append(nd)
        n_ck.append(nc)
        n_tp.append(np_)
    for col, vals in (("o_orderdate", n_od), ("o_custkey", n_ck),
                      ("o_totalprice", n_tp)):
        idx = tab.schema.get_field_index(col)
        tab = tab.set_column(
            idx, tab.schema.field(col),
            pa.array(vals, tab.schema.field(col).type),
        )
    return tab


def _hostile_lineitem(tab: pa.Table) -> pa.Table:
    """Plant hostile relational values in lineitem, keyed on l_orderkey
    (one class per row, precedence top-down). Negative quantity is the
    class that corrupted the medallion currency roundtrip; the orphan
    keys break referential integrity the join family must shrug off."""
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    far = datetime.datetime(2250, 6, 1)
    cols = {
        c: tab.column(c).to_pylist()
        for c in ("l_orderkey", "l_shipdate", "l_quantity", "l_discount",
                  "l_suppkey", "l_partkey")
    }
    out = {c: [] for c in cols}
    for k, s, q, d, su, pk in zip(
        cols["l_orderkey"], cols["l_shipdate"], cols["l_quantity"],
        cols["l_discount"], cols["l_suppkey"], cols["l_partkey"],
    ):
        nk, ns, nq, nd, nsu, npk = k, s, q, d, su, pk
        if k % 47 == 0:
            nk = 2_000_000_000 + k  # orphan FK: no such order
        elif k % 59 == 0:
            ns = epoch
        elif k % 61 == 0:
            ns = far
        elif k % 67 == 0:
            nq = None if q is None else -abs(q)  # a return
        elif k % 71 == 0:
            nd = 1.5  # out-of-domain discount: (1 - d) < 0
        elif k % 73 == 0:
            nsu = 3_000_000_000 + k
        elif k % 79 == 0:
            npk = 4_000_000_000 + k
        for c, v in (("l_orderkey", nk), ("l_shipdate", ns),
                     ("l_quantity", nq), ("l_discount", nd),
                     ("l_suppkey", nsu), ("l_partkey", npk)):
            out[c].append(v)
    for c, vals in out.items():
        idx = tab.schema.get_field_index(c)
        tab = tab.set_column(
            idx, tab.schema.field(c), pa.array(vals, tab.schema.field(c).type)
        )
    return tab


#: (keycol, col, mod) plants for sf_nullkeys, per table.
NULLKEY_PLANTS = {
    "events": [
        ("event_id", "ts", 31),
        ("event_id", "user_id", 43),
        ("event_id", "event_type", 41),
    ],
    "orders": [("o_orderkey", "o_custkey", 29)],
    "lineitem": [("l_orderkey", "l_suppkey", 83)],
    "documents": [("doc_id", "lang", 37), ("doc_id", "source", 53)],
}


def _null_keys(tab: pa.Table, plants) -> pa.Table:
    """NULL a key column wherever the (stable) id column % mod == 0."""
    for keycol, col, mod in plants:
        keys = tab.column(keycol).to_pylist()
        vals = tab.column(col).to_pylist()
        out = [
            None if (k is not None and k % mod == 0) else v
            for k, v in zip(keys, vals)
        ]
        idx = tab.schema.get_field_index(col)
        tab = tab.set_column(
            idx, tab.schema.field(col), pa.array(out, tab.schema.field(col).type)
        )
    return tab


#: (keycol, col, mod) plants for sf_nullcats, per table: the
#: CATEGORICAL / dimension-attribute columns no axis had ever NULLed
#: (r11 follow-up to the sf_nullkeys source-column audit).  These are
#: GROUP BY / pivot / CASE / partition keys all over the registry; a
#: NULL category survives plain aggregation identically on both
#: engines, so any divergence here is a mixed-plan bug (a join or
#: window emulating the group, a CASE whose ELSE swallows NULL, a
#: pivot column) — the same mechanism classes family seven found on
#: event_type, now probed on every remaining enum-like column.
NULLCAT_PLANTS = {
    "customer": [
        ("c_custkey", "c_mktsegment", 31),
        ("c_custkey", "c_nationkey", 41),
    ],
    "orders": [
        ("o_orderkey", "o_orderstatus", 47),
        ("o_orderkey", "o_orderpriority", 59),
    ],
    "lineitem": [
        ("l_orderkey", "l_returnflag", 89),
        ("l_orderkey", "l_linestatus", 97),
    ],
    "part": [
        ("p_partkey", "p_brand", 43),
        ("p_partkey", "p_type", 61),
    ],
    "supplier": [("s_suppkey", "s_nationkey", 7)],
    "embeddings": [("vec_id", "label", 53)],
}


def _positionless_user(tab: pa.Table) -> pa.Table:
    """NULL the ts of EVERY event of the smallest non-NULL user_id, so
    sf_nullkeys contains one user with zero sequence positions (r11:
    the class the r10 ADVICE flagged as unreachable — an empty filtered
    event sequence must digest to NULL on both engines, and ordered
    per-user windows must survive an all-NULL ordering partition)."""
    users = tab.column("user_id").to_pylist()
    target = min(u for u in users if u is not None)
    ts = tab.column("ts").to_pylist()
    out = [None if u == target else t for u, t in zip(users, ts)]
    idx = tab.schema.get_field_index("ts")
    return tab.set_column(
        idx, tab.schema.field("ts"), pa.array(out, tab.schema.field("ts").type)
    )


def _null_holes(tab: pa.Table, cols: list[str]) -> pa.Table:
    for col in cols:
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
    return tab


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out-base", default="/tmp")
    args = ap.parse_args()

    dirs = {
        name: os.path.join(args.out_base, name)
        for name in (
            "sf_empty", "sf_factsempty", "sf_onerow", "sf_nulls",
            "sf_ragged", "sf_nan", "sf_hostiletext", "sf_hostileevents",
            "sf_hostilerel", "sf_nullkeys", "sf_nullcats",
        )
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    for t in TABLES:
        tab = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        empty = tab.schema.empty_table()
        pq.write_table(empty, os.path.join(dirs["sf_empty"], f"{t}.parquet"))
        pq.write_table(
            empty if t in FACTS else tab,
            os.path.join(dirs["sf_factsempty"], f"{t}.parquet"),
        )
        pq.write_table(tab.slice(0, 1), os.path.join(dirs["sf_onerow"], f"{t}.parquet"))
        pq.write_table(
            _null_holes(tab, NULLIFY.get(t, [])),
            os.path.join(dirs["sf_nulls"], f"{t}.parquet"),
        )
        pq.write_table(
            _ragged_embeddings(tab) if t == "embeddings" else tab,
            os.path.join(dirs["sf_ragged"], f"{t}.parquet"),
        )
        pq.write_table(
            _nonfinite_events(tab) if t == "events" else tab,
            os.path.join(dirs["sf_nan"], f"{t}.parquet"),
        )
        pq.write_table(
            _hostile_documents(tab) if t == "documents" else tab,
            os.path.join(dirs["sf_hostiletext"], f"{t}.parquet"),
        )
        pq.write_table(
            _hostile_events(tab) if t == "events" else tab,
            os.path.join(dirs["sf_hostileevents"], f"{t}.parquet"),
        )
        hostile_rel = tab
        if t == "orders":
            hostile_rel = _hostile_orders(tab)
        elif t == "lineitem":
            hostile_rel = _hostile_lineitem(tab)
        pq.write_table(
            hostile_rel, os.path.join(dirs["sf_hostilerel"], f"{t}.parquet")
        )
        nullkeys = _null_keys(tab, NULLKEY_PLANTS[t]) if t in NULLKEY_PLANTS else tab
        if t == "events":
            nullkeys = _positionless_user(nullkeys)
        pq.write_table(
            nullkeys, os.path.join(dirs["sf_nullkeys"], f"{t}.parquet")
        )
        pq.write_table(
            _null_keys(tab, NULLCAT_PLANTS[t]) if t in NULLCAT_PLANTS else tab,
            os.path.join(dirs["sf_nullcats"], f"{t}.parquet"),
        )
        print(f"{t}: all degenerate axes written")
    print("fixture sets:", ", ".join(dirs.values()))


if __name__ == "__main__":
    main()
