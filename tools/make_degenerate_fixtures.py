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
                     embeddings.embedding / orders.o_totalprice NULL —
                     the "failed upstream parse" state (o_totalprice
                     added r12 per the r11 ADVICE: a NULL MONEY measure
                     reaches the percentile rank-window contract, the
                     measure-ordered windows, and every CASE over
                     price, none of which the payload holes probed);
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
- ``sf_ties``       deliberate TIES flooded through every ordered
                     surface (r12 family nine — two of r11's thirteen
                     bugs were tie-break divergences and no axis
                     stressed ties directly). Tie POOLS are planted at
                     the TOP of each measure's domain so every top-k
                     boundary falls INSIDE a pool (a mid-domain pool
                     never forces a tie-broken selection), plus tied
                     timestamps and full-payload duplicate rows where
                     every would-be tie-break column is itself tied:
                     customer  % 17 -> c_acctbal 9900.0;
                     supplier  % 11 -> s_acctbal 6000.0;
                     part      % 19 -> p_retailprice 919.0,
                               % 23 -> p_size 25;
                     orders    % 13 -> o_totalprice 499000.0,
                               % 17 -> o_orderdate 1997-06-15;
                     lineitem  % 19 -> l_extendedprice 104000.0,
                               % 23 -> l_quantity 50.0,
                               % 29 -> l_shipdate 1997-06-15,
                               % 31 -> FULL-PAYLOAD duplicate (qty
                               25.0 / price 30000.0 / disc 0.05 / tax
                               0.05 / ship 1997-06-15 — lines identical
                               except keys and linenumber);
                     events    % 13 -> value 327.0 (top pool),
                               % 17 -> value 0.05 (bottom pool),
                               % 23 -> FULL-PAYLOAD duplicate (ts
                               2024-01-15 12:00:00, type 'click',
                               value 42.0 — events identical except
                               event_id/user_id),
                               % 7  -> ts truncated to its hour
                               (intra-user sequence ties);
                     documents % 11 -> text := first doc's text
                               (exact content duplicates),
                               % 13 -> same LENGTH, rotated content
                               (n_chars stays == len(text) in both);
                     embeddings % 13 -> embedding := first vector
                               (exact duplicate vectors -> exactly
                               tied cosines in every top-k).
                     Every ordered window / top-k / min_by / first-last
                     entry lacking a TOTAL-ORDER tie-break is a
                     candidate divergence on this axis; the standing
                     convention it pins is that ordered selections
                     tie-break to a key column on BOTH engines.
- ``sf_extremes``   EXTREME-MAGNITUDE readings in events.value (r12
                     family ten — the overflow-from-FINITE-inputs gap
                     sf_nan left: 1e300 passes an isfinite check and
                     then overflows INSIDE the second-moment
                     aggregates, where Spark answers +Inf/NaN and
                     DuckDB RAISES "VARSAMP is out of range").
                     Planted by event_id, precedence top-down:
                     % 59 -> 1e300, % 61 -> -1e300 (moment overflow),
                     % 67 -> 1.5e154 (just past sqrt(DBL_MAX): the
                     subtle one — ONLY the square overflows),
                     % 71 -> 1e-300 (tiny), % 73 -> 5e-324 (denormal:
                     engines render it differently — '4.9E-324' vs
                     '5e-324'), % 79 -> -0.0 (signed zero: Spark
                     normalizes a -0.0 GROUP KEY to 0.0, DuckDB
                     returns -0.0). The convention this axis pins:
                     the finite gate (functions/finite.py) treats
                     abs(v) >= MAG_CAP (1e75, fourth-moment-safe) as
                     a corrupt reading like NaN/Inf; denormals and
                     signed zeros are legitimate IEEE values and must
                     flow through value logic unharmed.

- ``sf_unicode``    Unicode NORMALIZATION/COLLATION hostility (r13
                     family eleven — nothing earlier was
                     normalization-divergent; a 100 TB web crawl
                     contains all of it).  documents.text by doc_id
                     (% 23 -> NFC prefix, % 29 -> the SAME visible
                     prefix in NFD — near-dup pairs differing only in
                     code points, % 31 -> Turkish dotted/dotless İ/ı,
                     % 37 -> sharp-s ß/SS, % 41 -> zero-width
                     ZWJ/ZWSP/BOM inside and between words plus an
                     NBSP-joined token (Python str.split() treats
                     U+00A0 as whitespace; JVM \\s and SQL
                     split-on-space do not), % 43 ->
                     astral-plane emoji + math letters + a ZWJ emoji
                     family); part.p_name by p_partkey (% 29 -> ZWJ
                     hidden inside the name, % 31/% 37 -> the same visible
                     'ácme ' prefix in NFC vs NFD, % 41 -> İ prefix,
                     % 43 -> astral prefix); customer.c_name by
                     c_custkey (% 29 -> trailing ß before the final
                     '7' so fn_string's LIKE '%7' still admits it to
                     upper(), % 31 -> ZWJ before the final digit,
                     % 37 -> İ prefix); events.props by event_id
                     (% 29/% 31 -> NFC/NFD "tag" string values,
                     % 41 -> JSON-ESCAPED surrogate pair \ud83d\ude00
                     that must decode to ONE astral code point,
                     % 43 -> ß + ZWJ value).  The trap this axis pins:
                     Spark (JVM) uses FULL Unicode case mappings
                     (lower('İ') = 'i'+U+0307, upper('ß') = 'SS')
                     while DuckDB (utf8proc) uses SIMPLE 1:1 mappings
                     ('i', 'ẞ') — every lower()/upper() over dirty
                     text is a candidate divergence, and binary
                     equality treats NFC != NFD on both engines (any
                     one-sided normalization diverges).

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
    "orders": ["o_totalprice"],
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


#: sf_ties scalar tie pools (r12 family nine): per table, precedence-
#: ordered (keycol, col, mod, constant) plants.  Constants sit at the
#: TOP of each measure's profiled domain (FIXTURES.md §B) so top-k
#: boundaries fall inside the pool; NULL source values stay NULL.
TIE_PLANTS = {
    "customer": [("c_custkey", "c_acctbal", 17, 9900.0)],
    "supplier": [("s_suppkey", "s_acctbal", 11, 6000.0)],
    "part": [
        ("p_partkey", "p_retailprice", 19, 919.0),
        ("p_partkey", "p_size", 23, 25),
    ],
}


def _tie_scalars(tab: pa.Table, plants) -> pa.Table:
    """Plant constant tie pools, precedence top-down (a row already in
    an earlier class is left alone, so each row lands in one class)."""
    claimed: set[int] = set()
    for keycol, col, mod, const in plants:
        keys = tab.column(keycol).to_pylist()
        vals = tab.column(col).to_pylist()
        out = []
        for k, v in zip(keys, vals):
            if k is not None and k % mod == 0 and k not in claimed and v is not None:
                out.append(const)
                claimed.add(k)
            else:
                out.append(v)
        idx = tab.schema.get_field_index(col)
        tab = tab.set_column(
            idx, tab.schema.field(col), pa.array(out, tab.schema.field(col).type)
        )
    return tab


def _tie_orders(tab: pa.Table) -> pa.Table:
    """Tie pools in orders: a top-of-domain price pool and a shared
    order DATE (windows ordered by o_orderdate tie en masse)."""
    import datetime

    keys = tab.column("o_orderkey").to_pylist()
    tp = tab.column("o_totalprice").to_pylist()
    od = tab.column("o_orderdate").to_pylist()
    shared = datetime.datetime(1997, 6, 15)
    n_tp, n_od = [], []
    for k, p, d in zip(keys, tp, od):
        np_, nd = p, d
        if k % 13 == 0:
            np_ = None if p is None else 499000.0
        elif k % 17 == 0:
            nd = None if d is None else shared
        n_tp.append(np_)
        n_od.append(nd)
    for col, vals in (("o_totalprice", n_tp), ("o_orderdate", n_od)):
        idx = tab.schema.get_field_index(col)
        tab = tab.set_column(
            idx, tab.schema.field(col), pa.array(vals, tab.schema.field(col).type)
        )
    return tab


def _tie_lineitem(tab: pa.Table) -> pa.Table:
    """Tie pools in lineitem, including the FULL-PAYLOAD duplicate
    class (% 31): lines identical in every measure AND date, differing
    only in keys/linenumber — any ordered selection over them MUST fall
    back to a key tie-break or flap."""
    import datetime

    shared = datetime.datetime(1997, 6, 15)
    cols = {
        c: tab.column(c).to_pylist()
        for c in ("l_orderkey", "l_extendedprice", "l_quantity",
                  "l_discount", "l_tax", "l_shipdate")
    }
    out = {c: [] for c in cols}
    for k, ep, q, d, tx, s in zip(
        cols["l_orderkey"], cols["l_extendedprice"], cols["l_quantity"],
        cols["l_discount"], cols["l_tax"], cols["l_shipdate"],
    ):
        nep, nq, nd, ntx, ns = ep, q, d, tx, s
        if k % 19 == 0:
            nep = None if ep is None else 104000.0
        elif k % 23 == 0:
            nq = None if q is None else 50.0
        elif k % 29 == 0:
            ns = None if s is None else shared
        elif k % 31 == 0:
            nq = None if q is None else 25.0
            nep = None if ep is None else 30000.0
            nd = None if d is None else 0.05
            ntx = None if tx is None else 0.05
            ns = None if s is None else shared
        for c, v in (("l_extendedprice", nep), ("l_quantity", nq),
                     ("l_discount", nd), ("l_tax", ntx), ("l_shipdate", ns)):
            out[c].append(v)
    out["l_orderkey"] = cols["l_orderkey"]
    for c in ("l_extendedprice", "l_quantity", "l_discount", "l_tax", "l_shipdate"):
        idx = tab.schema.get_field_index(c)
        tab = tab.set_column(
            idx, tab.schema.field(c), pa.array(out[c], tab.schema.field(c).type)
        )
    return tab


def _tie_events(tab: pa.Table) -> pa.Table:
    """Tie pools in events: top/bottom value pools, a full-payload
    duplicate class, and hour-truncated timestamps (intra-user sequence
    ties — LAG deltas of zero, rank ties inside every session)."""
    import datetime

    ids = tab.column("event_id").to_pylist()
    ts = tab.column("ts").to_pylist()
    et = tab.column("event_type").to_pylist()
    val = tab.column("value").to_pylist()
    dup_ts = datetime.datetime(2024, 1, 15, 12, 0, 0)
    n_ts, n_et, n_val = [], [], []
    for i, t, e, v in zip(ids, ts, et, val):
        nt, ne, nv = t, e, v
        if i % 13 == 0:
            nv = None if v is None else 327.0
        elif i % 17 == 0:
            nv = None if v is None else 0.05
        elif i % 23 == 0:
            nt = None if t is None else dup_ts
            ne = None if e is None else "click"
            nv = None if v is None else 42.0
        elif i % 7 == 0:
            nt = None if t is None else t.replace(minute=0, second=0, microsecond=0)
        n_ts.append(nt)
        n_et.append(ne)
        n_val.append(nv)
    for col, vals in (("ts", n_ts), ("event_type", n_et), ("value", n_val)):
        idx = tab.schema.get_field_index(col)
        tab = tab.set_column(
            idx, tab.schema.field(col), pa.array(vals, tab.schema.field(col).type)
        )
    return tab


def _tie_documents(tab: pa.Table) -> pa.Table:
    """Tie pools in documents: exact CONTENT duplicates (% 11 — every
    text-derived score, fingerprint, and dedup signature ties) and
    same-LENGTH rotated content (% 13 — length/quality ties without
    content equality). n_chars stays == len(text) in both classes."""
    ids = tab.column("doc_id").to_pylist()
    texts = tab.column("text").to_pylist()
    donor = next(t for t in texts if t)
    rotated = donor[1:] + donor[0]
    nchars = tab.column("n_chars").to_pylist()
    n_t, n_c = [], []
    for i, t, c in zip(ids, texts, nchars):
        nt, nc = t, c
        if t is not None and i % 11 == 0:
            nt, nc = donor, len(donor)
        elif t is not None and i % 13 == 0:
            nt, nc = rotated, len(rotated)
        n_t.append(nt)
        n_c.append(nc)
    for col, vals, typ in (("text", n_t, pa.string()), ("n_chars", n_c, None)):
        idx = tab.schema.get_field_index(col)
        tab = tab.set_column(
            idx, tab.schema.field(col),
            pa.array(vals, typ or tab.schema.field(col).type),
        )
    return tab


def _tie_embeddings(tab: pa.Table) -> pa.Table:
    """Exact duplicate VECTORS (% 13): every cosine against a query is
    exactly equal across the class, so ANN top-k boundaries are tied
    and only a vec_id tie-break makes the selection deterministic."""
    ids = tab.column("vec_id").to_pylist()
    vecs = tab.column("embedding").to_pylist()
    donor = next(v for v in vecs if v)
    out = [
        donor if (v is not None and i % 13 == 0) else v
        for i, v in zip(ids, vecs)
    ]
    idx = tab.schema.get_field_index("embedding")
    return tab.set_column(
        idx, tab.schema.field("embedding"),
        pa.array(out, tab.schema.field("embedding").type),
    )


def _extreme_events(tab: pa.Table) -> pa.Table:
    """Plant extreme-magnitude readings in events.value keyed on
    event_id (precedence top-down, one class per row; NULLs stay
    NULL). 1e300/-1e300 overflow any second moment; 1.5e154 is the
    subtle class whose SQUARE alone overflows; 1e-300/5e-324 probe the
    tiny end; -0.0 probes signed-zero normalization."""
    idx = tab.schema.get_field_index("value")
    ids = tab.column("event_id").to_pylist()
    vals = tab.column("value").to_pylist()
    out = []
    for i, v in zip(ids, vals):
        if v is None:
            out.append(None)
        elif i % 59 == 0:
            out.append(1e300)
        elif i % 61 == 0:
            out.append(-1e300)
        elif i % 67 == 0:
            out.append(1.5e154)
        elif i % 71 == 0:
            out.append(1e-300)
        elif i % 73 == 0:
            out.append(5e-324)
        elif i % 79 == 0:
            out.append(-0.0)
        else:
            out.append(v)
    return tab.set_column(
        idx, tab.schema.field("value"), pa.array(out, tab.schema.field("value").type)
    )


# Family eleven (sf_unicode) plant strings.  NFC and NFD spell the
# SAME visible text with different code points (é = U+00E9 vs
# e + U+0301): binary-comparing engines agree they differ, but any
# one-sided normalization diverges.  The Turkish and sharp-s lines are
# the canonical FULL-vs-SIMPLE case-mapping traps: Java/Spark full
# mapping gives lower('İ') = 'i' + U+0307 (2 code points) and
# upper('ß') = 'SS', while utf8proc/DuckDB simple 1:1 mapping gives
# 'i' and 'ẞ'.  Zero-width characters (ZWJ/ZWSP/BOM) hide inside
# words and keys; the astral line forces surrogate-pair handling
# (UTF-16 engines) vs 4-byte UTF-8.
UNI_NFC = "caf\u00e9 r\u00e9sum\u00e9 na\u00efve se\u00f1or "
UNI_NFD = (
    "cafe\u0301 re\u0301sume\u0301 nai\u0308ve sen\u0303or "
)
UNI_TURKISH = "\u0130stanbul D\u0130YARBAKIR \u0131\u015f\u0131k III "
UNI_SHARP_S = "stra\u00dfe STRASSE Wei\u00df gro\u00dfen "
UNI_ZERO_WIDTH = "foo\u200dbar baz\u200bqux \ufeffbom nb\u00a0sp "
UNI_ASTRAL = (
    "\U0001f600 \U0001f680\U0001f4a5 "
    "\U0001d518\U0001d52b\U0001d526 "
    "\U0001f468\u200d\U0001f469\u200d\U0001f467 "
)


def _unicode_documents(tab: pa.Table) -> pa.Table:
    """Plant normalization/casing/zero-width/astral hostility in
    documents.text keyed on doc_id (precedence top-down, one class per
    doc; NULLs stay NULL).  The % 23/% 29 classes form NFC-vs-NFD
    near-dup PAIRS — same visible prefix, different bytes — so every
    shingle/fingerprint/dedup signature must make the same
    binary-vs-normalized choice on both engines."""
    idx = tab.schema.get_field_index("text")
    ids = tab.column("doc_id").to_pylist()
    texts = tab.column("text").to_pylist()
    out = []
    for i, t in zip(ids, texts):
        if t is None:
            out.append(None)
        elif i % 23 == 0:
            out.append(UNI_NFC + t)
        elif i % 29 == 0:
            out.append(UNI_NFD + t)
        elif i % 31 == 0:
            out.append(UNI_TURKISH + t)
        elif i % 37 == 0:
            out.append(UNI_SHARP_S + t)
        elif i % 41 == 0:
            out.append(UNI_ZERO_WIDTH + t)
        elif i % 43 == 0:
            out.append(UNI_ASTRAL + t)
        else:
            out.append(t)
    return tab.set_column(
        idx, tab.schema.field("text"), pa.array(out, pa.string())
    )


def _unicode_part(tab: pa.Table) -> pa.Table:
    """Plant unicode hostility inside p_name KEY strings keyed on
    p_partkey: a ZWJ hidden inside the name (visually identical to the
    clean name -> two 'same-looking' keys that must group apart on
    BOTH engines), NFC/NFD accent variants of the same letter, a
    Turkish dotted capital, and an astral prefix."""
    idx = tab.schema.get_field_index("p_name")
    keys = tab.column("p_partkey").to_pylist()
    names = tab.column("p_name").to_pylist()
    out = []
    for k, n in zip(keys, names):
        if n is None:
            out.append(None)
        elif k % 29 == 0:
            out.append(n.replace(" ", "\u200d ", 1))
        elif k % 31 == 0:
            out.append("\u00e1cme " + n)
        elif k % 37 == 0:
            out.append("a\u0301cme " + n)
        elif k % 41 == 0:
            out.append("\u0130" + n)
        elif k % 43 == 0:
            out.append("\U0001d4ab " + n)
        else:
            out.append(n)
    return tab.set_column(
        idx, tab.schema.field("p_name"), pa.array(out, pa.string())
    )


def _unicode_customer(tab: pa.Table) -> pa.Table:
    """Plant case-mapping traps in c_name keyed on c_custkey.  The ß
    class keeps the trailing '7' so rows still pass fn_string's
    LIKE '%7' filter and the ß reaches upper() (full mapping 'SS' vs
    simple 'ẞ'); the ZWJ class hides a joiner immediately before that
    trailing digit (LIKE must still match); the İ class probes
    full-vs-simple lower()."""
    idx = tab.schema.get_field_index("c_name")
    keys = tab.column("c_custkey").to_pylist()
    names = tab.column("c_name").to_pylist()
    out = []
    for k, n in zip(keys, names):
        if n is None:
            out.append(None)
        elif k % 29 == 0:
            out.append(n + "\u00df7")
        elif k % 31 == 0:
            out.append(n[:-1] + "\u200d" + n[-1])
        elif k % 37 == 0:
            out.append("\u0130" + n)
        else:
            out.append(n)
    return tab.set_column(
        idx, tab.schema.field("c_name"), pa.array(out, pa.string())
    )


def _unicode_events(tab: pa.Table) -> pa.Table:
    """Plant unicode STRING values inside events.props JSON keyed on
    event_id, under a NEW "tag" key (the numeric $.k extraction the
    other entries rely on is untouched).  The % 41 class writes the
    value as JSON-ESCAPED surrogate pairs (\\ud83d\\ude00) — both
    engines' JSON parsers must decode the pair to one astral code
    point, not two lone surrogates."""
    idx = tab.schema.get_field_index("props")
    ids = tab.column("event_id").to_pylist()
    props = tab.column("props").to_pylist()
    out = []
    for i, p in zip(ids, props):
        if p is None or not p.endswith("}"):
            out.append(p)
        elif i % 29 == 0:
            out.append(p[:-1] + ', "tag": "caf\u00e9"}')
        elif i % 31 == 0:
            out.append(p[:-1] + ', "tag": "café"}')
        elif i % 41 == 0:
            out.append(p[:-1] + ', "tag": "\\ud83d\\ude00"}')
        elif i % 43 == 0:
            out.append(p[:-1] + ', "tag": "stra\u00dfe\u200d"}')
        else:
            out.append(p)
    return tab.set_column(
        idx, tab.schema.field("props"), pa.array(out, pa.string())
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
            "sf_hostilerel", "sf_nullkeys", "sf_nullcats", "sf_ties",
            "sf_extremes", "sf_unicode",
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
        ties = tab
        if t in TIE_PLANTS:
            ties = _tie_scalars(tab, TIE_PLANTS[t])
        elif t == "orders":
            ties = _tie_orders(tab)
        elif t == "lineitem":
            ties = _tie_lineitem(tab)
        elif t == "events":
            ties = _tie_events(tab)
        elif t == "documents":
            ties = _tie_documents(tab)
        elif t == "embeddings":
            ties = _tie_embeddings(tab)
        pq.write_table(ties, os.path.join(dirs["sf_ties"], f"{t}.parquet"))
        pq.write_table(
            _extreme_events(tab) if t == "events" else tab,
            os.path.join(dirs["sf_extremes"], f"{t}.parquet"),
        )
        uni = tab
        if t == "documents":
            uni = _unicode_documents(tab)
        elif t == "part":
            uni = _unicode_part(tab)
        elif t == "customer":
            uni = _unicode_customer(tab)
        elif t == "events":
            uni = _unicode_events(tab)
        pq.write_table(uni, os.path.join(dirs["sf_unicode"], f"{t}.parquet"))
        print(f"{t}: all degenerate axes written")
    print("fixture sets:", ", ".join(dirs.values()))


if __name__ == "__main__":
    main()
