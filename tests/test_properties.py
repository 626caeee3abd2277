"""Property-based tests (hypothesis): engine operators vs independent
pure-Python reference implementations on randomized inputs.

Each property batches all generated examples into ONE DataFrame per case
so Spark job count stays bounded; examples are capped because every
hypothesis case is a distributed job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from projetos_etl_spark.medallion import clean_currency_col

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _brl_string_py(cents: int) -> str:
    """Reference-style currency rendering, mirroring registry/medallion."""
    dollars, rem = divmod(cents, 100)
    th, un = divmod(dollars, 1000)
    return f"R${th},{un:03d}.{rem:02d}"


@PROP
@given(st.lists(st.integers(0, 10**13), min_size=1, max_size=40, unique=True))
def test_currency_clean_roundtrip(spark, cents_list):
    rows = [(c, _brl_string_py(c)) for c in cents_list]
    df = spark.createDataFrame(rows, ["cents", "s"])
    out = df.select(
        "cents", clean_currency_col(F.col("s"), "R$").alias("parsed")
    ).collect()
    for r in out:
        assert r.parsed == r.cents / 100.0


def _min_rolling_hash_py(text: str, k: int = 8, base: int = 131, mod: int = 2147483647) -> int:
    best = mod + 1
    for i in range(len(text) - k + 1):
        h = 0
        for ch in text[i : i + k]:
            h = (h * base + ord(ch)) % mod
        best = min(best, h)
    return best


@PROP
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=8,
            max_size=120,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_rolling_hash_matches_python(spark, texts):
    from projetos_etl_spark.registry.text import REG  # noqa: F401 — expr lives there

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    # Reuse the registry's expression by temp-view + the same SQL shape.
    codes = (
        "transform(sequence(1, length(text)),"
        " i -> cast(ascii(substring(text, i, 1)) as bigint))"
    )
    expr = (
        "aggregate(transform(sequence(1, size(cs) - 7),"
        " i -> aggregate(slice(cs, i, 8), cast(0 as bigint),"
        " (h, c) -> (h * 131 + c) % 2147483647)),"
        " cast(2147483648 as bigint), (acc, x) -> least(acc, x))"
    )
    out = (
        df.filter(F.length("text") >= 8)
        .select("doc_id", F.expr(codes).alias("cs"))
        .select("doc_id", F.expr(expr).alias("h"))
        .collect()
    )
    for r in out:
        assert r.h == _min_rolling_hash_py(texts[r.doc_id])


@PROP
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=60),
    st.lists(st.tuples(st.integers(0, 5), st.text(alphabet="abc", max_size=2)),
             min_size=1, max_size=12),
)
def test_salted_join_equals_plain_join(spark, big_rows, small_rows):
    from projetos_etl_spark.operators.salt import salted_join

    big = spark.createDataFrame(big_rows, ["k", "v"])
    small = spark.createDataFrame(small_rows, ["k", "s"]).dropDuplicates(["k"])
    got = sorted(
        tuple(r) for r in salted_join(big, small, on=["k"], n_salts=4).collect()
    )
    want = sorted(tuple(r) for r in big.join(small, on="k").collect())
    assert got == want


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
        unique=True,
    ),
)
def test_asof_join_matches_naive(spark, left_rows, right_rows):
    """asof_join == 'most recent right at-or-before left ts per key'."""
    from projetos_etl_spark.operators.asof import asof_join

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("ts", T.LongType())]
    )
    left = spark.createDataFrame(left_rows, schema)
    right = spark.createDataFrame(right_rows, schema).withColumn("rv", F.col("ts"))
    got = {
        (r.k, r.ts): r.rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_value_cols=["rv"], suffix="",
        ).collect()
    }
    assert len(got) == len(left_rows)
    for lk, lts in left_rows:
        best = max(
            (ts for k, ts in right_rows if k == lk and ts <= lts), default=None
        )
        assert got[(lk, lts)] == best


def _cc_reference(n_vertices, edges):
    """Union-find reference for connected components."""
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then label = min id of the set
    comp = {}
    for v in range(n_vertices):
        r = find(v)
        comp.setdefault(r, min(r, v))
    return {v: min(w for w in range(n_vertices) if find(w) == find(v)) for v in range(n_vertices)}


@PROP
@given(
    st.integers(2, 12).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
                max_size=18,
            ),
        )
    )
)
def test_connected_components_matches_union_find(spark, case):
    from projetos_etl_spark.operators.components import connected_components

    n, edges = case
    verts = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    if edges:
        edf = spark.createDataFrame(edges, ["src", "dst"])
    else:
        edf = spark.createDataFrame([], "src INT, dst INT")
    got = {r.id: r.component for r in connected_components(verts, edf).collect()}
    assert got == _cc_reference(n, edges)


@PROP
@given(
    st.lists(
        st.tuples(
            st.integers(0, 15),              # key
            st.sampled_from(["I", "U", "D"]),
            st.integers(1, 5),               # seq
            st.integers(0, 999),             # payload
        ),
        max_size=20,
    )
)
def test_cdc_apply_matches_reference(spark, changes):
    """apply_cdc vs a dict-based reference: latest seq wins per key;
    ties on (key, seq) are excluded by construction (dedup below)."""
    from projetos_etl_spark.operators.cdc import apply_cdc

    seen = set()
    uniq = []
    for k, op, seq, val in changes:
        if (k, seq) not in seen:
            seen.add((k, seq))
            uniq.append((k, op, seq, val))
    base_rows = [(k, k * 10) for k in range(8)]

    ref = {k: v for k, v in base_rows}
    latest = {}
    for k, op, seq, val in uniq:
        if k not in latest or seq > latest[k][0]:
            latest[k] = (seq, op, val)
    for k, (seq, op, val) in latest.items():
        if op == "D":
            ref.pop(k, None)
        else:
            ref[k] = val

    base = spark.createDataFrame(base_rows, "key INT, payload INT")
    if uniq:
        chg = spark.createDataFrame(
            [(k, op, seq, v) for k, op, seq, v in uniq],
            "key INT, op STRING, seq INT, payload INT",
        )
    else:
        chg = spark.createDataFrame([], "key INT, op STRING, seq INT, payload INT")
    got = {
        r.key: r.payload
        for r in apply_cdc(base, chg, key="key").collect()
    }
    assert got == ref
