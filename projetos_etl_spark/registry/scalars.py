"""Scalar-function packs + the UDF surface (SURVEY.md §2B "Scalar fns",
"UDF surface").

Everything except the three ``udf_*`` entries is built-in functions only
— JVM-side, inside whole-stage codegen, eligible for pushdown/pruning.
The ``udf_*`` entries exist to cover the declared UDF surface and are
deliberately compared against built-in oracles so the slow path is still
correctness-checked.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetos_etl_spark.functions.currency import clean_currency
from projetos_etl_spark.functions.finite import sql_finite_pred
from projetos_etl_spark.registry._core import Registry
from projetos_etl_spark.sources.io import load_table, register_views

REG = Registry()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@REG.add(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                       AS name_upper,
           substr(c_name, 1, 8)                AS name_prefix,
           concat_ws('|', c_mktsegment, c_name) AS seg_name,
           CAST(length(c_name) AS INTEGER)     AS name_len,
           replace(c_name, 'Customer', 'Cust') AS name_short
    FROM customer
    WHERE c_name LIKE '%7'
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack: upper/substr/concat_ws/length/literal-replace/LIKE."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_name").like("%7"))
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
            F.length("c_name").alias("name_len"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
                "name_short"
            ),
        )
    )


@REG.add(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)    AS order_year,
           CAST(month(o_orderdate) AS INTEGER)   AS order_month,
           CAST(day(o_orderdate) AS INTEGER)     AS order_day,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(isodow(o_orderdate) - 1 AS INTEGER) AS weekday_num,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
               AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date pack: parts extraction, trunc, day arithmetic. (Spark weekday:
    0=Monday == DuckDB isodow-1.)"""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.weekday("o_orderdate").alias("weekday_num"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).alias("days_since_epoch_start"),
        )
    )


@REG.add(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * 10 + 0.5) AS BIGINT) / 100.0 AS price_tithe,
           round(abs(l_discount - 0.05), 6)       AS disc_dev,
           round(ln(l_extendedprice), 6)          AS price_ln,
           round(sqrt(l_quantity), 6)             AS qty_sqrt,
           round(pow(l_quantity, 2), 2)           AS qty_sq,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(floor(l_tax * 100) AS BIGINT)     AS tax_pct_floor,
           CAST(l_linenumber % 3 AS INTEGER)      AS line_mod
    FROM lineitem
    WHERE l_orderkey % 200 = 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack: round/abs/ln/sqrt/pow/ceil/floor/mod."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 200 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            # floor(x*10 + 0.5)/100 == round-half-up(x/10, 2) but via
            # integer arithmetic both engines compute identically —
            # round(x * 0.1, 2) lands on half-cent boundaries where
            # Spark (BigDecimal HALF_UP) and DuckDB disagree.
            (
                F.floor(F.col("l_extendedprice") * 10 + 0.5).cast("long") / 100.0
            ).alias("price_tithe"),
            F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
            F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
            F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
            F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
            F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
            F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
            (F.col("l_linenumber") % 3).alias("line_mod"),
        )
    )


@REG.add(
    "fn_json_extract",
    # json_valid gate: DuckDB's json_extract_string ERRORS on malformed
    # JSON where Spark's get_json_object returns NULL (r10 probe_json
    # sweep — '{bad json' killed the oracle, not the engine). The CASE
    # mirrors Spark's NULL-and-continue.
    oracle="""
    SELECT event_id, event_type,
           TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS INTEGER) AS k_val
    FROM events
    WHERE TRY_CAST(CASE WHEN json_valid(props)
                        THEN json_extract_string(props, '$.k') END
                   AS INTEGER) >= 50
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events ``props`` column
    (``get_json_object`` — no UDF, no full JSON parse of untouched keys).
    try_cast, not cast: under ANSI (Spark 4 default) a non-numeric value
    at ``$.k`` anywhere in the stream would otherwise kill the job; the
    telemetry semantics we want is NULL-and-continue (TRY_CAST mirrors
    it in the oracle)."""
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "event_type", k.alias("k_val"))
        .filter(F.col("k_val") >= 50)
    )


@REG.add(
    "fn_array_map",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)            AS n_tokens,
           string_split(text, ' ')[1]                              AS first_token,
           string_split(text, ' ')[-1]                             AS last_token,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT)
               AS sum_token_len
    FROM documents
    """,
)
def fn_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions: split/element_at/array_distinct/
    transform/aggregate — all JVM-side, no explode shuffle."""
    tokens = F.split(F.col("text"), " ")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.element_at(tokens, 1).alias("first_token"),
        F.element_at(tokens, -1).alias("last_token"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_distinct_tokens"),
        F.aggregate(
            F.transform(tokens, lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("sum_token_len"),
    )


_CURRENCY_SAMPLES = [
    (1, "R$1,234.56"),
    (2, "$99.99"),
    (3, "R$0.00"),
    (4, "R$12,345,678.90"),
    (5, "1000.01"),
    (6, "R$ 42.00"),
    (7, "R$7,000"),
    (8, "-R$15.25"),
]


@REG.add(
    "clean_currency",
    oracle="""
    SELECT id, raw,
           CAST(regexp_replace(raw, '[R$,\\s]', '', 'g') AS DOUBLE) AS amount
    FROM (VALUES
        (1, 'R$1,234.56'), (2, '$99.99'), (3, 'R$0.00'), (4, 'R$12,345,678.90'),
        (5, '1000.01'), (6, 'R$ 42.00'), (7, 'R$7,000'), (8, '-R$15.25')
    ) t(id, raw)
    """,
)
def clean_currency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference silver currency scrub (ops #11+#12, ``silver:76-82``) on a
    fixed sample battery covering every decoration the reference strips —
    including the ``Manufacturing Price`` case it forgets to cast back
    (``silver:76`` bug, fixed here)."""
    df = spark.createDataFrame(_CURRENCY_SAMPLES, "id int, raw string")
    return df.select("id", "raw", clean_currency("raw").alias("amount"))


# ---------------------------------------------------------------------------
# UDF surface (the declared slow path; SURVEY.md §2B "UDF surface").
# ---------------------------------------------------------------------------


@REG.add(
    "udf_pandas_vec",
    oracle="""
    SELECT event_id,
           round(1.0 / (1.0 + exp(-value / 100.0)), 6) AS sigmoid_value
    FROM events
    """,
)
def udf_pandas_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow-batched) pandas UDF — the acceptable Python path:
    one serde per batch, not per row. Oracle = the closed-form SQL twin."""
    import numpy as np

    @F.pandas_udf("double")
    def sigmoid(v: pd.Series) -> pd.Series:
        return 1.0 / (1.0 + np.exp(-v / 100.0))

    return _t(spark, sf_dir, "events").select(
        "event_id", F.round(sigmoid(F.col("value")), 6).alias("sigmoid_value")
    )


@REG.add(
    "udf_scalar",
    # NULL value -> NULL tier, stated explicitly: SQL CASE would
    # otherwise fall through NULL comparisons to 'low', silently
    # conflating "unknown" with the lowest tier. NaN -> NULL too: in
    # Python `nan >= 300` is False (falls to 'low') while DuckDB's
    # comparison sorts NaN above everything ('high') — the r10 sf_nan
    # probe caught exactly that silent divergence; a corrupt reading
    # has no tier. +/-Inf stays orderable (both engines agree).
    oracle="""
    SELECT event_id,
           CASE WHEN value IS NULL OR isnan(value) THEN NULL
                WHEN value >= 300 THEN 'high'
                WHEN value >= 100 THEN 'mid'
                ELSE 'low' END AS tier
    FROM events
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — registered to cover the surface, kept out
    of every other query's hot path on purpose (per-row serde; ~10-100x
    slower than the pandas UDF above at scale). NULL in -> NULL out: a
    Python UDF receives SQL NULL as ``None``, and ``None >= 300`` is a
    TypeError — every row-level UDF must handle the NULL case itself
    (built-in expressions get this propagation for free). NaN in ->
    NULL out for the same reason at one remove: Python's ``nan >= x``
    is always False, which is NOT what SQL comparisons do with NaN —
    every row-level UDF must handle NaN explicitly too (see oracle
    comment)."""

    @F.udf("string")
    def tier(v: float) -> str:
        if v is None or v != v:  # None or NaN: no tier
            return None
        return "high" if v >= 300 else ("mid" if v >= 100 else "low")

    return _t(spark, sf_dir, "events").select(
        "event_id", tier(F.col("value")).alias("tier")
    )


@REG.add(
    "udaf_grouped",
    # The positivity filter rides the finite gate (functions/finite.py):
    # Spark's `NaN > 0` is TRUE (NaN sorts greatest), so one NaN reading
    # slipped through and NaN-poisoned the whole group's geomean, and
    # one +Inf pinned it to Inf (r10 sf_nan probe); the oracle also
    # mirrors the gate's MAG_CAP (r12 sf_extremes — a finite 1e300
    # passes bare isfinite and skews the log-mean on one side only).
    # Geomean over the FINITE positive values; n_events counts those.
    oracle=f"""
    SELECT event_type,
           round(exp(avg(ln(value))), 6) AS geomean_value,
           count(*)                      AS n_events
    FROM events
    WHERE {sql_finite_pred("value")} AND value > 0
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via ``applyInPandas``: per-group geometric mean
    (over the FINITE positive values — the geomean is undefined at zero,
    the fixture contains value=0 rows at sf0.1, and one NaN/Inf reading
    would poison the whole group's mean through the log; see oracle
    comment). Each group arrives as one pandas DataFrame (group must
    fit in executor memory — fine for bounded group counts; for
    unbounded keys prefer a two-level algebraic decomposition like the
    oracle's exp(avg(ln)))."""
    import numpy as np

    from projetos_etl_spark.functions.finite import finite

    def geomean(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "geomean_value": [float(np.exp(np.log(pdf["value"]).mean()))],
                "n_events": [len(pdf)],
            }
        )

    return (
        _t(spark, sf_dir, "events")
        .filter(finite("value") > 0)
        .groupBy("event_type")
        .applyInPandas(geomean, "event_type string, geomean_value double, n_events bigint")
        .select(
            "event_type",
            F.round("geomean_value", 6).alias("geomean_value"),
            "n_events",
        )
        .orderBy("event_type")
    )


@REG.add(
    "fn_fuzzy_match",
    oracle="""
    SELECT p_partkey, p_name,
           CAST(levenshtein(p_name, 'red widget') AS INTEGER) AS edit_distance
    FROM part
    WHERE levenshtein(p_name, 'red widget') <= 5
    ORDER BY edit_distance, p_partkey
    """,
)
def fn_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching by edit distance: parts within Levenshtein 5
    of a probe name — the scoring kernel of fuzzy dedup / entity
    resolution. Built-in ``levenshtein`` (JVM-side, no UDF); at scale
    you never run it all-pairs — block first (prefix/fingerprint keys,
    as the dedup family does) and score only within blocks, exactly the
    probe-side filter shape here."""
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_name",
            F.levenshtein("p_name", F.lit("red widget")).alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 5)
        .orderBy("edit_distance", "p_partkey")
    )


CHUNK_TOKENS = 16


@REG.add(
    "udtf_chunk_lateral",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    starts AS (
        SELECT doc_id, ts,
               unnest(range(0, greatest(len(ts), 1), {CHUNK_TOKENS})) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST(s / {CHUNK_TOKENS} AS INTEGER)            AS chunk_id,
           array_to_string(ts[s + 1 : s + {CHUNK_TOKENS}], ' ') AS chunk
    FROM starts
    ORDER BY doc_id, chunk_id
    """,
)
def udtf_chunk_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function, Spark >= 3.5) applied as
    a LATERAL join: each document expands into fixed-size token chunks
    with positional ids — the one UDF surface (one row in, many rows
    out) the scalar/pandas/grouped entries can't express. Declared
    Python path like the rest of the udf_* family; the equivalent pure
    DataFrame formulation (explode over a sequence of slices) is what
    the corpus family uses in the hot path — this entry pins the API's
    semantics against that same logic in the oracle. The class is
    defined in-function so it pickles by value (no executor package
    ship needed)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, chunk string")
    class ChunkTokens:
        def eval(self, doc_id, text):  # noqa: ANN001 — UDTF contract
            if text is None:
                # NULL text -> one NULL chunk: the document stays
                # present (inner LATERAL would drop it on zero rows)
                # and NULL propagates, matching the SQL twin's
                # slice-of-NULL-list semantics.
                yield 0, None
                return
            toks = text.split(" ")
            for i in range(0, max(len(toks), 1), CHUNK_TOKENS):
                yield i // CHUNK_TOKENS, " ".join(toks[i : i + CHUNK_TOKENS])

    spark.udtf.register("pes_chunk_tokens", ChunkTokens)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("pes_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk
        FROM pes_udtf_docs d, LATERAL pes_chunk_tokens(d.doc_id, d.text) c
        ORDER BY d.doc_id, c.chunk_id
        """
    )


@REG.add(
    "fn_url_parse",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com:443/docs/' || doc_id
                   || '?ref=r' || (doc_id % 7) || '&utm_source=feed#frag'
                   AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)  AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&#]*)', 1)      AS ref_param,
           regexp_replace(regexp_replace(url, '#.*$', ''), ':443/', '/')
               AS canonical_url
    FROM u
    ORDER BY doc_id
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + canonicalization — the first step of any web-crawl
    pipeline (dedup by canonical URL, group by host, strip tracking
    fragments). URLs are synthesized deterministically from the
    documents table (the fixture has no URL column), then taken apart
    with Spark's JVM-side ``parse_url`` (HOST / PATH / QUERY-key
    extraction — codegen, no UDF) and canonicalized by dropping the
    fragment and the explicit default port. The DuckDB twin re-derives
    the same parts with regexes, pinning ``parse_url``'s semantics for
    these shapes. At 100 TB this is pure narrow column work: no
    shuffle, whole-stage codegen end to end."""
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com:443/docs/"),
        F.col("doc_id"),
        F.lit("?ref=r"),
        F.col("doc_id") % 7,
        F.lit("&utm_source=feed#frag"),
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
            F.regexp_replace(
                F.regexp_replace("url", F.lit("#.*$"), F.lit("")),
                F.lit(":443/"),
                F.lit("/"),
            ).alias("canonical_url"),
        )
        .orderBy("doc_id")
    )


@REG.add(
    "fn_try_arith",
    oracle="""
    WITH dirty AS (
        SELECT p_partkey, p_size, p_retailprice,
               CASE p_partkey % 3
                   WHEN 0 THEN CAST(round(p_retailprice, 2) AS VARCHAR)
                   WHEN 1 THEN concat('$', CAST(round(p_retailprice, 2) AS VARCHAR))
                   ELSE 'N/A'
               END AS price_str
        FROM part
    )
    SELECT CAST(count(*) AS BIGINT)                          AS n_rows,
           CAST(count(TRY_CAST(price_str AS DOUBLE)) AS BIGINT) AS n_parsed,
           round(sum(TRY_CAST(price_str AS DOUBLE)), 2)      AS parsed_total,
           CAST(sum(CASE WHEN p_retailprice / NULLIF(p_size - 5, 0) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)       AS n_div_by_zero,
           round(sum(p_retailprice / NULLIF(p_size - 5, 0)), 2) AS ratio_total
    FROM dirty
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar arithmetic over dirty inputs: ``try_cast``
    turns unparseable numerics into NULL instead of failing the job,
    and ``try_divide`` absorbs division-by-zero the same way — the
    ANSI-mode-safe idiom for ingest columns you don't control. On a
    100 TB scan this is the difference between one poisoned row
    killing a 6-hour job and a NULL count you can alert on; every
    expression here stays inside whole-stage codegen (no UDF escape
    hatch for error handling). The audit aggregate reports parse and
    divide failure volume — the numbers a quality gate thresholds."""
    p = load_table(spark, sf_dir, "part")
    price_str = (
        F.when(F.col("p_partkey") % 3 == 0, F.round("p_retailprice", 2).cast("string"))
        .when(
            F.col("p_partkey") % 3 == 1,
            F.concat(F.lit("$"), F.round("p_retailprice", 2).cast("string")),
        )
        .otherwise(F.lit("N/A"))
    )
    d = p.select(
        "p_retailprice",
        price_str.alias("price_str"),
        F.expr("try_divide(p_retailprice, p_size - 5)").alias("ratio"),
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.expr("try_cast(price_str AS double)")).cast("long").alias("n_parsed"),
        F.round(F.sum(F.expr("try_cast(price_str AS double)")), 2).alias("parsed_total"),
        F.sum(F.col("ratio").isNull().cast("int")).cast("long").alias("n_div_by_zero"),
        F.round(F.sum("ratio"), 2).alias("ratio_total"),
    )


@REG.add(
    "fn_surrogate_key",
    oracle="""
    WITH sk AS (
        SELECT c_custkey,
               substr(md5(c_name || '|' || CAST(c_nationkey AS VARCHAR)), 1, 16)
                   AS surrogate_key
        FROM customer
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_rows,
           CAST(count(DISTINCT surrogate_key) AS BIGINT)  AS n_distinct_keys,
           CAST(count(surrogate_key) - count(DISTINCT surrogate_key) AS BIGINT)
               AS n_collisions,
           min(surrogate_key)                             AS min_key
    FROM sk
    """,
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash surrogate keys: a 64-bit (16-hex) key derived from
    the natural key — stateless, parallel, and identical on every
    engine and every rerun, unlike ``monotonically_increasing_id``
    (partition-layout-dependent) or database sequences (a serialization
    point a 1000-executor load can't afford). The audit row counts hash
    collisions — the check a warehouse runs once per key-width decision
    (expected collisions ~ n²/2^65 at 64 bits; widen to the full digest
    if the audit ever shows one).

    An INCOMPLETE natural key (any NULL component, family eight) mints
    NO surrogate: ``concat_ws`` silently SKIPS a NULL piece, so
    ``(name, NULL)`` would collide with a hypothetical ``name``-only
    key — the classic mechanism-4 trap — while the oracle's ``||``
    NULL-poisons to a NULL key. Both engines now emit NULL for such
    rows (``concat`` propagates NULL like ``||``), and collisions are
    counted over MINTED keys only (``count(sk) - count(DISTINCT sk)``);
    unkeyable rows remain visible as ``n_rows - count(sk)``."""
    c = load_table(spark, sf_dir, "customer")
    sk = c.select(
        F.substring(
            F.md5(
                F.concat(
                    F.col("c_name"), F.lit("|"), F.col("c_nationkey").cast("string")
                )
            ),
            1,
            16,
        ).alias("surrogate_key")
    )
    return sk.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("surrogate_key").cast("long").alias("n_distinct_keys"),
        (F.count("surrogate_key") - F.countDistinct("surrogate_key"))
        .cast("long")
        .alias("n_collisions"),
        F.min("surrogate_key").alias("min_key"),
    )


@REG.add(
    "fn_variant_extract",
    # json_valid + TRY_CAST: DuckDB's json_extract_string ERRORS on a
    # malformed payload and plain CAST errors on a non-numeric $.k,
    # where Spark's try_parse_json / try_variant_get yield NULL (r10
    # probe_json sweep) — the oracle mirrors NULL-and-continue.
    oracle="""
    WITH k AS (
        SELECT event_type,
               TRY_CAST(CASE WHEN json_valid(props)
                             THEN json_extract_string(props, '$.k') END
                        AS INTEGER) AS k
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(k) AS BIGINT) AS k_total,
           CAST(max(k) AS BIGINT) AS k_max
    FROM k
    GROUP BY event_type ORDER BY event_type
    """,
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` once into the binary-encoded variant, then typed
    ``variant_get`` path reads. Versus per-path ``get_json_object``
    (``fn_json_extract``), VARIANT parses the document ONCE and each
    path access is a byte-offset lookup into the encoded form — the
    right trade at 100 TB where telemetry payloads carry many keys and
    queries touch several per row. Parquet can store the variant
    columnar ("shredded") so pushdown reaches sub-fields; here the
    parse happens at scan time from the JSON string fixture. The try_
    variants of both calls: a malformed payload or a non-int ``$.k``
    yields NULL instead of failing the scan under ANSI — at telemetry
    scale some rows WILL be garbage and must not kill the job."""
    ev = _t(spark, sf_dir, "events")
    k = F.expr("try_variant_get(try_parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("k_total"),
            F.max("k").cast("long").alias("k_max"),
        )
        .orderBy("event_type")
    )


@REG.add(
    "fn_regex_extract_all",
    oracle="""
    SELECT doc_id,
           -- two NULL sources to keep apart: NULL text -> NULL
           -- extraction (Spark propagation), but a non-null NO-MATCH is
           -- '' — DuckDB's array_to_string([]) is NULL (unlike Spark's
           -- array_join), hence coalesce INSIDE the CASE only
           CASE WHEN text IS NULL THEN NULL
                ELSE coalesce(array_to_string(
                         regexp_extract_all(text, '\\b(ba[a-z]+)\\b'), ','), '')
           END AS b_words,
           CAST(len(regexp_extract_all(text, '\\b(ba[a-z]+)\\b')) AS BIGINT)
               AS n_b_words,
           regexp_extract(text, '\\b(s[a-z]+)\\b', 1)         AS first_s_word
    FROM documents
    ORDER BY doc_id
    """,
)
def fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction (``regexp_extract_all``) next to the
    single-match form — the log/telemetry field-mining primitive. Both
    are JVM codegen expressions over the scan (one compiled automaton
    per task, no UDF, no explode unless the caller asks) — at 100 TB
    regex cost is CPU-linear in bytes scanned and this stays inside
    whole-stage codegen."""
    ev = _t(spark, sf_dir, "documents")
    return ev.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all("text", F.lit(r"\b(ba[a-z]+)\b")), ","
        ).alias("b_words"),
        F.size(F.regexp_extract_all("text", F.lit(r"\b(ba[a-z]+)\b")))
        .cast("long")
        .alias("n_b_words"),
        F.regexp_extract("text", r"\b(s[a-z]+)\b", 1).alias("first_s_word"),
    ).orderBy("doc_id")


@REG.add(
    "fn_collation_groupby",
    oracle="""
    WITH mangled AS (
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                    ELSE lower(o_orderpriority) END AS pri
        FROM orders
    )
    SELECT lower(pri)            AS pri_norm,
           min(pri)              AS first_variant,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM mangled
    GROUP BY lower(pri)
    ORDER BY pri_norm
    """,
)
def fn_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping through Spark 4 COLLATIONS
    (``COLLATE UTF8_LCASE``) — dirty categorical columns ('Ship' /
    'SHIP' / 'ship') grouped as one key by the COLUMN TYPE instead of
    wrapping every reference in ``lower()``: the collation rides the
    column through joins/sorts/aggregates, so no call site can forget
    the wrap (the classic silent-key-split bug). The hash aggregate
    computes collation-aware key hashes — same single-shuffle plan,
    no extra projection. Input case-variance is synthesized
    deterministically from the order key; the oracle is the explicit
    ``lower()`` spelling, proving the equivalence; the surfaced key is
    ``lower()``-normalized plus the binary-min variant (the collated
    group's representative would be first-seen, i.e. nondeterministic)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH mangled AS (
            SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                        ELSE lower(o_orderpriority)
                   END COLLATE UTF8_LCASE AS pri
            FROM orders
        )
        SELECT lower(pri)                  AS pri_norm,
               min(pri COLLATE UTF8_BINARY) AS first_variant,
               CAST(count(*) AS BIGINT)    AS n_orders
        FROM mangled
        GROUP BY pri
        ORDER BY pri_norm
        """
    )


@REG.add(
    "fn_map_functions",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
        FROM documents
    )
    SELECT doc_id,
           CAST(len(ts) AS BIGINT) AS n_keys,
           CAST(len(list_filter(ts, t -> length(t) >= 6)) AS BIGINT)
               AS n_long_keys,
           CAST(list_sum(list_transform(ts, t -> length(t))) AS BIGINT)
               AS sum_len,
           -- NULL text -> NULL key list (Spark propagation), but a
           -- non-null doc with NO long keys is '' — DuckDB's
           -- array_to_string([]) is NULL (unlike Spark's array_join),
           -- hence coalesce INSIDE the CASE only
           CASE WHEN ts IS NULL THEN NULL
                ELSE coalesce(array_to_string(
                         list_sort(list_filter(ts, t -> length(t) >= 6)), ','), '')
           END AS long_keys_sorted
    FROM toks ORDER BY doc_id
    """,
)
def fn_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType column surface: build a token -> length map per document
    (``map_from_arrays``), then ``map_filter`` / ``map_keys`` /
    ``map_values`` / higher-order traversal — the per-row key-value
    workhorse for feature dictionaries and sparse counters. All JVM
    codegen expressions, no explode (the map lives inside the row, so
    no shuffle is introduced to query it). Map iteration order is
    engine-specific, so every surfaced value is an order-insensitive
    reduction or explicitly sorted; the oracle computes the same
    results from the key list directly — same values, no map type
    needed on that side."""
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    m = F.map_from_arrays(toks, F.transform(toks, lambda t: F.length(t)))
    filtered = F.map_filter(m, lambda k, v: v >= 6)
    return d.select(
        "doc_id",
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.size(F.map_keys(filtered)).cast("long").alias("n_long_keys"),
        F.aggregate(F.map_values(m), F.lit(0), lambda acc, v: acc + v)
        .cast("long")
        .alias("sum_len"),
        F.array_join(F.array_sort(F.map_keys(filtered)), ",").alias(
            "long_keys_sorted"
        ),
    ).orderBy("doc_id")
