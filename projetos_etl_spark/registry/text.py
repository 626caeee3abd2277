"""Text-analysis family over ``documents`` (BASELINE.json north star:
token counting, quality scoring, language ID, fingerprinting).

All SQL-expressible entries are built-in-function pipelines (no explode,
no Python): token stats ride higher-order array functions, fingerprints
are md5 digests, quality scores are regexp length ratios. Per-row cost is
O(doc length); there is no shuffle at all — these stream through the scan,
which is exactly the 100 TB posture for per-document featurization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projetos_etl_spark.functions.langid import detect_language
from projetos_etl_spark.registry._core import Registry
from projetos_etl_spark.sources.io import load_table

REG = Registry()

STOPWORDS_SQL = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _tokens() -> Column:
    return F.split(F.col("text"), " ")


@REG.add(
    "text_tokens_stats",
    oracle="""
    SELECT doc_id, lang,
           CAST(length(text) AS BIGINT)                 AS n_chars_actual,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6)     AS avg_token_len
    FROM documents
    """,
)
def text_tokens_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + average token length per document."""
    tokens = _tokens()
    sum_len = F.aggregate(
        F.transform(tokens, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(tokens).cast("long").alias("n_tokens"),
        F.round(sum_len.cast("double") / F.size(tokens), 6).alias("avg_token_len"),
    )


@REG.add(
    "text_quality_score",
    # Every ratio divides via try_divide / nullif: an EMPTY document
    # (length 0 — real corpora are full of them) has no defined
    # space_ratio, and under ANSI mode the plain division DIDN'T return
    # garbage, it KILLED THE JOB — one zero-length doc in 100 TB aborted
    # the whole quality pass (found by the r10 sf_hostiletext probe).
    # NULL ratios + passes_quality=0 is the convention: undefined
    # metrics never pass the gate.
    oracle=f"""
    SELECT doc_id,
           round(CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS DOUBLE)
                 / nullif(length(text), 0), 6) AS space_ratio,
           round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ({STOPWORDS_SQL})))
                 AS DOUBLE) / nullif(len(string_split(text, ' ')), 0), 6) AS stopword_ratio,
           round(CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t)))
                 AS DOUBLE) / nullif(len(string_split(text, ' ')), 0), 6) AS avg_word_len,
           CASE WHEN length(text) >= 100
                 AND len(list_filter(string_split(text, ' '), t -> t IN ({STOPWORDS_SQL}))) > 0
                THEN 1 ELSE 0 END AS passes_quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features (length / whitespace / stopword
    density) + a boolean gate — the standard cheap pre-filter stage of an
    LLM training-data pipeline. Degenerate docs (empty text) get NULL
    ratios via try_divide, never a DIVIDE_BY_ZERO job abort (see the
    oracle comment), and never pass the gate."""
    tokens = _tokens()
    stop_hits = F.size(
        F.filter(
            tokens,
            lambda t: t.isin("the", "a", "of", "and", "to", "in", "is", "it"),
        )
    )
    sum_len = F.aggregate(
        F.transform(tokens, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_tok = F.size(tokens)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(
            F.try_divide(
                (
                    F.length("text") - F.length(F.regexp_replace("text", "[ ]", ""))
                ).cast("double"),
                F.length("text"),
            ),
            6,
        ).alias("space_ratio"),
        F.round(F.try_divide(stop_hits.cast("double"), n_tok), 6).alias(
            "stopword_ratio"
        ),
        F.round(F.try_divide(sum_len.cast("double"), n_tok), 6).alias(
            "avg_word_len"
        ),
        F.when((F.length("text") >= 100) & (stop_hits > 0), 1)
        .otherwise(0)
        .alias("passes_quality"),
    )


@REG.add(
    "text_lang_filter",
    oracle="""
    SELECT lang,
           count(*)                AS n_docs,
           round(avg(n_chars), 6)  AS avg_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM documents
    WHERE lang IN ('en', 'zh', 'es')
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language filtering + per-language corpus stats."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "zh", "es"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


@REG.add(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text)))   AS fp_full,
           md5(substr(text, 1, 40)) AS fp_prefix
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized full-text digest + positional
    prefix digest (cheap near-dup blocking key)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text"))).cast("binary")).alias("fp_full"),
        F.md5(F.substring("text", 1, 40).cast("binary")).alias("fp_prefix"),
    )


#: GPT-2-style pre-tokenizer shape, ASCII-simplified so Java regex (Spark)
#: and RE2 (DuckDB) agree exactly: word / number / punctuation-run tokens,
#: each optionally absorbing one leading space.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


@REG.add(
    "text_tokens_bpe_regex",
    # chars_per_token divides via try_divide / nullif: an empty or
    # whitespace-only document yields ZERO BPE tokens (every alternative
    # in the pattern needs non-space content), and under ANSI mode the
    # plain division aborted the whole corpus pass on one such doc
    # (r10 sf_hostiletext probe). Undefined budget -> NULL.
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INTEGER) AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS INTEGER)           AS n_ws_tokens,
           round(CAST(length(text) AS DOUBLE)
                 / nullif(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')), 0), 6)
               AS chars_per_token
    FROM documents
    """,
)
def text_tokens_bpe_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-shaped pre-tokenizer regex (word /
    number / punct runs with leading-space absorption) beside the plain
    whitespace count — chars-per-token is the standard budget estimator
    for LLM training corpora. Pure regexp built-ins, zero shuffle.
    Zero-token docs (empty/whitespace-only) get NULL chars_per_token via
    try_divide, never a DIVIDE_BY_ZERO job abort."""
    bpe = F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(_tokens()).alias("n_ws_tokens"),
        F.round(
            F.try_divide(F.length("text").cast("double"), F.size(bpe)), 6
        ).alias("chars_per_token"),
    )


#: Rolling-hash parameters (Rabin-Karp base / Mersenne-ish modulus, k=8).
_RH_K, _RH_BASE, _RH_MOD = 8, 131, 2147483647


@REG.add(
    "text_rolling_hash",
    oracle=f"""
    WITH codes AS (
        SELECT doc_id,
               list_transform(range(1, length(text) + 1),
                              i -> CAST(ord(text[i]) AS BIGINT)) AS cs,
               length(text) AS n
        FROM documents
    )
    SELECT doc_id,
           list_min(list_transform(range(1, n - {_RH_K} + 2),
               i -> list_reduce(cs[i : i + {_RH_K} - 1],
                                (h, c) -> (h * {_RH_BASE} + c) % {_RH_MOD})))
               AS min_rolling_hash
    FROM codes
    WHERE n >= {_RH_K}
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: polynomial Rabin-Karp hash of
    every 8-gram, keep the minimum (one stable shingle survives edits
    elsewhere in the document). Engine-portable arithmetic (base-131 poly
    mod 2^31-1 over character codes) so DuckDB reproduces the exact
    values; all higher-order array functions, no UDF, no shuffle."""
    # Materialize the per-document code array once, then hash 8-gram
    # slices of it — computing ascii(substring(...)) inside the inner
    # fold would rescan the string 8x per position (measured ~20x slower).
    codes = f"""
        transform(sequence(1, length(text)),
                  i -> cast(ascii(substring(text, i, 1)) as bigint))
    """
    expr = f"""
        aggregate(
            transform(sequence(1, size(cs) - {_RH_K} + 1),
                i -> aggregate(slice(cs, i, {_RH_K}),
                               cast(0 as bigint),
                               (h, c) -> (h * {_RH_BASE} + c) % {_RH_MOD})),
            cast({_RH_MOD} as bigint) + 1,
            (acc, x) -> least(acc, x))
    """
    from projetos_etl_spark.sources.io import spread

    # the whole pipeline is narrow (no shuffle), so on a single-file
    # input it would run 1-wide; spread() buys full-core parallelism
    # for the CPU-bound hash stage (no-op on already-wide scans).
    return (
        spread(_t(spark, sf_dir, "documents"), "doc_id")
        .filter(F.length("text") >= _RH_K)
        .select("doc_id", F.expr(codes).alias("cs"))
        .select("doc_id", F.expr(expr).alias("min_rolling_hash"))
    )


def _langid_oracle() -> str:
    from projetos_etl_spark.functions.langid import STOPWORDS

    def hits(lang: str) -> str:
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return (
            "len(list_filter(string_split_regex(lower(text), '\\s+'), "
            f"t -> t IN ({words})))"
        )

    h = {lang: hits(lang) for lang in ("en", "es", "de", "fr")}
    return f"""
    SELECT doc_id, lang AS declared_lang,
           CASE
             WHEN 5 * length(regexp_replace(text, '[^一-鿿]', '', 'g'))
                  >= length(text) THEN 'zh'
             WHEN greatest(h_en, h_es, h_de, h_fr) >= 1 THEN
               CASE  -- earlier language wins ties, same order as langid.py
                 WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr THEN 'en'
                 WHEN h_es >= h_de AND h_es >= h_fr THEN 'es'
                 WHEN h_de >= h_fr THEN 'de'
                 ELSE 'fr'
               END
             ELSE 'und'
           END AS detected_lang
    FROM (
        SELECT doc_id, lang, text,
               {h['en']} AS h_en, {h['es']} AS h_es,
               {h['de']} AS h_de, {h['fr']} AS h_fr
        FROM documents
    )
    """


@REG.add("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/CJK-heuristic language detection applied to documents.
    The scoring argmax is deterministic column logic, so it IS
    SQL-twinned (VERDICT r4 #7: "rows-only never means unasserted"):
    the oracle replays the same stopword-hit counts, the same
    earlier-language-wins tie order, and the same CJK codepoint-ratio
    gate. Accuracy on real multilingual text is asserted separately in
    tests/test_text.py (the fixture's text is synthetic word soup, so
    fixture-label accuracy would be meaningless)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        detect_language(F.col("text")).alias("detected_lang"),
    )


#: Per-language sampling rates (percent) for the stratified sample.
SAMPLE_RATES = {"en": 50, "zh": 30}
SAMPLE_DEFAULT_RATE = 10
#: Knuth multiplicative hash constants — pure BIGINT arithmetic, identical
#: in Spark and DuckDB (unlike engine hash functions or Bernoulli
#: sample(), whose RNG streams differ or depend on partitioning).
_KNUTH, _MOD32 = 2654435761, 4294967296


@REG.add(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE (doc_id * {_KNUTH}) % {_MOD32} % 100 <
          CASE lang WHEN 'en' THEN {SAMPLE_RATES['en']}
                    WHEN 'zh' THEN {SAMPLE_RATES['zh']}
                    ELSE {SAMPLE_DEFAULT_RATE} END
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling by deterministic key hash: language strata get
    different rates (en 50%, zh 30%, rest 10%). Hash-mod sampling is the
    training-data-pipeline standard at scale: reproducible across runs,
    partitionings and engines (a row's fate depends only on its key), and
    the sample can be widened monotonically by raising the threshold —
    properties Bernoulli ``df.sample()`` cannot give."""
    rate = (
        F.when(F.col("lang") == "en", SAMPLE_RATES["en"])
        .when(F.col("lang") == "zh", SAMPLE_RATES["zh"])
        .otherwise(SAMPLE_DEFAULT_RATE)
    )
    bucket = (F.col("doc_id") * _KNUTH) % _MOD32 % 100
    return (
        _t(spark, sf_dir, "documents").filter(bucket < rate).select("doc_id", "lang")
    )


@REG.add(
    "text_tfidf_topk",
    oracle="""
    WITH docs AS (SELECT doc_id, text FROM documents),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM docs),
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term, n
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        FROM scored
    )
    SELECT doc_id, term, tf, tfidf FROM ranked WHERE rn <= 3
    ORDER BY doc_id, term
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf * ln((N+1)/(df+1)) (smoothed idf), ranked on the ROUNDED score
    plus a term tie-break so ordering is engine-invariant (raw ln()
    outputs can differ in the last ulp between libms). Scale shape: the
    document-frequency table is vocabulary-sized (Zipf-bounded, millions
    of rows, not corpus-sized) and broadcast back onto the term stream,
    so scoring is map-side; the only full shuffles are the two hash
    aggregations (doc-term counts, term df). The final top-k window
    partitions by doc_id — co-partitioned with the tf aggregate."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "tfidf")
        .orderBy("doc_id", "term")
    )


PMI_MIN_COUNT = 5
PMI_TOP_K = 50


@REG.add(
    "text_bigram_pmi",
    # PMI from INTEGER counts: ln((c_xy * N_uni^2) / (N_bi * c_x * c_y))
    # — both engines divide the same BIGINT products as doubles, so the
    # ln input is bit-identical (no accumulated-float hazard). BIGINT
    # headroom: the numerator tops out ~1e17 at sf0.1; at warehouse
    # scale promote the products to DOUBLE before multiplying.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> len(t) > 0) AS ts
        FROM documents
    ),
    uni AS (
        SELECT t AS w, count(*) AS c FROM toks, unnest(ts) AS u(t) GROUP BY t
    ),
    bi AS (
        SELECT pair[1] AS w1, pair[2] AS w2, count(*) AS c
        FROM toks,
             unnest(list_transform(range(1, len(ts)),
                                   i -> [ts[i], ts[i + 1]])) AS u(pair)
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT (SELECT sum(c) FROM uni) AS n_uni,
               (SELECT sum(c) FROM bi) AS n_bi
    ),
    scored AS (
        SELECT b.w1, b.w2, b.c AS pair_count,
               ln(CAST(b.c * t.n_uni * t.n_uni AS DOUBLE)
                  / CAST(t.n_bi * u1.c * u2.c AS DOUBLE)) AS pmi
        FROM bi b
        JOIN uni u1 ON u1.w = b.w1
        JOIN uni u2 ON u2.w = b.w2
        CROSS JOIN tot t
        WHERE b.c >= {PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(pair_count AS BIGINT) AS pair_count,
           round(pmi, 6) AS pmi
    FROM scored
    ORDER BY pmi DESC, w1, w2
    LIMIT {PMI_TOP_K}
    """,
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{50} bigram collocations by pointwise mutual information —
    the corpus-analysis op behind tokenizer-merge candidates and
    boilerplate discovery (a high-PMI pair like "los angeles" co-occurs
    far above unigram chance). Plan: ONE tokenize pass feeds both the
    unigram and bigram counts (two partial-aggregated shuffles on the
    word keys); the vocabulary-sized unigram table broadcast-joins back
    onto the bigram counts; corpus totals ride along as two 1-row
    broadcast scalars; top-k is TakeOrderedAndProject on the exact PMI
    double (identical in both engines — computed from one integer-ratio
    division) with a (w1, w2) tie-break."""
    toks = _t(spark, sf_dir, "documents").select(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
        ).alias("ts")
    )
    # slice length is clamped to >= 0: an all-whitespace doc tokenizes
    # to an empty array, and slice(ts, 1, -1) throws at runtime where
    # the oracle's range(1, len(ts)) degrades to no bigrams.
    n = F.greatest(F.size("ts") - 1, F.lit(0))
    bigrams = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, n).alias("w1"),
                F.slice("ts", 2, n).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = (
        toks.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= PMI_MIN_COUNT)
    )
    totals = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        bigrams.agg(F.count(F.lit(1)).alias("n_bi"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totals))  # 1-row scalar
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("pair_count"),
            F.log(
                (F.col("c") * F.col("n_uni") * F.col("n_uni")).cast("double")
                / (F.col("n_bi") * F.col("c1") * F.col("c2")).cast("double")
            ).alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP_K)
        .select("w1", "w2", "pair_count", F.round("pmi", 6).alias("pmi"))
    )


BPE_MERGE_TOP_K = 10


@REG.add(
    "text_bpe_merge_step",
    # One BPE training round: adjacent-symbol pair counts weighted by
    # word frequency. Counting is over the DISTINCT word table (weight =
    # word count), so the pair expansion touches vocabulary-sized data,
    # not the corpus — exactly how real BPE trainers scale.
    oracle=f"""
    WITH words AS (
        SELECT w, count(*) AS wc
        FROM documents,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> len(t) > 1)) AS u(w)
        GROUP BY w
    ),
    pairs AS (
        SELECT cs[i] || cs[i + 1] AS pair, sum(wc) AS pair_count
        FROM (SELECT w, wc, string_split(w, '') AS cs FROM words),
             unnest(range(1, len(cs))) AS g(i)
        GROUP BY 1
    )
    SELECT pair, CAST(pair_count AS BIGINT) AS pair_count
    FROM pairs
    ORDER BY pair_count DESC, pair
    LIMIT {BPE_MERGE_TOP_K}
    """,
)
def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding training step: the top merge candidates by
    corpus-weighted adjacent-pair frequency — the inner loop of
    tokenizer training (Sennrich et al. 2016). The corpus collapses to
    the DISTINCT word table first (one shuffle, mergeable counts), so
    the per-character pair expansion runs over the vocabulary — at
    100 TB that's the difference between exploding 10^5 distinct words
    and 10^11 corpus tokens. Top-k is TakeOrderedAndProject with a
    lexicographic tie-break."""
    words = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"),
                    lambda t: F.length(t) > 1,
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    chars = words.select("wc", F.split("w", "").alias("cs"))
    n = F.size("cs")
    pairs = chars.select(
        "wc",
        F.explode(
            F.zip_with(
                F.slice("cs", 1, n - 1),
                F.slice("cs", 2, n - 1),
                lambda a, b: F.concat(a, b),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(BPE_MERGE_TOP_K)
    )


@REG.add(
    "eval_precision_recall_f1",
    # Per-class precision/recall/F1 of the langid detector against the
    # declared labels — integer confusion-matrix counts, nullif-guarded
    # ratios (a class can have zero predictions on this fixture).
    oracle=f"""
    WITH pred_all AS ({_langid_oracle()}),
    pred AS (
        SELECT p.* FROM pred_all p
        JOIN documents dl ON dl.doc_id = p.doc_id
        WHERE dl.lang IS NOT NULL
    )
    SELECT d.lang AS clazz,
           CAST(count(*) AS BIGINT) AS n_true,
           CAST((SELECT count(*) FROM pred p2 WHERE p2.detected_lang = d.lang)
                AS BIGINT) AS n_pred,
           CAST(sum(CASE WHEN p.detected_lang = d.lang THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           round(sum(CASE WHEN p.detected_lang = d.lang THEN 1 ELSE 0 END) * 1.0
                 / nullif((SELECT count(*) FROM pred p2
                           WHERE p2.detected_lang = d.lang), 0), 6) AS precision,
           round(sum(CASE WHEN p.detected_lang = d.lang THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS recall,
           round(2.0 * sum(CASE WHEN p.detected_lang = d.lang THEN 1 ELSE 0 END)
                 / nullif((SELECT count(*) FROM pred p2
                           WHERE p2.detected_lang = d.lang) + count(*), 0), 6)
               AS f1
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    WHERE d.lang IS NOT NULL
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def eval_precision_recall_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation on the fixture: per-class precision/recall
    of the heuristic langid against the declared labels — the standard
    confusion-matrix report every model-quality gate needs (here it
    honestly documents that word-soup text defeats a stopword detector;
    on real text the same operator grades any (predicted, true) pair).
    One detector pass + two tiny aggregates over the per-class counts;
    ratios are nullif-guarded because a class may never be predicted.

    Family-seven convention: an UNLABELED document (NULL lang) is not in
    the eval set — a prediction without ground truth can be graded
    neither hit nor miss (and ungated, Spark's boolean-cast tp sums the
    NULL comparisons to NULL/NaN where SQL's CASE counts 0 — a silent
    cross-engine f1 flip on the phantom NULL class)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    pred = docs.select(
        "doc_id",
        F.col("lang").alias("clazz"),
        detect_language(F.col("text")).alias("detected"),
    )
    per_pred = pred.groupBy(F.col("detected").alias("clazz")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pred")
    )
    per_true = pred.groupBy("clazz").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum((F.col("detected") == F.col("clazz")).cast("int"))
        .cast("long")
        .alias("tp"),
    )
    return (
        per_true.join(per_pred, "clazz", "left")
        .select(
            "clazz",
            "n_true",
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            "tp",
            F.round(
                F.col("tp") * 1.0 / F.nullif(F.coalesce("n_pred", F.lit(0)), F.lit(0)),
                6,
            ).alias("precision"),
            F.round(F.col("tp") * 1.0 / F.col("n_true"), 6).alias("recall"),
            # F1 via the count identity 2*tp/(n_pred + n_true): avoids
            # dividing two already-derived ratios (and their rounding).
            F.round(
                2.0
                * F.col("tp")
                / F.nullif(
                    F.coalesce("n_pred", F.lit(0)) + F.col("n_true"), F.lit(0)
                ),
                6,
            ).alias("f1"),
        )
        .orderBy("clazz")
    )


NB_VOCAB_TOPN = 50


@REG.add(
    "ml_naive_bayes_train",
    # Laplace-smoothed multinomial NB is ln() of integer ratios all the
    # way down — ln(a/b) on the identical quotient double is
    # bit-identical cross-engine (the text_unigram_logprob discipline),
    # rounded to 6dp on emission per the family convention.
    oracle=f"""
    WITH toks AS (
        SELECT lang, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ), vocab AS (
        SELECT w FROM toks GROUP BY w
        ORDER BY count(*) DESC, w LIMIT {NB_VOCAB_TOPN}
    ), vt AS (
        SELECT t.lang, t.w FROM toks t JOIN vocab v ON t.w = v.w
    ), cls AS (
        SELECT lang, count(*) AS n_c FROM vt GROUP BY lang
    ), wc AS (
        SELECT lang, w, count(*) AS n_wc FROM vt GROUP BY lang, w
    )
    SELECT c.lang, v.w AS token,
           round(ln(CAST(COALESCE(n_wc, 0) + 1 AS DOUBLE)
                    / (c.n_c + {NB_VOCAB_TOPN})), 6) AS log_likelihood
    FROM cls c
    CROSS JOIN vocab v
    LEFT JOIN wc ON wc.lang = c.lang AND wc.w = v.w
    ORDER BY c.lang, token
    """,
)
def ml_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes trainer over the document corpus:
    Laplace-smoothed ln P(token | lang) for the global top-{NB_VOCAB_TOPN}
    vocabulary — the classic lightweight doc classifier (language/topic/
    quality routing) trained entirely as aggregates. Plan: ONE tokenize
    pass feeds the vocabulary top-k (TakeOrderedAndProject over the
    vocabulary, not the corpus) and the (lang, token) count shuffle; the
    dense class x vocab grid comes from a broadcast cross join of two
    bounded sides, with absent counts smoothed via the LEFT join. At
    100 TB everything is one token-keyed shuffle + broadcasts."""
    toks = _t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .orderBy(F.col("cw").desc(), "w")
        .limit(NB_VOCAB_TOPN)
        .select("w")
    )
    vt = toks.join(F.broadcast(vocab), "w")
    cls = vt.groupBy("lang").agg(F.count(F.lit(1)).alias("n_c"))
    wc = vt.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("n_wc"))
    grid = F.broadcast(cls).crossJoin(F.broadcast(vocab))
    return (
        grid.join(wc, ["lang", "w"], "left")
        .select(
            "lang",
            F.col("w").alias("token"),
            F.round(
                F.log(
                    (F.coalesce(F.col("n_wc"), F.lit(0)) + 1).cast("double")
                    / (F.col("n_c") + NB_VOCAB_TOPN)
                ),
                6,
            ).alias("log_likelihood"),
        )
        .orderBy("lang", "token")
    )


@REG.add(
    "text_readability_score",
    # All counts are integers (tokens, sentence enders, vowel groups);
    # the Flesch formula is then a fixed arithmetic tree over identical
    # doubles with CAST-pinned coefficient literals, rounded to 6dp.
    oracle="""
    WITH c AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS n_sentences,
               CAST(list_sum(list_transform(string_split(lower(text), ' '),
                    t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1)))
                    AS BIGINT) AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(CAST(206.835 AS DOUBLE)
                 - CAST(1.015 AS DOUBLE) * n_words / n_sentences
                 - CAST(84.6 AS DOUBLE) * n_syllables / n_words, 6)
               AS flesch_ease
    FROM c ORDER BY doc_id
    """,
)
def text_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    feature in LLM quality-filter stacks (too-hard and too-trivial
    text both get downweighted). Syllables via the standard
    vowel-group heuristic (runs of [aeiouy], floor 1 per word),
    sentences via terminator runs (floor 1): pure column expressions,
    zero shuffle, streams through the scan like the rest of the
    per-document featurization tier."""
    words = F.split(F.col("text"), " ")
    lower_words = F.split(F.lower(F.col("text")), " ")
    n_words = F.size(words).cast("long")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0)), F.lit(1)
    ).cast("long")
    syl = F.aggregate(
        F.transform(
            lower_words,
            lambda t: F.greatest(
                F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), 0)), F.lit(1)
            ),
        ),
        F.lit(0),
        lambda a, x: a + x,
    ).cast("long")
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            syl.alias("n_syllables"),
        )
        .withColumn(
            "flesch_ease",
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * F.col("n_words") / F.col("n_sentences")
                - F.lit(84.6) * F.col("n_syllables") / F.col("n_words"),
                6,
            ),
        )
        .orderBy("doc_id")
    )


VOCAB_COVERAGE_TOPN = 100


@REG.add(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ), vocab AS (
        SELECT w FROM toks GROUP BY w
        ORDER BY count(*) DESC, w LIMIT {VOCAB_COVERAGE_TOPN}
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-{VOCAB_COVERAGE_TOPN} vocabulary — the coverage audit run
    before freezing any tokenizer/vocab on a corpus (rising OOV on new
    data = retrain signal). ONE tokenize pass feeds the vocabulary
    top-k (TakeOrderedAndProject over the vocabulary) and the per-doc
    OOV tally (broadcast membership join, occurrence-counted — an
    array_except would wrongly dedup repeats); integer tallies until
    one exact division."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .orderBy(F.col("cw").desc(), "w")
        .limit(VOCAB_COVERAGE_TOPN)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long")).alias("n_oov"),
            (
                F.sum(F.col("in_vocab").isNull().cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


KN_DISCOUNT = 0.75  # 3/4 — exactly representable in binary
KN_TOPN = 50


@REG.add(
    "corpus_kneser_ney_bigram",
    # Interpolated Kneser-Ney from INTEGER count tables only; D = 0.75
    # is exactly representable, so every term (max(c-D,0)/c1, the
    # D*N1+/c1 backoff weight, the continuation ratio) is a fixed IEEE
    # expression over identical integers — deterministic cross-engine.
    oracle=f"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> len(t) > 0) AS ts
        FROM documents
    ),
    bi AS (
        SELECT pair[1] AS w1, pair[2] AS w2, count(*) AS c
        FROM toks,
             unnest(list_transform(range(1, len(ts)),
                                   i -> [ts[i], ts[i + 1]])) AS u(pair)
        GROUP BY 1, 2
    ),
    ctx AS (
        SELECT w1, sum(c) AS c1, count(*) AS n1_fwd FROM bi GROUP BY w1
    ),
    cont AS (
        SELECT w2, count(*) AS n1_bwd FROM bi GROUP BY w2
    ),
    tot AS (SELECT count(*) AS n_types FROM bi)
    SELECT b.w1 AS w1, b.w2 AS w2, CAST(b.c AS BIGINT) AS pair_count,
           round(
               greatest(b.c - CAST({KN_DISCOUNT} AS DOUBLE), 0) / ctx.c1
               + (CAST({KN_DISCOUNT} AS DOUBLE) * ctx.n1_fwd / ctx.c1)
                 * (CAST(cont.n1_bwd AS DOUBLE) / tot.n_types),
               6) AS p_kn
    FROM bi b
    JOIN ctx ON ctx.w1 = b.w1
    JOIN cont ON cont.w2 = b.w2
    CROSS JOIN tot
    ORDER BY pair_count DESC, b.w1, b.w2
    LIMIT {KN_TOPN}
    """,
)
def corpus_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (D={KN_DISCOUNT})
    for the corpus's top-{KN_TOPN} bigrams — the LM-smoothing standard
    behind n-gram quality scorers: continuation probability rewards
    words that follow MANY contexts, not just frequent ones (the
    'san francisco' pathology of raw MLE). Everything derives from one
    bigram count table: context totals, distinct-follower counts
    (N1+(w1·)), distinct-predecessor counts (N1+(·w2)), and the bigram
    type total — four mergeable aggregates off one shuffle, joined back
    broadcast (all vocabulary-bounded). Top-k on integer counts is
    TakeOrderedAndProject."""
    toks = _t(spark, sf_dir, "documents").select(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
        ).alias("ts")
    )
    n = F.greatest(F.size("ts") - 1, F.lit(0))
    bi = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice("ts", 1, n).alias("w1"), F.slice("ts", 2, n).alias("w2")
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # one bigram shuffle feeds 4 aggregates
    )
    ctx = bi.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1_fwd")
    )
    cont = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("n1_bwd"))
    tot = bi.agg(F.count(F.lit(1)).alias("n_types"))
    d = F.lit(KN_DISCOUNT)
    return (
        bi.join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tot))  # 1-row scalar
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("pair_count"),
            F.round(
                F.greatest(F.col("c") - d, F.lit(0.0)) / F.col("c1")
                + (d * F.col("n1_fwd") / F.col("c1"))
                * (F.col("n1_bwd").cast("double") / F.col("n_types")),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.col("pair_count").desc(), "w1", "w2")
        .limit(KN_TOPN)
    )


KEYNESS_FOCUS = ("src0", "src1", "src2", "src3", "src4")
KEYNESS_MIN_COUNT = 10
KEYNESS_TOPN = 30


@REG.add(
    "text_keyness_g2",
    # G2 = 2*[a*ln(aN/(R1*C)) + b*ln(bN/(R2*C))]: every ln argument is
    # a ratio of BIGINT products cast to DOUBLE — bit-identical inputs,
    # so the log-likelihood scores and their ordering agree exactly.
    oracle=f"""
    WITH toks AS (
        SELECT CASE WHEN source IN {str(KEYNESS_FOCUS)} THEN 1 ELSE 0 END AS foc,
               unnest(string_split(lower(text), ' ')) AS w
        FROM documents
        WHERE source IS NOT NULL
    ),
    counts AS (
        SELECT w,
               sum(foc) AS a,
               sum(1 - foc) AS b
        FROM toks GROUP BY w
        HAVING sum(foc) > 0 AND sum(1 - foc) > 0
           AND sum(foc) + sum(1 - foc) >= {KEYNESS_MIN_COUNT}
    ),
    tot AS (
        SELECT sum(a) AS r1, sum(b) AS r2 FROM counts
    )
    SELECT w AS token, CAST(a AS BIGINT) AS n_focus, CAST(b AS BIGINT) AS n_ref,
           round(2 * (a * ln(CAST(a * (r1 + r2) AS DOUBLE)
                             / CAST(r1 * (a + b) AS DOUBLE))
                      + b * ln(CAST(b * (r1 + r2) AS DOUBLE)
                               / CAST(r2 * (a + b) AS DOUBLE))), 6) AS g2,
           CAST(CAST(a * r2 AS DOUBLE) > CAST(b * r1 AS DOUBLE) AS BOOLEAN)
               AS overused_in_focus
    FROM counts, tot
    ORDER BY g2 DESC, token
    LIMIT {KEYNESS_TOPN}
    """,
)
def text_keyness_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-likelihood (G2) keyness of tokens between a focus subcorpus
    (sources {KEYNESS_FOCUS}) and the rest — the corpus-linguistics
    standard for 'which words characterize this source', used to
    detect domain drift or boilerplate contamination between corpus
    slices before mixing them. ONE tokenize pass with the focus flag
    folded into the count aggregate (a/b per token from a single
    shuffle), totals as a 1-row broadcast scalar, ln over
    integer-ratio arguments, top-k by TakeOrderedAndProject. The
    overuse direction compares a*R2 vs b*R1 in integers — no division,
    no rounding ambiguity. UNATTRIBUTED (NULL-source) documents belong
    to neither subcorpus and are excluded on both engines (family
    seven, mechanism 3): Spark's NULL `isin` flag would silently drop
    them from BOTH tallies while the oracle's `CASE ... ELSE 0` would
    count them as REFERENCE — two different corpora, one entry."""
    foc = F.col("source").isin(*KEYNESS_FOCUS).cast("long")
    toks = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .select(
            foc.alias("foc"),
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
        )
    )
    counts = (
        toks.groupBy("w")
        .agg(F.sum("foc").alias("a"), F.sum(1 - F.col("foc")).alias("b"))
        .filter(
            (F.col("a") > 0)
            & (F.col("b") > 0)
            & (F.col("a") + F.col("b") >= KEYNESS_MIN_COUNT)
        )
        .localCheckpoint(eager=True)  # reused by totals and scoring
    )
    tot = counts.agg(F.sum("a").alias("r1"), F.sum("b").alias("r2"))
    a, b, r1, r2 = F.col("a"), F.col("b"), F.col("r1"), F.col("r2")
    n = r1 + r2
    g2 = 2 * (
        a * F.log((a * n).cast("double") / (r1 * (a + b)).cast("double"))
        + b * F.log((b * n).cast("double") / (r2 * (a + b)).cast("double"))
    )
    return (
        counts.crossJoin(F.broadcast(tot))  # 1-row scalar totals
        .select(
            F.col("w").alias("token"),
            a.cast("long").alias("n_focus"),
            b.cast("long").alias("n_ref"),
            F.round(g2, 6).alias("g2"),
            ((a * r2).cast("double") > (b * r1).cast("double")).alias(
                "overused_in_focus"
            ),
        )
        .orderBy(F.col("g2").desc(), "token")
        .limit(KEYNESS_TOPN)
    )


PPL_VOCAB_SMOOTH = 1000  # Laplace smoothing denominator addend (vocab bound)


@REG.add(
    "eval_heldout_perplexity",
    # Train/test assignment is the portable md5 split; the unigram LM
    # probabilities are ln() of integer ratios (Laplace-smoothed) —
    # bit-identical doubles in both engines. Each lp is rounded to 6dp
    # and summed as a scaled BIGINT (the repo's integer-exact
    # convention): a raw float sum would accumulate in engine- and
    # partition-order-dependent order, and a value near a 6dp rounding
    # boundary could round differently per engine (r6 ADVICE).
    oracle=f"""
    WITH tagged AS (
        SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                    THEN 'train' ELSE 'heldout' END AS split,
               unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    train_counts AS (
        SELECT w, count(*) AS c FROM tagged WHERE split = 'train' GROUP BY w
    ),
    train_total AS (
        SELECT sum(c) AS n FROM train_counts
    ),
    scored AS (
        SELECT t.split,
               CAST(round(ln(CAST(COALESCE(tc.c, 0) + 1 AS DOUBLE)
                             / (tt.n + {PPL_VOCAB_SMOOTH})) * 1000000, 0)
                    AS BIGINT) AS lp_micros
        FROM tagged t
        LEFT JOIN train_counts tc ON tc.w = t.w
        CROSS JOIN train_total tt
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(CAST(-sum(lp_micros) AS DOUBLE) / count(*) / 1000000, 6)
               AS avg_neg_log_prob
    FROM scored GROUP BY split ORDER BY split
    """,
)
def eval_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out language-model evaluation done the reproducible way:
    the corpus splits by the portable md5 hash (same assignment as
    ``split_train_test_hash``), a Laplace-smoothed unigram LM trains on
    the train shard only, and BOTH shards are scored with it — the
    train/heldout gap in average −ln P(w) is the generalization (and
    leakage!) probe run before trusting any corpus-level perplexity
    number. Plan: one token pass with the split flag, the train count
    table broadcast back onto all tokens, totals as a 1-row scalar; at
    100 TB the vocabulary (not the corpus) bounds the broadcast.
    Emitting avg −ln P rather than exp() of it keeps the compare free
    of a second transcendental."""
    tagged = _t(spark, sf_dir, "documents").select(
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b",
            "train",
        )
        .otherwise("heldout")
        .alias("split"),
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    )
    train_counts = (
        tagged.filter(F.col("split") == "train")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    train_total = train_counts.agg(F.sum("c").alias("n"))
    # Per-token lp rounded to 6dp and accumulated as a scaled BIGINT so
    # the sum is exact in any partition order (ADVICE r6: a raw double
    # sum near a rounding boundary could round differently per engine).
    lp_micros = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
            / (F.col("n") + PPL_VOCAB_SMOOTH)
        )
        * 1000000,
        0,
    ).cast("bigint")
    return (
        tagged.join(F.broadcast(train_counts), "w", "left")
        .crossJoin(F.broadcast(train_total))  # 1-row scalar
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                (-F.sum(lp_micros)).cast("double")
                / F.count(F.lit(1))
                / 1000000,
                6,
            ).alias("avg_neg_log_prob"),
        )
        .orderBy("split")
    )
