"""Training-corpus pipeline family over ``documents`` (BASELINE.json
north star): chunking, PII redaction, benchmark-contamination checks,
within-document repetition scoring, and source-mix resample weights.

These are the operations an LLM training-data pipeline runs after the
per-document featurization in ``text.py`` and the dedup family. All are
built-in-expression pipelines; the only shuffles are the contamination
shingle join (broadcast on the benchmark side — the benchmark set is
bounded by construction) and the bounded-cardinality mix aggregation.
At 100 TB: chunking and redaction stream through the scan (flatMap-
shaped, no state); contamination joins a 100 TB corpus against a
fixed-size benchmark — classic broadcast semi-join territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projetos_etl_spark.registry._core import Registry
from projetos_etl_spark.sources.io import load_table

REG = Registry()

#: Chunking geometry: 40-token chunks every 30 tokens (10-token overlap).
CHUNK_TOKENS, CHUNK_STRIDE = 40, 30

#: Contamination shingle width (4-gram: non-trivial overlap on fixture).
CONTAM_K = 4

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"555-[0-9]+"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@REG.add(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               string_split(text, ' ')      AS ts,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, ts, n, unnest(range(1, n + 1, {CHUNK_STRIDE})) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) // {CHUNK_STRIDE} AS INTEGER)                     AS chunk_idx,
           CAST(len(ts[s : least(s + {CHUNK_TOKENS} - 1, n)]) AS INTEGER) AS n_chunk_tokens,
           array_to_string(ts[s : least(s + {CHUNK_TOKENS} - 1, n)], ' ') AS chunk_text
    FROM starts
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (40-token chunks, 30-token
    stride): the standard context-window packing step before tokenizing
    a corpus. One row fans out to ceil(n/stride) rows via posexplode of
    a start-offset sequence — flatMap-shaped, stateless, no shuffle, so
    it scales linearly with corpus bytes."""
    toks = F.split(F.col("text"), " ")
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("ts"), F.size(toks).alias("n"))
        .select(
            "doc_id",
            "ts",
            "n",
            F.posexplode(
                F.sequence(F.lit(1), F.col("n"), F.lit(CHUNK_STRIDE))
            ).alias("chunk_idx", "s"),
        )
    )
    chunk = F.slice(F.col("ts"), F.col("s"), CHUNK_TOKENS)
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@REG.add(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || doc_id || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' call 555-0' || doc_id || ' today'
                       ELSE '' END AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INTEGER) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g'))            AS redacted_md5
    FROM aug
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (emails, phone-shaped tokens): count
    matches and emit the digest of the redacted text. The fixture corpus
    is synthetic word soup with no PII, so a deterministic injection
    step (keyed on doc_id) plants known emails/phones first — the
    redaction regexes and the injection are both oracle-mirrored, so
    the check verifies the actual scrub, not a no-op. Pure per-row
    regexp built-ins: zero shuffle, streams at scan speed."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" call 555-0"),
                    F.col("doc_id").cast("string"),
                    F.lit(" today"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0)).alias("n_phones"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


@REG.add(
    "text_contamination_ngram",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               string_split(text, ' ')      AS ts,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    sh AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, n - {CONTAM_K} + 2),
                      i -> array_to_string(ts[i : i + {CONTAM_K} - 1], ' '))) AS g
        FROM toks WHERE n >= {CONTAM_K}
    ),
    bench AS (SELECT DISTINCT g FROM sh WHERE source = 'src0'),
    corp  AS (SELECT DISTINCT doc_id, g FROM sh WHERE source <> 'src0')
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
    FROM corp c JOIN bench USING (g)
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
)
def text_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: corpus documents sharing any 4-gram
    word shingle with the held-out benchmark set (source ``src0`` stands
    in for an eval suite). The benchmark shingle set is DISTINCT-ed and
    broadcast — at 100 TB the corpus side streams through a map-side
    hash join keyed on the shingle, and per-doc dedup of shingles
    happens before the join so a repeated shingle can't double-count."""
    toks = F.split(F.col("text"), " ")
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", toks.alias("ts"), F.size(toks).alias("n")
    ).filter(F.col("n") >= CONTAM_K)
    shingles = F.transform(
        F.sequence(F.lit(1), F.col("n") - (CONTAM_K - 1)),
        lambda i: F.array_join(F.slice(F.col("ts"), i, CONTAM_K), " "),
    )
    sh = d.select("doc_id", "source", F.explode(shingles).alias("g"))
    bench = sh.filter(F.col("source") == "src0").select("g").distinct()
    corp = (
        sh.filter(F.col("source") != "src0").select("doc_id", "g").distinct()
    )
    return (
        corp.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .orderBy("doc_id")
    )


@REG.add(
    "text_repetition_ngram",
    oracle="""
    WITH tris AS (
        SELECT doc_id,
               len(string_split(text, ' ')) - 2 AS n_trigrams,
               list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
                   i -> array_to_string(string_split(text, ' ')[i : i + 2], ' ')))
                   AS dis
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT doc_id,
           CAST(n_trigrams AS INTEGER)                              AS n_trigrams,
           CAST(len(dis) AS INTEGER)                                AS n_distinct,
           round(1.0 - len(dis) / CAST(n_trigrams AS DOUBLE), 6)    AS repetition_ratio
    FROM tris
    """,
)
def text_repetition_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score: 1 - (distinct trigrams / total
    trigrams). High values flag boilerplate/looped generations — a
    standard quality gate for LLM training data. Higher-order array
    functions only; per-row cost O(doc length), no shuffle."""
    toks = F.split(F.col("text"), " ")
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("ts"), F.size(toks).alias("n"))
        .filter(F.col("n") >= 3)
    )
    tris = F.transform(
        F.sequence(F.lit(1), F.col("n") - 2),
        lambda i: F.array_join(F.slice(F.col("ts"), i, 3), " "),
    )
    dis = F.array_distinct(tris)
    return d.select(
        "doc_id",
        (F.col("n") - 2).cast("int").alias("n_trigrams"),
        F.size(dis).alias("n_distinct"),
        F.round(
            1.0 - F.size(dis) / (F.col("n") - 2).cast("double"), 6
        ).alias("repetition_ratio"),
    )


@REG.add(
    "corpus_mix_weights",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
    SELECT source,
           CAST(n AS BIGINT)                                        AS n_docs,
           round(n / sum(n) OVER (), 6)                             AS share,
           round((1.0 / 20) / (n / sum(n) OVER ()), 6)              AS resample_weight
    FROM c
    ORDER BY source
    """,
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix resampling weights: per-source share of the corpus and
    the weight that rebalances to a uniform 20-way target mix (the
    domain-mixture step of corpus assembly). The window runs over the
    ALREADY-aggregated per-source counts — bounded cardinality — so the
    single-partition window is a 20-row operation regardless of corpus
    size."""
    c = _t(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    share = F.col("n") / total
    return c.select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(share, 6).alias("share"),
        F.round(F.lit(1.0 / 20) / share, 6).alias("resample_weight"),
    ).orderBy("source")


@REG.add(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT sum(c) AS n FROM vocab)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT)                      AS n_tokens,
           round(avg(-ln(v.c / n)), 6)                   AS avg_neg_logprob
    FROM toks t JOIN vocab v USING (tok), tot
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: per-document average negative log
    probability under the corpus's own unigram distribution — the
    cheapest member of the perplexity-filter family used to rank
    training documents (fluent/common text scores low, noise scores
    high). Two passes: one aggregation builds the vocabulary (bounded:
    vocab size, not corpus size), which then BROADCASTS back onto the
    token stream — at 100 TB the second pass is a map-side join, and
    the per-doc average is an ordinary hash aggregate."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n"))), 6).alias(
                "avg_neg_logprob"
            ),
        )
        .orderBy("doc_id")
    )


#: Vocabulary size for the top-k token table.
VOCAB_K = 50


@REG.add(
    "text_vocab_topk",
    oracle=f"""
    SELECT tok, CAST(c AS BIGINT) AS n_occurrences
    FROM (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
    )
    ORDER BY c DESC, tok
    LIMIT {VOCAB_K}
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary building: the top-50 tokens by corpus
    frequency (count desc, token asc tie-break) — the seed step of any
    frequency-based tokenizer (BPE starts from exactly this table).
    explode -> combinable hash aggregate -> TakeOrderedAndProject: the
    top-k never materializes a global sort, so vocab extraction over
    100 TB is one pass + a k-row driver merge."""
    toks = _t(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "tok")
        .limit(VOCAB_K)
    )


#: Per-stratum sample size for the deterministic k-per-group sample.
STRATUM_K = 5


@REG.add(
    "sample_topk_per_stratum",
    oracle=f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
    WHERE rn <= {STRATUM_K}
    """,
)
def sample_topk_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling: rank rows inside each language by
    the md5 of their key and keep the first 5 — a deterministic,
    engine-portable stand-in for per-group reservoir sampling (the hash
    IS the random draw, so the sample is reproducible across runs,
    engines and partitionings, unlike rand()-based reservoirs). One
    shuffle on the stratum key; the per-group sort is k-bounded."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= STRATUM_K)
        .select("doc_id", "lang")
    )


#: Context-window capacity (tokens) for sequence packing.
PACK_CAPACITY = 512


@REG.add(
    "corpus_pack_bins",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    runs AS (
        SELECT source, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM sized
    )
    SELECT source, doc_id, n_tokens,
           CAST((cum - n_tokens) // {PACK_CAPACITY} AS INTEGER) AS bin_id,
           CAST((cum - n_tokens) % {PACK_CAPACITY} AS INTEGER)  AS bin_offset
    FROM runs
    """,
)
def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in stable doc_id order within
    each source) to fixed-capacity context-window bins by running token
    count — the concat-then-split-at-context-length step that turns a
    cleaned corpus into training sequences. The running sum is one
    window per source partition; bin id/offset are pure integer
    arithmetic on it, identical in both engines. At 100 TB packing runs
    per shard/source partition, which is exactly the partitioning here."""
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", toks.alias("n_tokens")
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor(start / PACK_CAPACITY).cast("int").alias("bin_id"),
        (start % PACK_CAPACITY).cast("int").alias("bin_offset"),
    )



#: Temperature-sampling exponent (alpha = 1/T): 0.5 is the mBERT/XLM-R
#: convention — upweights small sources, caps the head's dominance.
MIX_ALPHA = 0.5
MIX_TOKEN_BUDGET = 1_000_000


@REG.add(
    "corpus_temperature_mix",
    oracle=f"""
    WITH per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT *, pow(n_tokens, {MIX_ALPHA}) AS w_raw,
               sum(pow(n_tokens, {MIX_ALPHA})) OVER () AS w_tot
        FROM per_src
    )
    SELECT source, n_docs, n_tokens,
           round(w_raw / w_tot, 6) AS mix_weight,
           round({MIX_TOKEN_BUDGET} * (w_raw / w_tot) / n_tokens, 6)
               AS epochs_at_budget
    FROM w ORDER BY source
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based sampling weights per source (weight ∝
    tokens^alpha, alpha=0.5 — the multilingual/domain mix rule
    from the XLM-R lineage) plus the epochs each source would run to
    fill a token budget (epochs > 1 = upsampling, the overfit-risk
    flag). Complements ``corpus_mix_weights`` (fixed target weights)
    with the SIZE-DERIVED weighting used when no hand-tuned mix exists.
    One mergeable aggregate per source; the weight normalizer is a
    window total over the sources-sized table — corpus rows are
    touched once."""
    per_src = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), r"\s+")))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    w_raw = F.pow(F.col("n_tokens"), MIX_ALPHA)
    w_tot = F.sum(w_raw).over(Window.partitionBy())
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(w_raw / w_tot, 6).alias("mix_weight"),
        F.round(MIX_TOKEN_BUDGET * (w_raw / w_tot) / F.col("n_tokens"), 6).alias(
            "epochs_at_budget"
        ),
    ).orderBy("source")


SPAN_K = 8  # tokens per non-overlapping span


@REG.add(
    "pipeline_span_dedup",
    # First occurrence = global (doc_id, span_idx) order per span value;
    # every later copy is a duplicate span. Integer counts only.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    ch AS (
        SELECT doc_id, i,
               array_to_string(ts[(i - 1) * {SPAN_K} + 1 : i * {SPAN_K}], ' ')
                   AS span
        FROM toks,
             unnest(range(1, CAST(ceil(len(ts) * 1.0 / {SPAN_K}) AS INT) + 1))
                 g(i)
    ),
    ranked AS (
        SELECT doc_id, i, span,
               row_number() OVER (PARTITION BY span ORDER BY doc_id, i) AS rn
        FROM ch
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS dup_frac
    FROM ranked GROUP BY doc_id ORDER BY doc_id
    """,
)
def pipeline_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SPAN-level duplication audit (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": repeated
    spans, not just repeated documents, drive memorization): documents
    split into non-overlapping {8}-token spans, every span after its
    globally-first occurrence counted as duplicated, per-document
    duplication fraction reported. Plan: flatMap-shaped span fan-out
    (no shuffle), ONE shuffle on the span value for the first-occurrence
    window, one per-doc aggregate. At 100 TB hash the span to a 64-bit
    key before the shuffle (the string itself never needs to move) —
    here the literal span keeps the oracle twin byte-exact."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("ts")
    )
    n_spans = F.ceil(F.size("ts") / F.lit(SPAN_K)).cast("int")
    ch = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n_spans)).alias("i"),
        "ts",
    ).select(
        "doc_id",
        "i",
        F.array_join(
            F.slice("ts", (F.col("i") - 1) * SPAN_K + 1, SPAN_K), " "
        ).alias("span"),
    )
    rn = F.row_number().over(Window.partitionBy("span").orderBy("doc_id", "i"))
    ranked = ch.withColumn("rn", rn)
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum((F.col("rn") > 1).cast("int")).cast("long").alias("n_dup_spans"),
            F.round(
                F.sum((F.col("rn") > 1).cast("int")) * 1.0 / F.count(F.lit(1)), 6
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


SPAN_LEN = 3


@REG.add(
    "corpus_span_corruption",
    # Span starts ride the portable md5 hex (identical strings in both
    # engines, as split_train_test_hash); coverage is an integer window
    # max over the fixed span length — no randomness, no floats except
    # one exact final ratio.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, t.w, t.i
        FROM documents,
             LATERAL (SELECT unnest(string_split(text, ' ')) AS w,
                             generate_subscripts(string_split(text, ' '), 1) AS i) t
    ),
    marked AS (
        SELECT doc_id, i,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '-'
                                  || CAST(i AS VARCHAR)), 1, 1) = '0'
                    THEN 1 ELSE 0 END AS is_start
        FROM toks
    ),
    covered AS (
        SELECT doc_id, i, is_start,
               max(is_start) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN {SPAN_LEN - 1} PRECEDING AND CURRENT ROW
               ) AS masked
        FROM marked
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(is_start) AS BIGINT) AS n_spans,
           CAST(sum(masked) AS BIGINT) AS n_masked,
           CAST(sum(masked) AS DOUBLE) / count(*) AS corruption_rate
    FROM covered
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def corpus_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption planning: deterministic mask spans over
    every document's token stream — span starts where the portable
    ``md5(doc_id-pos)`` hex begins with '0' (1/16 of positions), each
    span covering {SPAN_LEN} tokens; a position is masked if any span
    started within the last {SPAN_LEN} positions (window max, integer).
    This is the *planning* operator for denoising-objective pretraining
    data: reproducible across engines, reruns, and repartitioning,
    unlike an RNG mask. Per-doc outputs: span count (= sentinel count),
    masked-token count, and the exact corruption rate. Cost: stateless
    per-token expressions + one bounded window per doc — no shuffle
    beyond the doc key."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("i0", "w")
    ).select("doc_id", (F.col("i0") + 1).alias("i"))
    is_start = (
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("-"), F.col("i").cast("string")
                )
            ),
            1,
            1,
        )
        == "0"
    ).cast("int")
    marked = toks.select("doc_id", "i", is_start.alias("is_start"))
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(-(SPAN_LEN - 1), 0)
    covered = marked.select(
        "doc_id", "is_start", F.max("is_start").over(w).alias("masked")
    )
    return (
        covered.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("is_start").alias("n_spans"),
            F.sum("masked").alias("n_masked"),
            (F.sum("masked").cast("double") / F.count(F.lit(1))).alias(
                "corruption_rate"
            ),
        )
        .orderBy("doc_id")
    )
