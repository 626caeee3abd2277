"""Text-analysis family over ``documents`` (BASELINE.json north star:
token counting, quality scoring, language ID, fingerprinting).

All SQL-expressible entries are built-in-function pipelines (no explode,
no Python): token stats ride higher-order array functions, fingerprints
are md5 digests, quality scores are regexp length ratios. Per-row cost is
O(doc length); there is no shuffle at all — these stream through the scan,
which is exactly the 100 TB posture for per-document featurization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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
    oracle=f"""
    SELECT doc_id,
           round(CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS space_ratio,
           round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ({STOPWORDS_SQL})))
                 AS DOUBLE) / len(string_split(text, ' ')), 6) AS stopword_ratio,
           round(CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t)))
                 AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_word_len,
           CASE WHEN length(text) >= 100
                 AND len(list_filter(string_split(text, ' '), t -> t IN ({STOPWORDS_SQL}))) > 0
                THEN 1 ELSE 0 END AS passes_quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features (length / whitespace / stopword
    density) + a boolean gate — the standard cheap pre-filter stage of an
    LLM training-data pipeline."""
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
            (F.length("text") - F.length(F.regexp_replace("text", "[ ]", ""))).cast(
                "double"
            )
            / F.length("text"),
            6,
        ).alias("space_ratio"),
        F.round(stop_hits.cast("double") / n_tok, 6).alias("stopword_ratio"),
        F.round(sum_len.cast("double") / n_tok, 6).alias("avg_word_len"),
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


@REG.add("text_langid")  # heuristic detector => rows-only (see langid.py)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/CJK-heuristic language detection applied to documents.
    Deterministic but not SQL-twinned (the scoring argmax is engine
    logic); accuracy is asserted on real multilingual text in
    tests/test_text.py."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        detect_language(F.col("text")).alias("detected_lang"),
    )
