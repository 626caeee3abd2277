"""Text-function unit tests: langid on real multilingual sentences,
currency cleaning vs the reference's literal-replace semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from projetos_etl_spark.functions.currency import clean_currency
from projetos_etl_spark.functions.langid import detect_language

REAL_SENTENCES = [
    ("the cat sat on the mat and it was happy to see you", "en"),
    ("it is a truth universally acknowledged that a man in possession of a fortune", "en"),
    ("el perro corre por la calle y la gente lo mira con una sonrisa", "es"),
    ("la casa de mi abuela es una de las más bonitas que he visto por aquí", "es"),
    ("der Hund läuft durch die Straße und die Leute sind nicht böse mit ihm", "de"),
    ("ich habe das Buch gelesen und es ist ein gutes Buch mit vielen Ideen", "de"),
    ("le chien court dans la rue et les gens ne sont pas fâchés pour autant", "fr"),
    ("je pense que les vacances sont une bonne chose pour tout le monde", "fr"),
    ("今天天气很好我们去公园散步吧", "zh"),
    ("这本书的内容非常有趣值得一读", "zh"),
]


def test_langid_on_real_text(spark):
    df = spark.createDataFrame(REAL_SENTENCES, "text string, expected string")
    rows = df.select("expected", detect_language(F.col("text")).alias("got")).collect()
    correct = sum(1 for r in rows if r.expected == r.got)
    assert correct == len(rows), [(r.expected, r.got) for r in rows]


def test_langid_unknown(spark):
    df = spark.createDataFrame([("zzz qqq xxx",)], "text string")
    assert df.select(detect_language(F.col("text")).alias("l")).first().l == "und"


def test_clean_currency_matches_reference_literal_semantics(spark):
    """The reference does literal str.replace('R$','').replace(',','') then
    astype(float) (silver:76-82). Our single regexp must agree on every
    decorated form the reference handles."""
    samples = ["R$1,234.56", "$99.99", "R$0.00", "R$12,345,678.90", "1000.01"]
    expected = [
        float(s.replace("R$", "").replace("$", "").replace(",", "")) for s in samples
    ]
    df = spark.createDataFrame([(s,) for s in samples], "raw string")
    got = [r.amount for r in df.select(clean_currency("raw").alias("amount")).collect()]
    assert got == expected


def test_clean_currency_null_on_garbage(spark):
    df = spark.createDataFrame([("not a number",)], "raw string")
    assert df.select(clean_currency("raw").alias("a")).first().a is None


def test_quality_gate_blocks_short_docs(spark):
    from projetos_etl_spark.registry.text import text_quality_score
    from tests.conftest import SF_DIR

    pdf: pd.DataFrame = text_quality_score(spark, SF_DIR).toPandas()
    assert set(pdf["passes_quality"].unique()) <= {0, 1}
    assert (pdf["space_ratio"] > 0).all()
