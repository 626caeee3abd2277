"""SimHash document fingerprinting (BASELINE.json north star).

16-bit engine-portable construction: bit ``i`` of a token's hash is the
high bit of hex digit ``i`` of ``md5('sh|' || token)``; the document
signature bit is the sign of the +-1 vote sum over its distinct tokens.
Near-duplicate docs differ in few bits (small Hamming distance).

Scale: explode(distinct tokens) + one groupBy(doc) with 16 conditional
sums — a single shuffle; the signature is 16 chars per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUM_BITS = 16
_HIGH_HEX = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per doc: ``simhash`` as a 16-char '0'/'1' string (string
    form keeps it oracle-portable; a BIGINT form is a trivial conv)."""
    from projetos_etl_spark.sources.io import spread

    tokens = F.array_distinct(F.split(F.col(text_col), " "))
    exploded = spread(df, id_col).select(id_col, F.explode(tokens).alias("tok")).withColumn(
        "digest", F.md5(F.concat(F.lit("sh|"), F.col("tok")).cast("binary"))
    )
    votes = [
        F.sum(
            F.when(F.substring("digest", i + 1, 1).isin(*_HIGH_HEX), 1).otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(NUM_BITS)
    ]
    sig = F.concat(
        *[F.when(F.col(f"v_{i}") > 0, "1").otherwise("0") for i in range(NUM_BITS)]
    )
    return exploded.groupBy(id_col).agg(*votes).select(id_col, sig.alias("simhash"))


def hamming_distance(a_col: str, b_col: str) -> "F.Column":
    """Hamming distance between two equal-length bit-string columns."""
    return sum(
        F.when(
            F.substring(a_col, i + 1, 1) != F.substring(b_col, i + 1, 1), 1
        ).otherwise(0)
        for i in range(NUM_BITS)
    ).alias("hamming")
