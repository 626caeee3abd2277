"""MinHash + banded LSH near-duplicate detection (BASELINE.json north
star: "MinHash+LSH (shingle->minhash->band->bucket-join)").

Engine-portable construction: the k hash functions are
``md5('mh<i>|' || shingle)`` and the MinHash signature is the
*lexicographic minimum digest* per (doc, i) — md5 hex strings order
identically everywhere, so a DuckDB oracle can reproduce the exact
signatures (no reliance on Spark's murmur3 vs DuckDB's internal hash).

Scale shape (the whole point of LSH at 100 TB):
- one explode of shingles + one groupBy(doc) computes all k mins in a
  single shuffle;
- banding turns all-pairs similarity into an equi-join on
  (band_id, band_key) — candidate pairs only ever meet inside a bucket,
  so cost tracks true-duplicate density, not n^2;
- signatures are k fixed-width digests per doc regardless of doc size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NUM_HASHES = 16
BAND_SIZE = 4
SHINGLE_WORDS = 3

#: Hot-bucket guard: a (band_id, band_key) bucket with b members yields
#: b*(b-1)/2 candidate pairs — boilerplate-heavy corpora (the common case
#: in web-crawl dedup) can put millions of docs in ONE bucket and make a
#: single join key quadratic. Each bucket therefore keeps at most this
#: many members (deterministically: the lowest ids), bounding per-bucket
#: work at O(max_bucket^2) while true near-dup clusters — which share
#: MOST bands, not one — still meet in the capped subset of some band.
#: The cap is mirrored bit-for-bit in the DuckDB oracle
#: (registry/dedup.py), so capped semantics are still oracle-exact.
DEFAULT_MAX_BUCKET = 64


def shingles(text_col: Column, n: int = SHINGLE_WORDS) -> Column:
    """Word n-gram shingles of a whitespace-tokenized text column; a doc
    shorter than n words contributes its full text as one shingle."""
    tokens = F.split(text_col, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + off) for off in range(n)]
        ),
    )
    return F.when(F.size(tokens) < n, F.array(text_col)).otherwise(grams)


#: Signature values derived per md5 digest: the 32-hex digest splits into
#: four 8-hex slices, each an independent-enough hash value — 4x fewer
#: md5 evaluations per shingle for the same signature width (measured
#: ~2x faster end-to-end at sf0.1; md5 dominates the signature stage).
SIGS_PER_DIGEST = 4


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """One row per doc: ``sig_0..sig_{k-1}`` minimum 8-hex slices, where
    sig_i = min over shingles of substr(md5('mh<i/4>|' || shingle),
    8*(i%4)+1, 8). Lexicographic min over fixed-width hex slices is
    engine-portable exactly like full digests."""
    from projetos_etl_spark.sources.io import spread

    exploded = spread(df, id_col).select(
        id_col, F.explode(shingles(F.col(text_col))).alias("shingle")
    )
    n_digests = (num_hashes + SIGS_PER_DIGEST - 1) // SIGS_PER_DIGEST
    # materialize each digest ONCE per shingle row, then slice — folding
    # the md5 into the min() would recompute it per signature (4x).
    digests = exploded.select(
        id_col,
        *[
            F.md5(F.concat(F.lit(f"mh{m}|"), F.col("shingle")).cast("binary")).alias(
                f"__d{m}"
            )
            for m in range(n_digests)
        ],
    )
    return digests.groupBy(id_col).agg(
        *[
            F.min(
                F.substring(
                    F.col(f"__d{i // SIGS_PER_DIGEST}"),
                    8 * (i % SIGS_PER_DIGEST) + 1,
                    8,
                )
            ).alias(f"sig_{i}")
            for i in range(num_hashes)
        ]
    )


def lsh_band_buckets(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Exploded (id, band_id, band_key) bucket membership — the join key
    space of banded LSH, exposed for bucket-occupancy observability."""
    n_bands = num_hashes // band_size
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[f"sig_{i}" for i in range(b * band_size, (b + 1) * band_size)],
                    ).cast("binary")
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select(id_col, F.explode(band_entries).alias("b")).select(
        id_col, "b.band_id", "b.band_key"
    )


def lsh_candidate_ids(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Banded LSH candidate GENERATION only: distinct (doc_a, doc_b)
    pairs sharing any band key, doc_a < doc_b — for callers that score
    candidates their own way (e.g. the exact-Jaccard verify tier, which
    would otherwise pay for an est_jaccard it discards).

    ``max_bucket`` caps each (band_id, band_key) bucket at its lowest-id
    members before the self-join (see :data:`DEFAULT_MAX_BUCKET`); pass
    ``None`` for the uncapped all-pairs-within-bucket behavior. The
    row_number shuffles on the same (band_id, band_key) keys the join
    needs anyway, so the guard adds a sort within each bucket partition
    but no extra exchange of a different key."""
    buckets = lsh_band_buckets(sigs, id_col, num_hashes, band_size)
    if max_bucket is not None:
        w = Window.partitionBy("band_id", "band_key").orderBy(id_col)
        buckets = (
            buckets.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_bucket)
            .drop("__rk")
        )
    # Both sides of the self-join read the bucket table; materializing it
    # computes the explode+cap once, and the LAYOUT-KEEPING checkpoint
    # (r14) hands the window's (band_id, band_key) hash partitioning to
    # the planner — a plain checkpoint degrades to UnknownPartitioning
    # under AQE, so the self-join re-exchanged BOTH sides of data the
    # cap window had already shuffled onto exactly the join keys. The
    # keyed (size-derived-count) form also RIGHT-SIZES the bucket table's
    # partitions — the window's exchange count is tuned for the corpus
    # pass, not for the small post-cap bucket table.
    from projetos_etl_spark.sources.io import checkpoint_partitioned

    buckets = checkpoint_partitioned(buckets, "band_id", "band_key")
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Banded LSH: docs sharing any band key become a candidate pair;
    output (doc_a, doc_b, est_jaccard) with est = matching-signature
    fraction, doc_a < doc_b. Candidate generation is
    :func:`lsh_candidate_ids`; this adds the signature-agreement score."""
    # The signature table is consumed FOUR times across this call (both
    # sides of the band self-join, both sides of the est-jaccard
    # signature join), and the bucket self-join's broadcast side defeats
    # exchange reuse — without materialization the md5-shingle signature
    # computation executes 4x per call (verified in the physical plan:
    # zero ReusedExchange, four copies of the digest subtree). One eager
    # localCheckpoint computes it once. Measured at sf0.1/local[32]:
    # wall-clock NEUTRAL (the duplicate subtrees ran concurrently on
    # idle cores) but ~4x less signature CPU — on a busy cluster, where
    # cores aren't free, the CPU saving is the real resource. The
    # keyed checkpoint (r14) additionally hands a right-sized doc-id
    # hash partitioning to the planner, so the two est-jaccard joins
    # below never re-exchange the signature side.
    from projetos_etl_spark.sources.io import checkpoint_partitioned

    sigs = checkpoint_partitioned(sigs, id_col)
    pairs = lsh_candidate_ids(sigs, id_col, num_hashes, band_size, max_bucket)
    sa = sigs.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a_{i}") for i in range(num_hashes)],
    )
    sb = sigs.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b_{i}") for i in range(num_hashes)],
    )
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
        )
    )


def exact_ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram-set Jaccard via an inverted shingle index join —
    pairs only form where a shingle is shared (and, optionally, within a
    blocking key), never a cross join."""
    cols = [id_col] + ([block_col] if block_col else [])
    sh = df.select(
        *cols, F.explode(F.array_distinct(shingles(F.col(text_col)))).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    cond = (F.col("a.sh") == F.col("b.sh")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def exact_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-set CONTAINMENT over the same inverted index as
    :func:`exact_ngram_jaccard_pairs`: ``C = |A∩B| / min(|A|, |B|)``.

    Containment is the asymmetric dedup criterion Jaccard structurally
    misses — a doc quoted whole inside a much longer doc has tiny
    Jaccard (union is large) but containment ≈ 1. Training-corpus
    dedup needs both: Jaccard for near-identical pairs, containment for
    subsumption (boilerplate-wrapped reposts, quote farms, concat
    crawls; cf. Broder's resemblance/containment pair, "On the
    resemblance and containment of documents", 1997). Same scale shape
    as the Jaccard tier: pairs only form where a shingle is shared,
    one shuffle on the shingle key, aggregates map-combinable."""
    cols = [id_col] + ([block_col] if block_col else [])
    sh = df.select(
        *cols, F.explode(F.array_distinct(shingles(F.col(text_col)))).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    cond = (F.col("a.sh") == F.col("b.sh")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / F.least("n_a", "n_b").cast("double"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
