"""End-to-end training-corpus preparation, as a user would run it.

This is the adoption path for a reference user: the same engine calls
the registry exercises, composed into the pipeline an LLM-data team
actually ships — quality gate → exact dedup → near-dup (LSH + exact
verify) → canonical selection → deterministic split/shuffle → packed
output. Run it:

    python examples/training_corpus_pipeline.py [sf_dir]

(defaults to /root/testdata/sf0.001; any sf dir works — every stage is
the scale-path formulation, see SCALE.md per-family notes.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from projetos_etl_spark.operators.minhash import (
    exact_ngram_jaccard_pairs,
    lsh_candidate_ids,
    minhash_signatures,
)
from projetos_etl_spark.operators.components import connected_components
from projetos_etl_spark.session import get_spark
from projetos_etl_spark.sources.io import load_table


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="training-corpus-example")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. Quality gate: cheap per-row signals, no shuffle.
    toks = F.split(F.col("text"), " ")
    gated = docs.filter(
        (F.col("n_chars") >= 80) & (F.size(toks) >= 10)
    )
    n1 = gated.count()

    # 2. Exact dedup on the normalized form (one shuffle on the hash).
    norm = F.md5(
        F.trim(F.regexp_replace(F.lower("text"), " +", " ")).cast("binary")
    )
    exact = gated.withColumn("norm_md5", norm).dropDuplicates(["norm_md5"])
    n2 = exact.count()

    # 3. Near-dup: banded LSH candidates, exact-Jaccard verify >= 0.5
    #    (candidates only — never all pairs), then connected components
    #    elect one canonical doc per duplicate cluster.
    sigs = minhash_signatures(exact, "doc_id", "text")
    cands = lsh_candidate_ids(sigs, "doc_id")
    verified = (
        exact_ngram_jaccard_pairs(exact, "doc_id", "text", threshold=0.5)
        .join(cands, ["doc_a", "doc_b"], "left_semi")
    )
    edges = verified.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    comp = connected_components(vertices, edges)
    canonical = comp.groupBy("component").agg(F.min("id").alias("keep_id"))
    drop = comp.join(
        canonical, "component"
    ).filter(F.col("id") != F.col("keep_id")).select(F.col("id").alias("doc_id"))
    kept = exact.join(drop, "doc_id", "left_anti")
    n3 = kept.count()

    # 4. Deterministic split + epoch shuffle (content-stable hashes; no
    #    rand(), so reruns and repartitions reproduce byte-identically).
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(nib <= "b", "train").when(nib <= "d", "val").otherwise("test")
    order_key = F.md5(F.concat(F.lit("epoch0:"), F.col("doc_id").cast("string")))
    final = kept.select("doc_id", "text", "lang", split.alias("split"), order_key.alias("k"))

    print(f"docs in:            {n0}")
    print(f"after quality gate: {n1}")
    print(f"after exact dedup:  {n2}")
    print(f"after near-dedup:   {n3}")
    final.groupBy("split").count().orderBy("split").show()
    # 5. Ship: in production this is sink_partitioned(final, out,
    #    ['split'], file_groups=...) — partitioned, size-controlled files.


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
