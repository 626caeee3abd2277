"""Multimodal family (BASELINE.json north star: "multimodal columns").

Three entries over ``documents``, treating text bytes as stand-in media
payloads (see ``operators/multimodal.py`` for the stubbing contract):

- ``multimodal_bundle``          — binary payload + typed metadata struct
  + content digest, all JVM-side.
- ``multimodal_decode_features`` — Arrow-batched ``mapInPandas`` decode
  (deterministic fake kernel, SQL-reproducible so the oracle verifies the
  Python batch path bit-for-bit).
- ``multimodal_frame_sample``    — per-frame explode from metadata
  (sequence/explode, zero Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetos_etl_spark.operators.multimodal import (
    bundle_media,
    decode_features,
    frame_sample,
)
from projetos_etl_spark.registry._core import Registry
from projetos_etl_spark.sources.io import load_table

REG = Registry()


@REG.add(
    "multimodal_bundle",
    oracle="""
    SELECT doc_id,
           'text/plain'                     AS mime,
           octet_length(encode(text))       AS n_bytes,
           octet_length(encode(text)) * 40  AS duration_ms,
           md5(text)                        AS digest
    FROM documents
    """,
)
def multimodal_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media bundling: payload digest + flattened metadata. The struct
    column itself isn't hashable by the driver compare, so the entry
    projects its fields; the binary payload is verified via md5."""
    bundled = bundle_media(load_table(spark, sf_dir, "documents"))
    return bundled.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.md5("media").alias("digest"),
    )


@REG.add(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(64 + octet_length(encode(text)) % 512 AS INTEGER)       AS width,
           CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) // 1000 + 1 AS INTEGER)      AS n_frames
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stub features through the real ``mapInPandas`` path: the
    oracle recomputes the fake kernel in SQL, proving the Arrow batch
    round-trip (binary in, features out) is lossless and deterministic."""
    bundled = bundle_media(load_table(spark, sf_dir, "documents"))
    return decode_features(bundled)


@REG.add(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, unnest(generate_series(0, octet_length(encode(text)) * 40, 5000)) AS frame_ms
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling every 5 s of fake duration; inclusive bounds match
    DuckDB ``generate_series``."""
    bundled = bundle_media(load_table(spark, sf_dir, "documents"))
    return frame_sample(bundled, every_ms=5000)


@REG.add(
    "multimodal_transcode_roundtrip",
    # substr-then-measure instead of least(octet_length(...), 64):
    # DuckDB's least() IGNORES NULLs (Postgres-style), so a NULL payload
    # would report 64 bytes instead of NULL; substr(NULL) propagates.
    # Byte-equivalent for the ASCII stand-in text this entry documents.
    oracle="""
    SELECT doc_id,
           octet_length(encode(substr(text, 1, 64))) AS out_bytes,
           md5(substr(text, 1, 64))                  AS out_md5
    FROM documents
    """,
)
def multimodal_transcode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary->binary transform (the resize/transcode shape) through the
    real Arrow ``mapInPandas`` round-trip: payloads go INTO Python as
    binary batches and come back OUT as binary. The stub kernel
    truncates to 64 bytes; the oracle reproduces it on the (ASCII)
    stand-in text, so the byte-level round-trip is verified exactly.
    ``operators/multimodal.py:transcode_stub`` is where a real codec
    kernel drops in."""
    from projetos_etl_spark.operators.multimodal import bundle_media, transcode_stub

    out = transcode_stub(bundle_media(load_table(spark, sf_dir, "documents")))
    return out.select(
        "doc_id",
        F.octet_length("out_media").cast("long").alias("out_bytes"),
        F.md5("out_media").alias("out_md5"),
    )


@REG.add(
    "multimodal_arrow_batches",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
               AS n_spaces
    FROM documents
    """,
)
def multimodal_arrow_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy tier below ``mapInPandas`` — the
    kernel receives raw ``pyarrow.RecordBatch``es and computes with
    Arrow compute kernels only (no pandas materialization, no per-row
    Python). That is the right boundary for bytes-heavy media pipelines:
    binary columns stay in Arrow buffers end-to-end, and the per-batch
    cost is two vectorized C++ kernel calls. The oracle recomputes both
    features in SQL, pinning the Arrow round-trip bit-for-bit."""
    from projetos_etl_spark.operators.multimodal import bundle_media

    def feature_kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            media = b.column("media")
            text = pc.cast(media, pa.string())  # ASCII stand-in payloads
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.binary_length(media), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                ],
                ["doc_id", "n_bytes", "n_spaces"],
            )

    bundled = bundle_media(load_table(spark, sf_dir, "documents"))
    return bundled.select("doc_id", "media").mapInArrow(
        feature_kernel, "doc_id long, n_bytes long, n_spaces long"
    )


@REG.add(
    "scan_binary_files",
    oracle="""
    SELECT 'n_' || n_nationkey || '.bin'                      AS file_name,
           CAST(octet_length(encode(n_name || '|' || n_regionkey)) AS BIGINT)
               AS n_bytes,
           md5(n_name || '|' || n_regionkey)                  AS content_md5
    FROM nation
    ORDER BY file_name
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media-lake ingest source: ``spark.read.format("binaryFile")``
    — how image/audio/video files actually enter a Spark pipeline (one
    row per file: path, length, raw bytes; globs + partition-parallel
    reads; pair it with the ``multimodal_*`` Arrow kernels downstream).
    Fixture: one small binary file per nation row (bounded, written
    driver-side), scanned back distributed; the oracle recomputes each
    file's name, size, and md5 from the same derivation. At 100 TB the
    same plan fans out over millions of objects with no driver
    involvement beyond listing; ``pathGlobFilter``/``recursiveFileLookup``
    prune at the listing step."""
    import os
    from projetos_etl_spark.scratch import scratch_dir

    rows = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
    d = scratch_dir("binfiles_")
    for r in rows:
        with open(os.path.join(d, f"n_{r.n_nationkey}.bin"), "wb") as f:
            f.write(f"{r.n_name}|{r.n_regionkey}".encode())
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(d)
    return (
        files.select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
        .orderBy("file_name")
    )


SHARD_BYTES = 16384


@REG.add(
    "multimodal_webdataset_manifest",
    # Shard assignment is an integer running byte-sum in doc order;
    # shard digests are md5-of-ordered-md5s — strings identical in both
    # engines, so the whole manifest hash-verifies.
    oracle=f"""
    WITH sized AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS digest,
               COALESCE(sum(octet_length(encode(text))) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS bytes_before
        FROM documents
    ),
    sharded AS (
        SELECT *, CAST(bytes_before // {SHARD_BYTES} AS INTEGER) AS shard_id
        FROM sized
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc,
           md5(string_agg(digest, '' ORDER BY doc_id)) AS shard_digest
    FROM sharded
    GROUP BY shard_id
    ORDER BY shard_id
    """,
)
def multimodal_webdataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest for the media corpus: payloads
    are packed into ~{SHARD_BYTES}-byte shards in stable doc order (the
    tar-shard layout multimodal training loaders stream), with per-
    shard sample counts, byte totals, id ranges, and an order-sensitive
    content digest (md5 of the concatenated per-sample md5s) for
    transfer verification. The running byte-sum is ONE ordered
    prefix-sum over per-doc integers (range-partitioned sort at scale;
    offsets compose) and the manifest is one aggregate over the
    assignment — the same two-pass shape as ``corpus_pack_bins``, plus
    the integrity digest a real shard writer needs."""
    from pyspark.sql import Window

    sized = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        F.md5("text").alias("digest"),
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    sharded = sized.select(
        "doc_id",
        "n_bytes",
        "digest",
        F.floor(
            F.coalesce(F.sum("n_bytes").over(w), F.lit(0)) / SHARD_BYTES
        ).cast("int").alias("shard_id"),
    )
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("n_bytes").cast("long").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", "digest"))
                        ),
                        lambda s: s["digest"],
                    ),
                    "",
                )
            ).alias("shard_digest"),
        )
        .orderBy("shard_id")
    )
