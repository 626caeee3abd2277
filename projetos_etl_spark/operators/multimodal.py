"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The pattern for image/audio/video at 100 TB (BASELINE.json north star):
media stays an opaque ``BinaryType`` column with a typed metadata struct
beside it; per-item compute (decode, feature-extract, resize, frame
sampling) runs as Arrow-batched ``mapInPandas`` so partitions stream
through Python in columnar batches — never a driver collect, never a
row-at-a-time UDF.

Real codecs (PIL/ffmpeg/torchaudio) are not installed in this
environment, so the decode kernel is STUBBED: ``decode_features`` ships a
deterministic byte-level fake (documented below) and ``resize_media``
raises ``NotImplementedError`` — but the Spark-side contract (schemas,
batch iteration, partitioning) is real and tested, so a real codec drops
in by replacing one pure function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried beside every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

DECODE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def bundle_media(docs: DataFrame, mime: str = "text/plain") -> DataFrame:
    """documents -> (doc_id, media binary, meta struct). The fixture's
    ``text`` stands in for opaque media bytes (UTF-8 encoded); metadata is
    derived deterministically (duration = 40 ms per byte, an audio-ish
    fake). All JVM-side expressions — no Python in this path."""
    n_bytes = F.octet_length("text").cast("long")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.struct(
            F.lit(mime).alias("mime"),
            n_bytes.alias("n_bytes"),
            (n_bytes * 40).alias("duration_ms"),
        ).alias("meta"),
    )


def fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic decode STUB (stands in for PIL/ffmpeg): derives
    (n_bytes, width, height, n_frames) from the byte length only, so the
    DuckDB oracle can reproduce it exactly. Replace this one function
    with a real codec to get real features through the same plan.
    NULL payload -> NULL features (a missing media blob is an everyday
    state in a 100 TB lake; a kernel crash on it would kill the batch —
    real codec kernels must make the same check)."""
    if payload is None:
        return None, None, None, None
    n = len(payload)
    return n, 64 + n % 512, 64 + (n * 7) % 512, n // 1000 + 1


def decode_features(bundled: DataFrame) -> DataFrame:
    """Arrow-batched decode: ``mapInPandas`` over (doc_id, media) batches.

    Each partition streams pandas batches through the decode kernel —
    the shape real image/audio decoding uses (CPU-bound per item,
    embarrassingly parallel, no shuffle). Column pruning still applies:
    only doc_id+media reach Python."""

    from projetos_etl_spark.session import ship_package

    ship_package(bundled.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode(b) for b in pdf["media"]]
            # nullable Int64: NULL-media rows carry None features, and a
            # plain list would become float64 (NaN), which Arrow refuses
            # to cast to the integer result schema.
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array([f[0] for f in feats], dtype="Int64"),
                    "width": pd.array([f[1] for f in feats], dtype="Int64"),
                    "height": pd.array([f[2] for f in feats], dtype="Int64"),
                    "n_frames": pd.array([f[3] for f in feats], dtype="Int64"),
                }
            )

    from projetos_etl_spark.sources.io import spread

    # decode is CPU-bound per item: widen narrow (single-file) inputs so
    # the Arrow batches hit every core (no-op on already-wide scans).
    return spread(bundled.select("doc_id", "media"), "doc_id").mapInPandas(
        decode, DECODE_FEATURES_SCHEMA
    )


def frame_sample(bundled: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plan: one row per sampled frame timestamp, from the
    metadata duration — pure JVM ``sequence``+``explode``, no Python. A
    real frame extractor would join these (doc_id, frame_ms) rows back to
    the payload in a ``mapInPandas`` stage."""
    return bundled.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )


def resize_media(bundled: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — requires a pixel codec (PIL), not installed here.
    The signature and schema are the contract; see ``fake_decode`` for
    how a real kernel slots in."""
    raise NotImplementedError(
        "resize_media needs an image codec (PIL/opencv), unavailable in this "
        "environment; the mapInPandas plumbing pattern is decode_features()"
    )


TRANSCODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_media", T.BinaryType()),
    ]
)


def transcode_stub(bundled: DataFrame, max_bytes: int = 64) -> DataFrame:
    """Binary -> binary media transform through the real Arrow path (the
    resize/transcode shape: payload in, new payload out). The kernel is a
    deterministic truncation STUB — a real resize/transcode replaces the
    one-line kernel; the ``mapInPandas`` plumbing (binary columns both
    directions, batch iteration, column pruning to doc_id+media) is the
    part that matters and is exactly what a codec kernel would ride."""
    from projetos_etl_spark.session import ship_package

    ship_package(bundled.sparkSession)

    def transcode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # NULL media -> NULL output (same rule as
                    # fake_decode: missing blobs must not kill the batch)
                    "out_media": [
                        None if b is None else bytes(b)[:max_bytes]
                        for b in pdf["media"]
                    ],
                }
            )

    return bundled.select("doc_id", "media").mapInPandas(transcode, TRANSCODE_SCHEMA)
