"""Multimodal plumbing tests: schema contracts, Arrow batch path,
frame-sample bounds, and the resize stub's explicit gate."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from projetos_etl_spark.operators.multimodal import (
    DECODE_FEATURES_SCHEMA,
    bundle_media,
    decode_features,
    fake_decode,
    frame_sample,
    resize_media,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bundled(spark):
    return bundle_media(spark.read.parquet(f"{SF}/documents.parquet"))


def test_bundle_schema(bundled):
    fields = {f.name: f.dataType for f in bundled.schema.fields}
    assert fields["media"] == T.BinaryType()
    meta = {f.name: f.dataType for f in fields["meta"].fields}
    assert meta == {
        "mime": T.StringType(),
        "n_bytes": T.LongType(),
        "duration_ms": T.LongType(),
    }


def test_decode_features_matches_kernel(bundled):
    out = decode_features(bundled)
    assert out.schema == DECODE_FEATURES_SCHEMA
    rows = {r.doc_id: r for r in out.collect()}
    for src in bundled.select("doc_id", "media").collect():
        n, w, h, fr = fake_decode(bytes(src.media))
        got = rows[src.doc_id]
        assert (got.n_bytes, got.width, got.height, got.n_frames) == (n, w, h, fr)


def test_frame_sample_inclusive_bounds(bundled):
    frames = frame_sample(bundled, every_ms=5000)
    per_doc = {r["doc_id"]: r["n"] for r in frames.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    durations = {
        r.doc_id: r.duration_ms
        for r in bundled.select("doc_id", "meta.duration_ms").collect()
    }
    for doc_id, dur in durations.items():
        assert per_doc[doc_id] == dur // 5000 + 1


def test_resize_stub_raises(bundled):
    with pytest.raises(NotImplementedError, match="codec"):
        resize_media(bundled, 224, 224)
