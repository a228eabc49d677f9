"""Multimodal plumbing tests: decode/resize/frame-sample contracts
(the stubs are deterministic, so exact outputs are pinned)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.functions.multimodal import (
    decode_media,
    media_table,
    resize_media,
    sample_frames,
)
from tests.conftest import SF_SMALL


def test_media_table_shape(spark):
    m = media_table(spark, SF_SMALL)
    assert [f.name for f in m.schema.fields] == ["doc_id", "payload", "meta"]
    row = m.where(F.col("doc_id") == 0).collect()[0]
    assert row.meta.mime == "text/plain"
    assert row.meta.n_bytes == len(row.payload)
    assert len(row.meta.sha256) == 64


def test_decode_deterministic_fake(spark):
    feats = decode_media(media_table(spark, SF_SMALL))
    r = feats.where(F.col("doc_id") == 0).collect()[0]
    assert len(r.feature) == 8
    # Histogram over first 256 bytes sums to min(256, n_bytes).
    n = media_table(spark, SF_SMALL).where(F.col("doc_id") == 0).collect()[0].meta.n_bytes
    assert sum(r.feature) == min(256, n)


def test_resize_pads_and_truncates(spark):
    resized = resize_media(media_table(spark, SF_SMALL), 64, 48)
    rows = resized.select("doc_id", F.octet_length("payload").alias("n")).collect()
    assert all(r.n == 64 * 48 for r in rows)


def test_frame_sampling_fan_out(spark):
    media = media_table(spark, SF_SMALL)
    frames = sample_frames(media, n_frames=4)
    n_docs = media.count()
    assert frames.count() == 4 * n_docs
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)
