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


def _tiny_bmp() -> bytes:
    """A handcrafted 2x2 24-bit BMP (no media libs needed to build it)."""
    import struct

    pixels = (
        b"\xff\x00\x00" b"\x00\xff\x00" + b"\x00\x00"  # row 0 + pad
        + b"\x00\x00\xff" b"\xff\xff\xff" + b"\x00\x00"  # row 1 + pad
    )
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info_header = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return file_header + info_header + pixels


def test_decode_feature_probe_both_paths():
    """_decode_payload must run a REAL decoder for raster payloads —
    the pure-numpy BMP parser needs no media library at all — and the
    deterministic fallback for opaque bytes; same (width, height,
    8-dim feature) contract either way."""
    from batchprocessor_spark.functions.multimodal import (
        _decode_payload,
        _decode_stub,
    )

    bmp = _tiny_bmp()
    w, h, feat = _decode_payload(bmp, "image/bmp")
    assert (w, h) == (2, 2), "real decoder must report true image dims"
    assert len(feat) == 8
    # Red/green/blue each appear with total 510 over 4 px; the white
    # pixel contributes 255 to every channel.
    assert feat[:3] == [127.5, 127.5, 127.5]
    assert (feat[6], feat[7]) == (0.0, 255.0)
    # Opaque payloads always take the fallback path.
    assert _decode_payload(b"hello world", "text/plain") == _decode_stub(b"hello world")


def test_fixture_text_is_pure_ascii_both_sfs(spark):
    """q_llm_multimodal_frames' oracle equates payload BYTES with
    ascii(substr(text, i, 1)) CODEPOINTS — valid only while the
    documents corpus is pure ASCII (byte = char = codepoint ≤ 127).
    Pin that fixture invariant at both parity SFs so a future corpus
    with multibyte characters fails HERE with a clear message instead
    of as an opaque frames-parity hash mismatch (ADVICE r4)."""
    from tests.conftest import SF_ORACLE, SF_ORACLE_BIG

    for sf_dir in (SF_ORACLE, SF_ORACLE_BIG):
        bad = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.octet_length("text") != F.length("text"))
            .count()
        )
        assert bad == 0, (
            f"{sf_dir}: {bad} documents contain non-ASCII text; the "
            "q_llm_multimodal_frames byte/codepoint oracle no longer holds"
        )
