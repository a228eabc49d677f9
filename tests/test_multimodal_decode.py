"""Real-raster decoder tests (VERDICT r2 item 2): the pure-numpy
PPM/BMP parsers must recover exact pixels from valid files — including
header comments, BMP bottom-up/BGR/padded rows — and both formats of
the same logical image must decode identically. Query-level parity
with the closed-form SQL oracle is covered by test_oracle_parity."""

from __future__ import annotations

import numpy as np
import pytest

from batchprocessor_spark.functions.multimodal import (
    _decode_payload,
    decode_image,
    make_bmp_bytes,
    make_ppm_bytes,
)


def test_ppm_golden_pixels():
    """Hand-crafted 2×2 P6 with a header comment decodes exactly."""
    raster = bytes(range(12))
    payload = b"P6\n# a comment line\n2 2\n255\n" + raster
    w, h, img = decode_image(payload)
    assert (w, h) == (2, 2)
    assert img.shape == (2, 2, 3)
    assert img.tobytes() == raster


def test_bmp_equals_ppm():
    """The same pixel law through both serializations must decode to
    the identical array — BMP's bottom-up BGR padded layout undone."""
    for doc_id, w, h in [(0, 4, 4), (7, 5, 3), (123, 19, 11)]:
        pw, ph, pimg = decode_image(make_ppm_bytes(doc_id, w, h))
        bw, bh, bimg = decode_image(make_bmp_bytes(doc_id, w, h))
        assert (pw, ph) == (bw, bh) == (w, h)
        assert np.array_equal(pimg, bimg)
        # And against the law itself.
        expect = ((doc_id * 31 + np.arange(w * h * 3)) % 256).astype(np.uint8)
        assert np.array_equal(pimg.reshape(-1), expect)


def test_bmp_padding_engages():
    """Width 5 ⇒ 15-byte rows padded to 16; a decoder that forgets the
    stride would shear the image."""
    w, h, img = decode_image(make_bmp_bytes(3, 5, 3))
    expect = ((3 * 31 + np.arange(5 * 3 * 3)) % 256).astype(np.uint8)
    assert np.array_equal(img.reshape(-1), expect)


def test_unsupported_rasters_raise():
    with pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n65535\n" + bytes(24))  # 16-bit maxval
    with pytest.raises(ValueError):
        decode_image(b"GIF89a....")
    with pytest.raises(ValueError):
        decode_image(b"BM")  # truncated header


def test_decode_payload_prefers_real_decoder():
    """_decode_payload must route raster payloads through the real
    parser (mean/std features) and opaque bytes through the fallback."""
    w, h, feats = _decode_payload(make_ppm_bytes(5, 6, 4), "image/x-portable-pixmap")
    assert (w, h) == (6, 4)
    img = decode_image(make_ppm_bytes(5, 6, 4))[2].astype(np.float64)
    assert feats[0] == pytest.approx(img[:, :, 0].mean())
    assert feats[7] == img.max()
    # Opaque text payload → deterministic fallback shape.
    w2, h2, feats2 = _decode_payload(b"just some text", "text/plain")
    assert len(feats2) == 8


def test_dhash_is_position_sensitive():
    """The dHash docstring's teeth: a decoder that scrambles spatial
    layout (here: vertically flipped rows — the exact mistake a BMP
    parser makes if it forgets bottom-up order) keeps the channel
    SUMS identical but flips gradient bits on real images, so
    q_llm_multimodal_dhash catches what the decode-stats oracle
    can't. Verified on the generator's own images across many
    doc_ids: at least one fingerprint must differ."""

    def dhash_of(img, w, h):
        gray = img.sum(axis=2, dtype=np.int64)
        xs = (np.arange(w) * 4) // w
        ys = (np.arange(h) * 4) // h
        bits = 0
        m = np.zeros((4, 4), dtype=np.int64)
        for gy in range(4):
            for gx in range(4):
                cell = gray[np.ix_(ys == gy, xs == gx)]
                m[gy, gx] = int(cell.sum()) // cell.size
        for gy in range(4):
            for gx in range(3):
                if m[gy, gx] > m[gy, gx + 1]:
                    bits |= 1 << (gy * 3 + gx)
        return bits

    diffs = 0
    for doc_id in range(64):
        w, h = doc_id % 16 + 4, doc_id % 8 + 4
        _, _, img = decode_image(make_bmp_bytes(doc_id, w, h))
        flipped = img[::-1, :, :]
        assert img.sum() == flipped.sum()  # sums can't tell them apart
        if dhash_of(img, w, h) != dhash_of(flipped, w, h):
            diffs += 1
    assert diffs > 0, "vertical flip never changed a fingerprint"
