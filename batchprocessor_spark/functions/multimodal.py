"""Multimodal column handling (SURVEY.md §2.4): opaque binary payloads
with typed metadata structs, integrity hashing, and the Pandas-UDF
plumbing for decode/feature-extraction.

Design: media is a `binary` column + a metadata struct (mime, size,
checksum). Decoding is REAL for the uncompressed raster formats a
pure-numpy parser can handle — P6 PPM and 24-bit BMP (`decode_image`,
including header comments, bottom-up rows, BGR order, and 4-byte row
padding) — with a FEATURE PROBE (`_pil_image`) adding compressed
formats when PIL is importable, and a deterministic fallback only for
genuinely opaque payloads. The Spark contract — schema, Arrow batch
shape, partitioning — is identical on every path and tested, so the
environment changes which decoder runs, never the plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table


@register(
    "q_llm_multimodal_cols",
    oracle="""
    SELECT doc_id,
           md5(text) AS payload_md5,
           octet_length(encode(text))::BIGINT AS payload_bytes,
           'text/plain' AS mime
    FROM documents
    """,
    category="multimodal",
)
def q_llm_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column (utf-8 encoded text standing in for media
    bytes) + integrity metadata: md5 checksum, byte length, mime tag.
    The binary column itself is reduced to its hash/size for the
    oracle compare — raw blobs hash differently across engines."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.md5(payload).alias("payload_md5"),
        F.length(payload).cast("long").alias("payload_bytes"),
        F.lit("text/plain").alias("mime"),
    )


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-shaped as a media table: (doc_id, payload binary,
    meta struct). On a real corpus `payload` is image/audio bytes."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def _pil_image():
    """Feature probe for a real image decoder, evaluated once per
    Python worker process. Returns the PIL Image module or None."""
    global _PIL_PROBE
    if _PIL_PROBE is _UNPROBED:
        try:
            from PIL import Image  # noqa: PLC0415

            _PIL_PROBE = Image
        except Exception:
            _PIL_PROBE = None
    return _PIL_PROBE


_UNPROBED = object()
_PIL_PROBE: object = _UNPROBED


def make_ppm_bytes(doc_id: int, width: int, height: int) -> bytes:
    """A real binary P6 PPM image with deterministic pixels
    v(x, y, c) = (doc_id·31 + (y·width + x)·3 + c) mod 256 — the
    fixture side of the decode tests: the BYTES are a fully valid
    image any PPM reader opens, and the closed-form pixel law lets a
    SQL oracle recompute the decoded statistics exactly."""
    n = width * height * 3
    px = ((doc_id * 31 + np.arange(n)) % 256).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (width, height) + px.tobytes()


def make_bmp_bytes(doc_id: int, width: int, height: int) -> bytes:
    """The SAME deterministic pixels as make_ppm_bytes, serialized as
    a real 24-bit uncompressed BMP: BITMAPFILEHEADER + 40-byte
    BITMAPINFOHEADER, rows bottom-up, channels BGR, each row padded to
    a 4-byte boundary — the quirks a real-world decoder must undo."""
    import struct

    n = width * height * 3
    rgb = ((doc_id * 31 + np.arange(n)) % 256).astype(np.uint8).reshape(
        height, width, 3
    )
    bgr_bottom_up = rgb[::-1, :, ::-1]
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    raster = b"".join(
        bgr_bottom_up[r].tobytes() + b"\0" * pad for r in range(height)
    )
    offset = 14 + 40
    file_size = offset + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + info + raster


def _ppm_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy P6 PPM parser: magic, '#' comments, whitespace-split
    width/height/maxval tokens, then the binary raster. Returns
    (width, height, h×w×3 uint8 RGB array)."""
    buf = bytes(payload)
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 8-bit)")
    pos += 1  # exactly one whitespace byte separates header and raster
    n = width * height * 3
    raster = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    return width, height, raster.reshape(height, width, 3)


def _bmp_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy 24-bit BMP parser: validates the BITMAPINFOHEADER,
    strips per-row 4-byte padding, flips the bottom-up row order and
    the BGR channel order. Returns (width, height, RGB array)."""
    import struct

    buf = bytes(payload)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    try:
        offset = struct.unpack_from("<I", buf, 10)[0]
        hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
            "<IiiHHI", buf, 14
        )
    except struct.error as e:  # truncated header → same contract as PPM
        raise ValueError(f"truncated BMP header: {e}") from e
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * height, offset=offset
    ).reshape(height, stride)[:, :row_bytes]
    img = rows.reshape(height, width, 3)
    if bottom_up:
        img = img[::-1]
    return width, height, img[:, :, ::-1]


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real raster decode for the formats a pure-numpy parser covers,
    dispatched on magic bytes. Raises ValueError on anything else —
    callers decide whether to fall back (see _decode_payload)."""
    head = bytes(payload[:2])
    if head == b"P6":
        return _ppm_decode(payload)
    if head == b"BM":
        return _bmp_decode(payload)
    raise ValueError("unrecognized image format")


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fallback featurizer for genuinely OPAQUE payloads
    (no recognizable raster magic, no PIL): features derived from the
    payload bytes so tests are reproducible — the Spark plumbing
    around it is identical to the real-decode paths."""
    n = len(payload)
    width, height = (n % 640) + 1, (n % 480) + 1
    # Deterministic fake features: byte histogram over 8 buckets.
    hist = [0.0] * 8
    for b in payload[:256]:
        hist[b % 8] += 1.0
    return width, height, hist


def _decode_payload(payload: bytes, mime: str) -> tuple[int, int, list[float]]:
    """Decode one payload, best decoder first: the pure-numpy raster
    parsers (PPM/BMP — real pixel math, no library needed), then PIL
    for compressed formats when importable, then the deterministic
    fallback for opaque payloads. Same (width, height, 8-dim feature)
    contract on every path, so the environment never changes the
    schema."""
    try:
        width, height, img = decode_image(payload)
        px = img.astype(np.float64)
        feats = [float(px[:, :, c].mean()) for c in range(3)]
        feats += [float(px[:, :, c].std()) for c in range(3)]
        feats += [float(px.min()), float(px.max())]
        return width, height, feats
    except ValueError:
        pass
    image_mod = _pil_image()
    if image_mod is not None and mime.startswith("image/"):
        import io

        with image_mod.open(io.BytesIO(bytes(payload))) as im:
            width, height = im.size
            px = list(im.convert("L").resize((4, 2)).getdata())
        return width, height, [float(x) for x in px]
    return _decode_stub(payload)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow-batched, one
    Python worker per partition — the only sane shape for per-blob
    Python work at scale (never a row-at-a-time UDF)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes = [(m or {}).get("mime", "") for m in pdf["meta"]]
            decoded = [
                _decode_payload(p, mime) for p, mime in zip(pdf["payload"], mimes)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        # Deterministic content fingerprint (sum of byte values):
        # cheap to recompute relationally, which is what lets
        # q_llm_multimodal_frames carry a DuckDB value oracle.
        T.StructField("bytesum", T.LongType()),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub over mapInPandas: a production build calls
    PIL.Image.resize here; the stub truncates/pads payload bytes to a
    deterministic width*height "image". The Spark contract — Arrow
    batches in, typed binary rows out — is the real part."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            resized = [
                bytes(p[:target]).ljust(target, b"\0") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stub over mapInPandas (1 input row → n output
    rows, the table-valued shape video decode needs): a production
    build seeks keyframes with pyav/ffmpeg; the stub slices the
    payload into n equal chunks."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "frame_idx": [], "frame": [],
                "n_bytes": [], "bytesum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    frame = bytes(payload[i * step : (i + 1) * step])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(frame)
                    out["n_bytes"].append(len(frame))
                    out["bytesum"].append(sum(frame))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


@register(
    "q_llm_multimodal_frames",
    # Replay the deterministic stub chain relationally: payload =
    # utf8(text) truncated/padded to 64*48 = 3072 bytes, 4 frames of
    # 768 bytes each; the first frame's byte-sum is the sum of ASCII
    # codes of chars 1..768 (NUL padding contributes 0; ascii of an
    # out-of-range substr is 0 in DuckDB, matching the padding).
    oracle="""
    WITH b AS (
      SELECT d.doc_id, ascii(substr(d.text, i.i::INT, 1)) AS byte
      FROM documents d, range(1, 769) i(i))
    SELECT doc_id, 4::BIGINT AS n_frames, 3072::BIGINT AS total_bytes,
           sum(byte)::BIGINT AS first_frame_bytesum
    FROM b GROUP BY doc_id
    """,
    category="multimodal",
)
def q_llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + frame-sample chain: media → resize(64×48) →
    4-frame sampling → per-doc frame stats. One row in, four rows out
    through Arrow-batched Python — the video-ingest shape. Now
    value-oracled (was rows-only): the stub decode is deterministic,
    so frame count, total bytes and the first frame's byte-sum
    fingerprint are all recomputable in SQL from the source text —
    the oracle drives the whole mapInPandas fan-out chain, not just
    its row count."""
    media = media_table(spark, sf_dir).repartition("doc_id")
    frames = sample_frames(resize_media(media, 64, 48), n_frames=4)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max(F.when(F.col("frame_idx") == 0, F.col("bytesum"))).alias(
            "first_frame_bytesum"
        ),
    )


@register(
    "q_llm_multimodal_pipeline",
    # Rebuild the stub's 8-bucket byte histogram in SQL (ASCII text ⇒
    # byte = codepoint), assemble ordered 8-dim vectors, and rank by
    # the SAME sequential-fold cosine (list_dot_product matches the
    # Spark fold bitwise — see README float-parity notes).
    oracle="""
    WITH pos AS (
      SELECT doc_id, text, unnest(range(least(length(text), 256))) AS i
      FROM documents),
    hist AS (
      SELECT doc_id, ascii(substr(text, (i + 1)::INT, 1)) % 8 AS b,
             count(*)::DOUBLE AS v
      FROM pos GROUP BY 1, 2),
    full_h AS (
      SELECT d.doc_id, r.range AS b, coalesce(h.v, 0.0) AS v
      FROM (SELECT DISTINCT doc_id FROM documents) d
      CROSS JOIN range(8) r
      LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.b = r.range),
    vecs AS (
      SELECT doc_id, list(v ORDER BY b) AS vec FROM full_h GROUP BY doc_id),
    nz AS (SELECT doc_id, vec FROM vecs WHERE list_dot_product(vec, vec) > 0),
    q AS (SELECT doc_id AS qid, vec AS qv FROM nz WHERE doc_id < 3),
    scored AS (
      SELECT q.qid, c.doc_id,
             round(list_dot_product(q.qv, c.vec)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.vec, c.vec))), 6) AS sim
      FROM q JOIN nz c ON c.doc_id <> q.qid)
    SELECT qid, doc_id, sim,
           row_number() OVER (PARTITION BY qid
                              ORDER BY sim DESC, doc_id) AS rnk
    FROM scored QUALIFY rnk <= 3
    """,
    category="multimodal",
)
def q_llm_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline composition: binary media table
    → mapInPandas decode (stub features) → embedding-style top-3
    similar media per query item — the decode→featurize→search chain
    a multimodal training-data pipeline runs, with every stage on the
    engine's own operators. The oracle rebuilds the deterministic stub
    features in SQL, so the full chain is driver value-checked."""
    from pyspark.sql import Window

    from batchprocessor_spark.operators.similarity import cosine_prenorm, dot, l2_norm

    feats = decode_media(media_table(spark, sf_dir)).select(
        "doc_id", F.transform("feature", lambda x: x.cast("double")).alias("v")
    )
    feats = feats.where(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x) > 0)
    feats = feats.withColumn("nrm", l2_norm(F.col("v")))
    q = feats.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        F.broadcast(q)
        .join(feats, F.col("doc_id") != F.col("qid"))
        .select(
            "qid",
            "doc_id",
            F.round(
                cosine_prenorm(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("doc_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 3)


IMAGE_STAT_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, n_px BIGINT, "
    "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT, "
    "mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE"
)


def image_media_table(spark: SparkSession, sf_dir: str, fmt: str = "ppm") -> DataFrame:
    """(doc_id, payload) with payload a REAL binary image — P6 PPM or
    24-bit BMP bytes built per doc by the deterministic pixel law in
    make_ppm_bytes/make_bmp_bytes. This is the fixture side: the
    testdata tables carry no raster column, so the engine synthesizes
    valid image files whose decoded statistics a SQL oracle can state
    in closed form. Dimensions vary per doc (width = doc_id%16+4,
    height = doc_id%8+4) so the parsers see non-square, odd-stride
    images (BMP row padding actually engages)."""
    maker = {"ppm": make_ppm_bytes, "bmp": make_bmp_bytes}[fmt]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        maker(int(i), int(i) % 16 + 4, int(i) % 8 + 4) for i in ids
                    ],
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition("doc_id").mapInPandas(
        gen, schema="doc_id BIGINT, payload BINARY"
    )


def image_stats(media: DataFrame) -> DataFrame:
    """REAL pixel math over mapInPandas: every payload goes through
    decode_image (actual header parse + raster reshape), then numpy
    per-channel integer sums and float means. Arrow-batched, narrow,
    shuffle-free — the decode→featurize shape at any scale."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "width", "height", "n_px",
                "sum_r", "sum_g", "sum_b", "mean_r", "mean_g", "mean_b",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, img = decode_image(payload)
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n_px = w * h
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(n_px)
                for c, name in enumerate(("r", "g", "b")):
                    out[f"sum_{name}"].append(int(sums[c]))
                    out[f"mean_{name}"].append(sums[c] / n_px)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=IMAGE_STAT_SCHEMA)


# Shared closed-form oracle for both raster-decode queries: the pixel
# law v(k) = (doc_id·31 + k) mod 256 over byte index k = (y·w + x)·3+c
# is re-enumerated in SQL; the engine side must recover EXACTLY these
# sums from the binary payload — through two different file layouts
# (PPM: raster order; BMP: bottom-up BGR padded rows). Means divide
# two exact <2^53 integers: one correctly-rounded IEEE op per engine.
_IMAGE_DECODE_ORACLE = """
    WITH dims AS (
      SELECT doc_id, (doc_id % 16 + 4)::BIGINT AS w, (doc_id % 8 + 4)::BIGINT AS h
      FROM documents),
    px AS (
      SELECT doc_id, w, h, unnest(range(w * h * 3)) AS k FROM dims),
    vals AS (
      SELECT doc_id, w, h, k % 3 AS c, (doc_id * 31 + k) % 256 AS v FROM px)
    SELECT doc_id, w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_px,
           sum(CASE WHEN c = 0 THEN v END)::BIGINT AS sum_r,
           sum(CASE WHEN c = 1 THEN v END)::BIGINT AS sum_g,
           sum(CASE WHEN c = 2 THEN v END)::BIGINT AS sum_b,
           sum(CASE WHEN c = 0 THEN v END)::BIGINT / (w * h) AS mean_r,
           sum(CASE WHEN c = 1 THEN v END)::BIGINT / (w * h) AS mean_g,
           sum(CASE WHEN c = 2 THEN v END)::BIGINT / (w * h) AS mean_b
    FROM vals GROUP BY doc_id, w, h
"""


@register("q_llm_multimodal_decode_ppm", oracle=_IMAGE_DECODE_ORACLE, category="multimodal")
def q_llm_multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: valid binary P6 PPM files →
    pure-numpy header/raster parse (decode_image) → per-channel pixel
    statistics. The oracle recomputes the statistics from the pixel
    law, so the driver value-checks genuine pixel math — width/height
    from the parsed header, channel sums from the decoded array — not
    a stub's closed form."""
    return image_stats(image_media_table(spark, sf_dir, "ppm"))


@register("q_llm_multimodal_decode_bmp", oracle=_IMAGE_DECODE_ORACLE, category="multimodal")
def q_llm_multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same decoded statistics as the PPM query but through the
    24-bit BMP layout — bottom-up rows, BGR channel order, 4-byte row
    padding — which the parser must all undo to reproduce the oracle's
    sums. Sharing the oracle with q_llm_multimodal_decode_ppm pins
    that both file formats decode to the SAME image."""
    return image_stats(image_media_table(spark, sf_dir, "bmp"))


@register(
    "q_llm_multimodal_decode",
    # The stub decoder is closed-form over the payload bytes (the
    # fixture text is pure ASCII, so byte = codepoint): width/height
    # are length modulos and feat_sum is the 8-bucket histogram total
    # = min(n_bytes, 256). The oracle states that closed form — so the
    # driver value-checks the ENTIRE mapInPandas round trip (Arrow
    # batching, schema, row alignment), which is the part that is real
    # regardless of which decoder runs.
    oracle="""
    SELECT doc_id,
           (octet_length(encode(text)) % 640 + 1)::INT AS width,
           (octet_length(encode(text)) % 480 + 1)::INT AS height,
           8 AS feat_dim,
           least(octet_length(encode(text)), 256)::DOUBLE AS feat_sum
    FROM documents
    """,
    category="multimodal",
)
def q_llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline over OPAQUE payloads (utf-8 text
    bytes, no raster magic): binary media table → mapInPandas decode →
    typed feature rows via the deterministic fallback featurizer. The
    oracle reproduces the fallback's closed form, making the Arrow
    plumbing driver-checked; the REAL decoders are exercised (and
    driver-checked) by q_llm_multimodal_decode_ppm/_bmp, which feed
    actual image files through the same plumbing."""
    media = media_table(spark, sf_dir).repartition("doc_id")
    feats = decode_media(media)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.size("feature").alias("feat_dim"),
        F.round(
            F.aggregate(
                F.transform("feature", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("feat_sum"),
    )


# ---------------------------------------------------------------- audio

def make_wav_bytes(doc_id: int, n_samples: int, sample_rate: int = 8000) -> bytes:
    """A real RIFF/WAVE file (canonical 44-byte header + 16-bit PCM
    mono LE) with deterministic samples
    s(doc_id, i) = ((doc_id*37 + i*17) mod 2001) - 1000 — a valid
    audio file any WAV reader opens, whose decoded statistics a SQL
    oracle can restate in closed form (the audio twin of
    make_ppm_bytes)."""
    import struct

    idx = np.arange(n_samples, dtype=np.int64)
    samples = ((doc_id * 37 + idx * 17) % 2001 - 1000).astype("<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * 2  # mono, 16-bit
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """Pure-numpy RIFF/WAVE parser: validates the RIFF/WAVE magic,
    walks the chunk list (tolerating extra chunks before 'data'),
    requires PCM 16-bit mono, returns (sample_rate, int16 samples)."""
    import struct

    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", buf, body
            )
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV (fmt={fmt}, ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            data = np.frombuffer(buf, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data


def audio_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload) with payload a REAL binary WAV file per doc;
    lengths vary per doc (400 + (doc_id%3)*80 samples) so the parser
    sees multiple durations. The testdata tables carry no audio
    column, so the engine synthesizes valid files whose decoded
    statistics the SQL oracle states in closed form."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        make_wav_bytes(int(i), 400 + int(i) % 3 * 80) for i in ids
                    ],
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition("doc_id").mapInPandas(
        gen, schema="doc_id BIGINT, payload BINARY"
    )


@register(
    "q_llm_multimodal_wav",
    # Closed-form replay of the sample law: s(i) = ((doc_id*37 + i*17)
    # % 2001) - 1000 over i < n = 400 + (doc_id % 3)*80. The engine
    # side must recover EXACTLY these integers from the binary RIFF
    # payload (header walk + int16 LE decode).
    oracle="""
    WITH dims AS (
      SELECT doc_id, (400 + (doc_id % 3) * 80)::BIGINT AS n FROM documents),
    s AS (
      SELECT doc_id, n, i,
             ((doc_id * 37 + i * 17) % 2001 - 1000)::BIGINT AS v,
             lag(((doc_id * 37 + i * 17) % 2001 - 1000))
               OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM (SELECT doc_id, n, unnest(range(n)) AS i FROM dims))
    SELECT doc_id,
           max(n)::BIGINT AS n_samples,
           8000::BIGINT AS sample_rate,
           ((1000 * max(n)) // 8000)::BIGINT AS duration_ms,
           max(abs(v))::BIGINT AS peak_abs,
           sum(v * v)::BIGINT AS sumsq,
           sum(CASE WHEN prev IS NOT NULL
                     AND ((v < 0) <> (prev < 0)) THEN 1 ELSE 0 END)::BIGINT
             AS zero_crossings
    FROM s GROUP BY doc_id
    """,
    category="multimodal",
)
def q_llm_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: valid binary RIFF/WAVE PCM files
    → pure-numpy chunk-walk + int16 parse (wav_decode) → per-doc audio
    statistics (duration, peak, energy, zero-crossing count — the
    features an audio curation pipeline filters on). The oracle
    recomputes every statistic from the sample law, so the driver
    value-checks genuine waveform math recovered from the binary
    payload — the audio leg of the multimodal surface beside the
    PPM/BMP image decoders.

    Scale posture: generate → decode is two Arrow-batched
    mapInPandas stages, shuffle-free after one doc_id repartition;
    per-doc state is one bounded waveform; the integer statistics
    (sumsq < 1e9 per doc) aggregate exactly."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                k: []
                for k in (
                    "doc_id",
                    "n_samples",
                    "sample_rate",
                    "duration_ms",
                    "peak_abs",
                    "sumsq",
                    "zero_crossings",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, v = wav_decode(payload)
                v64 = v.astype(np.int64)
                neg = v64 < 0
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(v64))
                out["sample_rate"].append(rate)
                out["duration_ms"].append(1000 * len(v64) // rate)
                out["peak_abs"].append(int(np.abs(v64).max()))
                out["sumsq"].append(int((v64 * v64).sum()))
                out["zero_crossings"].append(int((neg[1:] != neg[:-1]).sum()))
            yield pd.DataFrame(out)

    return audio_media_table(spark, sf_dir).mapInPandas(
        batches,
        schema=(
            "doc_id BIGINT, n_samples BIGINT, sample_rate BIGINT, "
            "duration_ms BIGINT, peak_abs BIGINT, sumsq BIGINT, "
            "zero_crossings BIGINT"
        ),
    )


# ------------------------------------------------------------- perceptual hash

_DHASH_ORACLE = """
    WITH dims AS (
      SELECT doc_id, (doc_id % 16 + 4)::BIGINT AS w, (doc_id % 8 + 4)::BIGINT AS h
      FROM documents),
    px AS (
      SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM dims),
    g AS (
      SELECT doc_id,
             ((p % w) * 4) // w AS gx,
             ((p // w) * 4) // h AS gy,
             (  (doc_id * 31 + p * 3) % 256
              + (doc_id * 31 + p * 3 + 1) % 256
              + (doc_id * 31 + p * 3 + 2) % 256) AS gray
      FROM px),
    cells AS (
      SELECT doc_id, gy, gx, (sum(gray) // count(*))::BIGINT AS m
      FROM g GROUP BY doc_id, gy, gx),
    bits AS (
      SELECT a.doc_id,
             sum(CASE WHEN a.m > b.m
                 THEN (1 << (a.gy * 3 + a.gx))::BIGINT ELSE 0 END)::BIGINT
               AS dhash
      FROM cells a
      JOIN cells b ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
      GROUP BY a.doc_id)
    SELECT doc_id, dhash,
           (count(*) OVER (PARTITION BY dhash))::BIGINT AS bucket_size
    FROM bits
"""


@register("q_llm_multimodal_dhash", oracle=_DHASH_ORACLE, category="multimodal")
def q_llm_multimodal_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual difference-hash (dHash) image near-dup keys over
    REAL decoded rasters: every BMP payload decodes (bottom-up BGR
    rows, padding stripped), collapses to integer grayscale
    (r+g+b per pixel), block-averages onto a 4x4 grid with EXACT
    truncated-integer cell means, and emits the 12-bit
    horizontal-gradient fingerprint (bit gy*3+gx set iff
    cell(gy,gx) > cell(gy,gx+1)) plus its corpus-wide bucket size —
    the standard first pass of image dedup (pHash/dHash family:
    near-identical images share fingerprints; buckets with
    bucket_size > 1 are the near-dup candidates, exactly like a
    minhash band bucket for text).

    The oracle re-derives the hash from the generator's pixel law, so
    the driver value-checks SPATIAL decode correctness — a decoder
    that got the BMP row order, channel order, or stride wrong would
    match q_llm_multimodal_decode_bmp's channel SUMS but scramble the
    gradient bits here (position-sensitive where sums are not).
    Cell means are sum DIV count on non-negative integers (floor ==
    trunc, identical on both engines); grid assignment is
    (x*4) DIV w — every cell non-empty since w, h >= 4.

    Scale posture: decode + hash is an Arrow-batched mapInPandas
    (one pass, narrow schema, no shuffle); the only exchange is the
    bucket-size window on the 8-byte hash — the near-dup join key. At
    100 TB the bucket pairing would go through capped_bucket_pairs
    like every other dedup family; the fingerprint is this operator's
    contract."""
    from pyspark.sql import Window

    media = image_media_table(spark, sf_dir, "bmp")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "dhash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, img = decode_image(payload)
                gray = img.sum(axis=2, dtype=np.int64)  # h x w, 0..765
                xs = (np.arange(w) * 4) // w
                ys = (np.arange(h) * 4) // h
                m = np.zeros((4, 4), dtype=np.int64)
                for gy in range(4):
                    for gx in range(4):
                        cell = gray[np.ix_(ys == gy, xs == gx)]
                        m[gy, gx] = int(cell.sum()) // cell.size
                bits = 0
                for gy in range(4):
                    for gx in range(3):
                        if m[gy, gx] > m[gy, gx + 1]:
                            bits |= 1 << (gy * 3 + gx)
                out["doc_id"].append(int(doc_id))
                out["dhash"].append(bits)
            yield pd.DataFrame(out)

    hashed = media.mapInPandas(batches, schema="doc_id BIGINT, dhash BIGINT")
    return hashed.select(
        "doc_id",
        "dhash",
        F.count(F.lit(1))
        .over(Window.partitionBy("dhash"))
        .cast("long")
        .alias("bucket_size"),
    )


_AHASH_ORACLE = """
    WITH dims AS (
      SELECT doc_id, (doc_id % 16 + 4)::BIGINT AS w, (doc_id % 8 + 4)::BIGINT AS h
      FROM documents),
    px AS (
      SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM dims),
    g AS (
      SELECT doc_id,
             ((p % w) * 4) // w AS gx,
             ((p // w) * 4) // h AS gy,
             (  (doc_id * 31 + p * 3) % 256
              + (doc_id * 31 + p * 3 + 1) % 256
              + (doc_id * 31 + p * 3 + 2) % 256) AS gray
      FROM px),
    cells AS (
      SELECT doc_id, gy, gx, (sum(gray) // count(*))::BIGINT AS m
      FROM g GROUP BY doc_id, gy, gx),
    tot AS (
      SELECT doc_id, sum(m)::BIGINT AS s FROM cells GROUP BY doc_id),
    ah AS (
      SELECT c.doc_id,
             sum(CASE WHEN 16 * c.m > t.s
                 THEN (1 << (c.gy * 4 + c.gx))::BIGINT ELSE 0 END)::BIGINT
               AS ahash
      FROM cells c JOIN tot t ON t.doc_id = c.doc_id
      GROUP BY c.doc_id)
    SELECT doc_id, ahash,
           (count(*) OVER (PARTITION BY ahash))::BIGINT AS bucket_size
    FROM ah
"""


@register("q_llm_multimodal_ahash", oracle=_AHASH_ORACLE, category="multimodal")
def q_llm_multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (aHash) image near-dup keys over REAL
    decoded rasters — the LEVEL-threshold sibling of
    q_llm_multimodal_dhash's gradient hash (the two catch different
    edits: aHash survives local rearrangement that flips gradient
    bits, dHash survives global brightness shifts that move the
    mean): every BMP payload decodes, collapses to integer grayscale,
    block-averages onto a 4x4 grid with exact truncated-integer cell
    means, and sets bit gy*4+gx iff the cell is STRICTLY brighter
    than the grid average (16·m > Σm — the exact-integer
    cross-multiplication, no float mean anywhere). Emits the 16-bit
    fingerprint and its corpus-wide bucket size.

    The oracle re-derives the hash from the generator's pixel law
    (the q_llm_multimodal_dhash discipline), so the driver
    value-checks spatial decode correctness through a second,
    level-sensitive lens.

    Scale posture: decode + hash is an Arrow-batched mapInPandas (one
    pass, narrow schema, no shuffle); the only exchange is the
    bucket-size window on the hash key. At 100 TB bucket pairing
    routes through capped_bucket_pairs like every dedup family; the
    fingerprint is this operator's contract."""
    from pyspark.sql import Window

    media = image_media_table(spark, sf_dir, "bmp")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "ahash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, img = decode_image(payload)
                gray = img.sum(axis=2, dtype=np.int64)
                xs = (np.arange(w) * 4) // w
                ys = (np.arange(h) * 4) // h
                m = np.zeros((4, 4), dtype=np.int64)
                for gy in range(4):
                    for gx in range(4):
                        cell = gray[np.ix_(ys == gy, xs == gx)]
                        m[gy, gx] = int(cell.sum()) // cell.size
                total = int(m.sum())
                bits = 0
                for gy in range(4):
                    for gx in range(4):
                        if 16 * int(m[gy, gx]) > total:
                            bits |= 1 << (gy * 4 + gx)
                out["doc_id"].append(int(doc_id))
                out["ahash"].append(bits)
            yield pd.DataFrame(out)

    hashed = media.mapInPandas(batches, schema="doc_id BIGINT, ahash BIGINT")
    return hashed.select(
        "doc_id",
        "ahash",
        F.count(F.lit(1))
        .over(Window.partitionBy("ahash"))
        .cast("long")
        .alias("bucket_size"),
    )
