"""Multimodal column handling (SURVEY.md §2.4): opaque binary payloads
with typed metadata structs, integrity hashing, and the Pandas-UDF
plumbing for decode/feature-extraction.

Design: media is a `binary` column + a metadata struct (mime, size,
checksum). Decoding sits behind a FEATURE PROBE (`_pil_image`): when
PIL is importable and the payload is an image, the real decoder runs;
otherwise a clearly-marked deterministic stub. Either way the Spark
contract — schema, Arrow batch shape, partitioning — is identical and
tested, so installing a media library changes behavior, not plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder for non-image payloads (or when no media library
    is installed): a deterministic fake derived from the payload bytes
    so tests are reproducible — the Spark plumbing around it is real.
    """
    n = len(payload)
    width, height = (n % 640) + 1, (n % 480) + 1
    # Deterministic fake features: byte histogram over 8 buckets.
    hist = [0.0] * 8
    for b in payload[:256]:
        hist[b % 8] += 1.0
    return width, height, hist


def _decode_payload(payload: bytes, mime: str) -> tuple[int, int, list[float]]:
    """Decode one payload: real PIL decode when a media library is
    present AND the payload is an image; the deterministic stub
    otherwise. Same (width, height, 8-dim feature) contract on both
    paths, so swapping environments never changes the schema."""
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
            out = {"doc_id": [], "frame_idx": [], "frame": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    frame = bytes(payload[i * step : (i + 1) * step])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(frame)
                    out["n_bytes"].append(len(frame))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


@register("q_llm_multimodal_frames", oracle=None, category="multimodal")
def q_llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + frame-sample chain: media → resize(64×48) →
    4-frame sampling → per-doc frame stats. One row in, four rows out
    through Arrow-batched Python — the video-ingest shape."""
    media = media_table(spark, sf_dir).repartition("doc_id")
    frames = sample_frames(resize_media(media, 64, 48), n_frames=4)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max(F.when(F.col("frame_idx") == 0, F.md5("frame"))).alias("first_frame_md5"),
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
    """End-to-end multimodal pipeline: binary media table →
    mapInPandas decode (stubbed, deterministic) → typed feature rows.
    The oracle reproduces the stub's closed form, making the Arrow
    plumbing driver-checked; pytest additionally pins the exact
    output for a fixed payload."""
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
