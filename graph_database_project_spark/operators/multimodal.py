"""Multimodal-column plumbing (north-star): opaque ``binary`` payloads with
typed metadata, decode/feature-extract as Arrow-batched Pandas functions.

The container has no image/audio libs, so the *decode* step is stubbed
(deterministic fake features; attempting real decode raises
NotImplementedError) — but the Spark-side plumbing is real: binary column
materialization, mapInPandas batch shape, output schema, and partition
behavior are all exercised and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..io import load_table

REAL_DECODE_AVAILABLE = False  # no PIL/libav in this environment

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mode", T.StringType()),
    T.StructField("feat_mean", T.DoubleType()),
])


def binarize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → opaque binary payload + typed metadata, the layout a
    multimodal corpus table uses (payload: binary, meta columns alongside)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime_type"),
        F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-batch 'decode' of binary payloads.

    STUB: real decoding (PIL.Image.open / av.open on ``payload``) is not
    available in this container; the fake features below are a deterministic
    function of the payload bytes so tests and the driver get stable output.
    The batch shape, schema, and Arrow transfer are exactly what the real
    decoder would use.
    """
    if REAL_DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real image/audio decode not wired in this container")
    for pdf in batches:
        digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).digest())
        n_bytes = pdf["payload"].map(len).astype("int32")
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes,
            "width": (digests.map(lambda d: d[0]) .astype("int32") % 640) + 1,
            "height": (digests.map(lambda d: d[1]).astype("int32") % 480) + 1,
            "mode": digests.map(lambda d: "RGB" if d[2] % 2 == 0 else "L"),
            "feat_mean": digests.map(lambda d: round(sum(d) / len(d) / 255.0, 6)),
        })


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → deterministic stub features via mapInPandas.

    Scale: stateless per-batch map — embarrassingly parallel, no shuffle;
    Arrow transfers the binary column zero-copy per batch. Python is
    unavoidable here (codec work), which is exactly the sanctioned
    Pandas-UDF seam (SURVEY.md §2.B "UDF surface").
    """
    return binarize_documents(spark, sf_dir).select("doc_id", "payload") \
        .mapInPandas(_decode_batch, schema=FEATURE_SCHEMA)


def q_multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side binary-column stats (no Python): byte length + sha256 —
    the cheap metadata pass a multimodal pipeline runs before decode."""
    return binarize_documents(spark, sf_dir).select(
        "doc_id",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("digest"),
        "mime_type",
    )


Q_MULTIMODAL_BLOB_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text)               AS digest,
       'text/plain'               AS mime_type
FROM documents
"""


RESIZE_W, RESIZE_H = 224, 224
FRAMES_PER_DOC = 4

RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized_w", T.IntegerType()),
    T.StructField("resized_h", T.IntegerType()),
    T.StructField("scale", T.DoubleType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_digest", T.StringType()),
])


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize: real path would be PIL thumbnail/resample on the decoded
    image; here the geometry math (aspect-preserving fit into 224×224) runs
    on the stub dimensions so the batch shape and schema are the real ones."""
    if REAL_DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real image resize not wired in this container")
    for pdf in batches:
        digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).digest())
        w = (digests.map(lambda d: d[0]).astype("int32") % 640) + 1
        h = (digests.map(lambda d: d[1]).astype("int32") % 480) + 1
        scale = pd.concat([RESIZE_W / w, RESIZE_H / h], axis=1).min(axis=1).clip(upper=1.0)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": w, "height": h,
            "resized_w": (w * scale).round().astype("int32"),
            "resized_h": (h * scale).round().astype("int32"),
            "scale": scale.round(6),
        })


def _frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampling: real path decodes a video container and samples
    every Nth frame; the fan-out (k output rows per input row) is the real
    plumbing being exercised."""
    if REAL_DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real frame sampling not wired in this container")
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            for i in range(FRAMES_PER_DOC):
                rows.append((doc_id, i, hashlib.md5(raw + bytes([i])).hexdigest()))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_digest"])


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan (stub decode): 1:1 row map, no shuffle."""
    return binarize_documents(spark, sf_dir).select("doc_id", "payload") \
        .mapInPandas(_resize_batch, schema=RESIZE_SCHEMA)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan (stub decode): 1:k row fan-out inside
    mapInPandas — the partition-local explode a video pipeline needs."""
    return binarize_documents(spark, sf_dir).select("doc_id", "payload") \
        .mapInPandas(_frame_sample_batch, schema=FRAME_SCHEMA)


QUERIES = {
    "multimodal_decode": q_multimodal_decode,      # rows-only (Python stub seam)
    "multimodal_blob_stats": q_multimodal_blob_stats,
    "multimodal_resize": q_multimodal_resize,      # rows-only (stub seam)
    "multimodal_frame_sample": q_multimodal_frame_sample,  # rows-only (stub seam)
}

ORACLE = {
    "multimodal_blob_stats": Q_MULTIMODAL_BLOB_SQL,
    # decode/resize/frame_sample: intentionally absent → rows-only (UDF seams).
}
