"""Multimodal-column plumbing (north-star): opaque ``binary`` payloads with
typed metadata, decode/feature-extract as Arrow-batched Pandas functions.

Two tiers of codec:
* REAL — PPM (P6) images, RIFF/WAVE audio, and compressed PNG decode with
  stdlib+numpy only: genuine container bytes in the binary column, genuine
  header/chunk parsing, DEFLATE and full five-filter reconstruction in the
  decoders, exact DuckDB value oracles (q_multimodal_image_decode /
  q_multimodal_audio_stats / q_multimodal_png_decode).
* STUB — formats needing PIL/libav (JPEG decode, resample, video frame
  extraction) keep deterministic fake features behind the same
  mapInPandas plumbing; attempting real decode raises
  NotImplementedError. Batch shape, schema, Arrow transfer and 1:k
  fan-out are all exercised and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..io import load_table

REAL_DECODE_AVAILABLE = False  # no PIL/libav in this environment


def _round6(x: float) -> float:
    """round(x, 6) with HALF_UP (away-from-zero) tie-breaking — the rule
    DuckDB's round() and Spark's F.round apply. Python's built-in round is
    banker's (half-to-even), so an exact 6th-decimal tie in a pandas-side
    codec feature would diverge from the oracle. Ties are essentially
    unreachable for these denominators (ADVICE r04 analysis), but the
    engines should agree by construction, not by luck."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))

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
            "feat_mean": digests.map(lambda d: _round6(sum(d) / len(d) / 255.0)),
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


# The stub features are a deterministic function of md5(payload) — which
# DuckDB can recompute exactly: md5() yields the hex digest, each byte is
# two hex chars parsed via strpos on the nibble alphabet, and the feature
# arithmetic is the same IEEE expression tree (sum/16 is a power-of-two
# division, exact; /255.0 rounds once identically; round(…, 6) is HALF_UP
# in both engines — see _round6). So the formerly rows-only key gets a
# full value oracle: the driver now checks the Arrow seam's OUTPUT, not
# just its shape (r07 verdict #5).
Q_MULTIMODAL_DECODE_SQL = """
WITH h AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes
  FROM documents
), b AS (
  SELECT doc_id, n_bytes,
         list_transform(range(0, 16),
           i -> (strpos('0123456789abcdef', substr(hx, 1 + 2*i, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hx, 2 + 2*i, 1)) - 1)
         ) AS bytes
  FROM h
)
SELECT doc_id, n_bytes,
       CAST(bytes[1] % 640 + 1 AS INT) AS width,
       CAST(bytes[2] % 480 + 1 AS INT) AS height,
       CASE WHEN bytes[3] % 2 = 0 THEN 'RGB' ELSE 'L' END AS mode,
       round(list_sum(bytes) / 16.0 / 255.0, 6) AS feat_mean
FROM b
"""


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


FRAME_FP_P = 65_521          # largest 16-bit prime — fingerprint modulus
VIDEO_FRAME_STRIDE = 2       # Y4M decimation stride, shared by BOTH Y4M
                             # consumers (frame fingerprints + frame stats)
                             # so they can never silently diverge
FRAME_SAMPLE_STRIDE = VIDEO_FRAME_STRIDE

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("frame_fp", T.LongType()),
])

# ---------------------------------------------------------------------------
# REAL codec #0b — BMP (Windows DIB, 24bpp), stdlib struct + numpy only.
# BMP adds the two geometry wrinkles PPM doesn't have: rows are stored
# BOTTOM-UP and padded to 4-byte boundaries, and pixels are BGR — the
# decoder must undo all three to recover the logical top-down RGB plane.
# The plane itself is the same digest-tiled formula as the PPM path, so the
# closed-form DuckDB oracle carries over; the resize below then does REAL
# nearest-neighbor resampling on the decoded plane (integer-exact index
# math, reproduced arithmetically by the oracle).
# ---------------------------------------------------------------------------

import struct as _struct

THUMB_W, THUMB_H = 24, 18   # thumbnail fit box (downscales most synth dims)


def _bmp_dims(doc_id: int) -> tuple[int, int]:
    # 16..64 × 12..48: most images downscale into the 24×18 box, a few
    # (doc_id % 49 <= 8 AND % 37 <= 6) fit already → scale == 1.0 branch
    # stays exercised.
    return 16 + doc_id % 49, 12 + doc_id % 37


def _bmp_bytes(doc_id: int, text: str) -> bytes:
    """A genuine 24bpp bottom-up BMP: BITMAPFILEHEADER + BITMAPINFOHEADER +
    BGR rows padded to 4 bytes. Logical top-down RGB pixel (y,x,c) carries
    digest byte ``dg[((y*w + x)*3 + c) % 16]``."""
    w, h = _bmp_dims(doc_id)
    dig = _media_digest(doc_id, text)
    n = w * h * 3
    pix = np.frombuffer((dig * (n // 16 + 1))[:n], dtype=np.uint8).reshape(h, w, 3)
    row_len = (w * 3 + 3) & ~3
    image_size = row_len * h
    header = _struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 54)
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size,
                        2835, 2835, 0, 0)
    rows = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):          # bottom-up
        rows += pix[y, :, ::-1].tobytes()   # RGB → BGR
        rows += pad
    return header + info + bytes(rows)


def decode_bmp(raw: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse a 24bpp uncompressed BMP into (w, h, top-down RGB plane).
    Handles both bottom-up (positive biHeight) and top-down (negative)
    layouts and row padding — any conformant 24bpp BMP, not just ours."""
    try:
        magic, _fsize, _r1, _r2, offset = _struct.unpack_from("<2sIHHI", raw, 0)
        if magic != b"BM":
            raise ValueError("not a BMP payload")
        hsize, w, h_signed, planes, bpp, comp = _struct.unpack_from("<IiiHHI", raw, 14)
    except _struct.error as exc:  # truncated header — same contract as the
        raise ValueError(f"truncated BMP header: {exc}") from exc  # other codecs
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24bpp BMP supported")
    h = abs(h_signed)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(raw, dtype=np.uint8, count=row_len * h,
                         offset=offset).reshape(h, row_len)[:, :w * 3]
    plane = rows.reshape(h, w, 3)[:, :, ::-1]           # BGR → RGB
    if h_signed > 0:
        plane = plane[::-1]                             # bottom-up → top-down
    return w, h, plane


def thumbnail_dims(w: int, h: int,
                   tw: int = THUMB_W, th: int = THUMB_H) -> tuple[int, int]:
    """Integer-exact aspect-preserving fit into (tw, th), never upscaling.
    Pure integer arithmetic so the DuckDB oracle reproduces it verbatim."""
    if w <= tw and h <= th:
        return w, h
    if w * th >= h * tw:      # width is the binding constraint
        return tw, max(1, (h * tw) // w)
    return max(1, (w * th) // h), th


def resize_nearest(plane: "np.ndarray", rw: int, rh: int) -> "np.ndarray":
    """Nearest-neighbor resample with integer source mapping
    src_y = i*h // rh, src_x = j*w // rw (exact in any engine)."""
    h, w = plane.shape[:2]
    ys = (np.arange(rh) * h) // rh
    xs = (np.arange(rw) * w) // rw
    return plane[np.ix_(ys, xs)]


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized_w", T.IntegerType()),
    T.StructField("resized_h", T.IntegerType()),
    T.StructField("scale", T.DoubleType()),
    T.StructField("resized_mean", T.DoubleType()),
])


def _bmp_synth_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "mime_type": "image/bmp",
            "payload": [_bmp_bytes(int(d), t)
                        for d, t in zip(pdf["doc_id"], pdf["text"])],
        })


def _bmp_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, plane = decode_bmp(bytes(payload))
            rw, rh = thumbnail_dims(w, h)
            thumb = resize_nearest(plane, rw, rh)
            mean = _round6(int(thumb.sum(dtype=np.int64)) / (rh * rw * 3 * 255))
            rows.append((int(doc_id), w, h, rw, rh, _round6(rw / w), mean))
        yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])


def _frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL frame sampling + fingerprinting: parse the Y4M container, keep
    every FRAME_SAMPLE_STRIDE-th frame, and fingerprint each kept frame's
    decoded plane with a positional-weighted hash
    ``Σ byte_i·(i+1) mod FRAME_FP_P`` — order-sensitive (a byte swap
    changes it), integer-exact, and closed-form for the oracle."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _w, _h, _fps, planes = y4m_planes(bytes(payload))
            n_frames = len(planes)
            for f in range(0, n_frames, FRAME_SAMPLE_STRIDE):
                plane = planes[f].astype(np.int64)
                fp = int((plane * (np.arange(plane.size, dtype=np.int64) + 1)).sum()
                         % FRAME_FP_P)
                rows.append((int(doc_id), f, n_frames, fp))
        yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL aspect-preserving thumbnail: synthesize genuine 24bpp BMPs,
    decode each container (bottom-up rows, padding, BGR swap), nearest-
    neighbor-resample the pixel plane into a 24×18 fit box, and emit the
    resampled-pixel mean — true geometry, value-oracled. Two stateless
    mapInPandas stages pipelined in one task, no shuffle."""
    docs = load_table(spark, sf_dir, "documents", widen=True)
    bmps = docs.select("doc_id", "text").mapInPandas(
        _bmp_synth_batch, schema=MEDIA_SCHEMA)
    return bmps.select("doc_id", "payload").mapInPandas(
        _bmp_resize_batch, schema=RESIZE_SCHEMA)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling + per-frame fingerprinting over genuine Y4M
    streams (every 5th document): 1:k partition-local fan-out inside
    mapInPandas, emitting an order-sensitive integer fingerprint per kept
    frame — the dedup-key step a video pipeline runs after decimation
    (multimodal_video_frames is the stats twin). Value-oracled: the
    fingerprint is closed-form over the synth plane, but the Spark side
    computes it from DECODED container bytes."""
    docs = load_table(spark, sf_dir, "documents", widen=True) \
        .filter(F.col("doc_id") % 5 == 0)
    media = docs.select("doc_id", "text").mapInPandas(
        _y4m_synth_batch, schema=MEDIA_SCHEMA)
    return media.select("doc_id", "payload").mapInPandas(
        _frame_sample_batch, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codecs — PPM (P6) and WAV (RIFF/PCM) need only stdlib + numpy, so for
# these two formats the decode seam is genuine, not stubbed: _synth_media
# emits actual P6/WAV container bytes (deterministically derived from each
# document), and the decoders PARSE THOSE BYTES (header grammar, numpy
# frombuffer, wave module) — the same mapInPandas plumbing the PIL/libav
# stub path uses, now with a real codec behind it. Because the synthesized
# content is a closed-form function of (doc_id, text), both queries carry
# exact DuckDB value oracles: a decoder bug breaks parity.
# ---------------------------------------------------------------------------

import io as _io
import re as _re
import wave as _wave

import numpy as np

WAV_RATE = 8000


def _media_digest(doc_id: int, text: str) -> bytes:
    return hashlib.md5(f"{doc_id}:{text[:32]}".encode()).digest()


def _ppm_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 9, 6 + doc_id % 7


def _ppm_bytes(doc_id: int, text: str) -> bytes:
    """A genuine P6 PPM: ASCII header + w*h*3 raw RGB bytes (the 16 digest
    bytes tiled)."""
    w, h = _ppm_dims(doc_id)
    n = w * h * 3
    dig = _media_digest(doc_id, text)
    pix = (dig * (n // 16 + 1))[:n]
    return b"P6\n%d %d\n255\n" % (w, h) + pix


def _wav_frames(doc_id: int) -> int:
    return 200 + doc_id % 100


def _wav_bytes(doc_id: int, text: str) -> bytes:
    """A genuine RIFF/WAVE container: mono 16-bit PCM at WAV_RATE, samples =
    the digest bytes tiled and read as little-endian int16."""
    n = _wav_frames(doc_id)
    dig = _media_digest(doc_id, text)
    raw = (dig * (2 * n // 16 + 1))[:2 * n]
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(WAV_RATE)
        f.writeframes(raw)
    return buf.getvalue()


def decode_ppm(raw: bytes) -> tuple[int, int, int, float]:
    """Parse a P6 header + pixel plane. Returns (w, h, maxval, pixel_mean
    in [0,1] rounded to 6)."""
    m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", raw)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    pix = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=m.end())
    return w, h, maxval, _round6(float(pix.sum()) / (w * h * 3) / maxval)


def decode_wav(raw: bytes) -> tuple[int, int, int, float, float]:
    """Parse a RIFF/WAVE container via the stdlib codec. Returns
    (n_channels, sample_rate, n_frames, duration_s, rms) with rms over the
    int16 samples, both rounded to 6."""
    with _wave.open(_io.BytesIO(raw), "rb") as f:
        nch, rate, nfr = f.getnchannels(), f.getframerate(), f.getnframes()
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        data = np.frombuffer(f.readframes(nfr), dtype="<i2").astype("float64")
    rms = float(np.sqrt((data * data).sum() / len(data)))
    return nch, rate, nfr, _round6(nfr / rate), _round6(rms)


IMAGE_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("maxval", T.IntegerType()),
    T.StructField("pixel_mean", T.DoubleType()),
])

AUDIO_STATS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("mime_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])


def _synth_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Even doc_ids become PPM images, odd become WAV audio — a mixed-mime
    corpus with real container bytes in the binary column."""
    for pdf in batches:
        mimes, payloads = [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if doc_id % 2 == 0:
                mimes.append("image/x-portable-pixmap")
                payloads.append(_ppm_bytes(int(doc_id), text))
            else:
                mimes.append("audio/wav")
                payloads.append(_wav_bytes(int(doc_id), text))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "mime_type": mimes, "payload": payloads})


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", widen=True)
    return docs.select("doc_id", "text").mapInPandas(
        _synth_media_batch, schema=MEDIA_SCHEMA)


def _image_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [(int(d), *decode_ppm(bytes(p)))
                for d, p in zip(pdf["doc_id"], pdf["payload"])]
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "maxval", "pixel_mean"])


def _audio_stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [(int(d), *decode_wav(bytes(p)))
                for d, p in zip(pdf["doc_id"], pdf["payload"])]
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_channels", "sample_rate", "n_frames",
                           "duration_s", "rms"])


def q_multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode: filter the mixed-mime corpus to PPM, parse each
    P6 container (header grammar + numpy pixel plane) for true geometry and
    pixel statistics. Two stateless mapInPandas stages pipelined in one
    task — no shuffle; the binary column crosses Arrow in batches."""
    media = synthesize_media(spark, sf_dir) \
        .filter(F.col("mime_type") == "image/x-portable-pixmap")
    return media.select("doc_id", "payload").mapInPandas(
        _image_decode_batch, schema=IMAGE_DECODE_SCHEMA)


def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: stdlib wave parses each RIFF container; RMS and
    duration from the int16 PCM plane. Same stateless no-shuffle shape."""
    media = synthesize_media(spark, sf_dir) \
        .filter(F.col("mime_type") == "audio/wav")
    return media.select("doc_id", "payload").mapInPandas(
        _audio_stats_batch, schema=AUDIO_STATS_SCHEMA)


# Oracles: the synthesized content is a closed-form function of
# (doc_id, text[:32]) — the SQL recomputes the SAME md5 digest, tiles it,
# and derives geometry/means/RMS arithmetically. The Spark side never sees
# the formula (it parses real container bytes), so a codec bug = parity
# break. dg = 16 digest bytes, 1-based lists throughout.
_DIGEST_BYTES_SQL = (
    "list_transform(range(0, 16), k -> "
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || substr(text, 1, 32)), "
    "2 * k + 1, 2)) AS BIGINT))"
)

Q_MULTIMODAL_IMAGE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         8 + doc_id % 9 AS width,
         6 + doc_id % 7 AS height,
         {_DIGEST_BYTES_SQL} AS dg
  FROM documents WHERE doc_id % 2 = 0
), sums AS (
  SELECT doc_id, width, height,
         width * height * 3 AS n,
         list_sum(dg) AS s16,
         dg
  FROM d
)
SELECT doc_id,
       CAST(width AS INTEGER)  AS width,
       CAST(height AS INTEGER) AS height,
       255                     AS maxval,
       round((s16 * (n // 16) + coalesce(list_sum(dg[1:n % 16]), 0))
             * 1.0 / n / 255, 6) AS pixel_mean
FROM sums
"""

Q_MULTIMODAL_AUDIO_SQL = f"""
WITH d AS (
  SELECT doc_id,
         200 + doc_id % 100 AS n,
         {_DIGEST_BYTES_SQL} AS dg
  FROM documents WHERE doc_id % 2 = 1
), samp AS (
  SELECT doc_id, n,
         list_transform(range(0, 8), i ->
           CASE WHEN dg[2 * i + 1] + 256 * dg[2 * i + 2] >= 32768
                THEN dg[2 * i + 1] + 256 * dg[2 * i + 2] - 65536
                ELSE dg[2 * i + 1] + 256 * dg[2 * i + 2] END) AS s
  FROM d
), ssq AS (
  SELECT doc_id, n,
         list_sum(list_transform(s, x -> x * x)) AS sq8,
         list_transform(s, x -> x * x) AS sqs
  FROM samp
)
SELECT doc_id,
       1                     AS n_channels,
       {WAV_RATE}            AS sample_rate,
       CAST(n AS INTEGER)    AS n_frames,
       round(n * 1.0 / {WAV_RATE}, 6) AS duration_s,
       round(sqrt((sq8 * (n // 8) + coalesce(list_sum(sqs[1:n % 8]), 0))
                  * 1.0 / n), 6) AS rms
FROM ssq
"""

# Thumbnail-resize oracle: the synthesized BMP plane is the digest-tiled
# formula, the fit box and nearest-neighbor mapping are pure integer math —
# so the expected thumbnail mean is Σ over output coords t of
# dg[((src_y*w + src_x)*3 + c) % 16] with src_y = i*h//rh, src_x = j*w//rw.
# The Spark side decodes real container bytes (bottom-up rows, padding,
# BGR); any codec or resampler bug breaks value parity here.
Q_MULTIMODAL_RESIZE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         16 + doc_id % 49 AS w,
         12 + doc_id % 37 AS h,
         {_DIGEST_BYTES_SQL} AS dg
  FROM documents
), g AS (
  SELECT doc_id, w, h, dg,
         CASE WHEN w <= {THUMB_W} AND h <= {THUMB_H} THEN w
              WHEN w * {THUMB_H} >= h * {THUMB_W} THEN {THUMB_W}
              ELSE greatest(1, (w * {THUMB_H}) // h) END AS rw,
         CASE WHEN w <= {THUMB_W} AND h <= {THUMB_H} THEN h
              WHEN w * {THUMB_H} >= h * {THUMB_W}
                THEN greatest(1, (h * {THUMB_W}) // w)
              ELSE {THUMB_H} END AS rh
  FROM d
)
SELECT doc_id,
       CAST(w AS INTEGER)  AS width,
       CAST(h AS INTEGER)  AS height,
       CAST(rw AS INTEGER) AS resized_w,
       CAST(rh AS INTEGER) AS resized_h,
       round(rw * 1.0 / w, 6) AS scale,
       round(list_sum(list_transform(range(0, rh * rw * 3), t ->
               dg[1 + ((((t // (rw * 3)) * h // rh) * w
                        + ((t // 3) % rw) * w // rw) * 3 + t % 3) % 16]))
             * 1.0 / (rh * rw * 3 * 255), 6) AS resized_mean
FROM g
"""


# ---------------------------------------------------------------------------
# REAL codec #3 — PNG, stdlib zlib + numpy only. Unlike PPM this is a
# COMPRESSED container: the encoder emits spec-conformant chunks (signature,
# IHDR, IDAT = zlib of filtered scanlines, IEND, CRC-32 per chunk) and
# deliberately cycles ALL FIVE scanline filter types (None/Sub/Up/Average/
# Paeth, one per row), so the decoder below must implement the full PNG
# filter reconstruction — it decodes any 8-bit truecolor non-interlaced PNG,
# not just ours. The pixel plane is the SAME digest-tiled plane as the PPM
# path, so the closed-form DuckDB oracle arithmetic carries over: filters
# and DEFLATE are lossless, a reconstruction bug breaks value parity.
# Per-pixel Python in the unfilter loop is fine here: scanline filters are
# sequential in x by construction (left-neighbor recurrence); a production
# pipeline swaps this for a C codec behind the same mapInPandas seam.
# ---------------------------------------------------------------------------

import zlib as _zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + typ + data
            + (_zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big"))


def _png_bytes(doc_id: int, text: str) -> bytes:
    """A genuine PNG: 8-bit RGB, one cycling filter type per scanline."""
    w, h = _ppm_dims(doc_id)
    n = w * h * 3
    dig = _media_digest(doc_id, text)
    arr = np.frombuffer((dig * (n // 16 + 1))[:n], np.uint8).reshape(h, w * 3)
    out = bytearray()
    prev = np.zeros(w * 3, np.uint8)
    for y in range(h):
        row = arr[y]
        a = np.concatenate([np.zeros(3, np.uint8), row[:-3]])   # left pixel
        b = prev                                                # above
        c = np.concatenate([np.zeros(3, np.uint8), prev[:-3]])  # above-left
        f = y % 5
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - a                                      # uint8 wraps
        elif f == 2:
            filt = row - b
        elif f == 3:
            filt = row - ((a.astype(np.uint16) + b) // 2).astype(np.uint8)
        else:
            p = a.astype(np.int16) + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, b, c)).astype(np.uint8)
            filt = row - pred
        out.append(f)
        out += filt.tobytes()
        prev = row
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))  # bit depth 8, truecolor, no interlace
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _zlib.compress(bytes(out), 6))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(raw: bytes) -> tuple[int, int, int, float]:
    """Parse chunks (CRC-verified), inflate IDAT, reconstruct all five
    scanline filters. Returns (w, h, bit_depth, pixel_mean in [0,1])."""
    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, b"", None
    while pos + 12 <= len(raw):
        ln = int.from_bytes(raw[pos:pos + 4], "big")
        typ, data = raw[pos + 4:pos + 8], raw[pos + 8:pos + 8 + ln]
        crc = int.from_bytes(raw[pos + 8 + ln:pos + 12 + ln], "big")
        if _zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("missing or truncated IHDR")
    w, h = int.from_bytes(ihdr[0:4], "big"), int.from_bytes(ihdr[4:8], "big")
    depth, color = ihdr[8], ihdr[9]
    if depth != 8 or color != 2 or ihdr[10] or ihdr[11] or ihdr[12]:
        raise ValueError("only 8-bit truecolor non-interlaced PNG supported")
    if w <= 0 or h <= 0:
        raise ValueError("degenerate image dimensions")
    if not idat:
        raise ValueError("missing IDAT")
    try:
        plane = _zlib.decompress(idat)
    except _zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    stride = w * 3
    if len(plane) != h * (stride + 1):
        raise ValueError("IDAT length does not match geometry")
    rec = np.zeros((h, stride), np.uint8)
    for y in range(h):
        f = plane[y * (stride + 1)]
        line = np.frombuffer(plane, np.uint8, stride, y * (stride + 1) + 1)
        prev = rec[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            rec[y] = line
        elif f == 2:
            rec[y] = line + prev                                # uint8 wraps
        elif f in (1, 3, 4):
            cur = rec[y]
            for x in range(stride):
                a = int(cur[x - 3]) if x >= 3 else 0
                b = int(prev[x])
                c = int(prev[x - 3]) if x >= 3 else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    pred = _paeth(a, b, c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {f}")
    mean = _round6(float(rec.sum()) / (w * h * 3) / 255)
    return w, h, 8, mean


PNG_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("bit_depth", T.IntegerType()),
    T.StructField("pixel_mean", T.DoubleType()),
])


def _png_synth_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "mime_type": "image/png",
            "payload": [
                _png_bytes(int(d), t)
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ],
        })


def _png_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [(int(d), *decode_png(bytes(p)))
                for d, p in zip(pdf["doc_id"], pdf["payload"])]
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "bit_depth", "pixel_mean"])


def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode: every document becomes a genuine PNG
    (zlib-deflated, CRC'd, all five filter types across its scanlines),
    then the decoder reconstructs the pixel plane from the container bytes
    alone. Same stateless two-stage mapInPandas pipeline as the PPM path —
    no shuffle, binary payloads never leave their partition."""
    docs = load_table(spark, sf_dir, "documents", widen=True)
    media = docs.select("doc_id", "text").mapInPandas(
        _png_synth_batch, schema=MEDIA_SCHEMA)
    return media.select("doc_id", "payload").mapInPandas(
        _png_decode_batch, schema=PNG_DECODE_SCHEMA)


# Same closed-form plane as the PPM oracle (digest tiled to w*h*3) — but
# here the Spark side recovers it through DEFLATE + filter reconstruction,
# so this oracle checks the whole compression round trip, for ALL doc_ids.
Q_MULTIMODAL_PNG_SQL = f"""
WITH d AS (
  SELECT doc_id,
         8 + doc_id % 9 AS width,
         6 + doc_id % 7 AS height,
         {_DIGEST_BYTES_SQL} AS dg
  FROM documents
), sums AS (
  SELECT doc_id, width, height,
         width * height * 3 AS n,
         list_sum(dg) AS s16,
         dg
  FROM d
)
SELECT doc_id,
       CAST(width AS INTEGER)  AS width,
       CAST(height AS INTEGER) AS height,
       8                       AS bit_depth,
       round((s16 * (n // 16) + coalesce(list_sum(dg[1:n % 16]), 0))
             * 1.0 / n / 255, 6) AS pixel_mean
FROM sums
"""


# --- REAL video codec: YUV4MPEG2 (Y4M) frame sampling ------------------------
# Y4M is to video what PPM is to images: a plain-text stream header
# (`YUV4MPEG2 W.. H.. F.. C444`) followed by `FRAME` markers and raw YUV
# planes — a genuine, documented container we can encode AND decode with
# zero codec libraries, completing the image/audio/video triad with real
# bytes (the PIL/libav-format paths stay stubbed seams).

VIDEO_FPS = 25


def _y4m_dims(doc_id: int) -> tuple[int, int, int]:
    # dims keyed on doc_id // 5, NOT doc_id % k: the corpus filter keeps
    # doc_id % 5 == 0, under which any doc_id % 5-or-multiple expression
    # is constant and the width variation would be dead (untested) code
    k = doc_id // 5
    return 8 + k % 5, 6 + k % 3, 3 + k % 4  # w, h, n_frames


def _y4m_bytes(doc_id: int, text: str) -> bytes:
    """A genuine YUV4MPEG2 stream: header + per-frame FRAME marker + raw
    C444 plane (Y,U,V each w*h bytes). Frame f's bytes are the digest
    tiled with a per-frame +f offset mod 256, so every frame differs and
    the oracle stays closed-form."""
    w, h, n_frames = _y4m_dims(doc_id)
    n = w * h * 3
    dig = np.frombuffer(_media_digest(doc_id, text), dtype=np.uint8)
    tiled = np.tile(dig, n // 16 + 1)[:n].astype(np.int32)
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, VIDEO_FPS)]
    for f in range(n_frames):
        out.append(b"FRAME\n")
        out.append(((tiled + f) % 256).astype(np.uint8).tobytes())
    return b"".join(out)


def y4m_planes(raw: bytes) -> tuple[int, int, int, list["np.ndarray"]]:
    """Parse a YUV4MPEG2 stream into (width, height, fps, raw uint8 frame
    planes). Only the C444 chroma mode is supported (plane = w*h*3)."""
    nl = raw.find(b"\n")
    if nl < 0 or not raw.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    params = {t[:1]: t[1:] for t in raw[:nl].split(b" ")[1:] if t}
    try:
        w, h = int(params[b"W"]), int(params[b"H"])
        fps = int(params[b"F"].split(b":")[0])
    except (KeyError, ValueError) as exc:
        raise ValueError(f"malformed Y4M header params: {exc!r}") from exc
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate Y4M geometry {w}x{h}")
    if params.get(b"C", b"444") != b"444":
        raise ValueError("only C444 supported")
    plane_len, pos, planes = w * h * 3, nl + 1, []
    while pos < len(raw):
        if raw[pos:pos + 5] != b"FRAME":
            raise ValueError(f"missing FRAME marker at byte {pos}")
        fnl = raw.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("unterminated FRAME header")
        pos = fnl + 1  # frame params (if any) end at \n
        try:
            plane = np.frombuffer(raw, dtype=np.uint8, count=plane_len, offset=pos)
        except ValueError as exc:
            raise ValueError(f"truncated frame plane: {exc}") from exc
        planes.append(plane)
        pos += plane_len
    return w, h, fps, planes


def decode_y4m(raw: bytes) -> tuple[int, int, int, int, list[float]]:
    """Container bytes → (width, height, fps, n_frames, per-frame plane
    mean in [0,1] rounded to 6)."""
    w, h, fps, planes = y4m_planes(raw)
    means = [_round6(float(p.sum()) / p.size / 255) for p in planes]
    return w, h, fps, len(planes), means


VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("frame_mean", T.DoubleType()),
])


def _y4m_synth_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "mime_type": "video/x-yuv4mpeg",
            "payload": [_y4m_bytes(int(d), t)
                        for d, t in zip(pdf["doc_id"], pdf["text"])],
        })


def describe_media(raw: bytes) -> dict:
    """Sniff a media payload by magic bytes and decode it through the SAME
    codecs the batch operators run — the single-payload seam the chat API
    uses for uploaded attachments (reference north star:
    static/script.js:19-67 captures an image upload and speech input that
    the reference's server never processes; here the server side is the
    real codec battery). Returns a JSON-able descriptor; raises
    ValueError on an unrecognized or malformed payload (the API maps that
    to 422, same contract as an untranslatable question)."""
    if raw[:8] == _PNG_SIG:
        w, h, depth, mean = decode_png(raw)
        return {"format": "png", "kind": "image", "width": w, "height": h,
                "bit_depth": depth, "pixel_mean": mean}
    if raw[:2] == b"BM":
        w, h, plane = decode_bmp(raw)
        return {"format": "bmp", "kind": "image", "width": w, "height": h,
                "pixel_mean": _round6(float(plane.sum()) / plane.size / 255)}
    if raw[:2] == b"P6":
        w, h, maxval, mean = decode_ppm(raw)
        return {"format": "ppm", "kind": "image", "width": w, "height": h,
                "maxval": maxval, "pixel_mean": mean}
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        # the stdlib codec raises wave.Error/EOFError on truncated bodies
        # — normalize to ValueError so the API's malformed-payload → 422
        # contract holds for recognized-but-corrupt attachments too
        # (r09 review finding: these leaked through as 500s)
        try:
            nch, rate, nfr, dur, rms = decode_wav(raw)
        except ValueError:
            raise
        except Exception as exc:
            raise ValueError(f"malformed WAV payload: {exc}") from exc
        return {"format": "wav", "kind": "audio", "n_channels": nch,
                "sample_rate": rate, "n_frames": nfr,
                "duration_s": dur, "rms": rms}
    if raw[:9] == b"YUV4MPEG2":
        try:
            w, h, fps, n_frames, means = decode_y4m(raw)
        except ValueError:
            raise
        except Exception as exc:
            raise ValueError(f"malformed Y4M payload: {exc}") from exc
        return {"format": "y4m", "kind": "video", "width": w, "height": h,
                "fps": fps, "n_frames": n_frames,
                "frame_means": means}
    raise ValueError("unrecognized media payload (supported: png, bmp, "
                     "ppm, wav, y4m)")


def _y4m_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for d, p in zip(pdf["doc_id"], pdf["payload"]):
            w, h, _fps, n_frames, means = decode_y4m(bytes(p))
            rows.extend(
                (int(d), f, w, h, n_frames, means[f])
                for f in range(0, n_frames, VIDEO_FRAME_STRIDE))
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame_idx", "width", "height",
                           "n_frames", "frame_mean"])


def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode + frame sampling: every 5th document becomes a
    genuine multi-frame YUV4MPEG2 stream; the sampler parses the container
    bytes and keeps every VIDEO_FRAME_STRIDE-th frame with its plane mean —
    the decimation step a video training pipeline runs before feature
    extraction (reference north star: static/script.js:19-67 captures
    media the server never processes; here the engine side is real).

    Scale: two stateless mapInPandas stages pipelined in ONE task — the
    1:k frame fan-out happens inside the Arrow batch, so video bytes never
    cross a shuffle and output rows are slim (stats, not planes)."""
    docs = load_table(spark, sf_dir, "documents", widen=True) \
        .filter(F.col("doc_id") % 5 == 0)
    media = docs.select("doc_id", "text").mapInPandas(
        _y4m_synth_batch, schema=MEDIA_SCHEMA)
    return media.select("doc_id", "payload").mapInPandas(
        _y4m_sample_batch, schema=VIDEO_FRAME_SCHEMA)


# Closed-form: frame f's plane is the tiled digest +f mod 256; the SQL
# recomputes that sum arithmetically per sampled frame. The Spark side
# parses real container bytes (header grammar, FRAME markers, numpy
# planes), so any encoder/decoder drift breaks parity.
Q_MULTIMODAL_VIDEO_SQL = f"""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id // 5) % 5 AS width,
         6 + (doc_id // 5) % 3 AS height,
         3 + (doc_id // 5) % 4 AS n_frames,
         {_DIGEST_BYTES_SQL} AS dg
  FROM documents WHERE doc_id % 5 = 0
), frames AS (
  SELECT doc_id, width, height, n_frames, dg,
         unnest(range(0, n_frames)) AS frame_idx
  FROM d
), sampled AS (
  SELECT doc_id, frame_idx, width, height, n_frames,
         width * height * 3 AS n,
         list_transform(dg, b -> (b + frame_idx) % 256) AS sdg
  FROM frames WHERE frame_idx % {VIDEO_FRAME_STRIDE} = 0
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(width AS INTEGER)     AS width,
       CAST(height AS INTEGER)    AS height,
       CAST(n_frames AS INTEGER)  AS n_frames,
       round((list_sum(sdg) * (n // 16) + coalesce(list_sum(sdg[1:n % 16]), 0))
             * 1.0 / n / 255, 6) AS frame_mean
FROM sampled
"""

# Frame-fingerprint oracle: frame f's byte i is (dg[i%16]+f)%256, so the
# positional-weighted hash is closed-form. The Spark side computes it from
# decoded container planes — a sampler/decoder drift breaks parity.
Q_MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id // 5) % 5 AS w,
         6 + (doc_id // 5) % 3 AS h,
         3 + (doc_id // 5) % 4 AS nf,
         {_DIGEST_BYTES_SQL} AS dg
  FROM documents WHERE doc_id % 5 = 0
), frames AS (
  SELECT doc_id, w, h, nf, dg,
         unnest(range(0, nf, {FRAME_SAMPLE_STRIDE})) AS f
  FROM d
)
SELECT doc_id,
       CAST(f AS INTEGER)  AS frame_idx,
       CAST(nf AS INTEGER) AS n_frames,
       CAST(list_sum(list_transform(range(0, w * h * 3), i ->
              ((dg[1 + i % 16] + f) % 256) * (i + 1))) % {FRAME_FP_P} AS BIGINT)
         AS frame_fp
FROM frames
"""


# ---------------------------------------------------------------------------
# Image near-duplicate detection via perceptual hash (dHash) — the
# multimodal arm of the dedup family: same banded-LSH join shape as
# dedup_minhash_lsh, but the signature comes out of a REAL image codec.
#
# Corpus: every document gets a synthesized P6 PPM. Documents sharing
# doc_id % PHASH_BASES get the same base pixel plane; per group the
# variant class (variant % 3) makes exact duplicates (untouched plane),
# near duplicates (ONE pixel byte +64 — flips at most 2 of the 32 dHash
# bits), and unrelated images (plane keyed on the full doc_id).
#
# dHash-32: grayscale g[j] = (r+g+b)//3 over the first 33 pixels; bit k =
# [g[k] > g[k+1]]; packed into 4 bands of 8 bits. Candidates = pairs
# sharing ANY equal band (equi-join, never all-pairs); verified at
# hamming <= PHASH_MAX_HAMMING. With threshold 3 and 4 bands the banding
# is COMPLETE by pigeonhole (3 flips cannot touch all 4 bands), so the
# oracle's plain hamming<=3 self-join must match the banded plan
# bit-exactly — parity proves the LSH recall guarantee, not just values.
# At 100 TB you widen bands (16-32 bits) so chance band collisions don't
# blow up the candidate set; the plan shape is unchanged.
# ---------------------------------------------------------------------------

PHASH_BASES = 50
PHASH_BITS = 32          # 33 grayscale samples → 32 neighbor comparisons
PHASH_GBYTES = 99        # 33 pixels × 3 channels; min plane is 8*6*3=144
PHASH_BANDS = 4          # 4 × 8-bit bands for the candidate join
PHASH_MAX_HAMMING = 3    # < PHASH_BANDS ⇒ banded recall is provably 1.0

PHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])
PHASH_HASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    *[T.StructField(f"b{i}", T.IntegerType()) for i in range(PHASH_BANDS)],
])


def _phash_ppm_bytes(doc_id: int) -> bytes:
    base, variant = doc_id % PHASH_BASES, doc_id // PHASH_BASES
    w, h = 8 + base % 9, 6 + base % 7
    n = w * h * 3
    if variant % 3 == 2:  # unrelated image: plane keyed on the full doc_id
        dig = hashlib.md5(b"far:%d" % doc_id).digest()
        pix = bytearray((dig * (n // 16 + 1))[:n])
    else:
        dig = hashlib.md5(b"phash:%d" % base).digest()
        pix = bytearray((dig * (n // 16 + 1))[:n])
        if variant % 3 == 1:  # near dup: one byte nudged
            p0 = (variant * 29) % PHASH_GBYTES
            pix[p0] = (pix[p0] + 64) % 256
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(pix)


def dhash32_bands(raw: bytes) -> tuple[int, ...]:
    """REAL decode: parse the P6 container, grayscale the first 33 pixels,
    emit the 32-bit dHash as PHASH_BANDS byte-bands (LSB-first)."""
    m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", raw)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h = int(m.group(1)), int(m.group(2))
    pix = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=m.end())
    g = [(int(pix[3 * j]) + int(pix[3 * j + 1]) + int(pix[3 * j + 2])) // 3
         for j in range(PHASH_BITS + 1)]
    bits = [1 if g[k] > g[k + 1] else 0 for k in range(PHASH_BITS)]
    width = PHASH_BITS // PHASH_BANDS
    return tuple(
        sum(bits[b * width + i] << i for i in range(width))
        for b in range(PHASH_BANDS)
    )


def _phash_synth_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "payload": [_phash_ppm_bytes(int(d)) for d in pdf["doc_id"]],
        })


def _phash_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [(int(d), *dhash32_bands(bytes(p)))
                for d, p in zip(pdf["doc_id"], pdf["payload"])]
        yield pd.DataFrame(
            rows, columns=["doc_id"] + [f"b{i}" for i in range(PHASH_BANDS)])


def q_multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: synthesize → decode (two pipelined stateless
    mapInPandas stages, no shuffle) → banded equi-join for candidates →
    hamming verify. Only (doc_id, band_idx, band_val) rows cross the pair
    shuffle — payloads and full hashes never do; full hashes re-attach by
    doc id afterwards. The hash table is computed once per reference here
    (cheap); at scale you'd persist it (it is corpus-sized, not
    pair-sized)."""
    docs = load_table(spark, sf_dir, "documents", widen=True)
    imgs = docs.select("doc_id").mapInPandas(_phash_synth_batch, schema=PHASH_SCHEMA)
    # four consumers (both band sides, both verify sides) would each
    # re-run the synth+decode Python stages — 4x the codec work per plan
    # (r05 scan-multiplicity audit); the narrow corpus-sized hash table is
    # exactly what you'd persist at scale, so materialize it once
    hashes = imgs.mapInPandas(_phash_decode_batch, schema=PHASH_HASH_SCHEMA) \
        .localCheckpoint(eager=True)
    bands = hashes.select(
        "doc_id",
        F.posexplode(F.array(*[f"b{i}" for i in range(PHASH_BANDS)]))
         .alias("band_idx", "val"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "val")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "val")
    cand = (
        a.join(b, ["band_idx", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ha = hashes.select(F.col("doc_id").alias("doc_a"),
                       *[F.col(f"b{i}").alias(f"a{i}") for i in range(PHASH_BANDS)])
    hb = hashes.select(F.col("doc_id").alias("doc_b"),
                       *[F.col(f"b{i}").alias(f"bb{i}") for i in range(PHASH_BANDS)])
    paired = cand.join(ha, "doc_a").join(hb, "doc_b")
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"bb{i}")))
        for i in range(PHASH_BANDS)
    )
    return (
        paired.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# Oracle: recompute the plane closed-form (digest-tiled + the one-byte
# nudge), dHash it with list lambdas, and take ALL pairs at hamming<=3 —
# no band condition. Equality with the banded Spark plan holds by the
# pigeonhole argument above; a recall bug in the banding breaks parity.
def _phash_band_sql(prefix: str) -> str:
    width = PHASH_BITS // PHASH_BANDS
    return ", ".join(
        f"list_sum(list_transform(range(0, {width}), "
        f"i -> bits[{b * width} + i + 1] * (1 << CAST(i AS INT)))) AS {prefix}{b}"
        for b in range(PHASH_BANDS)
    )


def _phash_byte_sql(idx: str) -> str:
    # pixel byte at absolute index idx: digest byte (1-based list) unless
    # it is the nudged position p0
    return (
        f"CASE WHEN ({idx}) = p0 THEN (d[(({idx}) % 16) + 1] + 64) % 256 "
        f"ELSE d[(({idx}) % 16) + 1] END"
    )


Q_PHASH_NEARDUP_SQL = f"""
WITH p AS (
  SELECT doc_id, doc_id % {PHASH_BASES} AS base, doc_id // {PHASH_BASES} AS variant
  FROM documents
), dg AS (
  SELECT doc_id,
         CASE WHEN variant % 3 = 2
              THEN list_transform(range(0, 16), k ->
                     CAST(('0x' || substr(md5('far:' || CAST(doc_id AS VARCHAR)),
                                          2 * k + 1, 2)) AS BIGINT))
              ELSE list_transform(range(0, 16), k ->
                     CAST(('0x' || substr(md5('phash:' || CAST(base AS VARCHAR)),
                                          2 * k + 1, 2)) AS BIGINT)) END AS d,
         CASE WHEN variant % 3 = 1 THEN (variant * 29) % {PHASH_GBYTES}
              ELSE -1 END AS p0
  FROM p
), gray AS (
  SELECT doc_id,
         list_transform(range(0, {PHASH_BITS + 1}), j ->
           ({_phash_byte_sql('3 * j')} + {_phash_byte_sql('3 * j + 1')}
            + {_phash_byte_sql('3 * j + 2')}) // 3) AS g
  FROM dg
), bitted AS (
  SELECT doc_id,
         list_transform(range(0, {PHASH_BITS}), k ->
           CASE WHEN g[k + 1] > g[k + 2] THEN 1 ELSE 0 END) AS bits
  FROM gray
), hashes AS (
  SELECT doc_id, {_phash_band_sql('b')}
  FROM bitted
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS INT)
         AS hamming
FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
    <= {PHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


QUERIES = {
    "multimodal_decode": q_multimodal_decode,      # rows-only (Python stub seam)
    "multimodal_blob_stats": q_multimodal_blob_stats,
    "multimodal_resize": q_multimodal_resize,      # REAL BMP decode + NN resample
    "multimodal_frame_sample": q_multimodal_frame_sample,  # REAL Y4M fingerprinting
    "multimodal_image_decode": q_multimodal_image_decode,
    "multimodal_audio_stats": q_multimodal_audio_stats,
    "multimodal_png_decode": q_multimodal_png_decode,
    "multimodal_video_frames": q_multimodal_video_frames,
    "multimodal_phash_neardup": q_multimodal_phash_neardup,
}

ORACLE = {
    "multimodal_blob_stats": Q_MULTIMODAL_BLOB_SQL,
    # decode: value-oracled since r08 — the stub features are a pure
    # function of md5(payload), which DuckDB recomputes from the hex
    # digest (the registry's last rows-only key, retired)
    "multimodal_decode": Q_MULTIMODAL_DECODE_SQL,
    "multimodal_resize": Q_MULTIMODAL_RESIZE_SQL,
    "multimodal_frame_sample": Q_MULTIMODAL_FRAME_SAMPLE_SQL,
    "multimodal_image_decode": Q_MULTIMODAL_IMAGE_SQL,
    "multimodal_audio_stats": Q_MULTIMODAL_AUDIO_SQL,
    "multimodal_png_decode": Q_MULTIMODAL_PNG_SQL,
    "multimodal_video_frames": Q_MULTIMODAL_VIDEO_SQL,
    "multimodal_phash_neardup": Q_PHASH_NEARDUP_SQL,
}
