"""Multimodal plumbing tests: binary column materialization, Arrow batch
decode stub determinism, schema stability."""

from __future__ import annotations

from graph_database_project_spark.operators.multimodal import (
    FEATURE_SCHEMA, binarize_documents, q_multimodal_decode,
)

from .conftest import SF_SMOKE


def test_binarize_schema(spark):
    df = binarize_documents(spark, SF_SMOKE)
    assert dict(df.dtypes)["payload"] == "binary"
    row = df.first()
    assert row.n_bytes == len(row.payload)


def test_ppm_roundtrip_pure_python():
    """The P6 codec is REAL: decode parses header + pixel plane from the
    bytes; it must recover exactly the geometry/statistics the synthesizer
    embedded (computed independently here)."""
    import hashlib

    from graph_database_project_spark.operators.multimodal import (
        _media_digest, _ppm_bytes, _ppm_dims, decode_ppm,
    )

    for doc_id, text in [(0, "alpha beta"), (17, "x" * 100), (42, "short")]:
        raw = _ppm_bytes(doc_id, text)
        w, h, maxval, mean = decode_ppm(raw)
        assert (w, h) == _ppm_dims(doc_id) and maxval == 255
        n = w * h * 3
        dig = _media_digest(doc_id, text)
        expect = round(sum((dig * (n // 16 + 1))[:n]) / n / 255, 6)
        assert mean == expect
        # it is a real PPM: another parser (not ours) agrees on geometry
        header, rest = raw.split(b"\n", 1)
        assert header == b"P6"
        dims = rest.split(b"\n", 1)[0].split()
        assert [int(dims[0]), int(dims[1])] == [w, h]


def test_wav_roundtrip_pure_python():
    """The WAV codec is REAL: stdlib wave must accept the container and the
    decoded RMS must match the closed-form over the embedded samples."""
    import numpy as np

    from graph_database_project_spark.operators.multimodal import (
        WAV_RATE, _media_digest, _wav_bytes, _wav_frames, decode_wav,
    )

    for doc_id, text in [(1, "odd doc"), (99, "another odd one")]:
        nch, rate, nfr, dur, rms = decode_wav(_wav_bytes(doc_id, text))
        assert (nch, rate) == (1, WAV_RATE)
        assert nfr == _wav_frames(doc_id)
        n = _wav_frames(doc_id)
        dig = _media_digest(doc_id, text)
        samples = np.frombuffer((dig * (2 * n // 16 + 1))[:2 * n], "<i2") \
            .astype("float64")
        assert rms == round(float(np.sqrt((samples ** 2).sum() / n)), 6)
        assert dur == round(n / WAV_RATE, 6)


def test_mixed_mime_corpus(spark):
    from pyspark.sql import functions as F

    from graph_database_project_spark.operators.multimodal import synthesize_media

    media = synthesize_media(spark, SF_SMOKE)
    counts = {r.mime_type: r.n for r in
              media.groupBy("mime_type").agg(F.count("*").alias("n")).collect()}
    assert counts == {"image/x-portable-pixmap": 250, "audio/wav": 250}


def test_decode_deterministic_and_schema(spark):
    a = {r.doc_id: (r.width, r.height, r.mode, r.feat_mean)
         for r in q_multimodal_decode(spark, SF_SMOKE).collect()}
    b = {r.doc_id: (r.width, r.height, r.mode, r.feat_mean)
         for r in q_multimodal_decode(spark, SF_SMOKE).collect()}
    assert a == b
    assert len(a) == 500
    w, h, mode, fm = next(iter(a.values()))
    assert 1 <= w <= 640 and 1 <= h <= 480 and mode in ("RGB", "L")
    assert 0.0 <= fm <= 1.0
    assert q_multimodal_decode(spark, SF_SMOKE).schema == FEATURE_SCHEMA


def test_png_roundtrip_pure_python():
    """Encode→decode recovers the exact PPM pixel plane through DEFLATE +
    all five scanline filters, and chunk CRCs are actually checked."""
    import zlib

    import pytest as _pytest

    from graph_database_project_spark.operators.multimodal import (
        _ppm_bytes, _ppm_dims, _png_bytes, decode_png, decode_ppm)

    for doc_id in (0, 1, 7, 12, 33):
        text = f"doc {doc_id} text for the png codec test"
        w, h, depth, mean = decode_png(_png_bytes(doc_id, text))
        pw, ph, maxval, pmean = decode_ppm(_ppm_bytes(doc_id, text))
        assert (w, h) == (pw, ph) == _ppm_dims(doc_id)
        assert depth == 8 and mean == pmean

    # every filter type (None/Sub/Up/Average/Paeth) appears in the stream,
    # so the decoder's full reconstruction path is what the roundtrip proves
    raw = _png_bytes(11, "x")
    pos, idat = 8, b""
    while pos + 12 <= len(raw):
        ln = int.from_bytes(raw[pos:pos + 4], "big")
        if raw[pos + 4:pos + 8] == b"IDAT":
            idat += raw[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    plane = zlib.decompress(idat)
    stride = _ppm_dims(11)[0] * 3
    h11 = _ppm_dims(11)[1]
    assert {plane[y * (stride + 1)] for y in range(h11)} == {0, 1, 2, 3, 4}

    # corrupted chunk -> CRC failure, not silent garbage
    bad = bytearray(_png_bytes(3, "y"))
    bad[40] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_png(bytes(bad))
    with _pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot really")

    # malformed-but-CRC-valid containers reject with ValueError, never
    # IndexError/zlib.error/ZeroDivisionError out of the executor
    from graph_database_project_spark.operators.multimodal import (
        _PNG_SIG, _png_chunk)

    ihdr = (5).to_bytes(4, "big") + (5).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    ihdr0 = (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    for label, raw in [
        ("short IHDR", _PNG_SIG + _png_chunk(b"IHDR", b"\x00" * 8)
         + _png_chunk(b"IEND", b"")),
        ("no IDAT", _PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"IEND", b"")),
        ("0x0 dims", _PNG_SIG + _png_chunk(b"IHDR", ihdr0)
         + _png_chunk(b"IDAT", zlib.compress(b"")) + _png_chunk(b"IEND", b"")),
        ("bad deflate", _PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"IDAT", b"\x00bogus") + _png_chunk(b"IEND", b"")),
    ]:
        with _pytest.raises(ValueError):
            decode_png(raw)


def test_png_decode_query(spark):
    from graph_database_project_spark.operators.multimodal import (
        PNG_DECODE_SCHEMA, q_multimodal_png_decode)

    df = q_multimodal_png_decode(spark, SF_SMOKE)
    assert df.schema == PNG_DECODE_SCHEMA
    rows = df.collect()
    assert len(rows) == 500
    assert all(r.bit_depth == 8 and 0.0 <= r.pixel_mean <= 1.0 for r in rows)


def test_y4m_roundtrip_pure_python():
    import pytest as _pytest

    from graph_database_project_spark.operators.multimodal import (
        _y4m_bytes, _y4m_dims, decode_y4m)

    # sweep doc_ids congruent to the corpus filter (doc_id % 5 == 0) so
    # every width/height/frame-count residue of _y4m_dims is exercised
    seen_dims = set()
    for doc_id in range(0, 300, 5):
        raw = _y4m_bytes(doc_id, "hello video")
        w, h, fps, n_frames, means = decode_y4m(raw)
        ew, eh, enf = _y4m_dims(doc_id)
        assert (w, h, fps, n_frames) == (ew, eh, 25, enf)
        assert all(0.0 <= m <= 1.0 for m in means)
        # frames must differ (per-frame +f offset) but only slightly
        assert len(set(means)) == n_frames
        seen_dims.add((w, h, n_frames))
    # the dims formula must actually vary across the filtered corpus
    assert len({d[0] for d in seen_dims}) == 5
    assert len({d[1] for d in seen_dims}) == 3
    assert len({d[2] for d in seen_dims}) == 4

    # malformed containers reject with ValueError, never KeyError /
    # ZeroDivisionError / IndexError out of the executor
    for label, bad in [
        ("wrong magic", b"NOTY4M W8 H6 F25:1\nFRAME\n" + b"\x00" * 144),
        ("no newline", b"YUV4MPEG2 W8 H6"),
        ("missing W", b"YUV4MPEG2 H6 F25:1\nFRAME\n"),
        ("bad number", b"YUV4MPEG2 Wx H6 F25:1\nFRAME\n"),
        ("zero dims", b"YUV4MPEG2 W0 H0 F25:1\nFRAME\n"),
        ("chroma 420", b"YUV4MPEG2 W8 H6 F25:1 C420\nFRAME\n" + b"\x00" * 72),
        ("no FRAME", b"YUV4MPEG2 W8 H6 F25:1\nXXXXX\n" + b"\x00" * 144),
        ("unterminated FRAME", b"YUV4MPEG2 W8 H6 F25:1\nFRAME"),
        ("truncated plane", b"YUV4MPEG2 W8 H6 F25:1\nFRAME\n" + b"\x00" * 10),
    ]:
        with _pytest.raises(ValueError):
            decode_y4m(bad)


def test_video_frames_query(spark):
    from graph_database_project_spark.operators.multimodal import (
        VIDEO_FRAME_SCHEMA, VIDEO_FRAME_STRIDE, q_multimodal_video_frames)

    df = q_multimodal_video_frames(spark, SF_SMOKE)
    assert df.schema == VIDEO_FRAME_SCHEMA
    rows = df.collect()
    assert rows and all(r.frame_idx % VIDEO_FRAME_STRIDE == 0 for r in rows)
    assert all(0.0 <= r.frame_mean <= 1.0 for r in rows)
    # 1:k fan-out: every 5th doc contributes ceil(n_frames / stride) rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frs in by_doc.items():
        assert doc_id % 5 == 0
        assert len(frs) == (frs[0].n_frames + VIDEO_FRAME_STRIDE - 1) // VIDEO_FRAME_STRIDE


def test_phash_codec_variant_classes():
    from graph_database_project_spark.operators.multimodal import (
        PHASH_BASES, PHASH_MAX_HAMMING, _phash_ppm_bytes, dhash32_bands)

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    base_doc = 7                      # variant 0 (canonical)
    exact = 7 + 3 * PHASH_BASES      # variant 3 → canonical again
    near = 7 + 1 * PHASH_BASES       # variant 1 → one nudged byte
    far = 7 + 2 * PHASH_BASES        # variant 2 → unrelated plane
    h0 = dhash32_bands(_phash_ppm_bytes(base_doc))
    assert dhash32_bands(_phash_ppm_bytes(exact)) == h0
    assert ham(h0, dhash32_bands(_phash_ppm_bytes(near))) <= 2
    assert ham(h0, dhash32_bands(_phash_ppm_bytes(far))) > PHASH_MAX_HAMMING
    # non-PPM payload rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dhash32_bands(b"JFIF not a ppm")


def test_phash_banding_complete_under_threshold():
    # pigeonhole: threshold < n_bands means every qualifying pair shares
    # at least one intact band — the property the oracle parity relies on
    from graph_database_project_spark.operators.multimodal import (
        PHASH_BANDS, PHASH_MAX_HAMMING)

    assert PHASH_MAX_HAMMING < PHASH_BANDS


def test_bmp_roundtrip_pure_python():
    """Encode→decode must recover the exact logical RGB plane (bottom-up
    row order, 4-byte padding, and BGR swap all undone), and a top-down
    (negative-height) BMP from another producer must decode too."""
    import struct

    import numpy as np

    from graph_database_project_spark.operators.multimodal import (
        _bmp_bytes, _bmp_dims, _media_digest, decode_bmp)

    for doc_id in (0, 7, 48, 113):   # includes a width hitting 4-byte padding
        text = f"doc {doc_id} text"
        raw = _bmp_bytes(doc_id, text)
        w, h, plane = decode_bmp(raw)
        assert (w, h) == _bmp_dims(doc_id)
        dig = _media_digest(doc_id, text)
        n = w * h * 3
        expected = np.frombuffer((dig * (n // 16 + 1))[:n], dtype=np.uint8) \
            .reshape(h, w, 3)
        assert (plane == expected).all()

    # top-down variant: flip the height sign and the row order
    raw = bytearray(_bmp_bytes(5, "x"))
    w, h, plane_up = decode_bmp(bytes(raw))
    hdr = struct.unpack_from("<Iii", raw, 14)
    struct.pack_into("<Iii", raw, 14, hdr[0], hdr[1], -hdr[2])
    row_len = (w * 3 + 3) & ~3
    body = raw[54:]
    flipped = b"".join(bytes(body[y * row_len:(y + 1) * row_len])
                       for y in range(h - 1, -1, -1))
    raw[54:] = flipped
    _, _, plane_down = decode_bmp(bytes(raw))
    assert (plane_down == plane_up).all()


def test_thumbnail_resize_against_naive_reference():
    import numpy as np

    from graph_database_project_spark.operators.multimodal import (
        THUMB_H, THUMB_W, resize_nearest, thumbnail_dims)

    rng = np.random.RandomState(7)
    for (w, h) in [(64, 48), (16, 12), (24, 18), (49, 13), (25, 19)]:
        plane = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        rw, rh = thumbnail_dims(w, h)
        assert rw <= THUMB_W or rw == w
        assert rh <= THUMB_H or rh == h
        # aspect preserved within integer truncation; never upscaled
        assert rw <= w and rh <= h
        out = resize_nearest(plane, rw, rh)
        naive = np.empty((rh, rw, 3), dtype=np.uint8)
        for i in range(rh):
            for j in range(rw):
                naive[i, j] = plane[i * h // rh, j * w // rw]
        assert (out == naive).all()


def test_resize_query_real_geometry(spark):
    """The query's dims/scale/mean must reflect the decoded container, and
    both scale branches (downscale + already-fits) must occur."""
    from graph_database_project_spark.operators.multimodal import (
        q_multimodal_resize)

    pdf = q_multimodal_resize(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert (pdf["resized_w"] <= pdf["width"]).all()
    assert ((pdf["scale"] < 1.0).any()) and ((pdf["scale"] == 1.0).any())
    assert pdf["resized_mean"].between(0, 1).all()


def test_bmp_codec_properties():
    """Property-based: for arbitrary dims and pixel planes, a conformant
    24bpp BMP we encode must decode to the identical plane (padding widths
    w%4 ∈ {0,1,2,3} all hit), and the thumbnail math must stay in-bounds
    and aspect-ordered."""
    import struct

    import numpy as np
    from hypothesis import given, settings, strategies as st

    from graph_database_project_spark.operators.multimodal import (
        THUMB_H, THUMB_W, decode_bmp, resize_nearest, thumbnail_dims)

    def encode(plane):
        h, w = plane.shape[:2]
        row_len = (w * 3 + 3) & ~3
        header = struct.pack("<2sIHHI", b"BM", 14 + 40 + row_len * h, 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_len * h,
                           0, 0, 0, 0)
        pad = b"\x00" * (row_len - w * 3)
        body = b"".join(plane[y, :, ::-1].tobytes() + pad
                        for y in range(h - 1, -1, -1))
        return header + info + body

    @given(w=st.integers(1, 70), h=st.integers(1, 55), seed=st.integers(0, 2**31))
    @settings(max_examples=60, deadline=None)
    def check(w, h, seed):
        rng = np.random.RandomState(seed % 2**31)
        plane = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        dw, dh, decoded = decode_bmp(encode(plane))
        assert (dw, dh) == (w, h)
        assert (decoded == plane).all()
        rw, rh = thumbnail_dims(w, h)
        assert 1 <= rw <= max(w, THUMB_W) and 1 <= rh <= max(h, THUMB_H)
        assert rw <= w and rh <= h            # never upscale
        thumb = resize_nearest(plane, rw, rh)
        assert thumb.shape == (rh, rw, 3)
        # every thumb pixel exists somewhere in the source plane row/col
        assert set(np.unique(thumb)) <= set(np.unique(plane))

    check()


def test_codecs_raise_valueerror_on_garbage():
    """Uniform decode contract: malformed/truncated containers raise
    ValueError (never a leaked struct.error / IndexError) so mapInPandas
    error handling can catch one exception type across all codecs."""
    import pytest

    from graph_database_project_spark.operators.multimodal import (
        decode_bmp, decode_png, decode_ppm, y4m_planes)

    for fn, bad in [(decode_bmp, b""), (decode_bmp, b"xx"), (decode_bmp, b"BM"),
                    (y4m_planes, b"YUV4MPEG2 W4"), (y4m_planes, b"nope"),
                    (decode_ppm, b"P6"), (decode_png, b"\x89PNG")]:
        with pytest.raises(ValueError):
            fn(bad)
