"""Multimodal column tests: the Spark-side plumbing (schema, Arrow batch
shape, determinism) is real; the codec is stubbed (no media libs in this
container) behind decode_real's documented NotImplementedError."""

from __future__ import annotations

import pytest

from cybersecurity_ioc_etl_spark.multimodal.columns import (
    FEATURE_SCHEMA,
    _fake_feature,
    codec_capabilities,
    decode_real,
    extract_features,
    synthesize_media,
)
from cybersecurity_ioc_etl_spark.sources.readers import load_table


def _media(spark, sf_dir):
    return synthesize_media(load_table(spark, sf_dir, "documents"))


def test_media_schema_and_kind_mapping(spark, sf_dir):
    m = _media(spark, sf_dir)
    assert dict(m.dtypes)["content"] == "binary"
    rows = m.select("media_id", "kind").collect()
    kinds = {0: "image", 1: "audio", 2: "video"}
    assert all(r.kind == kinds[r.media_id % 3] for r in rows)


def test_feature_extraction_schema_and_shape(spark, sf_dir):
    f = extract_features(_media(spark, sf_dir))
    assert f.schema == FEATURE_SCHEMA
    rows = f.collect()
    assert rows and all(len(r.feature) == 8 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_feature_extraction_deterministic(spark, sf_dir):
    f1 = {r.media_id: r.feature for r in extract_features(_media(spark, sf_dir)).collect()}
    f2 = {r.media_id: r.feature for r in extract_features(_media(spark, sf_dir)).collect()}
    assert f1 == f2


def test_fake_feature_matches_python_reference(spark, sf_dir):
    row = (
        extract_features(_media(spark, sf_dir).filter("media_id = 1"))
        .collect()[0]
    )
    blob = _media(spark, sf_dir).filter("media_id = 1").collect()[0].content
    assert row.feature == _fake_feature(bytes(blob))
    assert row.n_bytes == len(blob)


def test_codec_probe_reports_every_kind():
    caps = codec_capabilities()
    assert set(caps) == {"image", "audio", "video"}
    assert all(isinstance(v, bool) for v in caps.values())


def test_decode_real_gated_by_probe():
    caps = codec_capabilities()
    if not caps["image"]:
        with pytest.raises(NotImplementedError):
            decode_real(b"\x89PNG", "image")
    else:  # real-codec mode: a 1×1 PNG must decode to the feature contract
        import io

        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.new("L", (1, 1)).save(buf, format="PNG")
        assert len(decode_real(buf.getvalue(), "image")) == 8
    # kinds with no codec anywhere always raise
    if not caps["video"]:
        with pytest.raises(NotImplementedError):
            decode_real(b"\x00\x00\x00 ftypisom", "video")


def test_resize_truncates_and_keeps_schema(spark, sf_dir):
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        RESIZED_SCHEMA,
        resize_media,
    )

    r = resize_media(_media(spark, sf_dir), 8, 4)
    assert r.schema == RESIZED_SCHEMA
    rows = r.collect()
    assert rows and all(len(row.content) <= 32 for row in rows)
    assert all((row.target_w, row.target_h) == (8, 4) for row in rows)


def test_frame_sampling_explodes_videos_only(spark, sf_dir):
    from cybersecurity_ioc_etl_spark.multimodal.columns import sample_frames

    media = _media(spark, sf_dir)
    frames = sample_frames(media, every_n_bytes=16, max_frames=3)
    rows = frames.collect()
    n_videos = media.filter("kind = 'video'").count()
    assert len(rows) > n_videos  # 1 row in → N frame rows out
    assert {r.frame_idx for r in rows} <= {0, 1, 2}
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == list(range(len(v))) for v in per_media.values())


def _ppm_2x1() -> bytes:
    # two pixels: red (255,0,0) and white (255,255,255), with a comment
    return b"P6\n# test\n2 1\n255\n" + bytes([255, 0, 0, 255, 255, 255])


def _bmp_2x2() -> bytes:
    """Hand-assembled 24-bit BI_RGB BMP, 2x2, bottom-up, 2-byte row pad.
    Rows bottom-first: (blue, green) then (red, white) in BGR order."""
    import struct

    stride = 8  # 2*3 rounded up to 4
    px = (
        bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"   # bottom row: blue, green
        + bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"  # top row: red, white
    )
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(px), 0, 0, 0, 0)
    )
    return header + px


def test_native_ppm_decode_is_a_real_decode():
    """decode_real must genuinely parse P6: header comment skipped, RGB
    folded by integer BT.601 luma — NOT the raw-bytes stub feature."""
    from cybersecurity_ioc_etl_spark.multimodal.columns import _fake_feature

    got = decode_real(_ppm_2x1(), "image")
    assert got == _fake_feature(bytes([76, 255]))  # luma(red)=76, luma(white)=255
    assert got != _fake_feature(_ppm_2x1())  # stub-on-raw-bytes differs


def test_native_bmp_decode_flips_rows_and_reorders_bgr():
    from cybersecurity_ioc_etl_spark.multimodal.columns import _fake_feature

    # top-down luma order: red 76, white 255, blue 29, green 149
    assert decode_real(_bmp_2x2(), "image") == _fake_feature(bytes([76, 255, 29, 149]))


def test_native_decoders_reject_malformed_streams():
    import pytest as _pytest

    for junk in (b"P6\n2 1\n70000\n" + b"\x00" * 6,  # maxval > 255
                 b"P6\n2 1\n255\n\xff",               # truncated pixels
                 b"BMxxxx",                            # truncated BMP
                 b"\x89PNG\r\n\x1a\n"):                # no PNG without PIL
        if codec_capabilities()["image"] and junk.startswith(b"\x89PNG"):
            continue  # PIL present: PNG is decodable, skip that probe
        with _pytest.raises(NotImplementedError):
            decode_real(junk, "image")


def test_extract_features_runs_native_decode_through_spark(spark):
    """The real-decode path must work THROUGH the Arrow/mapInPandas stage:
    a PPM blob shipped to executors comes back with the decoded-luma
    feature, while a non-image blob still takes the stub path."""
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        MEDIA_SCHEMA,
        _fake_feature,
        extract_features,
    )

    rows = [
        (1, "image", bytearray(_ppm_2x1()), ("image/x-portable-pixmap", 2, 1, None)),
        (2, "audio", bytearray(b"\x01\x02\x03"), ("application/octet-stream", None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: list(r.feature) for r in extract_features(media).collect()}
    assert got[1] == _fake_feature(bytes([76, 255]))
    assert got[2] == _fake_feature(b"\x01\x02\x03")


def _png(width, height, color_type, rows_with_filters, channels):
    """Minimal PNG builder: raw scanlines are (filter_type, channel
    bytes BEFORE filtering is undone) — i.e. already-filtered data, so
    tests can exercise each reconstruction branch."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(line) for f, line in rows_with_filters)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_native_png_decode_unfiltered_rgb():
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        _fake_feature,
        decode_real,
    )

    # 2x2 RGB, all rows filter 0: red green / blue white
    png = _png(2, 2, 2, [
        (0, [255, 0, 0, 0, 255, 0]),
        (0, [0, 0, 255, 255, 255, 255]),
    ], 3)
    # BT.601 luma of the four pixels, top-down
    assert decode_real(png, "image") == _fake_feature(bytes([76, 149, 29, 255]))


def test_native_png_decode_reconstructs_all_filters():
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        _fake_feature,
        decode_real,
    )

    # grayscale 4x4 with one row per filter type: the decoder must undo
    # Sub, Up, Average, and Paeth to recover the plain ramp 0..15
    want = bytes(range(16))
    # row0 ramp via Sub: first byte literal, rest deltas of 1
    r0 = (1, [0, 1, 1, 1])
    # row1 via Up: deltas vs row0 are all 4
    r1 = (2, [4, 4, 4, 4])
    # row2 via Average: x - (left + up)//2
    row2, row1v = [8, 9, 10, 11], [4, 5, 6, 7]
    avg = []
    for i in range(4):
        left = row2[i - 1] if i else 0
        avg.append((row2[i] - ((left + row1v[i]) >> 1)) & 0xFF)
    r2 = (3, avg)
    # row3 via Paeth
    row3 = [12, 13, 14, 15]
    pae = []
    for i in range(4):
        a = row3[i - 1] if i else 0
        b = row2[i]
        c = row2[i - 1] if i else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        pae.append((row3[i] - pred) & 0xFF)
    r3 = (4, pae)
    png = _png(4, 4, 0, [r0, r1, r2, r3], 1)
    assert decode_real(png, "image") == _fake_feature(want)


def test_native_png_rejects_unsupported_flavors():
    import pytest as _pytest

    from cybersecurity_ioc_etl_spark.multimodal.columns import _decode_png, decode_real

    assert _decode_png(b"\x89PNG\r\n\x1a\njunk") is None
    assert _decode_png(b"not a png") is None
    with _pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40, "image")


def _wav(samples, width=2, nch=1, rate=8000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 1:
            wf.writeframes(bytes(samples))
        else:
            wf.writeframes(
                b"".join(int(s).to_bytes(2, "little", signed=True) for s in samples)
            )
    return buf.getvalue()


def test_native_wav_decode_16bit_mono():
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        _fake_feature,
        decode_real,
    )

    # 16-bit samples fold to unsigned high bytes: -32768→0, 0→128, 32512→255
    wav = _wav([-32768, 0, 32512, 256])
    assert decode_real(wav, "audio") == _fake_feature(bytes([0, 128, 255, 129]))


def test_native_wav_decode_stereo_averages_channels():
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        _fake_feature,
        decode_real,
    )

    # L/R pairs average per frame: (0,255)→127, (10,20)→15 (8-bit PCM)
    wav = _wav([0, 255, 10, 20], width=1, nch=2)
    assert decode_real(wav, "audio") == _fake_feature(bytes([127, 15]))


def test_native_wav_rejects_non_riff():
    import pytest as _pytest

    from cybersecurity_ioc_etl_spark.multimodal.columns import _decode_wav, decode_real

    assert _decode_wav(b"not audio at all") is None
    with _pytest.raises(NotImplementedError):
        decode_real(b"RIFFxxxxWAVEbroken", "audio")


def _y4m(w, h, y_planes, cs=b"420jpeg"):
    """Minimal YUV4MPEG2 builder: given Y planes, pads chroma with 0x80."""
    csz = {b"4": w * h // 2, b"m": 0}[cs[:1] if cs[:1] == b"m" else b"4"]
    hdr = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n" % (w, h, cs)
    body = b"".join(
        b"FRAME\n" + bytes(y) + b"\x80" * csz for y in y_planes
    )
    return hdr + body


def test_native_y4m_decode_extracts_luma_planes():
    """decode_real must genuinely parse Y4M: header W/H/C, per-FRAME
    markers, Y plane kept, chroma planes skipped, frames concatenated."""
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        _decode_y4m,
        _fake_feature,
        decode_real,
    )

    y0, y1 = bytes([10, 20, 30, 40]), bytes([50, 60, 70, 80])
    blob = _y4m(2, 2, [y0, y1])
    assert _decode_y4m(blob) == [y0, y1]
    assert decode_real(blob, "video") == _fake_feature(y0 + y1)
    # mono layout: no chroma at all
    mono = _y4m(2, 2, [y0], cs=b"mono")
    assert _decode_y4m(mono) == [y0]


def test_native_y4m_rejects_malformed_streams():
    import pytest as _pytest

    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        _decode_y4m,
        decode_real,
    )

    assert _decode_y4m(b"\x00\x00\x00 ftypisom") is None  # mp4, not y4m
    assert _decode_y4m(b"YUV4MPEG2 W2 H2\nFRAME\n\x01\x02") is None  # short
    assert _decode_y4m(b"YUV4MPEG2 W2 H2 C999\nFRAME\n") is None  # bad cs
    with _pytest.raises(NotImplementedError):
        decode_real(b"YUV4MPEG2 W2 H2\ngarbage", "video")


def test_frame_sampling_decodes_real_y4m_frames(spark):
    """sample_frames through the REAL mapInPandas UDTF: a Y4M blob must
    yield its decoded Y planes (not byte slices), capped at max_frames,
    while a non-Y4M video blob still takes the stride-slice stub."""
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    planes = [bytes([i] * 4) for i in range(6)]
    meta = ("video/x-yuv4mpeg", 2, 2, None)
    rows = [
        (1, "video", bytearray(_y4m(2, 2, planes)), meta),
        (2, "video", bytearray(b"\xffnotyuv" * 20), meta),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {}
    for r in sample_frames(media, every_n_bytes=64, max_frames=4).collect():
        got.setdefault(r.media_id, []).append((r.frame_idx, bytes(r.frame)))
    assert sorted(got[1]) == [(i, planes[i]) for i in range(4)]  # capped
    stub = bytes(b"\xffnotyuv" * 20)
    assert sorted(got[2]) == [(i, stub[i * 64 : (i + 1) * 64]) for i in range(2)]


def test_extract_features_decodes_video_natively(spark):
    """extract_features end-to-end on a Y4M blob: the feature must come
    from the decoded luma planes, not the container bytes."""
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        MEDIA_SCHEMA,
        _fake_feature,
        extract_features,
    )

    y = bytes(range(4))
    blob = _y4m(2, 2, [y])
    rows = [(7, "video", bytearray(blob), ("video/x-yuv4mpeg", 2, 2, None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    (row,) = extract_features(media).collect()
    assert list(row.feature) == _fake_feature(y)
    assert row.n_bytes == len(blob)


def test_synthesized_wav_roundtrips_through_native_decoder(spark):
    """synthesize_wav_audio emits genuine RIFF/WAVE blobs: the native
    stdlib decoder must recover exactly the padded text bytes (8-bit
    mono PCM decode is the identity on the data chunk)."""
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        _AU_N,
        _decode_wav,
        synthesize_wav_audio,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 500)], "doc_id long, text string"
    )
    rows = {r["media_id"]: bytes(r["content"])
            for r in synthesize_wav_audio(docs).collect()}
    got = _decode_wav(rows[1])
    want = ("hello world" + "x" * (_AU_N - 11)).encode()
    assert got == want
    assert _decode_wav(rows[2]) == b"x" * _AU_N


def test_synthesized_y4m_roundtrips_through_native_decoder(spark):
    """synthesize_y4m_videos emits genuine Y4M streams: the native
    decoder must recover the four 64-byte Y planes exactly."""
    from cybersecurity_ioc_etl_spark.multimodal.columns import (
        _decode_y4m,
        _VID_CHARS,
        synthesize_y4m_videos,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "y" * 300)], "doc_id long, text string"
    )
    rows = {r["media_id"]: bytes(r["content"])
            for r in synthesize_y4m_videos(docs).collect()}
    pad = ("abc" + "x" * (_VID_CHARS - 3)).encode()
    frames = _decode_y4m(rows[1])
    assert [bytes(f) for f in frames] == [
        pad[i * 64:(i + 1) * 64] for i in range(4)
    ]
    assert all(bytes(f) == b"y" * 64 for f in _decode_y4m(rows[2]))
