"""Multimodal column plumbing — north-star extension.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct.  The Spark-side machinery (schema, Arrow-batched mapInPandas,
batch shapes, partition sizing) is real and tested.  Decoding is
real where pure Python can be: native decoders cover P6 PPM, 24-bit
BMP, non-interlaced 8-bit PNG (stdlib zlib), RIFF/WAVE PCM (stdlib
wave), and YUV4MPEG2 video — all four media kinds decode without any
imaging library.  Compressed formats beyond that set use PIL/pyav when
the capability probe finds them, else ``_fake_feature`` derives
deterministic stand-in features from the raw bytes (the oracle-checked
columns flow through either way).

Scale notes: mapInPandas streams Arrow batches, so a 100 TB media corpus
is processed at (batch_rows × avg_blob) memory per task — control it with
``spark.sql.execution.arrow.maxRecordsPerBatch`` and keep blobs under the
task-size budget by storing media chunked with a manifest table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..operators.registry import query
from ..sources.readers import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table from `documents`: the utf-8 text
    bytes stand in for an encoded blob.  Exercises the real binary-column
    path end to end."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _probe_codecs() -> dict[str, bool]:
    """Capability probe: which media kinds have a real codec importable
    on THIS interpreter.  Runs once per process (module import) on both
    driver and executors — a heterogeneous cluster where only some
    executors have PIL would silently mix modes, so deployments should
    pin images with the codec baked in (the probe result is also
    surfaced via ``codec_capabilities()`` for a startup assertion)."""
    caps = {}
    try:  # pillow → images
        import PIL.Image  # noqa: F401

        caps["image"] = True
    except ImportError:
        caps["image"] = False
    try:  # pyav → video/audio containers
        import av  # noqa: F401

        caps["video"] = caps["audio"] = True
    except ImportError:
        caps["video"] = caps["audio"] = False
    return caps


_CODECS = _probe_codecs()


def codec_capabilities() -> dict[str, bool]:
    """Snapshot of the per-kind codec availability probe."""
    return dict(_CODECS)


def _luma(r: int, g: int, b: int) -> int:
    """Integer BT.601 luma — the deterministic RGB→grayscale fold used by
    both native decoders (no floats, so executor-identical everywhere)."""
    return (r * 299 + g * 587 + b * 114) // 1000


def _decode_ppm(content: bytes) -> bytes | None:
    """Native decoder for binary PPM (P6, maxval ≤ 255): pure-Python
    header parse + RGB→luma, no imaging library.  Returns grayscale
    bytes, or None when `content` is not a well-formed P6 stream."""
    if not content.startswith(b"P6"):
        return None
    # header = magic + 3 ASCII integers (w, h, maxval), '#' comments
    # allowed between tokens, single whitespace byte after maxval
    pos, fields = 2, []
    try:
        while len(fields) < 3:
            while content[pos : pos + 1].isspace():
                pos += 1
            if content[pos : pos + 1] == b"#":
                pos = content.index(b"\n", pos) + 1
                continue
            start = pos
            while not content[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(content[start:pos]))
        pos += 1  # the single whitespace terminating the header
        w, h, maxval = fields
        if w <= 0 or h <= 0 or not 0 < maxval <= 255:
            return None
        px = content[pos : pos + 3 * w * h]
        if len(px) != 3 * w * h:
            return None
        return bytes(
            _luma(px[i], px[i + 1], px[i + 2]) for i in range(0, len(px), 3)
        )
    except (ValueError, IndexError):
        return None


def _decode_bmp(content: bytes) -> bytes | None:
    """Native decoder for uncompressed 24-bit BMP (BI_RGB): header-field
    parse + bottom-up row flip + BGR→luma.  Returns grayscale bytes in
    top-down row order, or None for any other BMP flavor."""
    import struct

    if len(content) < 54 or not content.startswith(b"BM"):
        return None
    try:
        (px_off,) = struct.unpack_from("<I", content, 10)
        w, h = struct.unpack_from("<ii", content, 18)
        (bpp,) = struct.unpack_from("<H", content, 28)
        (compression,) = struct.unpack_from("<I", content, 30)
    except struct.error:
        return None
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if len(content) < px_off + stride * h:
        return None
    rows = range(h) if top_down else range(h - 1, -1, -1)
    out = bytearray()
    for r in rows:
        base = px_off + r * stride
        for c in range(w):
            b, g, rr = content[base + 3 * c : base + 3 * c + 3]
            out.append(_luma(rr, g, b))
    return bytes(out)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(content: bytes) -> bytes | None:
    """Native decoder for non-interlaced 8-bit PNG (grayscale, gray+α,
    RGB, RGBA): chunk walk → concatenated-IDAT zlib inflate (stdlib) →
    per-scanline filter reconstruction (None/Sub/Up/Average/Paeth, the
    full spec set) → luma fold.  Returns top-down grayscale bytes, or
    None for palette/16-bit/interlaced streams (PIL handles those when
    present)."""
    import struct
    import zlib

    if not content.startswith(_PNG_SIG):
        return None
    pos, w = len(_PNG_SIG), 0
    h = bit_depth = color = interlace = None
    idat = bytearray()
    try:
        while pos + 8 <= len(content):
            (length,) = struct.unpack_from(">I", content, pos)
            ctype = content[pos + 4 : pos + 8]
            data = content[pos + 8 : pos + 8 + length]
            if len(data) < length:
                return None
            if ctype == b"IHDR":
                w, h, bit_depth, color, _, _, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if not idat or h is None or bit_depth != 8 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
        if channels is None or w <= 0 or h <= 0:
            return None
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error):
        return None
    stride = w * channels
    if len(raw) < h * (stride + 1):
        return None
    out = bytearray()
    prev = bytearray(stride)
    off = 0
    for _ in range(h):
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            return None
        prev = line
        for x in range(w):
            px = line[x * channels : (x + 1) * channels]
            if channels == 1:
                out.append(px[0])
            elif channels == 2:  # gray + alpha
                out.append(px[0])
            else:  # RGB / RGBA — alpha ignored for luma
                out.append(_luma(px[0], px[1], px[2]))
    return bytes(out)


def _decode_wav(content: bytes) -> bytes | None:
    """Native decoder for RIFF/WAVE PCM audio (8- and 16-bit, any
    channel count) via the stdlib ``wave`` module: frames → mono-folded
    8-bit amplitude bytes (16-bit samples take the high byte offset to
    unsigned), so audio features share the byte-fold contract with the
    image decoders.  Returns None for non-WAV or compressed streams."""
    import io
    import wave

    if not (content[:4] == b"RIFF" and content[8:12] == b"WAVE"):
        return None
    try:
        with wave.open(io.BytesIO(content)) as wf:
            width = wf.getsampwidth()
            nch = wf.getnchannels()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError):
        return None
    if width not in (1, 2) or nch < 1:
        return None
    out = bytearray()
    step = width * nch
    for off in range(0, len(frames) - step + 1, step):
        acc = 0
        for ch in range(nch):
            base = off + ch * width
            if width == 1:
                acc += frames[base]  # already unsigned 8-bit
            else:  # 16-bit little-endian signed → unsigned high byte
                s = int.from_bytes(
                    frames[base : base + 2], "little", signed=True
                )
                acc += (s >> 8) + 128
        out.append(acc // nch)
    return bytes(out)


def _decode_y4m(content: bytes) -> list[bytes] | None:
    """Native decoder for YUV4MPEG2 (Y4M) video — the uncompressed
    container mplayer/ffmpeg emit for raw frame pipelines: ASCII stream
    header (W/H/C parameters), then per-frame ``FRAME\\n`` markers each
    followed by fixed-size planar YUV data.  Returns the list of
    per-frame Y (luma) planes — already the grayscale contract the
    image decoders produce — or None for non-Y4M / truncated streams.
    Supported colorspaces: C420* (all chroma sitings share the 3/2
    layout), C422, C444, Cmono."""
    if not content.startswith(b"YUV4MPEG2"):
        return None
    hdr_end = content.find(b"\n")
    if hdr_end < 0:
        return None
    w = h = 0
    cs = "420"
    try:
        for tok in content[9:hdr_end].split(b" "):
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
            elif tok[:1] == b"C":
                cs = tok[1:].decode("ascii", "replace")
    except ValueError:
        return None
    if w <= 0 or h <= 0:
        return None
    ysz = w * h
    if cs.startswith("420"):
        fsz = ysz * 3 // 2
    elif cs.startswith("422"):
        fsz = ysz * 2
    elif cs.startswith("444"):
        fsz = ysz * 3
    elif cs.startswith("mono"):
        fsz = ysz
    else:
        return None
    frames: list[bytes] = []
    pos = hdr_end + 1
    while pos < len(content):
        if not content.startswith(b"FRAME", pos):
            return None
        nl = content.find(b"\n", pos)
        if nl < 0:
            return None
        data = content[nl + 1 : nl + 1 + fsz]
        if len(data) != fsz:
            return None
        frames.append(bytes(data[:ysz]))  # Y plane only
        pos = nl + 1 + fsz
    return frames or None


def decode_real(content: bytes, kind: str, dim: int = 8) -> list[float]:
    """Real decode path: PIL when the probe finds it, else/and the
    pure-Python native decoders — uncompressed image formats (P6 PPM,
    24-bit BI_RGB BMP), non-interlaced 8-bit PNG (stdlib zlib inflate +
    the full filter set), RIFF/WAVE PCM audio (stdlib wave), and
    YUV4MPEG2 (Y4M) video (per-frame Y planes) — so a GENUINE decode,
    including a real DEFLATE stream, runs even in this codec-less
    container.  Either way the decoded bytes fold to ``dim`` doubles
    under the same output contract as ``_fake_feature``.  Raises
    NotImplementedError when nothing can decode `kind`/`content`
    (formats beyond the native set without PIL/pyav).

    The native WAV/Y4M attempts are NOT gated on the pyav probe: there
    is no pyav branch here yet, so gating would make a pyav install
    silently REGRESS decodable streams to NotImplementedError (r5
    ADVICE).  A future pyav path should be PREFERRED before these, not
    replace them."""
    if kind == "audio":
        raw = _decode_wav(content)
        if raw is not None:
            return _fake_feature(raw, dim)
    if kind == "video":
        frames = _decode_y4m(content)
        if frames is not None:
            return _fake_feature(b"".join(frames), dim)
    if kind == "image":
        raw = None
        if _CODECS["image"]:
            import io

            import PIL.Image

            with PIL.Image.open(io.BytesIO(content)) as img:
                raw = img.convert("L").tobytes()
        if raw is None:
            raw = _decode_ppm(content) or _decode_bmp(content) or _decode_png(content)
        if raw is not None:
            return _fake_feature(raw, dim)
    raise NotImplementedError(
        f"no codec for kind={kind!r} and content is not a natively "
        f"decodable format (capabilities={_CODECS}); install PIL/pyav "
        "and the probe activates the full path with extract_features "
        "unchanged"
    )


def _fake_feature(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte-histogram moments folded to
    `dim` doubles.  Replaces decode_real in tests."""
    if not blob:
        return [0.0] * dim
    out = []
    n = len(blob)
    for d in range(dim):
        acc = 0
        for i in range(d, n, dim):
            acc = (acc + blob[i]) % 100003
        out.append(acc / 100003.0)
    return out


def extract_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs via mapInPandas.

    The UDF boundary is the *only* Python in the pipeline; everything
    before (scan/filter/partition) and after (joins with features) stays
    JVM-side.  The per-kind codec probe picks decode_real when the
    library exists on the executor, else the deterministic stub — same
    signature and batch shape either way, so the oracle-checked columns
    (counts/bytes, which flow THROUGH this stage) pass in both modes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feat(blob: bytes, kind: str) -> list[float]:
            # every kind attempts the real path first — the native
            # PPM/BMP/PNG/WAV/Y4M decoders need no library at all
            try:
                return decode_real(bytes(blob), kind)
            except Exception:
                return _fake_feature(bytes(blob))  # undecodable blob

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len),
                    "feature": [
                        feat(b, k) for b, k in zip(pdf["content"], pdf["kind"])
                    ],
                }
            )

    # NULL blobs never cross the Python boundary — len(None)/bytes(None)
    # would kill the worker for rows that carry nothing to extract
    return media.filter(F.col("content").isNotNull()).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


@query(
    "media_byte_profile",
    oracle="""
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  COUNT(*) AS n_media,
  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
WHERE text IS NOT NULL  -- mirrors the JVM-side null-blob filter
GROUP BY 1
""",
)
def q_media_byte_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline profile: synthesize binary media from
    `documents`, run the REAL Arrow/mapInPandas feature-extraction stage,
    aggregate per media kind.  The oracle checks the columns DuckDB can
    derive (counts + byte sizes flow THROUGH the Python stage, so a batch
    -shape or schema bug upstream breaks parity); feature values are
    covered by tests/test_multimodal.py."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


@query(
    "media_dedup_groups",
    oracle="""
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  COUNT(*) AS n_blobs,
  COUNT(DISTINCT md5(text)) AS n_distinct,
  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dup_copies
FROM documents
GROUP BY 1
""",
)
def q_media_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of binary media by content hash, per kind — the first
    pass every multimodal training pipeline runs (byte-identical images/
    clips are the bulk of web-scale duplication).  md5 runs JVM-side on
    the binary column (no Python, no decode); at 100 TB the distinct
    count is the same map-side-combined hash agg as text dedup.  The
    synthesized blob is the utf-8 text bytes, so the oracle hashes the
    string form — ASCII fixture text makes them byte-identical."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy("kind").agg(
        F.count("*").alias("n_blobs"),
        F.countDistinct(F.md5("content")).alias("n_distinct"),
        (F.count("*") - F.countDistinct(F.md5("content"))).alias("n_dup_copies"),
    )


@query(
    "frame_dedup_profile",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_frames,
  COUNT(DISTINCT md5(frame_txt)) AS n_distinct_frames,
  CAST(MAX(length(frame_txt)) AS BIGINT) AS max_frame_bytes
FROM (
  SELECT substring(d.text, CAST(f.i AS INTEGER) * 64 + 1, 64) AS frame_txt
  FROM documents d,
       unnest(range(0, least(4, greatest(1, length(d.text) // 64)))) AS f(i)
  -- text IS NOT NULL mirrors the JVM-side null-blob filter; without it
  -- DuckDB's greatest() skips the NULL length and invents one NULL frame
  WHERE d.doc_id % 3 = 2 AND d.text IS NOT NULL
)
""",
)
def q_frame_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level dedup profile: sample frames from every video blob via
    the REAL mapInPandas UDTF stage (1 blob → N frame rows), hash each
    frame JVM-side, count global and distinct frames.  The oracle
    re-derives the fixed-stride byte slices with string functions (ASCII
    fixture ⇒ char slicing == byte slicing), so a batching or slicing
    bug in the Python stage breaks parity — this is the strongest check
    a stubbed codec path can get."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.countDistinct(F.md5("frame")).alias("n_distinct_frames"),
        F.max(F.length("frame")).cast("long").alias("max_frame_bytes"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("target_w", T.IntegerType(), False),
        T.StructField("target_h", T.IntegerType(), False),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage (images): same mapInPandas plumbing as
    extract_features.  STUB transform — no codec in this container, so
    the 'resized' blob is a deterministic truncation to w*h bytes; a
    real deployment decodes with PIL, resizes, re-encodes in place.
    The Spark-side contract (binary in → binary out, schema, batch
    shape, partition inheritance) is what this exercises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": pdf["content"].map(
                        lambda b: bytes(b)[: width * height] or b"\x00"
                    ),
                    "target_w": width,
                    "target_h": height,
                }
            )

    return media.filter(F.col("content").isNotNull()).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame sampling (video): 1 row in → N frame rows out through
    mapInPandas (the UDTF shape).  Real-decode-first: a blob that
    parses as YUV4MPEG2 yields its ACTUAL decoded Y planes (first
    ``max_frames`` — a real deployment adds pyav keyframe seeks for
    compressed containers); anything else falls back to the
    deterministic fixed-stride byte slices (what the synthesized
    fixture exercises, and what the frame_dedup_profile oracle
    re-derives).  Output explodes, so downstream per-frame work
    parallelizes beyond the source row count."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                b = bytes(blob)
                decoded = _decode_y4m(b)
                if decoded is not None:
                    for i, y in enumerate(decoded[:max_frames]):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(y)
                    continue
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.filter(
        (F.col("kind") == "video") & F.col("content").isNotNull()
    ).mapInPandas(run, schema=FRAME_SCHEMA)



# ---------------------------------------------------------------------------
# Perceptual hashing (dHash) THROUGH the native decode path — the oracle
# re-derives every bit, so it validates the decoder itself
# ---------------------------------------------------------------------------

_PH_W, _PH_H = 9, 8  # dHash grid == image dims: no resample stage needed
_PH_BYTES = 3 * _PH_W * _PH_H  # 216 RGB bytes per synthesized P6 image

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash_hi", T.LongType(), False),
        T.StructField("dhash_lo", T.LongType(), False),
    ]
)


def synthesize_ppm_images(documents: DataFrame) -> DataFrame:
    """Deterministic REAL P6 PPM blobs: each document's first 216 ASCII
    bytes (x-padded) become a 9x8 RGB pixel buffer behind a genuine PPM
    header — so the native decoder exercises its actual parse path.
    Docs whose text is not pure single-byte ASCII are excluded (char
    slicing must equal byte slicing for the SQL oracle to re-derive
    pixels)."""
    ascii_only = F.length(F.encode(F.col("text"), "utf-8")) == F.length(
        F.col("text")
    )
    px = F.encode(
        F.rpad(F.substring(F.col("text"), 1, _PH_BYTES), _PH_BYTES, "x"),
        "utf-8",
    )
    header = F.lit(f"P6\n{_PH_W} {_PH_H}\n255\n".encode())
    return (
        documents.filter(F.col("text").isNotNull() & ascii_only)
        .select(
            F.col("doc_id").alias("media_id"),
            F.concat(header, px).alias("content"),
        )
    )


def perceptual_hash(media: DataFrame) -> DataFrame:
    """dHash over the REAL decode path: mapInPandas batches feed
    _decode_ppm (header parse + BT.601 integer luma), then each bit
    compares horizontally adjacent luma samples — 8 rows x 8 bits,
    split into two uint32 halves so both engines stay in signed int64.
    A decoder regression (header skip, row order, luma coefficients)
    flips bits and breaks the value hash downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "dhash_hi": [], "dhash_lo": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                lum = _decode_ppm(bytes(blob))
                if lum is None or len(lum) != _PH_W * _PH_H:
                    continue
                bits = 0
                for r in range(_PH_H):
                    for c in range(_PH_W - 1):
                        if lum[r * _PH_W + c] > lum[r * _PH_W + c + 1]:
                            bits |= 1 << (r * (_PH_W - 1) + c)
                out["media_id"].append(int(mid))
                out["dhash_hi"].append(bits >> 32)
                out["dhash_lo"].append(bits & 0xFFFFFFFF)
            yield pd.DataFrame(out, columns=list(DHASH_SCHEMA.names))

    return media.filter(F.col("content").isNotNull()).mapInPandas(
        run, schema=DHASH_SCHEMA
    )


def _dhash_hashes_cte(where: str = "") -> str:
    """DuckDB CTE chain re-deriving the per-doc 64-bit dHash from raw
    character codes (shared by the groups and pairs oracles)."""
    return f"""px AS (
  SELECT doc_id,
    rpad(substring(text, 1, {_PH_BYTES}), {_PH_BYTES}, 'x') AS p
  FROM documents
  WHERE text IS NOT NULL AND strlen(text) = length(text){where}
),
lum AS (  -- BT.601 integer luma of pixel i (0-based), from char codes
  SELECT doc_id, CAST(g.i AS BIGINT) AS i,
    (ord(substring(p, CAST(3 * g.i + 1 AS INTEGER), 1)) * 299
   + ord(substring(p, CAST(3 * g.i + 2 AS INTEGER), 1)) * 587
   + ord(substring(p, CAST(3 * g.i + 3 AS INTEGER), 1)) * 114) // 1000
      AS y
  FROM px, range(0, {_PH_W * _PH_H}) g(i)
),
bits AS (
  SELECT a.doc_id,
    (a.i // {_PH_W}) * {_PH_W - 1} + (a.i % {_PH_W}) AS bitpos,
    CASE WHEN a.y > b.y THEN 1 ELSE 0 END AS bit
  FROM lum a JOIN lum b
    ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.i % {_PH_W} < {_PH_W - 1}
),
hashes AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN bitpos >= 32 THEN bit * (1 << (bitpos - 32))
             ELSE 0 END) AS BIGINT) AS dhash_hi,
    CAST(SUM(CASE WHEN bitpos < 32 THEN bit * (1 << bitpos)
             ELSE 0 END) AS BIGINT) AS dhash_lo
  FROM bits GROUP BY doc_id
)"""


_DHASH_ORACLE = f"""
WITH {_dhash_hashes_cte()}
SELECT dhash_hi, dhash_lo,
  CAST(COUNT(*) AS BIGINT) AS n_images,
  MIN(doc_id) AS example_media_id
FROM hashes
GROUP BY 1, 2
ORDER BY n_images DESC, dhash_hi, dhash_lo
LIMIT 20
"""


@query("media_dhash_groups", oracle=_DHASH_ORACLE)
def q_media_dhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup grouping of images by difference hash —
    byte-identical dedup (media_dedup_groups) misses a re-encoded or
    slightly-corrupted copy; dHash (adjacent-luma gradient signs) is
    the standard first perceptual pass.  The pipeline is REAL end to
    end: a genuine P6 PPM blob per document, the native decoder's
    actual header parse + BT.601 luma, Arrow-batched mapInPandas, then
    the 64-bit hash split into two int32 halves.  The ORACLE re-derives
    every bit from raw character codes — so a decoder regression
    (header handling, row order, luma coefficients, batch shape) breaks
    the value hash: this is the strongest correctness check any decode
    path in the engine has.

    Scale shape: decode+hash is a narrow Arrow-batched map (no shuffle
    until the 8-byte hash aggregates); grouping shuffles hashes, never
    pixels; top-20 is TakeOrderedAndProject.  Hamming-banded candidate
    pairs over these hashes reuse the simhash banding machinery
    unchanged (same 64-bit signature shape)."""
    d = load_table(spark, sf_dir, "documents")
    hashes = perceptual_hash(synthesize_ppm_images(d))
    return (
        hashes.groupBy("dhash_hi", "dhash_lo")
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.min("media_id").alias("example_media_id"),
        )
        .orderBy(F.col("n_images").desc(), "dhash_hi", "dhash_lo")
        .limit(20)
    )


_DH_HAMMING_T = 7
_DH_BANDS = 8  # > _DH_HAMMING_T: pigeonhole guarantees no missed pair
_DH_BAND_W = 64 // _DH_BANDS  # 8 bits per band across the hi/lo halves


def _dh_band_bits(hi: Column, lo: Column, k: int) -> Column:
    """Band k (0-based from the low end) of the 64-bit hash stored as
    two uint32 halves: bands 0-3 slice ``lo``, bands 4-7 slice ``hi``."""
    src = lo if k < _DH_BANDS // 2 else hi
    shift = (k % (_DH_BANDS // 2)) * _DH_BAND_W
    return F.shiftright(src, shift).bitwiseAND(F.lit((1 << _DH_BAND_W) - 1))


def dhash_banded_candidates(hashes: DataFrame) -> DataFrame:
    """Candidate pairs via 8-band pigeonhole LSH over 64-bit dHashes —
    the simhash banding idiom (operators/dedup.py::
    simhash_banded_candidates) re-instantiated at perceptual-hash width:
    any pair within Hamming ≤ 7 differs in ≤ 7 of the 8 disjoint bytes,
    so at least one byte-band matches and the pair collides there.
    Pair generation shuffles n·8 tiny (band, byte) rows instead of the
    n² θ-join; each pair is emitted only from the FIRST band where the
    two hashes agree, so multi-band collisions never duplicate and no
    post-join dedup aggregate is needed."""
    banded = hashes.select(
        "media_id",
        "dhash_hi",
        "dhash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        _dh_band_bits(
                            F.col("dhash_hi"), F.col("dhash_lo"), k
                        ).alias("bits"),
                    )
                    for k in range(_DH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "dhash_hi", "dhash_lo", "bk.band", "bk.bits")
    a, b = banded.alias("a"), banded.alias("b")
    first_band = F.coalesce(
        *[
            F.when(
                _dh_band_bits(F.col("a.dhash_hi"), F.col("a.dhash_lo"), k)
                == _dh_band_bits(F.col("b.dhash_hi"), F.col("b.dhash_lo"), k),
                F.lit(k),
            )
            for k in range(_DH_BANDS)
        ]
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .filter(F.col("a.band") == first_band)
        .select(
            F.col("a.media_id").alias("doc_a"),
            F.col("b.media_id").alias("doc_b"),
            F.col("a.dhash_hi").alias("hi_a"),
            F.col("a.dhash_lo").alias("lo_a"),
            F.col("b.dhash_hi").alias("hi_b"),
            F.col("b.dhash_lo").alias("lo_b"),
        )
    )


_DHASH_PAIRS_ORACLE = f"""
WITH {_dhash_hashes_cte(" AND doc_id < 600")}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.dhash_hi, b.dhash_hi))
     + bit_count(xor(a.dhash_lo, b.dhash_lo)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
    + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= {_DH_HAMMING_T}
"""


@query("media_dhash_neardup_pairs", oracle=_DHASH_PAIRS_ORACLE)
def q_media_dhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate IMAGE pairs: Hamming ≤ 7 over the
    64-bit dHash, through the real decode path — catches the
    re-encoded / slightly-corrupted copies that byte-identical
    media_dedup_groups misses (the fixture yields distances 1-7, not
    just hash-equal clones).  The oracle states the spec as the exact
    all-pairs O(n²) join over hashes it re-derives from character
    codes; the Spark plan is the scale shape — 8 disjoint byte-bands,
    candidates only from shared (band, byte) buckets (pigeonhole: ≤ 7
    differing bits cannot break all 8 bands), then the exact popcount
    filter.  This is multi-index hashing (Norouzi et al.) stated
    honestly: 8-bit bands give 256 buckets per band, a CONSTANT-FACTOR
    candidate prune (measured 3.7× on this skewed fixture,
    tools/dhash_probe.py) with a verify that is one JVM popcount per
    candidate — the probe holds 341M candidates to 5.2 s.  The
    exponential-prune scale path is a WIDER perceptual hash (256-bit
    pHash → 2^32 buckets per byte-band) on this exact machinery.
    Input bounded to doc_id < 600 purely so the all-pairs ORACLE
    stays feasible."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    hashes = perceptual_hash(synthesize_ppm_images(d))
    cand = dhash_banded_candidates(hashes)
    hamming = F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    ) + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    return cand.filter(hamming <= _DH_HAMMING_T).select(
        "doc_a", "doc_b", hamming.cast("bigint").alias("hamming")
    )


# ---------------------------------------------------------------------------
# Audio feature extraction through the REAL WAV decode path
# ---------------------------------------------------------------------------

_AU_N = 192  # samples per synthesized clip
_AU_FRAME = 16  # samples per analysis frame -> 12 frames per clip

# constant 44-byte RIFF/WAVE header: PCM, mono, 8-bit, 8 kHz, N samples
import struct as _struct

_WAV_HEADER = (
    b"RIFF"
    + _struct.pack("<I", 36 + _AU_N)
    + b"WAVE"
    + b"fmt "
    + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    + b"data"
    + _struct.pack("<I", _AU_N)
)

RMS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame", T.LongType(), False),
        T.StructField("energy_i", T.LongType(), False),
    ]
)


def synthesize_wav_audio(documents: DataFrame) -> DataFrame:
    """Deterministic REAL RIFF/WAVE blobs: each document's first 192
    ASCII bytes (x-padded) become unsigned 8-bit PCM samples behind a
    genuine constant 44-byte header — so the native ``wave`` decoder
    exercises its actual parse path (the audio twin of
    synthesize_ppm_images)."""
    ascii_only = F.length(F.encode(F.col("text"), "utf-8")) == F.length(
        F.col("text")
    )
    pcm = F.encode(
        F.rpad(F.substring(F.col("text"), 1, _AU_N), _AU_N, "x"), "utf-8"
    )
    return documents.filter(F.col("text").isNotNull() & ascii_only).select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit(_WAV_HEADER), pcm).alias("content"),
    )


def frame_energies(media: DataFrame) -> DataFrame:
    """Per-frame integer energy Σ(s−128)² over the REAL decode path:
    mapInPandas batches feed _decode_wav (RIFF parse + mono fold), then
    each 16-sample frame folds to one exact int — features leave the
    Python stage as (media_id, frame, energy) rows, so everything
    downstream is JVM aggregation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame": [], "energy_i": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                samples = _decode_wav(bytes(blob))
                if samples is None:
                    continue
                for f in range(len(samples) // _AU_FRAME):
                    chunk = samples[f * _AU_FRAME : (f + 1) * _AU_FRAME]
                    out["media_id"].append(int(mid))
                    out["frame"].append(f)
                    out["energy_i"].append(
                        sum((s - 128) * (s - 128) for s in chunk)
                    )
            yield pd.DataFrame(out, columns=list(RMS_SCHEMA.names))

    return media.filter(F.col("content").isNotNull()).mapInPandas(
        run, schema=RMS_SCHEMA
    )


_AUDIO_RMS_ORACLE = f"""
WITH px AS (
  SELECT doc_id, rpad(substring(text, 1, {_AU_N}), {_AU_N}, 'x') AS p
  FROM documents
  WHERE text IS NOT NULL AND strlen(text) = length(text)
),
samp AS (
  SELECT doc_id, CAST(g.i AS BIGINT) AS i,
    ord(substring(p, CAST(g.i + 1 AS INTEGER), 1)) AS s
  FROM px, range(0, {_AU_N}) g(i)
),
fr AS (
  SELECT doc_id, i // {_AU_FRAME} AS frame,
    SUM((s - 128) * (s - 128)) AS energy_i
  FROM samp GROUP BY 1, 2
)
SELECT doc_id AS media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
  CAST(SUM(energy_i) AS BIGINT) AS total_energy,
  CAST(MAX(energy_i) AS BIGINT) AS peak_energy,
  sqrt(CAST(SUM(energy_i) AS DOUBLE)
       / CAST(COUNT(*) * {_AU_FRAME} AS DOUBLE)) AS rms
FROM fr GROUP BY doc_id
"""


@query("audio_rms_profile", oracle=_AUDIO_RMS_ORACLE)
def q_audio_rms_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy per audio clip through the REAL decode path:
    a genuine RIFF/WAVE PCM blob per document, the native stdlib
    ``wave`` parse + mono fold, Arrow-batched mapInPandas emitting one
    exact integer energy per 16-sample frame, then JVM aggregation to
    per-clip (n_frames, total/peak energy, RMS).  The ORACLE re-derives
    every sample from raw character codes — a decoder regression
    (header offset, sample signedness, channel fold) shifts energies
    and breaks the value hash, exactly like media_dhash_groups does for
    the image decoder.  RMS is the one non-integer output: sqrt of an
    exact-int ratio, a correctly-rounded IEEE op on identical inputs.

    Scale shape: decode + frame fold is a narrow Arrow map (no shuffle
    until the 3-int frame rows aggregate); per-clip state is bounded by
    clip length / frame size.  This is the audio-feature stage of a
    multimodal curation pipeline — silence trimming, loudness
    normalization, and VAD gates all consume exactly these frame
    energies."""
    d = load_table(spark, sf_dir, "documents")
    fr = frame_energies(synthesize_wav_audio(d))
    return fr.groupBy("media_id").agg(
        F.count("*").cast("bigint").alias("n_frames"),
        F.sum("energy_i").cast("bigint").alias("total_energy"),
        F.max("energy_i").cast("bigint").alias("peak_energy"),
        F.sqrt(
            F.sum("energy_i").cast("double")
            / (F.count("*") * F.lit(_AU_FRAME)).cast("double")
        ).alias("rms"),
    )


# ---------------------------------------------------------------------------
# Video scene-cut detection through the REAL Y4M decode path
# ---------------------------------------------------------------------------

_VID_W = 8
_VID_H = 8
_VID_FRAMES = 4
_VID_PLANE = _VID_W * _VID_H  # Cmono: Y plane only
_VID_CHARS = _VID_PLANE * _VID_FRAMES
_SCENE_CUT_T = 640  # Σ|Δluma| over 64 px (avg 10/px) → a cut

SCENE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("pair_idx", T.LongType(), False),
        T.StructField("delta_i", T.LongType(), False),
    ]
)


def synthesize_y4m_videos(documents: DataFrame) -> DataFrame:
    """Deterministic REAL YUV4MPEG2 blobs: each document's first 256
    ASCII bytes (x-padded) become four 8×8 mono Y planes behind a
    genuine Y4M stream header with per-frame FRAME markers — the video
    twin of synthesize_ppm_images / synthesize_wav_audio, so
    _decode_y4m exercises its actual parse path."""
    ascii_only = F.length(F.encode(F.col("text"), "utf-8")) == F.length(
        F.col("text")
    )
    pad = F.rpad(F.substring(F.col("text"), 1, _VID_CHARS), _VID_CHARS, "x")
    header = F.lit(f"YUV4MPEG2 W{_VID_W} H{_VID_H} F25:1 Cmono\n".encode())
    marker = F.lit(b"FRAME\n")
    parts = [header]
    for f in range(_VID_FRAMES):
        parts.append(marker)
        parts.append(
            F.encode(F.substring(pad, f * _VID_PLANE + 1, _VID_PLANE), "utf-8")
        )
    return documents.filter(F.col("text").isNotNull() & ascii_only).select(
        F.col("doc_id").alias("media_id"),
        F.concat(*parts).alias("content"),
    )


def frame_pair_deltas(media: DataFrame) -> DataFrame:
    """Σ|Δluma| between consecutive decoded frames — the scene-cut
    signal, computed inside one Arrow-batched mapInPandas over the REAL
    Y4M decoder; each pair leaves Python as one exact integer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "pair_idx": [], "delta_i": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                frames = _decode_y4m(bytes(blob))
                if not frames:
                    continue
                for i in range(1, len(frames)):
                    a, b = frames[i - 1], frames[i]
                    out["media_id"].append(int(mid))
                    out["pair_idx"].append(i)
                    out["delta_i"].append(
                        sum(abs(x - y) for x, y in zip(a, b))
                    )
            yield pd.DataFrame(out, columns=list(SCENE_SCHEMA.names))

    return media.filter(F.col("content").isNotNull()).mapInPandas(
        run, schema=SCENE_SCHEMA
    )


_SCENE_ORACLE = f"""
WITH px AS (
  SELECT doc_id, rpad(substring(text, 1, {_VID_CHARS}), {_VID_CHARS}, 'x')
    AS p
  FROM documents
  WHERE text IS NOT NULL AND strlen(text) = length(text)
),
pos AS (
  SELECT doc_id, p, unnest(generate_series(1, {_VID_FRAMES - 1})) AS f
  FROM px
),
cell AS (
  SELECT doc_id, f, unnest(generate_series(0, {_VID_PLANE - 1})) AS i, p
  FROM pos
),
deltas AS (
  SELECT doc_id, f AS pair_idx,
    CAST(SUM(abs(
      ord(substring(p, CAST(f * {_VID_PLANE} + i + 1 AS INTEGER), 1))
      - ord(substring(p, CAST((f - 1) * {_VID_PLANE} + i + 1 AS INTEGER), 1))
    )) AS BIGINT) AS delta_i
  FROM cell GROUP BY 1, 2
)
SELECT doc_id AS media_id,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(CASE WHEN delta_i > {_SCENE_CUT_T} THEN 1 ELSE 0 END)
       AS BIGINT) AS n_cuts,
  CAST(MAX(delta_i) AS BIGINT) AS max_delta
FROM deltas GROUP BY 1
"""


@query("video_scene_cuts", oracle=_SCENE_ORACLE)
def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection through the REAL video decode path: genuine
    YUV4MPEG2 blobs (stream header + FRAME markers + mono Y planes),
    the native _decode_y4m parse, and per-consecutive-frame Σ|Δluma|
    computed inside one Arrow map — frames whose delta exceeds the
    threshold are cuts, the shot-segmentation primitive every video
    curation pipeline needs (keyframe selection, clip splitting,
    near-static filtering).  The ORACLE re-derives every luma sample
    from character codes, so a decoder regression (header parse, frame
    stride, plane size) shifts deltas and breaks the value hash — the
    media_dhash/audio_rms discipline completing the third media kind.

    Scale shape: decode + pairwise fold is a narrow Arrow map emitting
    3 ints per frame pair; aggregation is JVM and per-clip state is
    bounded by frames-per-clip.  A real deployment swaps the synth for
    pyav keyframe iterators; the plumbing (batch shape, UDTF explode,
    integer features) is exactly what ships here."""
    d = load_table(spark, sf_dir, "documents")
    deltas = frame_pair_deltas(synthesize_y4m_videos(d))
    return deltas.groupBy("media_id").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(
            F.when(F.col("delta_i") > _SCENE_CUT_T, 1).otherwise(0)
        ).cast("bigint").alias("n_cuts"),
        F.max("delta_i").cast("bigint").alias("max_delta"),
    )


# ---------------------------------------------------------------------------
# Audio silence segmentation — gaps-and-islands over decoded frame energies
# ---------------------------------------------------------------------------

_AU_SILENCE_T = 8000  # frame energy below this is "silent" (VAD gate)

_AUDIO_SILENCE_ORACLE = f"""
WITH px AS (
  SELECT doc_id, rpad(substring(text, 1, {_AU_N}), {_AU_N}, 'x') AS p
  FROM documents
  WHERE text IS NOT NULL AND strlen(text) = length(text)
),
samp AS (
  SELECT doc_id, CAST(g.i AS BIGINT) AS i,
    ord(substring(p, CAST(g.i + 1 AS INTEGER), 1)) AS s
  FROM px, range(0, {_AU_N}) g(i)
),
fr AS (
  SELECT doc_id, i // {_AU_FRAME} AS frame,
    SUM((s - 128) * (s - 128)) AS energy_i
  FROM samp GROUP BY 1, 2
),
sil AS (
  SELECT doc_id, frame,
    frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame) AS isl
  FROM fr WHERE energy_i < {_AU_SILENCE_T}
),
seg AS (
  SELECT doc_id, isl, COUNT(*) AS seg_len
  FROM sil GROUP BY 1, 2
),
per AS (
  SELECT doc_id, CAST(SUM(seg_len) AS BIGINT) AS n_silent,
    CAST(COUNT(*) AS BIGINT) AS n_segments,
    CAST(MAX(seg_len) AS BIGINT) AS longest_run
  FROM seg GROUP BY 1
),
tot AS (SELECT doc_id, COUNT(*) AS n_frames FROM fr GROUP BY 1)
SELECT t.doc_id AS media_id,
  CAST(t.n_frames AS BIGINT) AS n_frames,
  COALESCE(p.n_silent, 0) AS n_silent,
  COALESCE(p.n_segments, 0) AS n_segments,
  COALESCE(p.longest_run, 0) AS longest_run,
  CAST(COALESCE(p.n_silent, 0) * 1000000 // t.n_frames AS BIGINT)
    AS silent_ppm
FROM tot t LEFT JOIN per p ON t.doc_id = p.doc_id
"""


@query("audio_silence_segments", oracle=_AUDIO_SILENCE_ORACLE)
def q_audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence SEGMENTATION on top of the decoded frame energies — the
    VAD (voice-activity) gate an audio curation pipeline runs before
    keeping a clip: frames below the energy threshold are silent, and
    consecutive silent frames merge into segments via the classic
    frame − row_number gaps-and-islands key.  Per clip: silent-frame
    count, segment count, longest silent run, and the exact
    silent-ppm — the trim/discard decision signals.  Same decode-path
    value-hash discipline as audio_rms_profile: every frame energy is
    re-derived by the oracle from raw character codes, so a decoder or
    threshold regression breaks the hash.

    Scale shape: the islands window partitions by clip (parallel) over
    the already-tiny frame rows (12 per clip); everything after the
    Arrow decode map is JVM aggregation.  Clips with no silent frames
    keep a row with zero counts (LEFT join to the frame census — the
    empty-guard discipline)."""
    d = load_table(spark, sf_dir, "documents")
    fr = frame_energies(synthesize_wav_audio(d))
    sil = fr.filter(F.col("energy_i") < _AU_SILENCE_T).select(
        "media_id",
        "frame",
        (
            F.col("frame")
            - F.row_number().over(
                Window.partitionBy("media_id").orderBy("frame")
            )
        ).alias("isl"),
    )
    seg = sil.groupBy("media_id", "isl").agg(F.count("*").alias("seg_len"))
    per = seg.groupBy("media_id").agg(
        F.sum("seg_len").cast("bigint").alias("n_silent"),
        F.count("*").cast("bigint").alias("n_segments"),
        F.max("seg_len").cast("bigint").alias("longest_run"),
    )
    tot = fr.groupBy("media_id").agg(F.count("*").alias("n_frames"))
    return tot.join(per, "media_id", "left").select(
        "media_id",
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.coalesce(F.col("n_silent"), F.lit(0)).alias("n_silent"),
        F.coalesce(F.col("n_segments"), F.lit(0)).alias("n_segments"),
        F.coalesce(F.col("longest_run"), F.lit(0)).alias("longest_run"),
        F.expr(
            "CAST(coalesce(n_silent, 0) * 1000000 div n_frames AS BIGINT)"
        ).alias("silent_ppm"),
    )


# ---------------------------------------------------------------------------
# ViT-style patch statistics — the dataset-normalization pass a vision
# pipeline computes before training (per-patch-position mean/std)
# ---------------------------------------------------------------------------

_PATCH_W, _PATCH_H = 3, 2  # 9x8 luma grid tiles into 3x4 = 12 patches

PATCH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("pr", T.LongType()),
        T.StructField("pc", T.LongType()),
        T.StructField("psum", T.LongType()),
    ]
)


def patch_luma_sums(media: DataFrame) -> DataFrame:
    """Per-image per-patch integer luma sums over the REAL decode path
    (mapInPandas batches feed _decode_ppm, the dHash stage's decoder):
    the 9×8 luma grid tiles into 3-wide × 2-tall patches and each
    patch's 6 samples sum exactly — the Arrow-batched analog of a ViT
    patchify, emitting integers so everything downstream hash-checks."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "pr": [], "pc": [], "psum": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                lum = _decode_ppm(bytes(blob))
                if lum is None or len(lum) != _PH_W * _PH_H:
                    continue
                for pr in range(_PH_H // _PATCH_H):
                    for pc in range(_PH_W // _PATCH_W):
                        s = 0
                        for dr in range(_PATCH_H):
                            row = pr * _PATCH_H + dr
                            base = row * _PH_W + pc * _PATCH_W
                            s += sum(lum[base : base + _PATCH_W])
                        out["media_id"].append(int(mid))
                        out["pr"].append(pr)
                        out["pc"].append(pc)
                        out["psum"].append(s)
            yield pd.DataFrame(out, columns=list(PATCH_SCHEMA.names))

    return media.filter(F.col("content").isNotNull()).mapInPandas(
        run, schema=PATCH_SCHEMA
    )


_PATCH_N = _PATCH_W * _PATCH_H

_PATCH_STATS_ORACLE = f"""
WITH px AS (
  SELECT doc_id,
    rpad(substring(text, 1, {_PH_BYTES}), {_PH_BYTES}, 'x') AS p
  FROM documents
  WHERE text IS NOT NULL AND strlen(text) = length(text)
),
lum AS (
  SELECT doc_id, CAST(g.i AS BIGINT) AS i,
    (ord(substring(p, CAST(3 * g.i + 1 AS INTEGER), 1)) * 299
   + ord(substring(p, CAST(3 * g.i + 2 AS INTEGER), 1)) * 587
   + ord(substring(p, CAST(3 * g.i + 3 AS INTEGER), 1)) * 114) // 1000
      AS y
  FROM px, range(0, {_PH_W * _PH_H}) g(i)
),
psums AS MATERIALIZED (
  SELECT doc_id,
    CAST((i // {_PH_W}) // {_PATCH_H} AS BIGINT) AS pr,
    CAST((i % {_PH_W}) // {_PATCH_W} AS BIGINT) AS pc,
    CAST(SUM(y) AS BIGINT) AS psum
  FROM lum GROUP BY 1, 2, 3
),
stats AS (
  SELECT pr, pc, CAST(COUNT(*) AS BIGINT) AS n_images,
    CAST(SUM(psum) AS BIGINT) AS s, CAST(SUM(psum * psum) AS BIGINT) AS q
  FROM psums GROUP BY 1, 2
)
SELECT pr AS patch_row, pc AS patch_col, n_images,
  CAST(s AS DOUBLE) / n_images / {_PATCH_N}.0 AS mean_luma,
  sqrt(CAST(q * n_images - s * s AS DOUBLE)
       / NULLIF(CAST(n_images AS DOUBLE) * (n_images - 1), 0.0))
    AS std_patch_sum
FROM stats
"""


@query("image_patch_stats", oracle=_PATCH_STATS_ORACLE)
def q_image_patch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-STYLE per-patch-position dataset statistics — the
    normalization pass every vision-training pipeline runs before
    patchifying images into tokens (per-position mean/std feed the
    input-norm layer; a position with anomalous variance flags a
    synthesis/decode bug): each synthesized P6 PPM decodes through the
    NATIVE path (_decode_ppm header parse + BT.601 integer luma — the
    dHash stage's decoder, so a decoder regression breaks BOTH
    families' hashes), the 9×8 luma grid tiles into 3×4 = 12
    patches of 6 samples inside the same Arrow batch, and per-patch
    integer sums are the only thing Python emits.

    Exactness: patch sums are exact integers (≤ 6·255); per-position
    count / Σ / Σ² fold exactly (q·n ≤ ~6e15 at sf1 — inside int64);
    mean and std are one closed-form double expression each,
    NULLIF-guarded for the single-image corner.  The oracle re-derives
    luma from raw character codes (the dHash oracle technique) and
    must match to the bit.

    Scale shape: decode + patchify is ONE Arrow-batched mapInPandas
    over the media stream (the sanctioned Python stage, allow-listed);
    the statistics are a 12-row census — at 100 TB the only
    data-scale cost is the decode pass the pipeline runs anyway."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_ppm_images(docs)
    ps = patch_luma_sums(media)
    stats = ps.groupBy("pr", "pc").agg(
        F.count("*").cast("bigint").alias("n_images"),
        F.sum("psum").cast("bigint").alias("s"),
        F.sum(F.col("psum") * F.col("psum")).cast("bigint").alias("q"),
    )
    n = F.col("n_images")
    return stats.select(
        F.col("pr").alias("patch_row"),
        F.col("pc").alias("patch_col"),
        "n_images",
        (F.col("s").cast("double") / n / F.lit(float(_PATCH_N))).alias(
            "mean_luma"
        ),
        F.sqrt(
            (F.col("q") * n - F.col("s") * F.col("s")).cast("double")
            / F.nullif(n.cast("double") * (n - 1), F.lit(0.0))
        ).alias("std_patch_sum"),
    )
