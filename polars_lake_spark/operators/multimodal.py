"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch shapes, partitioning, UDF
signatures — is real and tested.  The codec story (r5):

* **PNG is decoded for real** — ``encode_png``/``decode_png`` are a
  complete 8-bit PNG codec on stdlib ``zlib`` + numpy (chunk walk, CRCs,
  all five scanline filters Sub/Up/Average/Paeth on decode), so
  ``decode_images_real`` and ``resize_images`` do genuine pixel work
  with zero external dependencies.
* JPEG pixel decode stays honestly gated behind
  ``NotImplementedError`` (baseline JPEG needs entropy/DCT codec work
  that a lib should do); JPEG *headers* are parsed for real.
* ``decode_images`` remains the clearly-marked deterministic fake for
  plumbing tests.

At scale the pattern is: keep media bytes in their own column (Parquet
stores them row-group-columnar, so metadata-only queries never read
them — column pruning), repartition before decode so each Arrow batch is
bounded, and emit features as typed columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def attach_media_column(
    df: DataFrame, source_col: str, media_type: str = "image", fmt: str = "raw"
) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata struct.

    (In production the bytes come from the lake; here they're derived from
    an existing column so the plumbing is exercised end-to-end.)
    """
    blob = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn("media", blob).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.octet_length(F.col("media")).cast("long").alias("n_bytes"),
        ),
    )


def _fake_decode(buf: bytes) -> tuple[int, int, int, float]:
    """STUB decoder — deterministic pseudo-dimensions from the byte
    content. Replace with PIL/cv2 in a real deployment."""
    n = len(buf)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3
    mean_intensity = (sum(buf[:256]) / max(1, min(n, 256))) / 255.0
    return width, height, channels, round(mean_intensity, 6)


def decode_images(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Arrow-batched fake decode: mapInPandas keeps transfer vectorized and
    lets each task stream record batches (never materializing a partition)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[media_col]):
                b = bytes(buf)
                w, h, c, mi = _fake_decode(b)
                rows.append((int(_id), len(b), w, h, c, mi))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "width",
                    "height",
                    "channels",
                    "mean_intensity",
                ],
            )

    # Bound Arrow batch memory before the Python worker boundary.
    return df.select(id_col, media_col).mapInPandas(
        decode_batches, schema=IMAGE_FEATURES_SCHEMA
    )


# --------------------------------------------------------------------------
# Real header parsing (public formats, no codec lib needed): PNG IHDR and
# JPEG SOFn carry width/height/channels in plain bytes.  The synthesizer
# below builds VALID headers with formula-determined dimensions so the
# parse step is a DuckDB-oracle-checkable roundtrip.

IMAGE_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF0-SOF15 excluding DHT(C4)/JPG(C8)/DAC(CC), per ITU T.81 table B.1
_SOF_MARKERS = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def synthesize_png(width: int, height: int, channels: int, payload: bytes) -> bytes:
    """Minimal valid PNG prefix: signature + IHDR chunk (33 bytes), then
    payload. color_type 0 = grayscale, 2 = truecolor (PNG spec 11.2.2)."""
    color_type = 0 if channels == 1 else 2
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return _PNG_SIG + (13).to_bytes(4, "big") + b"IHDR" + ihdr + b"\x00\x00\x00\x00" + payload


def synthesize_jpeg(width: int, height: int, channels: int, payload: bytes) -> bytes:
    """Minimal JPEG prefix: SOI + APP0(JFIF) + SOF0, then payload.
    Prefix size = 2 + 18 + (2 + 8 + 3·channels) bytes."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_len = 8 + 3 * channels
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    sof0 = (
        b"\xff\xc0"
        + sof_len.to_bytes(2, "big")
        + bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([channels])
        + comps
    )
    return b"\xff\xd8" + app0 + sof0 + payload


def parse_image_header(buf: bytes):
    """(fmt, width, height, channels) from PNG IHDR or JPEG SOFn, else
    None. Pure-Python public-format parsing — no codec dependency."""
    b = bytes(buf)
    if b[:8] == _PNG_SIG and len(b) >= 26 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(b[25])
        return ("png", w, h, channels)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 10 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker in _SOF_MARKERS:
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("jpeg", w, h, b[i + 9])
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        return None
    return None


def synthesize_images(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build deterministic, VALID image blobs from documents: dims are
    pure formulas of (id, text) so an oracle can predict the parsed
    output without seeing the bytes.

      fmt      = png if id even else jpeg
      width    = 16 + n_text_bytes % 624
      height   = 16 + id % 464
      channels = 1 if id % 3 == 0 else 3
    """

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for _id, text in zip(pdf[id_col], pdf[text_col]):
                _id = int(_id)
                payload = str(text).encode("utf-8")
                w = 16 + len(payload) % 624
                h = 16 + _id % 464
                c = 1 if _id % 3 == 0 else 3
                fn = synthesize_png if _id % 2 == 0 else synthesize_jpeg
                ids.append(_id)
                blobs.append(fn(w, h, c, payload))
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    from polars_lake_spark.operators.dedup import parallelize_for_cpu

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return parallelize_for_cpu(df.select(id_col, text_col)).mapInPandas(
        synth, schema=schema
    )


def parse_image_headers(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Arrow-batched header parse via mapInPandas — streams record
    batches, emits typed feature columns."""

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[media_col]):
                b = bytes(buf)
                parsed = parse_image_header(b)
                if parsed is None:
                    rows.append((int(_id), None, None, None, None, len(b)))
                else:
                    fmt, w, h, c = parsed
                    rows.append((int(_id), fmt, w, h, c, len(b)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "fmt", "width", "height", "channels", "n_bytes"]
            )

    return df.select(id_col, media_col).mapInPandas(
        parse_batches, schema=IMAGE_HEADER_SCHEMA
    )


# --------------------------------------------------------------------------
# Real PNG codec (stdlib zlib + numpy; PNG spec = public W3C standard).
# 8-bit depth, color types 0 (gray) and 2 (RGB); encode emits filter 0
# (None) and 2 (Up) scanlines, decode handles all five filter types.


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + tag
        + data
        + zlib.crc32(tag + data).to_bytes(4, "big")
    )


PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def encode_png(pixels) -> bytes:
    """Complete, valid PNG from a (h, w) or (h, w, c) uint8 array —
    signature, IHDR, one zlib IDAT, IEND, real CRCs. Channels 1/2/3/4
    map to color types 0 (gray), 4 (gray+alpha), 2 (RGB), 6 (RGBA).
    Even rows use filter 0 (None), odd rows filter 2 (Up), so decoders
    must actually unfilter. Any standard viewer opens the output."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in PNG_COLOR_TYPE:
        raise ValueError(f"channels must be 1-4, got {c}")
    flat = px.reshape(h, w * c).astype(np.int16)
    lines = []
    for r in range(h):
        if r % 2 == 0:
            lines.append(b"\x00" + flat[r].astype(np.uint8).tobytes())
        else:
            up = (flat[r] - flat[r - 1]) % 256  # filter 2: Up
            lines.append(b"\x02" + up.astype(np.uint8).tobytes())
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, PNG_COLOR_TYPE[c], 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(buf: bytes):
    """(width, height, channels, (h,w,c) uint8 array) from a real PNG —
    chunk walk, IDAT concat, zlib inflate, scanline unfiltering for ALL
    five filter types (None/Sub/Up/Average/Paeth, PNG spec 9.2). 8-bit
    depth, non-interlaced, color types 0/2/4/6 (palette excluded)."""
    import zlib

    import numpy as np

    b = bytes(buf)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, ihdr, idat = 8, None, []
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i : i + 4], "big")
        tag = b[i + 4 : i + 8]
        if tag == b"IHDR":
            ihdr = b[i + 8 : i + 8 + ln]
        elif tag == b"IDAT":
            idat.append(b[i + 8 : i + 8 + ln])
        elif tag == b"IEND":
            break
        i += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, interlace = ihdr[8], ihdr[9], ihdr[12]
    if bit_depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    try:
        c = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    except KeyError:
        raise ValueError(f"unsupported color type {color_type}") from None
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (1 + stride):
        raise ValueError("IDAT size mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for r in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        prev = img[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up (vectorized)
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for j in range(stride):
                a = int(cur[j - c]) if j >= c else 0
                up = int(prev[j])
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + up) // 2
                else:
                    cl = int(prev[j - c]) if j >= c else 0
                    p = a + up - cl
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - cl)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else cl)
                cur[j] = (int(line[j]) + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        img[r] = cur.astype(np.uint8)
    return w, h, c, img.reshape(h, w, c)


def box_resize(pixels, out_w: int, out_h: int):
    """Box (area-mean) downsample/nearest upsample of an (h,w,c) uint8
    array via numpy index mapping — the classic feature-extract resize,
    no codec lib.  FLOOR edges guarantee every output cell covers a
    non-empty source window at any scale factor (rounded edges could
    produce y0==y1==h when upsampling >2×, yielding NaN means)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    h, w, c = px.shape
    ys = (np.arange(out_h + 1) * h) // out_h  # floor: ys[r] <= h-1 for r<out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.zeros((out_h, out_w, c), dtype=np.float64)
    for r in range(out_h):
        y0 = int(ys[r])
        y1 = max(int(ys[r + 1]), y0 + 1)
        for q in range(out_w):
            x0 = int(xs[q])
            x1 = max(int(xs[q + 1]), x0 + 1)
            out[r, q] = px[y0:y1, x0:x1].mean(axis=(0, 1))
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def decode_images_real(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    on_undecodable: str = "null",
) -> DataFrame:
    """REAL pixel decode via mapInPandas: PNGs are decoded by the
    pure-stdlib codec above (actual inflate + unfilter + pixel mean);
    JPEG/other formats either yield NULL feature columns
    (``on_undecodable='null'``) or raise (``'error'``) — baseline JPEG
    entropy decoding is the one step that still needs a codec library."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[media_col]):
                b = bytes(buf)
                decoded = None
                if b[:8] == _PNG_SIG:
                    try:
                        decoded = decode_png(b)
                    except (ValueError, zlib.error):
                        decoded = None  # truncated/corrupt/unsupported PNG
                if decoded is not None:
                    w, h, c, px = decoded
                    mi = round(float(px.mean()) / 255.0, 6)
                    rows.append((int(_id), len(b), w, h, c, mi))
                elif on_undecodable == "null":
                    rows.append((int(_id), len(b), None, None, None, None))
                else:
                    raise NotImplementedError(
                        "undecodable media (non-PNG needs a codec library — "
                        "JPEG entropy coding; corrupt PNG bytes); headers "
                        "parse fine — see parse_image_headers"
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "width",
                    "height",
                    "channels",
                    "mean_intensity",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        decode_batches, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Decode → box-resize → re-encode PNG, all map-side (the standard
    thumbnail/feature-extract stage). Non-PNG rows are dropped (decode
    gated — see decode_images_real)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, ws, hs = [], [], [], []
            for _id, buf in zip(pdf[id_col], pdf[media_col]):
                b = bytes(buf)
                if b[:8] != _PNG_SIG:
                    continue
                _, _, _, px = decode_png(b)
                ids.append(int(_id))
                blobs.append(encode_png(box_resize(px, out_w, out_h)))
                ws.append(out_w)
                hs.append(out_h)
            yield pd.DataFrame(
                {"doc_id": ids, "media": blobs, "width": ws, "height": hs}
            )

    return df.select(id_col, media_col).mapInPandas(
        resize_batches, schema=RESIZED_SCHEMA
    )


def synthesize_pixel_pngs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic COMPLETE PNGs (pixels, not just headers) from
    documents: pixel[y,x,ch] = (3x + 7y + 11ch + seed) % 256 with
    formula-determined dims, so any decoder can be checked against the
    closed-form expectation without storing originals.

      seed     = doc_id % 251
      width    = 8 + doc_id % 24
      height   = 8 + (doc_id // 7) % 24
      channels = 1 if doc_id % 3 == 0 else 3
    """
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for _id in pdf[id_col]:
                _id = int(_id)
                w = 8 + _id % 24
                h = 8 + (_id // 7) % 24
                c = 1 if _id % 3 == 0 else 3
                seed = _id % 251
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                ch = np.arange(c)[None, None, :]
                px = ((3 * x + 7 * y + 11 * ch + seed) % 256).astype(np.uint8)
                ids.append(_id)
                blobs.append(encode_png(px))
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    from polars_lake_spark.operators.dedup import parallelize_for_cpu

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return parallelize_for_cpu(df.select(id_col)).mapInPandas(synth, schema=schema)


# --------------------------------------------------------------------------
# Real WAV/PCM audio codec (RIFF is a public Microsoft/IBM format; 16-bit
# PCM needs no entropy decoding — stdlib bytes + numpy only).

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def encode_wav(samples, sample_rate: int) -> bytes:
    """Complete valid RIFF/WAVE from an (n, channels) int16 array:
    RIFF header + fmt chunk (PCM, 16-bit, little-endian) + data chunk.
    Any audio tool opens the output."""
    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved frames, little-endian
    byte_rate = sample_rate * ch * 2
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF word padding
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_wav(buf: bytes):
    """(sample_rate, channels, (n, channels) int16 array) from a real
    RIFF/WAVE: chunk walk, fmt parse, PCM-16 data — rejects compressed
    formats (those need a codec library)."""
    import numpy as np

    b = bytes(buf)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        ln = int.from_bytes(b[i + 4 : i + 8], "little")
        body = b[i + 8 : i + 8 + ln]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        i += 8 + ln + (ln % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    codec = int.from_bytes(fmt[0:2], "little")
    if codec != 1:
        raise ValueError(f"non-PCM WAV (codec {codec}) needs a codec library")
    ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if bits != 16:
        raise ValueError("only 16-bit PCM supported")
    if ch < 1 or rate < 1:
        # a zero here would turn downstream frame/duration math into
        # ZeroDivisionError inside the Spark worker — reject as malformed
        raise ValueError(f"malformed fmt chunk: channels={ch} rate={rate}")
    n = len(data) // (2 * ch)
    arr = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return rate, ch, arr


def decode_audio(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """REAL audio feature extraction via mapInPandas: PCM WAVs decode to
    sample arrays (rate, channels, duration, RMS amplitude); non-WAV
    rows yield NULL features."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[media_col]):
                try:
                    rate, ch, arr = decode_wav(bytes(buf))
                    rms = float(np.sqrt((arr.astype(np.float64) ** 2).mean()))
                    rows.append(
                        (
                            int(_id),
                            rate,
                            ch,
                            arr.shape[0],
                            round(arr.shape[0] * 1000.0 / rate, 6),
                            round(rms, 6),
                        )
                    )
                except ValueError:
                    rows.append((int(_id), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "channels",
                    "n_samples",
                    "duration_ms",
                    "rms",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        feats, schema=AUDIO_FEATURES_SCHEMA
    )


def synthesize_pcm_wavs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic COMPLETE PCM WAVs from documents:
    sample[i, ch] = ((31*doc_id + 7*i + 13*ch) % 2003) - 1001, with

      n_samples   = 256 + doc_id % 512
      sample_rate = 8000 + 4000 * (doc_id % 3)
      channels    = 1 if doc_id % 2 == 0 else 2
    """
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for _id in pdf[id_col]:
                _id = int(_id)
                n = 256 + _id % 512
                rate = 8000 + 4000 * (_id % 3)
                ch = 1 if _id % 2 == 0 else 2
                i = np.arange(n)[:, None]
                c = np.arange(ch)[None, :]
                s = ((31 * _id + 7 * i + 13 * c) % 2003 - 1001).astype("<i2")
                ids.append(_id)
                blobs.append(encode_wav(s, rate))
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    from polars_lake_spark.operators.dedup import parallelize_for_cpu

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return parallelize_for_cpu(df.select(id_col)).mapInPandas(synth, schema=schema)


def verify_audio_roundtrip(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """(doc_id, ok): decode each synthesize_pcm_wavs blob and compare
    rate/channels/samples ELEMENTWISE against the closed form."""
    import numpy as np

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, oks = [], []
            for _id, buf in zip(pdf[id_col], pdf[media_col]):
                _id = int(_id)
                try:
                    rate, ch, arr = decode_wav(bytes(buf))
                    n = 256 + _id % 512
                    erate = 8000 + 4000 * (_id % 3)
                    ech = 1 if _id % 2 == 0 else 2
                    i = np.arange(n)[:, None]
                    c = np.arange(ech)[None, :]
                    want = ((31 * _id + 7 * i + 13 * c) % 2003 - 1001).astype(
                        np.int16
                    )
                    ok = (rate, ch) == (erate, ech) and np.array_equal(arr, want)
                except Exception:
                    ok = False
                ids.append(_id)
                oks.append(bool(ok))
            yield pd.DataFrame({"doc_id": ids, "ok": oks})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("ok", T.BooleanType())]
    )
    return df.select(id_col, media_col).mapInPandas(check, schema=schema)


def verify_pixel_roundtrip(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """(doc_id, ok): decode each synthesize_pixel_pngs blob through the
    REAL codec and compare the pixel array ELEMENTWISE against the
    regenerated closed-form expectation — any filter/inflate/stride bug
    in the decoder (or encoder) flips ok to false. Map-side."""
    import numpy as np

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, oks = [], []
            for _id, buf in zip(pdf[id_col], pdf[media_col]):
                _id = int(_id)
                try:
                    w, h, c, px = decode_png(bytes(buf))
                    ew = 8 + _id % 24
                    eh = 8 + (_id // 7) % 24
                    ec = 1 if _id % 3 == 0 else 3
                    seed = _id % 251
                    x = np.arange(ew)[None, :, None]
                    y = np.arange(eh)[:, None, None]
                    ch = np.arange(ec)[None, None, :]
                    want = ((3 * x + 7 * y + 11 * ch + seed) % 256).astype(np.uint8)
                    ok = (w, h, c) == (ew, eh, ec) and np.array_equal(px, want)
                except Exception:
                    ok = False
                ids.append(_id)
                oks.append(bool(ok))
            yield pd.DataFrame({"doc_id": ids, "ok": oks})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("ok", T.BooleanType())]
    )
    return df.select(id_col, media_col).mapInPandas(check, schema=schema)


def frame_sample_stub(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", every_n: int = 10
) -> DataFrame:
    """Video frame-sampling plumbing (STUB): emits one row per sampled
    'frame' with deterministic fake offsets — demonstrates the explode-
    style fan-out a real sampler produces.  Superseded by the REAL
    AVI container walk below (``sample_video_frames``); kept for the
    plumbing tests."""
    n_frames = (F.octet_length(F.col(media_col)) / F.lit(every_n)).cast("int")
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))))
        )
        .select(
            F.col(id_col),
            F.col("pos").alias("frame_idx"),
            (F.col("pos") * every_n).alias("byte_offset"),
        )
    )


# --------------------------------------------------------------------------
# Real AVI (MJPEG) container codec — AVI is RIFF (public Microsoft
# format), frames are plain '00dc' chunks; for MJPEG each chunk is a
# standalone JPEG.  Container walk + frame extraction are fully real;
# frame PIXEL decode shares JPEG's honest entropy-coding gate.


def encode_avi(frames: list, width: int, height: int, fps: int = 25) -> bytes:
    """Minimal valid RIFF/AVI wrapping MJPEG frames: LIST hdrl (avih main
    header + one 'vids'/'MJPG' stream with strh/strf) then LIST movi with
    one '00dc' chunk per frame (word-aligned)."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(frames)
    max_size = max((len(f) for f in frames), default=0)
    avih = (
        (1_000_000 // fps).to_bytes(4, "little")  # microseconds per frame
        + (max_size * fps).to_bytes(4, "little")  # max bytes/sec
        + (0).to_bytes(4, "little")
        # dwFlags = 0: no idx1 chunk is written, so AVIF_HASINDEX (0x10)
        # must NOT be declared — strict demuxers would seek the index
        + (0).to_bytes(4, "little")
        + n.to_bytes(4, "little")  # total frames
        + (0).to_bytes(4, "little")
        + (1).to_bytes(4, "little")  # streams
        + max_size.to_bytes(4, "little")
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + bytes(16)
    )
    strh = (
        b"vids"
        + b"MJPG"
        + bytes(12)  # flags, priority, language, initial frames
        + (1).to_bytes(4, "little")  # scale
        + fps.to_bytes(4, "little")  # rate (rate/scale = fps)
        + (0).to_bytes(4, "little")
        + n.to_bytes(4, "little")  # length in frames
        + max_size.to_bytes(4, "little")
        + (0xFFFFFFFF).to_bytes(4, "little")  # quality
        + (0).to_bytes(4, "little")
        + bytes(8)
    )
    strf = (  # BITMAPINFOHEADER
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"MJPG"
        + (width * height * 3).to_bytes(4, "little")
        + bytes(16)
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi(buf: bytes):
    """(fps, width, height, [frame bytes]) from a RIFF/AVI: recursive
    LIST walk, avih main-header parse, '00dc'/'00db' frame chunk
    extraction. Container-level decode is complete; MJPEG frame PIXELS
    stay gated exactly like standalone JPEG (entropy coding)."""
    b = bytes(buf)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    avih, frames = None, []

    def walk(lo: int, hi: int):
        nonlocal avih
        i = lo
        while i + 8 <= hi:
            tag = b[i : i + 4]
            ln = int.from_bytes(b[i + 4 : i + 8], "little")
            if tag == b"LIST":
                walk(i + 12, i + 8 + ln)
            elif tag == b"avih":
                avih = b[i + 8 : i + 8 + ln]
            elif tag in (b"00dc", b"00db"):
                frames.append(b[i + 8 : i + 8 + ln])
            i += 8 + ln + (ln % 2)

    walk(12, len(b))
    if avih is None:
        raise ValueError("missing avih header")
    us_per_frame = int.from_bytes(avih[0:4], "little")
    fps = round(1_000_000 / us_per_frame) if us_per_frame else 0
    width = int.from_bytes(avih[32:36], "little")
    height = int.from_bytes(avih[36:40], "little")
    n_declared = int.from_bytes(avih[16:20], "little")
    if n_declared != len(frames):
        raise ValueError(
            f"frame count mismatch: header {n_declared} vs {len(frames)} chunks"
        )
    return fps, width, height, frames


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 1,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """REAL frame sampling: walk each AVI container, keep every
    ``every_n``-th frame chunk, parse the frame's own JPEG/PNG header —
    one output row per sampled frame, all map-side via mapInPandas."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, buf in zip(pdf[id_col], pdf[media_col]):
                try:
                    fps, _w, _h, frames = decode_avi(bytes(buf))
                except ValueError:
                    continue
                for idx in range(0, len(frames), every_n):
                    fb = frames[idx]
                    parsed = parse_image_header(fb)
                    fmt, w, h = (
                        (parsed[0], parsed[1], parsed[2]) if parsed else (None, None, None)
                    )
                    rows.append((int(_id), idx, fps, fmt, w, h, len(fb)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "fps",
                    "fmt",
                    "width",
                    "height",
                    "n_bytes",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        sample, schema=VIDEO_FRAMES_SCHEMA
    )


def synthesize_mjpeg_avis(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic COMPLETE MJPEG AVIs from documents: each holds
    formula-determined JPEG frames (headers real, payload deterministic):

      n_frames = 1 + doc_id % 5
      fps      = 10 + 5 * (doc_id % 4)
      width    = 32 + doc_id % 64      (all frames)
      height   = 24 + doc_id % 48
      frame payload = b'f' * (10 + frame_idx)
    """

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for _id in pdf[id_col]:
                _id = int(_id)
                nf = 1 + _id % 5
                fps = 10 + 5 * (_id % 4)
                w = 32 + _id % 64
                h = 24 + _id % 48
                frames = [
                    synthesize_jpeg(w, h, 3, b"f" * (10 + i)) for i in range(nf)
                ]
                ids.append(_id)
                blobs.append(encode_avi(frames, w, h, fps))
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    from polars_lake_spark.operators.dedup import parallelize_for_cpu

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return parallelize_for_cpu(df.select(id_col)).mapInPandas(synth, schema=schema)
