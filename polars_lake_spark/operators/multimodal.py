"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch shapes, partitioning, UDF
signatures — is real and tested; the actual codec step is STUBBED because
no image/audio library ships in this environment: ``decode_images`` uses a
clearly-marked deterministic fake decoder, and ``decode_images_real``
raises NotImplementedError unless PIL is importable.

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


def decode_images_real(df: DataFrame, **kwargs) -> DataFrame:
    """Real codec path — requires PIL, not available in this container."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decoding needs PIL/opencv; this environment ships "
            "neither — use decode_images (deterministic stub) instead"
        ) from e
    raise NotImplementedError("wire PIL decode here when the codec lib exists")


def frame_sample_stub(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", every_n: int = 10
) -> DataFrame:
    """Video frame-sampling plumbing (STUB): emits one row per sampled
    'frame' with deterministic fake offsets — demonstrates the explode-
    style fan-out a real sampler produces."""
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
