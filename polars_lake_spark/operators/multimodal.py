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
