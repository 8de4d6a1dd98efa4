"""Real PNG codec (operators/multimodal.py): encode/decode exactness,
all five scanline filters, box resize, and the Spark decode/resize
operators. No codec library anywhere — stdlib zlib + numpy.
"""

import numpy as np
import pytest

from polars_lake_spark.operators.multimodal import (
    _PNG_SIG,
    _png_chunk,
    box_resize,
    decode_images_real,
    decode_png,
    encode_png,
    resize_images,
    synthesize_pixel_pngs,
    verify_pixel_roundtrip,
)


def _rand(h, w, c, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("h,w,c", [(1, 1, 1), (7, 5, 1), (13, 9, 3), (32, 17, 3)])
def test_png_roundtrip_exact(h, w, c):
    px = _rand(h, w, c, seed=h * 100 + w * 10 + c)
    got_w, got_h, got_c, got = decode_png(encode_png(px))
    assert (got_w, got_h, got_c) == (w, h, c)
    assert np.array_equal(got, px)


def test_png_output_is_spec_valid():
    """Signature, chunk layout, CRCs — a standards-compliant reader's view."""
    import zlib

    b = encode_png(_rand(4, 6, 3, 1))
    assert b[:8] == _PNG_SIG
    i, tags = 8, []
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i : i + 4], "big")
        tag, data = b[i + 4 : i + 8], b[i + 8 : i + 8 + ln]
        crc = int.from_bytes(b[i + 8 + ln : i + 12 + ln], "big")
        assert crc == zlib.crc32(tag + data), tag  # real CRCs
        tags.append(tag)
        i += 12 + ln
    assert tags == [b"IHDR", b"IDAT", b"IEND"]


def _encode_with_filter(px, ftype):
    """Reference encoder applying ONE filter type to every scanline
    (slow, per the PNG spec definitions) — exercises decode paths the
    production encoder (None/Up) doesn't emit."""
    import zlib

    h, w, c = px.shape
    flat = px.reshape(h, w * c).astype(np.int32)
    out = []
    for r in range(h):
        prev = flat[r - 1] if r else np.zeros(w * c, dtype=np.int32)
        line = bytearray([ftype])
        for j in range(w * c):
            cur = int(flat[r][j])
            a = int(flat[r][j - c]) if j >= c else 0
            up = int(prev[j])
            cl = int(prev[j - c]) if j >= c else 0
            if ftype == 0:
                v = cur
            elif ftype == 1:
                v = cur - a
            elif ftype == 2:
                v = cur - up
            elif ftype == 3:
                v = cur - (a + up) // 2
            else:  # Paeth
                p = a + up - cl
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - cl)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else cl)
                v = cur - pred
            line.append(v % 256)
        out.append(bytes(line))
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 0 if c == 1 else 2, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(out)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_handles_every_filter_type(ftype):
    px = _rand(9, 7, 3, seed=ftype)
    w, h, c, got = decode_png(_encode_with_filter(px, ftype))
    assert (w, h, c) == (7, 9, 3)
    assert np.array_equal(got, px), f"filter {ftype} unfilter mismatch"


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_box_resize_means():
    # 4x4 image of known blocks -> 2x2 box means
    px = np.zeros((4, 4, 1), dtype=np.uint8)
    px[:2, :2] = 10
    px[:2, 2:] = 20
    px[2:, :2] = 30
    px[2:, 2:] = 40
    out = box_resize(px, 2, 2)
    assert out.shape == (2, 2, 1)
    assert out[0, 0, 0] == 10 and out[0, 1, 0] == 20
    assert out[1, 0, 0] == 30 and out[1, 1, 0] == 40


def test_decode_images_real_on_spark(spark, sf_dir):
    """End-to-end Spark path: synthesize complete PNGs for a small doc
    slice, decode pixels for real, check dims + exact formula mean."""
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(12)
    pngs = synthesize_pixel_pngs(docs)
    feats = {r.doc_id: r for r in decode_images_real(pngs).collect()}
    assert len(feats) == 12
    for _id, r in feats.items():
        ew = 8 + _id % 24
        eh = 8 + (_id // 7) % 24
        ec = 1 if _id % 3 == 0 else 3
        assert (r.width, r.height, r.channels) == (ew, eh, ec)
        seed = _id % 251
        x = np.arange(ew)[None, :, None]
        y = np.arange(eh)[:, None, None]
        ch = np.arange(ec)[None, None, :]
        want = ((3 * x + 7 * y + 11 * ch + seed) % 256).mean() / 255.0
        assert abs(r.mean_intensity - round(float(want), 6)) < 1e-9


def test_verify_pixel_roundtrip_catches_corruption(spark, sf_dir):
    """The invariant query's checker: all-ok on good blobs; a corrupted
    IDAT flips ok to false (decode fails or pixels differ)."""
    from pyspark.sql import functions as F

    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(8)
    pngs = synthesize_pixel_pngs(docs)
    assert verify_pixel_roundtrip(pngs).filter(~F.col("ok")).count() == 0

    # corrupt one byte inside the IDAT payload of every blob
    from pyspark.sql import types as T

    def corrupt(rows):
        import pandas as pd

        for pdf in rows:
            blobs = []
            for buf in pdf["media"]:
                b = bytearray(bytes(buf))
                b[45] ^= 0xFF  # inside IHDR/IDAT region
                blobs.append(bytes(b))
            pdf = pdf.copy()
            pdf["media"] = blobs
            yield pdf

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    bad = pngs.mapInPandas(corrupt, schema=schema)
    assert verify_pixel_roundtrip(bad).filter(~F.col("ok")).count() == 8


def test_resize_images_spark_roundtrip(spark, sf_dir):
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(6)
    pngs = synthesize_pixel_pngs(docs)
    small = resize_images(pngs, 8, 8).collect()
    assert len(small) == 6
    for r in small:
        w, h, c, px = decode_png(bytes(r.media))
        assert (w, h) == (8, 8) and px.shape[:2] == (8, 8)


# ---------------------------------------------------------------- WAV codec
from polars_lake_spark.operators.multimodal import (  # noqa: E402
    decode_audio,
    decode_wav,
    encode_wav,
    synthesize_pcm_wavs,
    verify_audio_roundtrip,
)


@pytest.mark.parametrize("n,ch,rate", [(1, 1, 8000), (300, 1, 16000), (257, 2, 44100)])
def test_wav_roundtrip_exact(n, ch, rate):
    rng = np.random.RandomState(n + ch)
    s = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
    got_rate, got_ch, got = decode_wav(encode_wav(s, rate))
    assert (got_rate, got_ch) == (rate, ch)
    assert np.array_equal(got, s)


def test_wav_output_is_riff_valid():
    b = encode_wav(np.zeros((5, 1), dtype=np.int16), 8000)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    # declared RIFF size matches actual
    assert int.from_bytes(b[4:8], "little") == len(b) - 8
    # odd-length data chunk gets a pad byte (RIFF word alignment)
    b2 = encode_wav(np.zeros((5, 1), dtype=np.int16), 8000)
    assert len(b2) % 2 == 0


def test_wav_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00AIFF")
    with pytest.raises(ValueError):
        decode_wav(b"junkjunkjunk")
    # compressed codec id -> gated error
    s = np.zeros((4, 1), dtype=np.int16)
    b = bytearray(encode_wav(s, 8000))
    b[20] = 85  # fmt codec field -> MP3
    with pytest.raises(ValueError, match="codec"):
        decode_wav(bytes(b))


def test_decode_audio_on_spark(spark, sf_dir):
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    wavs = synthesize_pcm_wavs(docs)
    feats = {r.doc_id: r for r in decode_audio(wavs).collect()}
    assert len(feats) == 10
    for _id, r in feats.items():
        n = 256 + _id % 512
        assert r.sample_rate == 8000 + 4000 * (_id % 3)
        assert r.channels == (1 if _id % 2 == 0 else 2)
        assert r.n_samples == n
        # RMS equals the closed-form expectation over the sample formula
        i = np.arange(n)[:, None]
        c = np.arange(r.channels)[None, :]
        want = ((31 * _id + 7 * i + 13 * c) % 2003 - 1001).astype(np.float64)
        assert abs(r.rms - round(float(np.sqrt((want**2).mean())), 6)) < 1e-9


def test_verify_audio_roundtrip_catches_corruption(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(6)
    wavs = synthesize_pcm_wavs(docs)
    assert verify_audio_roundtrip(wavs).filter(~F.col("ok")).count() == 0

    def corrupt(rows):
        import pandas as pd

        for pdf in rows:
            blobs = []
            for buf in pdf["media"]:
                b = bytearray(bytes(buf))
                b[60] ^= 0xFF  # inside PCM data
                blobs.append(bytes(b))
            pdf = pdf.copy()
            pdf["media"] = blobs
            yield pdf

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    bad = wavs.mapInPandas(corrupt, schema=schema)
    assert verify_audio_roundtrip(bad).filter(~F.col("ok")).count() == 6


# ---------------------------------------------------------------- AVI codec
from polars_lake_spark.operators.multimodal import (  # noqa: E402
    decode_avi,
    encode_avi,
    sample_video_frames,
    synthesize_jpeg,
    synthesize_mjpeg_avis,
)


def test_avi_roundtrip_frames_exact():
    frames = [synthesize_jpeg(40, 30, 3, b"x" * (5 + i)) for i in range(7)]
    buf = encode_avi(frames, 40, 30, fps=15)
    fps, w, h, got = decode_avi(buf)
    assert (fps, w, h) == (15, 40, 30)
    assert got == frames  # byte-identical frame extraction


def test_avi_roundtrip_odd_sized_frames():
    # odd-length chunks exercise RIFF word-alignment padding
    frames = [b"a" * 3, b"b" * 5, b"c" * 4]
    fps, w, h, got = decode_avi(encode_avi(frames, 8, 8, fps=25))
    assert got == frames


def test_avi_rejects_garbage_and_mismatch():
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # header/frame-count mismatch detected
    frames = [b"ab", b"cd"]
    buf = bytearray(encode_avi(frames, 8, 8))
    idx = buf.find(b"avih") + 8 + 16  # total_frames field
    buf[idx] = 9
    with pytest.raises(ValueError, match="mismatch"):
        decode_avi(bytes(buf))


def test_sample_video_frames_on_spark(spark, sf_dir):
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(9)
    avis = synthesize_mjpeg_avis(docs)
    # every_n=2: frames 0,2,4... per doc
    rows = sample_video_frames(avis, every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 9
    for _id, rs in by_doc.items():
        nf = 1 + _id % 5
        want_idx = list(range(0, nf, 2))
        assert sorted(r.frame_idx for r in rs) == want_idx
        for r in rs:
            assert r.fps == 10 + 5 * (_id % 4)
            assert r.fmt == "jpeg"
            assert r.width == 32 + _id % 64
            assert r.height == 24 + _id % 48
            assert r.n_bytes == 39 + 10 + r.frame_idx


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_all_color_types_roundtrip(c):
    """Color types 0/4/2/6 (gray, gray+alpha, RGB, RGBA) all roundtrip
    exactly — the decoder's channel map is fully exercised."""
    px = _rand(6, 5, c, seed=c)
    w, h, got_c, got = decode_png(encode_png(px))
    assert (w, h, got_c) == (5, 6, c)
    assert np.array_equal(got, px)


def test_codec_queries_have_no_preshuffle(spark, sf_dir):
    """The synth -> decode chains stay map-side: no Exchange before the
    Python stage (one narrow pipeline per modality)."""
    from polars_lake_spark.plans import executed_plan
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    for chain in (
        verify_pixel_roundtrip(synthesize_pixel_pngs(docs)),
        decode_audio(synthesize_pcm_wavs(docs)),
        sample_video_frames(synthesize_mjpeg_avis(docs)),
    ):
        plan = executed_plan(chain)
        # the only exchange allowed is the parallelize_for_cpu repartition
        # feeding the synth stage; decode must chain onto it shuffle-free
        assert plan.count("Exchange") <= 1, plan


def test_box_resize_upsample_no_nan():
    """Upsampling >2x must nearest-neighbor cleanly - floor edge mapping
    guarantees non-empty source windows (rounded edges produced NaN)."""
    px = np.array([[[10], [200]]], dtype=np.uint8)  # 1x2 image
    out = box_resize(px, 4, 4)
    assert out.shape == (4, 4, 1)
    assert set(out.ravel().tolist()) == {10, 200}  # no NaN-derived zeros
    assert np.array_equal(out[:, :2, 0], np.full((4, 2), 10))
    assert np.array_equal(out[:, 2:, 0], np.full((4, 2), 200))


def test_decode_images_real_nulls_on_corrupt_png(spark, sf_dir):
    """A blob with a valid PNG signature but corrupt body must follow the
    on_undecodable='null' contract, not kill the Spark task."""
    from pyspark.sql import types as T

    rows = [(1, encode_png(_rand(4, 4, 3, 1))), (2, _PNG_SIG + b"garbage")]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    df = spark.createDataFrame(rows, schema)
    got = {r.doc_id: r for r in decode_images_real(df).collect()}
    assert got[1].width == 4 and got[1].mean_intensity is not None
    assert got[2].width is None and got[2].mean_intensity is None


def test_decode_wav_rejects_zero_channels_and_rate():
    s = np.zeros((4, 1), dtype=np.int16)
    good = encode_wav(s, 8000)
    b = bytearray(good)
    b[22] = 0  # nChannels -> 0
    with pytest.raises(ValueError, match="malformed"):
        decode_wav(bytes(b))
    b = bytearray(good)
    b[24:28] = (0).to_bytes(4, "little")  # sample rate -> 0
    with pytest.raises(ValueError, match="malformed"):
        decode_wav(bytes(b))


def test_encode_avi_declares_no_index():
    buf = encode_avi([b"xx"], 8, 8)
    i = buf.find(b"avih") + 8
    flags = int.from_bytes(buf[i + 12 : i + 16], "little")
    assert flags & 0x10 == 0  # AVIF_HASINDEX not set (no idx1 written)


# --------------------------------------------------------- property fuzzing
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, c), dtype=np.uint8)
    got_w, got_h, got_c, got = decode_png(encode_png(px))
    assert (got_w, got_h, got_c) == (w, h, c)
    assert np.array_equal(got, px)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 11025, 16000, 44100, 48000]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    s = (
        np.random.RandomState(seed)
        .randint(-32768, 32768, size=(n, ch))
        .astype(np.int16)
    )
    got_rate, got_ch, got = decode_wav(encode_wav(s, rate))
    assert (got_rate, got_ch) == (rate, ch)
    assert np.array_equal(got, s)


@settings(max_examples=15, deadline=None)
@given(
    n_frames=st.integers(0, 8),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(n_frames, fps, seed):
    rng = np.random.RandomState(seed)
    frames = [
        rng.randint(0, 256, size=rng.randint(1, 64), dtype=np.uint8).tobytes()
        for _ in range(n_frames)
    ]
    got_fps, _w, _h, got = decode_avi(encode_avi(frames, 16, 16, fps))
    assert got_fps == fps
    assert got == frames
