"""Multimodal column plumbing tests (synthetic binary assets)."""

from __future__ import annotations

import pandas as pd
import pytest
from vinum_spark.operators.media_synth import (  # shared spec-built encoders
    _FlacW,
    _bmp_bytes,
    _G711_SEG_ENDS,
    _Vp8lW,
    _alaw_encode_scalar,
    _flac_bytes,
    _flac_encode,
    _flac_rice_write,
    _flac_write_subframe,
    _ima_encode,
    _mulaw_encode_scalar,
    _tf_color,
    _tf_palette,
    _tf_predictor,
    _tf_subtract_green,
    _vp8l_byte_tree,
    _vp8l_emit_stream,
    _vp8l_encode,
    _vp8l_lz77_sym,
    _vp8l_tree,
    _vp8l_wrap,
    _wav_bytes,
)
from pyspark.sql import functions as F

# spec-correct headers: PNG 64x48 RGBA (IHDR), JPEG 120x80 3-component
# (APP0 then SOF0), GIF89a 320x200 (logical screen descriptor)
PNG = (
    b"\x89PNG\r\n\x1a\n"
    + (13).to_bytes(4, "big") + b"IHDR"
    + (64).to_bytes(4, "big") + (48).to_bytes(4, "big")
    + bytes([8, 6, 0, 0, 0]) + b"\x00" * 4  # bitdepth, RGBA, …, crc
    + b"\x00" * 32
)
JPG = (
    b"\xff\xd8"
    + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    + b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
    + (80).to_bytes(2, "big") + (120).to_bytes(2, "big") + bytes([3])
    + b"\x00" * 9
    + b"\x01" * 40
)
GIF = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 20
MP4 = b"\x00\x00\x00\x18ftypmp42" + b"\x02" * 200
RAW = b"justsomebytes" * 10


@pytest.fixture(scope="module")
def assets(spark):
    rows = [(0, PNG), (1, JPG), (2, MP4), (3, RAW), (4, GIF)]
    return spark.createDataFrame(rows, "asset_id long, content binary")


def test_attach_metadata_sniffs_mime(assets):
    from vinum_spark.operators.multimodal import attach_metadata

    out = {
        int(r["asset_id"]): r["meta"]
        for r in attach_metadata(assets).collect()
    }
    assert out[0]["mime"] == "image/png"
    assert out[1]["mime"] == "image/jpeg"
    assert out[2]["mime"] == "video/mp4"
    assert out[3]["mime"] == "application/octet-stream"
    assert out[0]["size_bytes"] == len(PNG)
    assert len(out[0]["sha1"]) == 40


def test_decode_images_shapes(assets):
    from vinum_spark.operators.multimodal import decode_images

    out = decode_images(assets).toPandas().set_index("asset_id")
    assert len(out) == 5
    # TRUE dimensions parsed from the container headers, no codec libs
    png, jpg, gif = out.loc[0], out.loc[1], out.loc[4]
    assert (png.height, png.width, png.channels) == (48, 64, 4)
    assert png.decoder in ("png-header", "pil")
    assert (jpg.height, jpg.width, jpg.channels) == (80, 120, 3)
    assert jpg.decoder in ("jpeg-sof", "pil")
    assert (gif.height, gif.width) == (200, 320)
    assert gif.decoder in ("gif-header", "pil")
    # unrecognized containers fall back to the labeled deterministic fake
    assert out.loc[3].decoder in ("stub", "pil")
    # deterministic: same bytes → same shape across runs
    again = decode_images(assets).toPandas().set_index("asset_id")
    assert out[["height", "width"]].equals(again[["height", "width"]])


def test_extract_features_unit_vectors(assets):
    from vinum_spark.operators.multimodal import extract_features

    import numpy as np

    out = extract_features(assets).toPandas()
    assert len(out) == 5
    for v in out["feature"]:
        assert len(v) == 64  # one dim for every extractor (= 8x8 pools)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)


def test_feature_feeds_similarity(assets, spark):
    from vinum_spark.operators.multimodal import extract_features
    from vinum_spark.operators import cosine_topk

    feats = extract_features(assets).withColumnRenamed("asset_id", "vec_id").withColumnRenamed(
        "feature", "embedding"
    )
    q = feats.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    top = cosine_topk(feats, q, k=2)
    assert top.collect()[0]["vec_id"] == 0


def test_sample_frames_explodes_rows(assets):
    from vinum_spark.operators.multimodal import sample_frames

    frames = sample_frames(assets, every_n=50).toPandas()
    assert len(frames) > 4  # more rows out than in
    assert set(frames.columns) == {"asset_id", "frame_idx", "frame", "decoder"}
    mp4_frames = frames[frames.asset_id == 2]
    assert mp4_frames.frame_idx.tolist() == list(range(len(mp4_frames)))


def test_attach_metadata_digests_match_hashlib(assets):
    """sha1 (default) and sha256 meta digests must equal hashlib's over
    the raw bytes (the oracle gate can only check a hex-portable digest;
    this pins the raw-byte path)."""
    import hashlib

    from vinum_spark.operators.multimodal import attach_metadata

    by_id_sha1 = {
        int(r["asset_id"]): r["meta"]["sha1"]
        for r in attach_metadata(assets).collect()
    }
    by_id_sha256 = {
        int(r["asset_id"]): r["meta"]["sha256"]
        for r in attach_metadata(assets, hash_algo="sha256").collect()
    }
    assert by_id_sha1[0] == hashlib.sha1(PNG).hexdigest()
    assert by_id_sha256[0] == hashlib.sha256(PNG).hexdigest()
    assert by_id_sha256[1] == hashlib.sha256(JPG).hexdigest()


def test_attach_metadata_rejects_unknown_algo(assets):
    from vinum_spark.operators.multimodal import attach_metadata

    with pytest.raises(ValueError, match="hash_algo"):
        attach_metadata(assets, hash_algo="md5")


# spec-correct WAV: PCM stereo 44100 Hz 16-bit; data chunk declares
# 176400 bytes (= exactly 1.0 s at the fmt byte rate)
WAV = (
    b"RIFF" + (36 + 176400).to_bytes(4, "little") + b"WAVE"
    + b"fmt " + (16).to_bytes(4, "little")
    + (1).to_bytes(2, "little")        # PCM
    + (2).to_bytes(2, "little")        # channels
    + (44100).to_bytes(4, "little")    # sample rate
    + (176400).to_bytes(4, "little")   # byte rate
    + (4).to_bytes(2, "little")        # block align
    + (16).to_bytes(2, "little")       # bits per sample
    + b"data" + (176400).to_bytes(4, "little")
    + b"\x00" * 64                     # truncated payload: header rules
)


def _mp4_with_moov() -> bytes:
    """Minimal ISO-BMFF: ftyp + moov(mvhd v0 ts=1000 dur=5500,
    trak(tkhd v0 640x360))."""
    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"mp42" + b"\x00" * 4
    mvhd = (
        (32).to_bytes(4, "big") + b"mvhd"
        + bytes(4)                      # version 0 + flags
        + bytes(8)                      # creation, modification
        + (1000).to_bytes(4, "big")     # timescale
        + (5500).to_bytes(4, "big")     # duration -> 5.5 s
        + bytes(4)
    )
    tkhd_payload = bytearray(84)
    tkhd_payload[76:80] = (640 << 16).to_bytes(4, "big")   # 16.16 width
    tkhd_payload[80:84] = (360 << 16).to_bytes(4, "big")   # 16.16 height
    tkhd = (8 + 84).to_bytes(4, "big") + b"tkhd" + bytes(tkhd_payload)
    trak = (8 + len(tkhd)).to_bytes(4, "big") + b"trak" + tkhd
    moov_body = mvhd + trak
    moov = (8 + len(moov_body)).to_bytes(4, "big") + b"moov" + moov_body
    return ftyp + moov


def test_probe_media_wav_fmt_chunk(spark):
    """WAV metadata from header bytes alone: decoder must be the real
    parser, never 'stub' (VERDICT r6 item 6)."""
    from vinum_spark.operators.multimodal import probe_media

    df = spark.createDataFrame([(0, WAV)], "asset_id long, content binary")
    row = probe_media(df).collect()[0]
    assert row["decoder"] == "wav-fmt"
    assert row["kind"] == "audio"
    assert row["channels"] == 2
    assert row["sample_rate"] == 44100
    assert row["bits_per_sample"] == 16
    assert abs(row["duration_s"] - 1.0) < 1e-9


def test_probe_media_mp4_mvhd(spark):
    from vinum_spark.operators.multimodal import probe_media

    df = spark.createDataFrame(
        [(0, _mp4_with_moov())], "asset_id long, content binary"
    )
    row = probe_media(df).collect()[0]
    assert row["decoder"] == "mp4-mvhd"
    assert row["kind"] == "video"
    assert abs(row["duration_s"] - 5.5) < 1e-9
    assert (row["width"], row["height"]) == (640, 360)


def test_probe_media_unknown_is_honest_stub(spark):
    """Unrecognized bytes (including a moov-less ftyp stub) come back
    NULL-fielded with decoder='stub' — never invented numbers."""
    from vinum_spark.operators.multimodal import probe_media

    df = spark.createDataFrame(
        [(0, RAW), (1, MP4)], "asset_id long, content binary"
    )
    rows = {r["asset_id"]: r for r in probe_media(df).collect()}
    for r in rows.values():
        assert r["decoder"] == "stub"
        assert r["duration_s"] is None and r["sample_rate"] is None


def test_probe_media_image_containers(spark):
    """Image containers probe to kind='image' with header dims and a
    channel count — never a pixel decode (the decoder label is the
    header path's, not a pixel path's)."""
    import numpy as np

    from vinum_spark.operators.multimodal import probe_media

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (20, 30, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (0, _bmp_header_bytes(w=320, h=200)),
            (1, _tiff_full(img, compression=5)),
            (2, _webp_bytes("VP8X", w=1024, h=768)),
        ],
        "asset_id long, content binary",
    )
    rows = {r["asset_id"]: r for r in probe_media(df).collect()}
    assert rows[0]["kind"] == "image"
    assert (rows[0]["width"], rows[0]["height"]) == (320, 200)
    assert rows[0]["decoder"] == "bmp-header"
    assert rows[0]["duration_s"] is None
    # a compressed TIFF probes via the IFD, not a strip decode
    assert (rows[1]["kind"], rows[1]["decoder"]) == ("image", "tiff-ifd")
    assert (rows[1]["width"], rows[1]["height"]) == (30, 20)
    assert (rows[2]["width"], rows[2]["height"]) == (1024, 768)


def _sine_wav(freq=440.0, rate=8000, seconds=0.5, amp=0.5, channels=1):
    """Spec-built PCM16 WAV with a real sine payload."""
    import numpy as np

    n = int(rate * seconds)
    t = np.arange(n) / rate
    mono = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    pcm = np.repeat(mono, channels).tobytes()
    byte_rate = rate * channels * 2
    return (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little")
        + pcm
    )


def test_decode_audio_real_pcm_stats(spark):
    """decode_audio performs a REAL PCM16 decode: RMS of a sine is
    amp/sqrt(2), peak is amp, duration is n/rate — numbers a stub
    cannot fake."""
    import math

    from vinum_spark.operators.multimodal import decode_audio

    wav = _sine_wav(amp=0.5, rate=8000, seconds=0.5)
    df = spark.createDataFrame(
        [(0, wav), (1, b"not audio at all")], "asset_id long, content binary"
    )
    rows = {r["asset_id"]: r for r in decode_audio(df).collect()}
    good = rows[0]
    assert good["decoder"] == "pcm16"
    assert good["n_channels"] == 1
    assert good["sample_rate"] == 8000
    assert good["n_samples"] == 4000
    assert abs(good["duration_s"] - 0.5) < 1e-9
    assert abs(good["rms"] - 0.5 / math.sqrt(2)) < 0.01
    assert abs(good["peak"] - 0.5) < 0.01
    bad = rows[1]
    assert bad["decoder"] == "stub"
    assert bad["rms"] is None and bad["n_samples"] is None


def test_decode_audio_stereo_frames(spark):
    from vinum_spark.operators.multimodal import decode_audio

    wav = _sine_wav(rate=4000, seconds=0.25, channels=2)
    df = spark.createDataFrame([(0, wav)], "asset_id long, content binary")
    row = decode_audio(df).collect()[0]
    assert row["n_channels"] == 2
    assert row["n_samples"] == 1000  # frames, not interleaved samples
    assert abs(row["duration_s"] - 0.25) < 1e-9


def _png_rgb(arr, filters=None):
    """Spec-built PNG encoder (stdlib only): 8-bit RGB, one IDAT,
    per-row filter codes (default all 0/None)."""
    import binascii
    import zlib

    import numpy as np

    h, w, _ = arr.shape
    filters = filters or [0] * h

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + binascii.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # 8-bit, truecolor, no interlace
    )
    raw = b""
    prev = np.zeros(w * 3, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        f = filters[y]
        if f == 0:
            filt = line
        elif f == 1:  # Sub
            filt = (line - np.concatenate([np.zeros(3, np.int32), line[:-3]])) % 256
        elif f == 2:  # Up
            filt = (line - prev) % 256
        else:
            raise ValueError(f)
        raw += bytes([f]) + bytes(filt.astype(np.uint8))
        prev = line
    return (
        bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_pixels_roundtrip_all_filters(spark):
    """_png_pixels must reproduce the source array exactly through
    zlib + None/Sub/Up scanline filters."""
    import numpy as np

    from vinum_spark.operators.multimodal import _png_pixels

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (12, 10, 3), dtype=np.uint8)
    png = _png_rgb(arr, filters=[0, 1, 2] * 4)
    got = _png_pixels(png)
    assert got is not None and got.shape == (12, 10, 3)
    assert np.array_equal(got, arr)


def test_decode_images_real_png_pixels(spark):
    import numpy as np

    from vinum_spark.operators.multimodal import decode_images

    arr = np.zeros((16, 24, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, _png_rgb(arr)), (1, b"not an image")],
        "asset_id long, content binary",
    )
    rows = {r["asset_id"]: r for r in decode_images(df, pixels=True).collect()}
    assert rows[0]["decoder"] == "png-zlib"
    assert (rows[0]["height"], rows[0]["width"], rows[0]["channels"]) == (16, 24, 3)
    assert rows[1]["decoder"] == "stub"
    # default path: dims from header bytes, no per-asset decompression
    cheap = {r["asset_id"]: r for r in decode_images(df).collect()}
    assert cheap[0]["decoder"] == "png-header"
    assert (cheap[0]["height"], cheap[0]["width"]) == (16, 24)


def test_extract_features_real_png_similarity(spark):
    """Real pooled-grayscale features: a near-identical image pair must
    be close in cosine; an inverted image must not."""
    import numpy as np

    from vinum_spark.operators.multimodal import extract_features

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[:2, :2] = 0  # tiny corner edit
    far = (255 - base).astype(np.uint8)
    df = spark.createDataFrame(
        [(0, _png_rgb(base)), (1, _png_rgb(near)), (2, _png_rgb(far))],
        "asset_id long, content binary",
    )
    out = extract_features(df).toPandas().set_index("asset_id")
    assert set(out.extractor) == {"png-pool8"}
    f = {i: np.array(out.loc[i].feature) for i in (0, 1, 2)}
    cos = lambda a, b: float(a @ b)  # unit vectors
    assert cos(f[0], f[1]) > 0.9
    assert cos(f[0], f[2]) < -0.9  # inversion flips the centered feature


def test_extract_features_uniform_dims_mixed_corpus(spark):
    """A corpus mixing decodable PNGs, flat PNGs (fallback path), and
    undecodable bytes must yield ONE feature dimensionality — mixed
    dims would break any downstream cosine/LSH stage."""
    import numpy as np

    from vinum_spark.operators.multimodal import extract_features

    rng = np.random.RandomState(2)
    textured = _png_rgb(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8))
    flat = _png_rgb(np.full((16, 16, 3), 128, dtype=np.uint8))
    df = spark.createDataFrame(
        [(0, textured), (1, flat), (2, b"jpeg-ish opaque bytes")],
        "asset_id long, content binary",
    )
    out = extract_features(df).toPandas().set_index("asset_id")
    dims = {i: len(out.loc[i].feature) for i in (0, 1, 2)}
    assert dims == {0: 64, 1: 64, 2: 64}
    assert out.loc[0].extractor == "png-pool8"
    assert out.loc[1].extractor == "png-pool8"  # flat fallback, same dim
    assert out.loc[2].extractor == "stub"


def test_resize_images_mixed_formats(spark):
    """resize_images over a mixed corpus: GIF, TIFF and WebP-lossless
    inputs all resize through their real decoders and come back as
    PNGs that decode to exactly the target dims."""
    import numpy as np

    from vinum_spark.operators.multimodal import _png_pixels, resize_images

    arr = np.random.RandomState(3).randint(0, 4, (10, 12, 3)).astype(
        np.uint8) * 80
    gif = _encode_gif(arr)
    tiff = _tiff_full(np.random.RandomState(4).randint(
        0, 256, (9, 11, 3), dtype=np.uint8), compression=8)
    A, B = 0xFF336699, 0xFFCC9933
    webp = _vp8l_encode(
        [("lit", (A if (x + y) % 2 else B))
         for y in range(9) for x in range(12)], 12, 9)
    df = spark.createDataFrame(
        [(0, gif), (1, tiff), (2, webp), (3, b"junk")],
        "asset_id long, content binary",
    )
    out = resize_images(df, 6, 6).toPandas().set_index("asset_id")
    assert out.loc[0, "resizer"] == "gif-nn"
    assert out.loc[1, "resizer"] == "tiff-nn"
    assert out.loc[2, "resizer"] == "webp-nn"
    assert out.loc[3, "resizer"] == "stub"
    for aid in (0, 1, 2):
        px = _png_pixels(bytes(out.loc[aid, "content"]))
        assert px is not None and px.shape[:2] == (6, 6)


def test_resize_images_real_roundtrip(spark):
    """resize_images: decodable PNG -> real nearest-neighbor resample ->
    re-encoded PNG that decodes back to exactly the target shape with
    the expected sample values; undecodable bytes pass through."""
    import numpy as np

    from vinum_spark.operators.multimodal import _png_pixels, resize_images

    rng = np.random.RandomState(9)
    arr = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, _png_rgb(arr)), (1, b"opaque")], "asset_id long, content binary"
    )
    rows = {r["asset_id"]: r for r in resize_images(df, 8, 8).collect()}
    ok = rows[0]
    assert ok["resizer"] == "png-nn"
    out = _png_pixels(bytes(ok["content"]))
    assert out.shape == (8, 8, 3)
    yi = (np.arange(8) * 16) // 8
    xi = (np.arange(8) * 24) // 8
    assert np.array_equal(out, arr[yi][:, xi])
    passthru = rows[1]
    assert passthru["resizer"] == "stub"
    assert bytes(passthru["content"]) == b"opaque"


def _animated_gif(n_frames: int) -> bytes:
    """Minimal structurally-valid GIF89a with n image descriptors."""
    out = b"GIF89a" + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    out += bytes([0x00, 0x00, 0x00])  # packed (no GCT), bg, aspect
    for _ in range(n_frames):
        # graphic control extension (label 0xF9, 4-byte block, terminator)
        out += bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
        # image descriptor: separator, x=0, y=0, w=2, h=2, packed=0
        out += bytes([0x2C]) + b"\x00\x00\x00\x00" + (2).to_bytes(2, "little") + (2).to_bytes(2, "little") + bytes([0x00])
        # LZW min code size + one fake data sub-block + terminator
        out += bytes([0x02, 0x03, 0xAA, 0xBB, 0xCC, 0x00])
    return out + bytes([0x3B])


def test_sample_frames_real_gif_block_walk(spark):
    from vinum_spark.operators.multimodal import _gif_frame_spans, sample_frames

    gif = _animated_gif(5)
    spans = _gif_frame_spans(gif)
    assert len(spans) == 5
    for lo, hi in spans:
        assert gif[lo] == 0x2C  # each frame starts at its image descriptor

    df = spark.createDataFrame([(1, gif)], "asset_id long, content binary")
    frames = sample_frames(df, every_n=2).toPandas()
    # frames 0, 2, 4 of 5
    assert frames.frame_idx.tolist() == [0, 1, 2]
    assert (frames.decoder == "gif-blocks").all()
    assert all(bytes(f)[0] == 0x2C for f in frames.frame)


def test_sample_frames_avi_movi_chunks(spark):
    """AVI frame extraction: LIST movi walk yields exactly the video
    ##dc/##db payloads (audio ##wb excluded, 'rec ' nesting included),
    with decoder='avi-movi' and every_n sampling applied."""
    from vinum_spark.operators.multimodal import (_avi_frame_spans,
                                                  sample_frames)

    vids = [bytes([i]) * (20 + i) for i in range(6)]
    recs = [b"R1" * 8, b"R2" * 9]
    avi = _avi_bytes(video_frames=vids, audio_chunks=[b"a" * 33],
                     rec_frames=recs)
    spans = _avi_frame_spans(avi)
    assert [avi[lo:hi] for lo, hi in spans] == vids + recs

    df = spark.createDataFrame([(0, avi)], "asset_id long, content binary")
    frames = sample_frames(df, every_n=2).toPandas()
    assert set(frames.decoder) == {"avi-movi"}
    got = [bytes(f) for f in frames.sort_values("frame_idx").frame]
    assert got == (vids + recs)[::2]

    # headers-only AVI (no movi list): no real frames -> stub path
    stub = sample_frames(
        spark.createDataFrame([(0, _avi_bytes())],
                              "asset_id long, content binary"),
        every_n=10,
    ).toPandas()
    assert set(stub.decoder) == {"stub"}


def test_vp8l_two_color_literals():
    """Minimal VP8L: two-color literal image through simple prefix
    codes round-trips to the exact RGBA pixels."""
    import numpy as np

    from vinum_spark.operators.multimodal import _webp_pixels

    A = 0xFF2060B0
    B = 0xFF90E517
    w_, h_ = 9, 5
    pattern = [(A if (x + y) % 2 else B) for y in range(h_)
               for x in range(w_)]
    data = _vp8l_encode([("lit", p) for p in pattern], w_, h_)
    px = _webp_pixels(data)
    assert px is not None and px.shape == (h_, w_, 4)
    flat = (
        px[..., 3].astype(np.uint32) << 24
        | px[..., 0].astype(np.uint32) << 16
        | px[..., 1].astype(np.uint32) << 8
        | px[..., 2].astype(np.uint32)
    ).ravel()
    assert flat.tolist() == pattern


def test_vp8l_lz77_and_cl_coded_tree():
    """LZ77 copies (left and row-above distances through the neighbor
    map) with a code-length-coded green tree round-trip exactly."""
    import numpy as np

    from vinum_spark.operators.multimodal import _webp_pixels

    A = 0xFF123456
    w_, h_ = 10, 4
    # row 0: A then 9 copies of left (dist map idx 2 -> (1,0) -> dist 1)
    # rows 1-3: copy the 30 pixels from the row above (map idx 1 ->
    # (0,1) -> dist w)
    toks = [("lit", A), ("copy", 9, 2), ("copy", 30, 1)]
    data = _vp8l_encode(toks, w_, h_)
    px = _webp_pixels(data)
    assert px is not None and px.shape == (h_, w_, 4)
    assert (px[..., 0] == 0x12).all()
    assert (px[..., 1] == 0x34).all()
    assert (px[..., 2] == 0x56).all()


def test_vp8l_color_cache():
    """Color-cache references (green symbols past 256+24) resolve to
    the hashed recent pixels."""
    import numpy as np

    from vinum_spark.operators.multimodal import _webp_pixels

    cache_bits = 4
    A = 0xFF102030
    B = 0xFF405060

    def idx(px):
        return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)

    assert idx(A) != idx(B)
    w_, h_ = 4, 2
    toks = [("lit", A), ("lit", B), ("cache", idx(A)), ("cache", idx(B))] * 2
    body = _Vp8lW()
    body.w(0, 1)  # no more transforms (none present)
    body.w(1, 1)  # color cache present
    body.w(cache_bits, 4)
    body.w(0, 1)  # no meta prefix codes
    greens = sorted({(A >> 8) & 0xFF, (B >> 8) & 0xFF,
                     256 + 24 + idx(A), 256 + 24 + idx(B)})
    g_map = _vp8l_tree(body, greens, 256 + 24 + (1 << cache_bits))
    r_map = _vp8l_tree(body, sorted({(A >> 16) & 0xFF, (B >> 16) & 0xFF}),
                       256)
    b_map = _vp8l_tree(body, sorted({A & 0xFF, B & 0xFF}), 256)
    a_map = _vp8l_tree(body, {0xFF}, 256)
    _vp8l_tree(body, {0}, 40)
    for tok in toks:
        if tok[0] == "lit":
            p = tok[1]
            body.code(*g_map[(p >> 8) & 0xFF])
            body.code(*r_map[(p >> 16) & 0xFF])
            body.code(*b_map[p & 0xFF])
            body.code(*a_map[0xFF])
        else:
            body.code(*g_map[256 + 24 + tok[1]])
    data = _vp8l_wrap(body, w_, h_)
    px = _webp_pixels(data)
    assert px is not None
    flat = (
        px[..., 3].astype(np.uint32) << 24
        | px[..., 0].astype(np.uint32) << 16
        | px[..., 1].astype(np.uint32) << 8
        | px[..., 2].astype(np.uint32)
    ).ravel().tolist()
    assert flat == [A, B, A, B, A, B, A, B]


def _rgba_flat(px):
    import numpy as np

    return (
        px[..., 3].astype(np.uint32) << 24
        | px[..., 0].astype(np.uint32) << 16
        | px[..., 1].astype(np.uint32) << 8
        | px[..., 2].astype(np.uint32)
    ).ravel().tolist()


def test_vp8l_subtract_green_transform():
    from vinum_spark.operators.multimodal import _webp_pixels

    A = 0xFF5A9C3D
    B = 0xFFC81F77
    w_, h_ = 6, 4
    want = [(A if x % 2 else B) for y in range(h_) for x in range(w_)]

    def sub_green(p):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        return (p & 0xFF00FF00) | (r << 16) | b

    data = _vp8l_encode(
        [("lit", sub_green(p)) for p in want], w_, h_,
        transforms=[_tf_subtract_green],
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == want


def test_vp8l_predictor_transform():
    """Left-predictor residual stream reconstructs the horizontal
    gradient exactly (border rules: black at origin, Left on row 0,
    Top on column 0)."""
    from vinum_spark.operators.multimodal import _webp_pixels

    w_, h_ = 8, 5
    step_r, step_g, step_b = 3, 5, 7
    row = [
        0xFF000000
        | ((step_r * (x + 1) & 0xFF) << 16)
        | ((step_g * (x + 1) & 0xFF) << 8)
        | (step_b * (x + 1) & 0xFF)
        for x in range(w_)
    ]
    want = row * h_
    # residuals vs mode-1 (Left): (0,0) vs black pred -> first pixel
    # values (incl. alpha 0xff - 0xff = 0); row 0 x>0 -> step; col 0
    # y>0 vs Top -> 0; interior vs Left -> step
    step_px = (step_r << 16) | (step_g << 8) | step_b
    resid = []
    for y in range(h_):
        for x in range(w_):
            if x == 0 and y == 0:
                resid.append(step_px)  # first pixel == step values
            elif x == 0:
                resid.append(0)
            else:
                resid.append(step_px)
    data = _vp8l_encode(
        [("lit", p) for p in resid], w_, h_,
        transforms=[_tf_predictor(mode=1)],
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == want


def test_vp8l_color_transform():
    """Cross-color transform: the decoder adds the per-tile deltas
    back (g2r on red; g2b then r2b on blue)."""
    from vinum_spark.operators.multimodal import _webp_pixels

    g2r, g2b, r2b = 0x30, 0xE8, 0x11  # mixed signs as int8
    w_, h_ = 5, 3

    def delta(t, c):
        if t >= 128:
            t -= 256
        if c >= 128:
            c -= 256
        return (t * c) >> 5

    want = [0xFF64C832] * (w_ * h_)  # constant image
    g = 0xC8
    r_t = (0x64 - delta(g2r, g)) & 0xFF
    b_t = (0x32 - delta(g2b, g) - delta(r2b, 0x64)) & 0xFF
    token = 0xFF000000 | (r_t << 16) | (g << 8) | b_t
    data = _vp8l_encode(
        [("lit", token)] * (w_ * h_), w_, h_,
        transforms=[_tf_color(g2r, g2b, r2b)],
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == want


def test_vp8l_palette_bundled_and_wide():
    """Color-indexing: a 2-entry palette exercises 8-pixels-per-byte
    bundling; a 32-entry palette exercises the unbundled index path
    and delta-coded palette reconstruction."""
    from vinum_spark.operators.multimodal import _webp_pixels

    # 2 colors, width 16 -> bundled width 2 bytes/row
    A, B = 0xFF112233, 0xFFAABBCC
    w_, h_ = 16, 3
    bits_rows = [[(x + y) % 2 for x in range(w_)] for y in range(h_)]
    want = [(B if v else A) for row in bits_rows for v in row]
    packed_tokens = []
    for row in bits_rows:
        for b0 in range(0, w_, 8):
            byte = sum(row[b0 + k] << k for k in range(8))
            packed_tokens.append(("lit", byte << 8))
    data = _vp8l_encode(
        packed_tokens, w_, h_, transforms=[_tf_palette([A, B])]
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == want

    # 32 entries (no bundling), 8 distinct indices used -> L3 tree
    pal = [(0xFF000000 | (0x010203 * (i + 1)) & 0xFFFFFF) | 0xFF000000
           for i in range(32)]
    w2, h2 = 8, 4
    idxs = [(3 * x + y) % 8 * 4 for y in range(h2) for x in range(w2)]
    want2 = [pal[i] for i in idxs]
    data2 = _vp8l_encode(
        [("lit", i << 8) for i in idxs], w2, h2,
        transforms=[_tf_palette(pal)],
    )
    px2 = _webp_pixels(data2)
    assert px2 is not None
    assert _rgba_flat(px2) == want2


def test_vp8l_meta_prefix_groups():
    """Meta prefix codes: two tile groups with disjoint literal trees,
    selected by the (r<<8)|g of the huffman image."""
    from vinum_spark.operators.multimodal import _webp_pixels

    A, B = 0xFF204060, 0xFF90B0D0
    w_, h_ = 16, 2
    prefix_bits = 3  # tiles of 8 -> 2x1 huffman image
    want = [(A if x < 8 else B) for y in range(h_) for x in range(w_)]
    w = _Vp8lW()
    w.w(0, 1)  # no transforms
    w.w(0, 1)  # no color cache
    w.w(1, 1)  # meta prefix present
    w.w(prefix_bits - 2, 3)
    # huffman image (2x1): group ids 0 and 1 in (r<<8)|g
    w.w(0, 1)  # sub-image: no color cache
    _vp8l_emit_stream(w, [("lit", 0 << 8), ("lit", 1 << 8)])
    # group 0 trees (A only), group 1 trees (B only)
    for color in (A, B):
        g_map = _vp8l_tree(w, {(color >> 8) & 0xFF}, 256 + 24)
        r_map = _vp8l_tree(w, {(color >> 16) & 0xFF}, 256)
        b_map = _vp8l_tree(w, {color & 0xFF}, 256)
        a_map = _vp8l_tree(w, {0xFF}, 256)
        _vp8l_tree(w, {0}, 40)
    # all codes are 0-bit constants -> pixel stream needs no bits at
    # all, but emit in order anyway (zero-length writes)
    data = _vp8l_wrap(w, w_, h_)
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == want


def _vp8l_forward_predict(img, w_, h_, modes, tile_bits):
    """Forward predictor: residuals = px - pred per channel mod 256,
    mirroring the spec's border rules and all 14 modes (independent
    transcription used to drive the decoder's inverse)."""

    def chans(p):
        return [(p >> s) & 0xFF for s in (24, 16, 8, 0)]

    def pack(c):
        return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]

    def avg2(a, b):
        return pack([(x + y) >> 1 for x, y in zip(chans(a), chans(b))])

    def clamp(v):
        return max(0, min(255, v))

    tw = (w_ + (1 << tile_bits) - 1) >> tile_bits
    out = []
    for y in range(h_):
        for x in range(w_):
            pos = y * w_ + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = img[pos - 1]
            elif x == 0:
                pred = img[pos - w_]
            else:
                mode = modes[(y >> tile_bits) * tw + (x >> tile_bits)]
                L = img[pos - 1]
                T = img[pos - w_]
                TL = img[pos - w_ - 1]
                TR = img[pos - w_ + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:
                    # spec Select: UNCLAMPED estimate, ties -> top
                    pl = sum(
                        abs((lc + tc - tlc) - lc)
                        for lc, tc, tlc in zip(chans(L), chans(T), chans(TL))
                    )
                    pt = sum(
                        abs((lc + tc - tlc) - tc)
                        for lc, tc, tlc in zip(chans(L), chans(T), chans(TL))
                    )
                    pred = L if pl < pt else T
                elif mode == 12:
                    pred = pack([
                        clamp(lc + tc - tlc)
                        for lc, tc, tlc in zip(chans(L), chans(T), chans(TL))
                    ])
                else:
                    # libwebp AddSubtractComponentHalf: C trunc-to-zero
                    # division of (ave - TL), then Clip255
                    def _half13(lc, tc, tlc):
                        ave = (lc + tc) >> 1
                        d = ave - tlc
                        h = abs(d) >> 1
                        return clamp(ave + (h if d >= 0 else -h))

                    pred = pack([
                        _half13(lc, tc, tlc)
                        for lc, tc, tlc in zip(chans(L), chans(T), chans(TL))
                    ])
            out.append(pack([
                (pc - qc) & 0xFF for pc, qc in zip(chans(img[pos]),
                                                   chans(pred))
            ]))
    return out


def test_vp8l_all_predictor_modes_random_images():
    """Every predictor mode 0-13 round-trips a RANDOM image exactly
    (via the full-byte trees), including the Select and
    ClampAddSubtract arithmetic — the hardest inverse-transform code."""
    import numpy as np

    from vinum_spark.operators.multimodal import _webp_pixels

    rng = np.random.RandomState(77)
    w_, h_ = 11, 7
    for mode in range(14):
        img = [
            0xFF000000 | int(v)
            for v in rng.randint(0, 1 << 24, w_ * h_, dtype=np.int64)
        ]
        resid = _vp8l_forward_predict(img, w_, h_, [mode], 9)
        data = _vp8l_encode(
            [("lit", p) for p in resid], w_, h_,
            transforms=[_tf_predictor(mode)], full_byte=True,
        )
        px = _webp_pixels(data)
        assert px is not None, f"mode {mode}"
        assert _rgba_flat(px) == img, f"mode {mode}"


def test_vp8l_predictor13_trunc_division_known_answer():
    """Known-answer vector for ClampAddSubtractHalf (mode 13) computed
    BY HAND from the libwebp arithmetic (`a + (a - b) / 2`, C division
    truncating toward zero).  Chosen so (ave - TL) is odd and negative
    on the green channel: floor division would predict 8, libwebp
    predicts 9 — a decoder using Python `//` fails this pin even
    though it round-trips its own floor-based encoder."""
    from vinum_spark.operators.multimodal import _webp_pixels

    # 2x2 image; only (1,1) exercises mode 13.
    # (0,0)=ARGB FF000A0A  (1,0)=FF000B0B  (0,1)=FF000D0D
    # L=(0,1): g=13 b=13; T=(1,0): g=11 b=11; TL=(0,0): g=10 b=10
    # g: ave=(13+11)>>1=12, d=12-10=2,  pred=12+1=13
    # pick values to force a NEGATIVE odd d on blue instead:
    # use TL blue=15: d=12-15=-3 -> trunc -1 -> pred 11; floor -> 10
    img = [0xFF000A0F, 0xFF000B0B, 0xFF000D0D, 0]  # TL, T, L, target
    # target true pixel: blue 200, green 7
    target = 0xFF0007C8
    # residual = target - pred (mod 256) per channel
    # green: ave=(13+11)>>1=12, d=12-10=2, pred=12+1=13; r=(7-13)&255=250
    # blue:  ave=(13+11)>>1=12, d=12-15=-3, trunc(-3/2)=-1, pred=11;
    #        r=(200-11)&255=189
    # alpha: ave=255, d=0, pred=255; r=0.  red: pred=0; r=0
    img[3] = target
    resid = [
        0x00000A0F,              # (0,0): pred 0xFF000000 -> r = px-pred
        0,                       # (1,0): filled below
        0,                       # (0,1): filled below
        0,                       # (1,1): filled below
    ]
    # recompute (1,0): px FF000B0B - left FF000A0F per channel mod 256:
    resid[1] = (0x00 << 24) | (0x00 << 16) | (0x01 << 8) | ((0x0B - 0x0F) & 0xFF)
    # (0,1): px FF000D0D - top FF000A0F:
    resid[2] = (0x00 << 24) | (0x00 << 16) | (0x03 << 8) | ((0x0D - 0x0F) & 0xFF)
    resid[3] = (0x00 << 24) | (0x00 << 16) | (250 << 8) | 189
    data = _vp8l_encode(
        [("lit", p) for p in resid], 2, 2,
        transforms=[_tf_predictor(13)], full_byte=True,
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == img


def test_vp8l_select_tie_goes_to_top_known_answer():
    """Known-answer vector for Select (mode 11) tie-breaking: when
    pL == pT with L != T the spec returns TOP (`if (pL < pT) return L;
    else return T`), not left."""
    from vinum_spark.operators.multimodal import _webp_pixels

    # TL=FF000000, T=FF000004, L=FF000002:
    # estimate=L+T-TL -> blue 6; |6-L|=4, |6-T|=2 -> pT < pL -> top.
    # For a TIE: TL blue=3 -> est=3; |3-2|=1 vs |3-4|=1 -> tie -> TOP.
    img = [0xFF000003, 0xFF000004, 0xFF000002, 0]
    target_resid_blue = 0x10  # arbitrary
    # pred at (1,1) must be TOP (blue 4): pixel = 4 + 0x10 = 0x14
    expect = 0xFF000014
    img[3] = expect
    resid = [
        0x00000003,                  # (0,0): pred FF000000
        (0x01) & 0xFF,               # (1,0): px-left = 4-3 = 1 (blue)
        ((0x02 - 0x03) & 0xFF),      # (0,1): px-top = 2-3 = -1
        target_resid_blue,
    ]
    data = _vp8l_encode(
        [("lit", p) for p in resid], 2, 2,
        transforms=[_tf_predictor(11)], full_byte=True,
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == img


def test_vp8l_multi_tile_predictors():
    """Per-tile predictor modes: a 4-pixel tile grid with a different
    mode in every tile round-trips a random image exactly."""
    import numpy as np

    from vinum_spark.operators.multimodal import _webp_pixels

    rng = np.random.RandomState(99)
    w_, h_, tile_bits = 14, 9, 2
    tw = (w_ + 3) >> 2
    th = (h_ + 3) >> 2
    modes = [int(m) for m in rng.randint(0, 14, tw * th)]
    img = [
        0xFF000000 | int(v)
        for v in rng.randint(0, 1 << 24, w_ * h_, dtype=np.int64)
    ]
    resid = _vp8l_forward_predict(img, w_, h_, modes, tile_bits)
    data = _vp8l_encode(
        [("lit", p) for p in resid], w_, h_,
        transforms=[_tf_predictor(modes, tile_bits=tile_bits)],
        full_byte=True,
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == img


def test_vp8l_multi_tile_color_transform_random():
    """Per-tile cross-color elements over a random image: the forward
    transform (subtract deltas; r2b applied against the ORIGINAL red)
    inverts exactly through the decoder."""
    import numpy as np

    from vinum_spark.operators.multimodal import _webp_pixels

    rng = np.random.RandomState(41)
    w_, h_, tile_bits = 10, 6, 2
    tw = (w_ + 3) >> 2
    th = (h_ + 3) >> 2
    elements = [int(v) for v in rng.randint(0, 1 << 24, tw * th)]
    img = [
        0xFF000000 | int(v)
        for v in rng.randint(0, 1 << 24, w_ * h_, dtype=np.int64)
    ]

    def delta(t, c):
        if t >= 128:
            t -= 256
        if c >= 128:
            c -= 256
        return (t * c) >> 5

    toks = []
    for pos, p in enumerate(img):
        y, x = divmod(pos, w_)
        el = elements[(y >> tile_bits) * tw + (x >> tile_bits)]
        g2r, g2b, r2b = el & 0xFF, (el >> 8) & 0xFF, (el >> 16) & 0xFF
        g = (p >> 8) & 0xFF
        r = (p >> 16) & 0xFF
        b = p & 0xFF
        r_t = (r - delta(g2r, g)) & 0xFF
        b_t = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
        toks.append(("lit", (p & 0xFF00FF00) | (r_t << 16) | b_t))
    data = _vp8l_encode(
        toks, w_, h_,
        transforms=[_tf_color(elements, tile_bits=tile_bits)],
        full_byte=True,
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == img


def test_vp8l_combined_transforms_and_long_distance():
    """Two stacked transforms invert in reverse read order (stream
    lists [subtract-green, predictor]; decoder applies predictor⁻¹
    then add-green), and a plain >120 distance code copies across
    rows."""
    import numpy as np

    from vinum_spark.operators.multimodal import _webp_pixels

    rng = np.random.RandomState(5)
    w_, h_ = 9, 6
    img = [
        0xFF000000 | int(v)
        for v in rng.randint(0, 1 << 24, w_ * h_, dtype=np.int64)
    ]

    def sub_green(p):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        return (p & 0xFF00FF00) | (r << 16) | b

    stage1 = [sub_green(p) for p in img]
    resid = _vp8l_forward_predict(stage1, w_, h_, [2], 9)  # mode Top
    data = _vp8l_encode(
        [("lit", p) for p in resid], w_, h_,
        transforms=[_tf_subtract_green, _tf_predictor(2)],
        full_byte=True,
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == img

    # plain distance: dist_code 123 -> dist 3 (beyond the 120-map)
    A, B, C = 0xFF101010, 0xFF202020, 0xFF303030
    toks = [("lit", A), ("lit", B), ("lit", C), ("copy", 9, 123)]
    px2 = _webp_pixels(_vp8l_encode(toks, 4, 3))
    assert px2 is not None
    assert _rgba_flat(px2) == [A, B, C] * 4


def test_vp8l_predictor_after_palette_uses_bundled_width():
    """Exotic-but-legal transform order [color-indexing, predictor]:
    the predictor was applied to the BUNDLED image, so its inverse
    must run at the bundled width before the palette unbundles."""
    import numpy as np

    from vinum_spark.operators.multimodal import _webp_pixels

    A, B = 0xFF112233, 0xFFAABBCC
    w_, h_ = 16, 4  # bundled: 2 bytes per row (width_bits 3)
    bits_rows = [[(x + y) % 2 for x in range(w_)] for y in range(h_)]
    want = [(B if v else A) for row in bits_rows for v in row]
    bw = w_ // 8
    packed = [
        sum(row[b0 + k] << k for k in range(8)) << 8
        for row in bits_rows for b0 in range(0, w_, 8)
    ]
    resid = _vp8l_forward_predict(packed, bw, h_, [1], 9)
    data = _vp8l_encode(
        [("lit", p) for p in resid], w_, h_,
        transforms=[_tf_palette([A, B]), _tf_predictor(1)],
        full_byte=True,
    )
    px = _webp_pixels(data)
    assert px is not None
    assert _rgba_flat(px) == want


def test_vp8l_no_alpha_hint_three_channels():
    """A VP8L stream whose header declares no alpha decodes to a
    3-channel array — the channel count then matches the header-dims
    path for the same file."""
    from vinum_spark.operators.multimodal import (_header_dims,
                                                  _webp_pixels)

    w = _Vp8lW()
    w.w(0, 1)
    w.w(0, 1)
    w.w(0, 1)
    _vp8l_emit_stream(w, [("lit", 0xFF336699)] * 12)
    data = _vp8l_wrap(w, 4, 3, alpha_hint=0)
    px = _webp_pixels(data)
    assert px is not None and px.shape == (3, 4, 3)
    hdr = _header_dims(data)
    assert hdr is not None and hdr[:3] == (3, 4, 3)


def test_vp8l_decode_images_and_features(spark):
    """decode_images(pixels=True) reports webp-vp8l with pixel-exact
    dims; extract_features pools the decoded pixels (webp-pool8); a
    header-dims-only lossy WebP stays on the header path."""
    import numpy as np

    from vinum_spark.operators.multimodal import (decode_images,
                                                  extract_features)

    A, B = 0xFF336699, 0xFFCC9933
    w_, h_ = 12, 9
    pattern = [(A if (x // 3 + y // 3) % 2 else B)
               for y in range(h_) for x in range(w_)]
    vp8l = _vp8l_encode([("lit", p) for p in pattern], w_, h_)
    df = spark.createDataFrame(
        [(0, vp8l), (1, _webp_bytes("VP8L"))],
        "asset_id long, content binary",
    )
    out = decode_images(df, pixels=True).toPandas().set_index("asset_id")
    assert out.loc[0, "decoder"] == "webp-vp8l-pixels"
    assert (out.loc[0, "height"], out.loc[0, "width"]) == (h_, w_)
    assert out.loc[1, "decoder"] == "webp-vp8l"  # header-dims fallback
    feats = {r["asset_id"]: r for r in extract_features(df).collect()}
    assert feats[0]["extractor"] == "webp-pool8"
    v = np.array(feats[0]["feature"])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_sample_frames_webm_simpleblocks(spark):
    """Matroska/WebM frame extraction: SimpleBlock payloads come back
    exactly (track varint + timecode + flags stripped), BlockGroup >
    Block works, laced blocks are skipped, and the headers-only file
    still parses for metadata but yields no real frames."""
    from vinum_spark.operators.multimodal import (_webm_frame_spans,
                                                  sample_frames)

    vids = [bytes([0x40 + i]) * (25 + i) for i in range(5)]
    grouped = [b"G" * 40]
    webm = _webm_bytes(frames=vids, laced_frames=[b"L" * 30],
                       grouped_frames=grouped)
    spans = _webm_frame_spans(webm)
    assert [webm[lo:hi] for lo, hi in spans] == vids + grouped

    df = spark.createDataFrame([(0, webm)], "asset_id long, content binary")
    frames = sample_frames(df, every_n=2).toPandas()
    assert set(frames.decoder) == {"webm-blocks"}
    got = [bytes(f) for f in frames.sort_values("frame_idx").frame]
    assert got == (vids + grouped)[::2]

    assert _webm_frame_spans(_webm_bytes()) == []


def test_webm_track_127_blocks_not_skipped():
    """Track number 127 encodes as the 1-byte varint 0xFF — the
    all-ones pattern is a plain value here, not the element-size
    unknown sentinel, so its blocks must still be extracted."""
    from vinum_spark.operators.multimodal import _webm_frame_spans

    vids = [b"frame-a" * 4, b"frame-b" * 4]
    webm = _webm_bytes(frames=vids, block_track=127)
    spans = _webm_frame_spans(webm)
    assert [webm[lo:hi] for lo, hi in spans] == vids


def test_sample_frames_truncated_gif_falls_back_to_stub(spark):
    from vinum_spark.operators.multimodal import sample_frames

    broken = _animated_gif(3)[:-8]  # cut mid-frame
    df = spark.createDataFrame([(1, broken)], "asset_id long, content binary")
    frames = sample_frames(df, every_n=10).toPandas()
    assert (frames.decoder == "stub").all()  # refused, never guessed


def test_extract_features_real_wav_rms_envelope(spark):
    """Real WAV features: same loudness envelope at different sample
    rates stays close in cosine; a bursty envelope does not."""
    import numpy as np

    from vinum_spark.operators.multimodal import extract_features

    steady_a = _sine_wav(freq=440.0, rate=8000, seconds=0.5, amp=0.5)
    steady_b = _sine_wav(freq=220.0, rate=4000, seconds=0.5, amp=0.5)
    # bursty: loud first half, near-silent second half
    import struct

    rate, seconds = 8000, 0.5
    n = int(rate * seconds)
    t = np.arange(n) / rate
    amp = np.where(t < seconds / 2, 0.9, 0.01)
    samples = (amp * np.sin(2 * np.pi * 440.0 * t) * 32767).astype("<i2")
    payload = samples.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(payload))
    )
    bursty = hdr + payload
    df = spark.createDataFrame(
        [(0, steady_a), (1, steady_b), (2, bursty)],
        "asset_id long, content binary",
    )
    out = extract_features(df).toPandas().set_index("asset_id")
    assert set(out.extractor) == {"wav-rms64"}
    f = {i: np.array(out.loc[i].feature) for i in (0, 1, 2)}
    cos = lambda a, b: float(a @ b)
    assert cos(f[0], f[1]) > 0.98  # same flat envelope, different rate/pitch
    assert cos(f[0], f[2]) < 0.85  # half-silent envelope is far


def test_extract_features_flac_wav_twins_identical(spark):
    """A FLAC and a WAV of the SAME recording land on the SAME
    RMS-envelope vector (FLAC is lossless), under distinct extractor
    labels — the near-dup property the feature exists for."""
    import numpy as np

    from vinum_spark.operators.multimodal import extract_features

    n = 4000
    lin = np.round(
        0.3 * 32767 * np.sin(2 * np.pi * 220 * np.arange(n) / 8000)
    ).astype(np.int64)
    wav = _wav_bytes(lin.astype("<i2").tobytes(), 1, 1, 8000, 16)
    flac = _flac_encode(lin, rate=8000, mode="fixed2")
    df = spark.createDataFrame(
        [(0, wav), (1, flac)], "asset_id long, content binary"
    )
    out = {r["asset_id"]: r for r in extract_features(df).collect()}
    assert out[0]["extractor"] == "wav-rms64"
    assert out[1]["extractor"] == "flac-rms64"
    assert np.array_equal(
        np.array(out[0]["feature"]), np.array(out[1]["feature"])
    )


def test_extract_features_silent_wav_unit_vector(spark):
    # review regression: digital silence must not produce a zero vector
    import numpy as np
    import struct

    from vinum_spark.operators.multimodal import extract_features

    rate = 8000
    payload = (np.zeros(4000, dtype="<i2")).tobytes()
    silent = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    df = spark.createDataFrame([(0, silent)], "asset_id long, content binary")
    out = extract_features(df).collect()[0]
    assert out["extractor"] == "wav-rms64"
    v = np.array(out["feature"])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def _encode_gif(px, interlace: bool = False) -> bytes:
    """Spec-valid GIF89a encoder for tests: 'uncompressed' LZW (literal
    codes with a clear before every pair so the code width never grows),
    256-entry palette built from the image's distinct colors."""
    import numpy as np

    h, w, _ = px.shape
    colors, inverse = np.unique(px.reshape(-1, 3), axis=0, return_inverse=True)
    assert len(colors) <= 256
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    indices = inverse.reshape(h, w)
    if interlace:
        rows = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            rows.extend(range(start, h, step))
        indices = indices[rows]
    mcs = 8  # 256-color table -> min code size 8, width 9
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes = []
    flat = indices.ravel().tolist()
    for i, v in enumerate(flat):
        if i % 2 == 0:
            codes.append(clear)  # keep dictionary (and width) fixed
        codes.append(v)
    codes.append(end)
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    gif = bytearray(b"GIF89a")
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0x80 | 0x07, 0x00, 0x00])  # GCT present, 256 entries
    gif += palette.tobytes()
    gif += bytes([0x2C]) + b"\x00\x00\x00\x00"
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0x40 if interlace else 0x00, mcs])
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += bytes([0x00, 0x3B])
    return bytes(gif)


def test_gif_pixels_roundtrip():
    import numpy as np

    from vinum_spark.operators.multimodal import _gif_pixels

    rng = np.random.RandomState(5)
    px = rng.randint(0, 255, (16, 12, 3), dtype=np.uint8)
    got = _gif_pixels(_encode_gif(px))
    assert got is not None and got.shape == (16, 12, 3)
    assert (got == px).all()


def test_gif_pixels_interlaced_roundtrip():
    import numpy as np

    from vinum_spark.operators.multimodal import _gif_pixels

    rng = np.random.RandomState(6)
    px = rng.randint(0, 255, (13, 9, 3), dtype=np.uint8)
    got = _gif_pixels(_encode_gif(px, interlace=True))
    assert got is not None and (got == px).all()


def test_gif_pixels_rejects_garbage():
    from vinum_spark.operators.multimodal import _gif_pixels

    assert _gif_pixels(b"GIF89a" + b"\x00" * 6) is None
    assert _gif_pixels(b"not a gif at all") is None


def test_extract_features_real_gif(spark):
    import numpy as np

    from vinum_spark.operators.multimodal import extract_features

    rng = np.random.RandomState(8)
    # GIF is palette-indexed: build from a 64-color palette
    pal = rng.randint(0, 255, (64, 3), dtype=np.uint8)
    base = pal[rng.randint(0, 64, (32, 32))]
    near = base.copy(); near[:2, :2] = 0
    df = spark.createDataFrame(
        [(0, _encode_gif(base)), (1, _encode_gif(near))],
        "asset_id long, content binary",
    )
    out = extract_features(df).toPandas().set_index("asset_id")
    assert set(out.extractor) == {"gif-pool8"}
    f0, f1 = np.array(out.loc[0].feature), np.array(out.loc[1].feature)
    assert float(f0 @ f1) > 0.9  # near-identical frames stay close


def _lzw_compress(indices, mcs):
    """Reference greedy GIF-LZW compressor for tests: builds the
    dictionary, grows code width, emits a clear only when the table
    fills — exercising the decoder's dictionary-reference, KwKwK, and
    width-growth branches that the 'uncompressed' encoder never hits."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    codes = [clear]
    buf = ()
    out_bits = []
    for v in indices:
        cand = buf + (v,)
        if cand in table:
            buf = cand
            continue
        codes.append(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            codes.append(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        buf = (v,)
    if buf:
        codes.append(table[buf])
    codes.append(end)
    # emission pass: write each code with the width THE DECODER will
    # use, by simulating its state machine (no dictionary add happens
    # for the first code after a clear — the off-by-one that matters)
    acc = nbits = 0
    width = mcs + 1
    next_d = end + 1
    first_after_clear = True
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            width = mcs + 1
            next_d = end + 1
            first_after_clear = True
        elif c != end:
            if first_after_clear:
                first_after_clear = False
            else:
                next_d += 1
                if next_d == (1 << width) and width < 12:
                    width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_pixels_real_compressed_stream_roundtrip():
    """Decoder correctness on a COMPRESSED stream: repeated patterns
    force dictionary references, KwKwK sequences, and width growth."""
    import numpy as np

    from vinum_spark.operators.multimodal import _gif_pixels

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 255, (16, 3), dtype=np.uint8)
    # repetitive rows -> heavy dictionary reuse; 48x40 = 1920 indices
    row = np.tile(np.array([0, 1, 2, 3, 3, 2, 1, 0], dtype=np.int64), 6)
    indices = np.tile(row, (40, 1))
    px = pal[indices]
    h, w = indices.shape
    mcs = 4  # 16-color palette
    lzw = _lzw_compress(indices.ravel().tolist(), mcs)
    gif = bytearray(b"GIF89a")
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0x80 | 0x03, 0x00, 0x00])  # GCT, 16 entries
    gif += pal.tobytes()
    gif += bytes([0x2C]) + b"\x00\x00\x00\x00"
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0x00, mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += bytes([0x00, 0x3B])
    got = _gif_pixels(bytes(gif))
    assert got is not None and (got == px).all()


def test_gif_pixels_rejects_corrupt_min_code_size():
    # review regression: a huge LZW min-code-size byte must fail fast,
    # not build a 2^mcs dictionary
    from vinum_spark.operators.multimodal import _gif_pixels

    gif = bytearray(b"GIF89a")
    gif += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    gif += bytes([0x80, 0x00, 0x00]) + bytes(6)  # tiny GCT (2 entries)
    gif += bytes([0x2C]) + b"\x00\x00\x00\x00"
    gif += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    gif += bytes([0x00, 24, 0x02, 0xAA, 0xBB, 0x00, 0x3B])  # mcs=24!
    import time

    t0 = time.perf_counter()
    assert _gif_pixels(bytes(gif)) is None
    assert time.perf_counter() - t0 < 0.5  # fail fast, no dict explosion


def test_gif_pixels_rejects_bomb_dimensions():
    from vinum_spark.operators.multimodal import _gif_pixels

    gif = bytearray(b"GIF89a")
    gif += (65535).to_bytes(2, "little") + (65535).to_bytes(2, "little")
    gif += bytes([0x00, 0x00, 0x00])
    gif += bytes([0x2C]) + b"\x00\x00\x00\x00"
    gif += (65535).to_bytes(2, "little") + (65535).to_bytes(2, "little")
    gif += bytes([0x00, 0x08, 0x01, 0x00, 0x00, 0x3B])
    assert _gif_pixels(bytes(gif)) is None


def test_gif_pixels_composites_subframe_onto_screen():
    # review regression: a sub-rectangle first frame must place at its
    # offset on the logical screen so dims match the header path
    import numpy as np

    from vinum_spark.operators.multimodal import _gif_pixels

    pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    gif = bytearray(b"GIF89a")
    gif += (8).to_bytes(2, "little") + (6).to_bytes(2, "little")  # screen 8x6
    gif += bytes([0x80, 0x00, 0x00])  # GCT 2 entries, bg index 0
    gif += pal.tobytes()
    # 2x2 frame of color 1 at offset (3, 2)
    gif += bytes([0x2C]) + (3).to_bytes(2, "little") + (2).to_bytes(2, "little")
    gif += (2).to_bytes(2, "little") + (2).to_bytes(2, "little") + bytes([0x00])
    mcs = 2
    # uncompressed: clear, 1, 1, clear, 1, 1, end at width 3, LSB-first
    codes = [4, 1, 1, 4, 1, 1, 5]
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            data.append(acc & 0xFF); acc >>= 8; nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    gif += bytes([mcs, len(data)]) + data + bytes([0x00, 0x3B])
    got = _gif_pixels(bytes(gif))
    assert got is not None and got.shape == (6, 8, 3)
    assert (got[2:4, 3:5] == pal[1]).all()      # frame at its offset
    assert (got[0, 0] == pal[0]).all()           # background elsewhere


# ---------------------------------------------------------------------------
# baseline JPEG: spec-valid test encoder + decoder round-trip
# ---------------------------------------------------------------------------


def _encode_jpeg(px, qval=2, subsampling="444", restart_interval=0,
                 full_tables=False):
    """Baseline JPEG encoder for tests: 4:4:4 / 4:2:0 / 4:2:2, custom
    canonical Huffman tables (fixed 9-bit codes for every used symbol —
    valid per spec below 511 symbols), flat quant table. Lossy like any
    JPEG; qval=2 keeps round-trip error within a few counts. Pads to
    MCU multiples and patches true dims into SOF (the decoder crops per
    spec). Subsampled chroma is 2x-block-averaged at encode (the
    decoder upsamples nearest). ``restart_interval``: emit DRI and an
    RSTn marker (byte-aligned, cycling 0-7, DC predictors reset) every
    N MCUs."""
    import numpy as np

    from vinum_spark.operators.multimodal import _JPEG_D, _JPEG_ZIGZAG

    samps = {"444": [(1, 1), (1, 1), (1, 1)],
             "420": [(2, 2), (1, 1), (1, 1)],
             "422": [(2, 1), (1, 1), (1, 1)]}[subsampling]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    h0, w0, _ = px.shape
    ph, pw = -(-h0 // (8 * vmax)) * 8 * vmax, -(-w0 // (8 * hmax)) * 8 * hmax
    px = np.pad(px, ((0, ph - h0), (0, pw - w0), (0, 0)), mode="edge")
    h, w, _ = px.shape
    q = np.full(64, qval, dtype=np.int64)
    p = px.astype(np.float64)
    y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    cb = 128.0 - 0.168735892 * p[..., 0] - 0.331264108 * p[..., 1] + 0.5 * p[..., 2]
    cr = 128.0 + 0.5 * p[..., 0] - 0.418687589 * p[..., 1] - 0.081312411 * p[..., 2]

    def down(plane, hi, vi):
        fy, fx = vmax // vi, hmax // hi
        if fy == fx == 1:
            return plane
        return plane.reshape(h // fy, fy, w // fx, fx).mean(axis=(1, 3))

    planes = [down(pl, hi, vi) - 128.0
              for pl, (hi, vi) in zip((y, cb, cr), samps)]

    def category(v):
        a = abs(int(v))
        return 0 if a == 0 else a.bit_length()

    # MCU-interleaved block order, matching the decoder's walk
    blocks = []
    nmy, nmx = h // (8 * vmax), w // (8 * hmax)
    for my in range(nmy):
        for mx in range(nmx):
            for c, (hi, vi) in enumerate(samps):
                for byi in range(vi):
                    for bxi in range(hi):
                        r0, c0 = (my * vi + byi) * 8, (mx * hi + bxi) * 8
                        blk = planes[c][r0:r0 + 8, c0:c0 + 8]
                        coef = _JPEG_D @ blk @ _JPEG_D.T
                        blocks.append((c, np.round(
                            coef.flatten()[_JPEG_ZIGZAG] / q[_JPEG_ZIGZAG]
                        ).astype(np.int64)))

    dc_syms, ac_syms, stream = set(), set(), []
    prev_dc = [0, 0, 0]
    bpm = sum(hi * vi for hi, vi in samps)  # blocks per MCU
    for bi, (c, zz) in enumerate(blocks):
        if restart_interval and bi % bpm == 0:
            mcu_idx = bi // bpm
            if mcu_idx and mcu_idx % restart_interval == 0:
                stream.append(
                    ("rst", (mcu_idx // restart_interval - 1) % 8, 0, 0)
                )
                prev_dc = [0, 0, 0]
        diff = int(zz[0]) - prev_dc[c]
        prev_dc[c] = int(zz[0])
        s = category(diff)
        dc_syms.add(s)
        stream.append(("dc", s, diff, s))
        last_nz = max([k for k in range(1, 64) if zz[k] != 0], default=0)
        run = 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                if run == 16:
                    ac_syms.add(0xF0); stream.append(("ac", 0xF0, 0, 0)); run = 0
                continue
            s = category(v)
            sym = (run << 4) | s
            ac_syms.add(sym); stream.append(("ac", sym, v, s)); run = 0
        if last_nz < 63:
            ac_syms.add(0x00); stream.append(("ac", 0x00, 0, 0))

    if full_tables:
        # content-INDEPENDENT tables over the whole baseline symbol
        # alphabet (162 AC + 12 DC symbols fit fixed 9-bit codes): every
        # image encodes with identical DHT segments — what a JPEG-in-
        # TIFF writer needs to share one JPEGTables across all strips
        dc_syms = set(range(12))
        ac_syms = {0x00, 0xF0} | {
            (run << 4) | size for run in range(16) for size in range(1, 11)
        }

    def table(symbols):
        vals = sorted(symbols)
        return vals, {v: i for i, v in enumerate(vals)}, [0]*8 + [len(vals)] + [0]*7

    dc_vals, dc_code, dc_bits = table(dc_syms)
    ac_vals, ac_code, ac_bits = table(ac_syms)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes(int(x) for x in q[_JPEG_ZIGZAG])
    out += b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
    out += h0.to_bytes(2, "big") + w0.to_bytes(2, "big") + b"\x03"
    for cid, (hi, vi) in zip((1, 2, 3), samps):
        out += bytes([cid, (hi << 4) | vi, 0x00])
    for cls, vals, bits in ((0, dc_vals, dc_bits), (1, ac_vals, ac_bits)):
        out += b"\xff\xc4" + (19 + len(vals)).to_bytes(2, "big")
        out += bytes([cls << 4]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big")
        out += restart_interval.to_bytes(2, "big")
    out += b"\xff\xda" + (12).to_bytes(2, "big") + b"\x03"
    for cid in (1, 2, 3):
        out += bytes([cid, 0x00])
    out += b"\x00\x3f\x00"
    acc = n = 0
    ent = bytearray()
    def emit(value, nbits):
        nonlocal acc, n
        for i in range(nbits - 1, -1, -1):
            acc = (acc << 1) | ((value >> i) & 1)
            n += 1
            if n == 8:
                ent.append(acc)
                if acc == 0xFF:
                    ent.append(0x00)
                acc = 0; n = 0
    for kind, sym, v, s in stream:
        if kind == "rst":
            while n:  # pad to byte boundary, then the bare marker
                emit(1, 1)
            ent.append(0xFF)
            ent.append(0xD0 + sym)
            continue
        emit((dc_code if kind == "dc" else ac_code)[sym], 9)
        if s:
            emit(int(v) if v >= 0 else int(v) + (1 << s) - 1, s)
    while n:
        emit(1, 1)
    out += ent + b"\xff\xd9"
    return bytes(out)


def _smooth_rgb(seed, h, w):
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (-(-h // 8), -(-w // 8), 3)).astype(float)
    big = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    return np.clip(big + rng.standard_normal((h, w, 3)) * 2, 0, 255).astype(np.uint8)


def test_jpeg_pixels_roundtrip():
    import numpy as np

    from vinum_spark.operators.multimodal import _jpeg_pixels

    px = _smooth_rgb(1, 32, 32)
    dec = _jpeg_pixels(_encode_jpeg(px))
    assert dec is not None and dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.max() <= 16 and err.mean() < 4  # lossy but close


def test_jpeg_pixels_odd_dims_crop():
    import numpy as np

    from vinum_spark.operators.multimodal import _jpeg_pixels

    px = _smooth_rgb(2, 20, 25)
    dec = _jpeg_pixels(_encode_jpeg(px))
    assert dec is not None and dec.shape == (20, 25, 3)
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 16


def test_jpeg_pixels_roundtrip_420():
    """4:2:0 — the dominant web-corpus layout: 2x2-subsampled chroma,
    MCU-interleaved (4 Y blocks then Cb then Cr per 16x16 MCU)."""
    import numpy as np

    from vinum_spark.operators.multimodal import _jpeg_pixels

    px = _smooth_rgb(4, 32, 48)
    dec = _jpeg_pixels(_encode_jpeg(px, subsampling="420"))
    assert dec is not None and dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    # chroma is block-averaged at encode and nearest-upsampled at
    # decode, so the bound is looser than 4:4:4 but still tight on a
    # block-smooth image
    assert err.max() <= 24 and err.mean() < 5


def test_jpeg_pixels_roundtrip_420_odd_dims_crop():
    import numpy as np

    from vinum_spark.operators.multimodal import _jpeg_pixels

    px = _smooth_rgb(5, 21, 19)  # forces MCU padding on both axes
    dec = _jpeg_pixels(_encode_jpeg(px, subsampling="420"))
    assert dec is not None and dec.shape == (21, 19, 3)
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 24


def test_jpeg_pixels_roundtrip_422():
    import numpy as np

    from vinum_spark.operators.multimodal import _jpeg_pixels

    px = _smooth_rgb(6, 24, 40)
    dec = _jpeg_pixels(_encode_jpeg(px, subsampling="422"))
    assert dec is not None and dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 24


def test_decode_images_420_fixture_uses_jpeg_huff(spark):
    """A 4:2:0 fixture must now take the real pixel path (decoder
    'jpeg-huff'), not fall back to header dims."""
    from vinum_spark.operators.multimodal import decode_images

    px = _smooth_rgb(7, 32, 32)
    df = spark.createDataFrame(
        [(0, _encode_jpeg(px, subsampling="420"))], "asset_id long, content binary"
    )
    out = decode_images(df, pixels=True).toPandas()
    assert out.loc[0, "decoder"] == "jpeg-huff"
    assert (out.loc[0, "height"], out.loc[0, "width"]) == (32, 32)


def test_jpeg_pixels_rejects_unsupported_profiles():
    from vinum_spark.operators.multimodal import _jpeg_pixels

    assert _jpeg_pixels(b"\xff\xd8junk") is None
    assert _jpeg_pixels(b"nope") is None
    prog = b"\xff\xd8\xff\xc2" + (11).to_bytes(2, "big") + bytes(9)
    assert _jpeg_pixels(prog) is None  # progressive
    # dimension bomb: patch SOF dims huge
    bomb = bytearray(_encode_jpeg(_smooth_rgb(3, 8, 8)))
    i = bomb.find(b"\xff\xc0")
    bomb[i+5:i+7] = (65535).to_bytes(2, "big")
    bomb[i+7:i+9] = (65535).to_bytes(2, "big")
    assert _jpeg_pixels(bytes(bomb)) is None


def test_extract_features_real_jpeg(spark):
    import numpy as np

    from vinum_spark.operators.multimodal import extract_features

    base = _smooth_rgb(4, 32, 32)
    near = base.copy(); near[:2, :2] = 0
    df = spark.createDataFrame(
        [(0, _encode_jpeg(base)), (1, _encode_jpeg(near))],
        "asset_id long, content binary",
    )
    out = extract_features(df).toPandas().set_index("asset_id")
    assert set(out.extractor) == {"jpeg-pool8"}
    f0, f1 = np.array(out.loc[0].feature), np.array(out.loc[1].feature)
    assert float(f0 @ f1) > 0.9


def test_decode_images_jpeg_pixel_dims(spark):
    from vinum_spark.operators.multimodal import decode_images

    df = spark.createDataFrame(
        [(0, _encode_jpeg(_smooth_rgb(5, 24, 17)))], "asset_id long, content binary"
    )
    out = decode_images(df, pixels=True).collect()[0]
    assert (out["height"], out["width"], out["decoder"]) == (24, 17, "jpeg-huff")


def test_jpeg_corrupt_sos_component_count_returns_none():
    # review regression: SOS declaring more components than its segment
    # holds must fail to None, not IndexError the task
    from vinum_spark.operators.multimodal import _jpeg_pixels

    good = bytearray(_encode_jpeg(_smooth_rgb(6, 8, 8)))
    i = good.find(b"\xff\xda")
    good[i + 4] = 255  # ns byte inside a 12-byte segment
    assert _jpeg_pixels(bytes(good)) is None


def test_gif_subframe_with_local_table_uses_global_bg():
    # review regression: bg color must come from the GLOBAL table even
    # when the frame carries a smaller LOCAL table (and a large global
    # bg index must not IndexError into the local palette)
    import numpy as np

    from vinum_spark.operators.multimodal import _gif_pixels

    gpal = np.zeros((256, 3), dtype=np.uint8)
    gpal[100] = [9, 8, 7]  # background color at global index 100
    lpal = np.array([[1, 1, 1], [250, 250, 250]], dtype=np.uint8)
    gif = bytearray(b"GIF89a")
    gif += (8).to_bytes(2, "little") + (6).to_bytes(2, "little")
    gif += bytes([0x80 | 0x07, 100, 0x00])  # 256-entry GCT, bg=100
    gif += gpal.tobytes()
    # 2x2 sub-frame at (3,2) with a 2-entry LOCAL color table
    gif += bytes([0x2C]) + (3).to_bytes(2, "little") + (2).to_bytes(2, "little")
    gif += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    gif += bytes([0x80])  # local table, 2 entries
    gif += lpal.tobytes()
    mcs = 2
    codes = [4, 1, 1, 4, 1, 1, 5]
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            data.append(acc & 0xFF); acc >>= 8; nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    gif += bytes([mcs, len(data)]) + data + bytes([0x00, 0x3B])
    got = _gif_pixels(bytes(gif))
    assert got is not None and got.shape == (6, 8, 3)
    assert (got[2:4, 3:5] == lpal[1]).all()   # frame uses local table
    assert (got[0, 0] == gpal[100]).all()     # bg from GLOBAL table


# ---------------------------------------------------------------------------
# MP4 key-frame extraction (stbl sample-table walk) — round 8
# ---------------------------------------------------------------------------

_MP4_SIZES = [10, 12, 8, 14, 9, 11]


def _bmff_box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def _mp4_with_samples(with_stss=True, co64=False) -> bytes:
    """Minimal playable-shaped ISO-BMFF: ftyp + mdat (6 samples in 2
    chunks: 4 then 2) + moov(trak(mdia(hdlr 'vide', minf(stbl(stsz,
    stsc, stco|co64, [stss 1,4,6]))))). Sample i is filled with byte
    0xA0+i so frame payloads are recognizable."""
    ftyp = _bmff_box(b"ftyp", b"mp42" + b"\x00" * 4)
    payloads = [bytes([0xA0 + i]) * n for i, n in enumerate(_MP4_SIZES)]
    mdat = _bmff_box(b"mdat", b"".join(payloads))
    base = len(ftyp) + 8  # first sample offset inside mdat
    chunk_offsets = [base, base + sum(_MP4_SIZES[:4])]
    stsz = _bmff_box(
        b"stsz",
        b"\x00" * 4 + (0).to_bytes(4, "big") + len(_MP4_SIZES).to_bytes(4, "big")
        + b"".join(n.to_bytes(4, "big") for n in _MP4_SIZES),
    )
    stsc = _bmff_box(
        b"stsc",
        b"\x00" * 4 + (2).to_bytes(4, "big")
        + b"".join(v.to_bytes(4, "big") for v in (1, 4, 1, 2, 2, 1)),
    )
    if co64:
        stco = _bmff_box(
            b"co64",
            b"\x00" * 4 + (2).to_bytes(4, "big")
            + b"".join(o.to_bytes(8, "big") for o in chunk_offsets),
        )
    else:
        stco = _bmff_box(
            b"stco",
            b"\x00" * 4 + (2).to_bytes(4, "big")
            + b"".join(o.to_bytes(4, "big") for o in chunk_offsets),
        )
    stbl_body = stsz + stsc + stco
    if with_stss:
        stbl_body += _bmff_box(
            b"stss",
            b"\x00" * 4 + (3).to_bytes(4, "big")
            + b"".join(k.to_bytes(4, "big") for k in (1, 4, 6)),
        )
    minf = _bmff_box(b"minf", _bmff_box(b"stbl", stbl_body))
    hdlr = _bmff_box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    trak = _bmff_box(b"trak", _bmff_box(b"mdia", hdlr + minf))
    return ftyp + mdat + _bmff_box(b"moov", trak)


def test_mp4_keyframe_spans_sync_samples():
    from vinum_spark.operators.multimodal import _mp4_keyframe_spans

    data = _mp4_with_samples()
    base = len(_bmff_box(b"ftyp", b"mp42" + b"\x00" * 4)) + 8
    offs = [base]
    for n in _MP4_SIZES[:-1]:
        offs.append(offs[-1] + n)
    want = [(offs[k - 1], offs[k - 1] + _MP4_SIZES[k - 1]) for k in (1, 4, 6)]
    assert _mp4_keyframe_spans(data) == want
    # each span slices exactly the sample's fill bytes
    for (lo, hi), k in zip(want, (1, 4, 6)):
        assert data[lo:hi] == bytes([0xA0 + k - 1]) * (hi - lo)


def test_mp4_keyframe_spans_no_stss_all_sync():
    """Absent stss = every sample is a sync sample (14496-12 §8.6.2)."""
    from vinum_spark.operators.multimodal import _mp4_keyframe_spans

    assert len(_mp4_keyframe_spans(_mp4_with_samples(with_stss=False))) == 6


def test_mp4_keyframe_spans_co64():
    from vinum_spark.operators.multimodal import _mp4_keyframe_spans

    assert len(_mp4_keyframe_spans(_mp4_with_samples(co64=True))) == 3


def test_mp4_keyframe_spans_rejects_offsets_past_eof():
    """A truncated/hostile file whose chunk offsets run past EOF must
    return None (degrade to stub), never invent frame bytes."""
    from vinum_spark.operators.multimodal import _mp4_keyframe_spans

    data = _mp4_with_samples()
    assert _mp4_keyframe_spans(data[: len(data) - 40]) is None  # moov gone
    # chop mdat short but keep moov: spans would run past EOF
    full = _mp4_with_samples()
    moov_at = full.rindex(b"moov") - 4
    truncated = full[:30] + full[moov_at:]
    assert _mp4_keyframe_spans(truncated) is None


def test_sample_frames_mp4_real_keyframes(spark):
    """sample_frames on an MP4 with sample tables must emit the real
    sync-sample payloads with decoder='mp4-stbl' — the stub label is
    gone for table-bearing MP4s."""
    from vinum_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(0, _mp4_with_samples())], "asset_id long, content binary"
    )
    out = sample_frames(df, every_n=1).toPandas().sort_values("frame_idx")
    assert out.decoder.tolist() == ["mp4-stbl"] * 3
    assert [bytes(f)[:1] for f in out.frame] == [b"\xa0", b"\xa3", b"\xa5"]
    assert [len(bytes(f)) for f in out.frame] == [10, 14, 11]


# --------------------------------------------------------------------------
# MP3 frame-header walk (round 9)
# --------------------------------------------------------------------------


def _mp3_frames(n, kbps_idx=9, pad_every=None, id3v2=False, id3v1=False):
    """Spec-built MPEG1 Layer III fixture: 44100 Hz joint-stereo frames
    with valid 4-byte headers and zeroed payloads (the parser never
    reads payload bytes). kbps_idx=9 -> 128 kbps; frame length
    144*128000/44100 = 417 (+1 when padded)."""
    out = bytearray()
    if id3v2:
        # 132-byte tag body, syncsafe size 0b1_0000100 = 132
        out += b"ID3" + bytes([4, 0, 0, 0, 0, 1, 4]) + b"\x00" * 132
    for k in range(n):
        pad = 1 if (pad_every and k % pad_every == 0) else 0
        out += bytes([0xFF, 0xFB, (kbps_idx << 4) | (pad << 1), 0x40])
        out += b"\x00" * (144 * 128000 // 44100 + pad - 4)
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)


def test_parse_mp3_exact_duration_and_vbr_padding():
    from vinum_spark.operators.multimodal import _parse_mp3

    ch, rate, samples, duration, kbps = _parse_mp3(_mp3_frames(38))
    assert (ch, rate, samples) == (2, 44100, 38 * 1152)
    assert duration == pytest.approx(38 * 1152 / 44100)
    assert kbps == pytest.approx(128, rel=0.01)
    # padded frames change per-frame length; the walk must still chain
    _, _, samples2, _, _ = _parse_mp3(_mp3_frames(20, pad_every=3))
    assert samples2 == 20 * 1152


def test_parse_mp3_skips_id3_tags_and_rejects_garbage():
    from vinum_spark.operators.multimodal import _parse_mp3

    with_tags = _mp3_frames(10, id3v2=True, id3v1=True)
    bare = _mp3_frames(10)
    assert _parse_mp3(with_tags) == _parse_mp3(bare)
    assert _parse_mp3(b"") is None
    assert _parse_mp3(b"\xff" * 4096) is None  # sync but bitrate idx 15
    assert _parse_mp3(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f") is None
    # a single false sync with no chaining second frame is rejected
    assert _parse_mp3(b"\x00" * 64 + b"\xff\xfb\x90\x40" + b"\x01" * 8) is None


def test_parse_mp3_mono_mpeg25():
    """Version/layer/rate tables: MPEG2.5 Layer III mono 8 kbps 8000 Hz
    -> 72-byte frames of 576 samples."""
    from vinum_spark.operators.multimodal import _mp3_header, _parse_mp3

    frame = bytes([0xFF, 0xE2, 0x18, 0xC0]) + b"\x00" * 68
    assert _mp3_header(frame, 0) == (72, 576, 8000, 8, 1)
    ch, rate, samples, duration, _ = _parse_mp3(frame * 25)
    assert (ch, rate, samples) == (1, 8000, 25 * 576)
    assert duration == pytest.approx(25 * 576 / 8000)


def test_decode_audio_mp3_frame_stats(spark):
    """decode_audio on MP3: TRUE channels/rate/samples/duration from the
    header walk, NULL rms/peak (samples are never decoded), decoder
    'mpeg-frames'; WAV in the same batch keeps its pcm16 path."""
    from vinum_spark.operators.multimodal import decode_audio

    df = spark.createDataFrame(
        [(0, _mp3_frames(38, id3v2=True)), (1, _sine_wav()), (2, b"junk")],
        "asset_id long, content binary",
    )
    out = decode_audio(df).toPandas().set_index("asset_id").sort_index()
    mp3 = out.loc[0]
    assert mp3["decoder"] == "mpeg-frames"
    assert (mp3["n_channels"], mp3["sample_rate"]) == (2, 44100)
    assert mp3["n_samples"] == 38 * 1152
    assert mp3["duration_s"] == pytest.approx(38 * 1152 / 44100)
    assert pd.isna(mp3["rms"]) and pd.isna(mp3["peak"])
    assert out.loc[1, "decoder"] == "pcm16"
    assert out.loc[2, "decoder"] == "stub"


def test_probe_media_mp3(spark):
    from vinum_spark.operators.multimodal import probe_media

    df = spark.createDataFrame(
        [(0, _mp3_frames(76))], "asset_id long, content binary"
    )
    row = probe_media(df).toPandas().iloc[0]
    assert row["kind"] == "audio"
    assert row["decoder"] == "mpeg-frames"
    assert (row["channels"], row["sample_rate"]) == (2, 44100)
    assert row["duration_s"] == pytest.approx(76 * 1152 / 44100)
    assert pd.isna(row["bits_per_sample"])  # kbps is not a bit depth


def test_attach_metadata_sniffs_tagless_mp3(spark):
    from vinum_spark.operators.multimodal import attach_metadata

    df = spark.createDataFrame(
        [(0, _mp3_frames(2)), (1, _mp3_frames(2, id3v2=True))],
        "asset_id long, content binary",
    )
    out = attach_metadata(df).select("asset_id", "meta.mime").toPandas()
    assert out.mime.tolist() == ["audio/mpeg", "audio/mpeg"]


def test_progressive_jpeg_labeled_distinctly(spark):
    """SOF2 (progressive) JPEGs fall back to header dims — the label
    must say so ('jpeg-sof-progressive', not plain 'jpeg-sof') so a
    corpus audit can count header-only images; baseline SOF0 keeps the
    plain label."""
    from vinum_spark.operators.multimodal import _header_dims, decode_images

    prog = JPG.replace(b"\xff\xc0", b"\xff\xc2")
    assert _header_dims(JPG)[3] == "jpeg-sof"
    assert _header_dims(prog) == (80, 120, 3, "jpeg-sof-progressive")

    df = spark.createDataFrame(
        [(0, JPG), (1, prog)], "asset_id long, content binary"
    )
    out = (
        decode_images(df, pixels=True)
        .toPandas()
        .set_index("asset_id")
        .sort_index()
    )
    # neither fixture carries scan data, so both land on header dims;
    # only the progressive one gets the distinct label
    assert out.loc[0, "decoder"] == "jpeg-sof"
    assert out.loc[1, "decoder"] == "jpeg-sof-progressive"
    assert (out.loc[1, ["height", "width"]] == [80, 120]).all()


# --------------------------------------------------------------------------
# ADTS AAC frame-header walk (round 9)
# --------------------------------------------------------------------------


def _adts_frames(n, rate_idx=4, chan=2, flen=256, blocks=0):
    """Spec-built ADTS fixture: MPEG-4 AAC-LC headers (no CRC), zeroed
    payloads; rate_idx=4 -> 44100 Hz, each frame (blocks+1)*1024
    samples."""
    out = bytearray()
    for _ in range(n):
        b = bytearray(7)
        b[0] = 0xFF
        b[1] = 0xF1
        b[2] = (1 << 6) | (rate_idx << 2) | (chan >> 2)
        b[3] = ((chan & 3) << 6) | ((flen >> 11) & 3)
        b[4] = (flen >> 3) & 0xFF
        b[5] = ((flen & 7) << 5) | 0x1F
        b[6] = 0xFC | blocks
        out += bytes(b) + b"\x00" * (flen - 7)
    return bytes(out)


def test_parse_adts_exact_duration_and_blocks():
    from vinum_spark.operators.multimodal import _adts_header, _parse_adts

    assert _adts_header(_adts_frames(1), 0) == (256, 1024, 44100, 2)
    ch, rate, samples, duration, kbps = _parse_adts(_adts_frames(43))
    assert (ch, rate, samples) == (2, 44100, 43 * 1024)
    assert duration == pytest.approx(43 * 1024 / 44100)
    assert kbps == pytest.approx(256 * 8 * 43 / duration / 1000)
    # number_of_raw_data_blocks doubles the samples per frame
    _, _, s2, _, _ = _parse_adts(_adts_frames(5, blocks=1))
    assert s2 == 5 * 2048
    # channel_configuration 0 defers to an in-stream PCE: channels None
    assert _parse_adts(_adts_frames(5, chan=0))[0] is None


def test_adts_and_mp3_walks_are_mutually_exclusive():
    """The layer bits discriminate: ADTS layer is 00, MPEG audio layer
    is never 00 — each walker must reject the other's frames."""
    from vinum_spark.operators.multimodal import _parse_adts, _parse_mp3

    assert _parse_mp3(_adts_frames(10)) is None
    assert _parse_adts(_mp3_frames(10)) is None
    assert _parse_adts(b"") is None
    assert _parse_adts(b"\xff" * 4096) is None


def test_frame_walks_exclude_truncated_final_frame():
    """A final frame whose header parses but whose body is cut off must
    not count toward samples/duration/bitrate — stats for a file cut
    mid-frame equal the stats of its complete-frame prefix."""
    from vinum_spark.operators.multimodal import _parse_adts, _parse_mp3

    full = _mp3_frames(12)
    flen = len(full) // 12
    cut = full[: 11 * flen + flen // 2]  # 11 whole frames + half a frame
    assert _parse_mp3(cut) == _parse_mp3(full[: 11 * flen])

    afull = _adts_frames(9)
    acut = afull[: 8 * 256 + 100]  # 8 whole frames + truncated header+body
    assert _parse_adts(acut) == _parse_adts(afull[: 8 * 256])


def test_decode_audio_and_probe_adts(spark):
    from vinum_spark.operators.multimodal import decode_audio, probe_media

    df = spark.createDataFrame(
        [(0, _adts_frames(43))], "asset_id long, content binary"
    )
    row = decode_audio(df).toPandas().iloc[0]
    assert row["decoder"] == "adts-frames"
    assert (row["n_channels"], row["sample_rate"]) == (2, 44100)
    assert row["n_samples"] == 43 * 1024
    assert pd.isna(row["rms"]) and pd.isna(row["peak"])
    prow = probe_media(df).toPandas().iloc[0]
    assert (prow["kind"], prow["decoder"]) == ("audio", "adts-frames")
    assert prow["duration_s"] == pytest.approx(43 * 1024 / 44100)


# --------------------------------------------------------------------------
# Progressive JPEG decode (round 9)
# --------------------------------------------------------------------------


def _encode_progressive_jpeg(px, qval=2, subsampling="444", dc_al=1, ac_al=1):
    """Spec-built PROGRESSIVE JPEG encoder (T.81 G.1.2) for tests:
    spectral selection (DC scan + per-component AC 1-63 scans) with
    successive approximation (dc_al/ac_al high bits first, then refine
    scans with correction bits, EOB-run codes, ZRL-with-buffered-bits).
    Same flat quant / fixed 9-bit canonical Huffman trick as
    _encode_jpeg, so for identical px/qval the final coefficients are
    identical — decode must be pixel-identical to the baseline file."""
    import numpy as np

    from vinum_spark.operators.multimodal import _JPEG_D, _JPEG_ZIGZAG

    samps = {"444": [(1, 1), (1, 1), (1, 1)],
             "420": [(2, 2), (1, 1), (1, 1)]}[subsampling]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    h0, w0, _ = px.shape
    ph, pw = -(-h0 // (8 * vmax)) * 8 * vmax, -(-w0 // (8 * hmax)) * 8 * hmax
    px = np.pad(px, ((0, ph - h0), (0, pw - w0), (0, 0)), mode="edge")
    h, w, _ = px.shape
    q = np.full(64, qval, dtype=np.int64)
    p = px.astype(np.float64)
    y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    cb = 128.0 - 0.168735892 * p[..., 0] - 0.331264108 * p[..., 1] + 0.5 * p[..., 2]
    cr = 128.0 + 0.5 * p[..., 0] - 0.418687589 * p[..., 1] - 0.081312411 * p[..., 2]

    def down(plane, hi, vi):
        fy, fx = vmax // vi, hmax // hi
        if fy == fx == 1:
            return plane
        return plane.reshape(h // fy, fy, w // fx, fx).mean(axis=(1, 3))

    planes = [down(pl, hi, vi) - 128.0
              for pl, (hi, vi) in zip((y, cb, cr), samps)]
    # per-component zigzag blocks in raster order
    comp_blocks = []
    for c, (hi, vi) in enumerate(samps):
        bh, bw = planes[c].shape[0] // 8, planes[c].shape[1] // 8
        rows = []
        for yb in range(bh):
            row = []
            for xb in range(bw):
                blk = planes[c][yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                coefs = _JPEG_D @ blk @ _JPEG_D.T
                row.append(np.round(
                    coefs.flatten()[_JPEG_ZIGZAG] / q[_JPEG_ZIGZAG]
                ).astype(np.int64))
            rows.append(row)
        comp_blocks.append((rows, bh, bw))

    def category(v):
        a = abs(int(v))
        return 0 if a == 0 else a.bit_length()

    # each scan = (header_bytes_fn, ops) where ops mix ('sym', s) and
    # ('raw', value, nbits); symbols get per-scan 9-bit canonical codes
    scans = []

    # ---- DC scans (interleaved MCU order over all three components)
    nmy, nmx = h // (8 * vmax), w // (8 * hmax)
    mcu_dc = []
    for my in range(nmy):
        for mx in range(nmx):
            for c, (hi, vi) in enumerate(samps):
                for byi in range(vi):
                    for bxi in range(hi):
                        mcu_dc.append(
                            (c, int(comp_blocks[c][0][my * vi + byi][mx * hi + bxi][0]))
                        )
    ops = []
    prev = [0, 0, 0]
    for c, dc in mcu_dc:
        v = dc >> dc_al  # DC point transform is an arithmetic shift
        diff = v - prev[c]
        prev[c] = v
        s = category(diff)
        ops.append(("sym", s))
        if s:
            ops.append(("raw", diff if diff >= 0 else diff + (1 << s) - 1, s))
    scans.append(("dc", None, 0, 0, 0, dc_al, ops))
    for al in range(dc_al - 1, -1, -1):  # DC refine scans
        ops = [("raw", (dc >> al) & 1, 1) for _, dc in mcu_dc]
        scans.append(("dc", None, 0, 0, al + 1, al, ops))

    # ---- AC scans, one component at a time, band 1..63
    for c in range(3):
        rows, bh, bw = comp_blocks[c]
        blocks = [rows[yb][xb] for yb in range(bh) for xb in range(bw)]
        # first scan at Al=ac_al, EOB-run accumulation
        ops = []
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                n = eobrun.bit_length() - 1
                ops.append(("sym", n << 4))
                if n:
                    ops.append(("raw", eobrun - (1 << n), n))
                eobrun = 0

        for zz in blocks:
            sc = [
                (1 if zz[k] >= 0 else -1) * (abs(int(zz[k])) >> ac_al)
                for k in range(64)
            ]
            last_nz = max([k for k in range(1, 64) if sc[k] != 0], default=0)
            if last_nz == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(1, last_nz + 1):
                v = sc[k]
                if v == 0:
                    run += 1
                    if run == 16:
                        ops.append(("sym", 0xF0))
                        run = 0
                    continue
                s = category(v)
                ops.append(("sym", (run << 4) | s))
                ops.append(("raw", v if v >= 0 else v + (1 << s) - 1, s))
                run = 0
            if last_nz < 63:
                eobrun += 1
        flush_eob()
        scans.append(("ac", c, 1, 63, 0, ac_al, ops))

    for al in range(ac_al - 1, -1, -1):  # AC refine scans per component
        for c in range(3):
            rows, bh, bw = comp_blocks[c]
            blocks = [rows[yb][xb] for yb in range(bh) for xb in range(bw)]
            ops = []
            eobrun = 0
            be_bits = []  # corrections accumulated across the EOB run

            def flush_eob():
                nonlocal eobrun, be_bits
                if eobrun:
                    n = eobrun.bit_length() - 1
                    ops.append(("sym", n << 4))
                    if n:
                        ops.append(("raw", eobrun - (1 << n), n))
                    for b in be_bits:
                        ops.append(("raw", b, 1))
                    eobrun = 0
                    be_bits = []

            for zz in blocks:
                ab = [abs(int(zz[k])) >> al for k in range(64)]
                eob = 0
                for k in range(1, 64):
                    if ab[k] == 1:
                        eob = k
                r = 0
                br_bits = []
                for k in range(1, 64):
                    if ab[k] == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        flush_eob()
                        ops.append(("sym", 0xF0))
                        r -= 16
                        for b in br_bits:
                            ops.append(("raw", b, 1))
                        br_bits = []
                    if ab[k] > 1:  # history-nonzero: buffered correction
                        br_bits.append(ab[k] & 1)
                        continue
                    flush_eob()
                    ops.append(("sym", (r << 4) | 1))
                    ops.append(("raw", 1 if zz[k] >= 0 else 0, 1))
                    for b in br_bits:
                        ops.append(("raw", b, 1))
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    eobrun += 1
                    be_bits.extend(br_bits)
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
            scans.append(("ac", c, 1, 63, al + 1, al, ops))

    # ---- serialize: headers, per-scan DHT (9-bit canonical) + SOS
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes(
        int(x) for x in q[_JPEG_ZIGZAG]
    )
    out += b"\xff\xc2" + (17).to_bytes(2, "big") + b"\x08"
    out += h0.to_bytes(2, "big") + w0.to_bytes(2, "big") + b"\x03"
    for cid, (hi, vi) in zip((1, 2, 3), samps):
        out += bytes([cid, (hi << 4) | vi, 0x00])
    for kind, c, ss, se, ah, al, ops in scans:
        syms = sorted({s for op, s, *_ in [(o[0], o[1]) for o in ops] if op == "sym"})
        code = {v: i for i, v in enumerate(syms)}
        needs_table = any(o[0] == "sym" for o in ops)
        cls = 0 if kind == "dc" else 1
        if needs_table:
            out += b"\xff\xc4" + (19 + len(syms)).to_bytes(2, "big")
            out += bytes([cls << 4]) + bytes([0] * 8 + [len(syms)] + [0] * 7)
            out += bytes(syms)
        if kind == "dc":
            out += b"\xff\xda" + (12).to_bytes(2, "big") + b"\x03"
            for cid in (1, 2, 3):
                out += bytes([cid, 0x00])
        else:
            out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01"
            out += bytes([c + 1, 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        acc = n = 0
        ent = bytearray()

        def emit(value, nbits):
            nonlocal acc, n
            for i in range(nbits - 1, -1, -1):
                acc = (acc << 1) | ((value >> i) & 1)
                n += 1
                if n == 8:
                    ent.append(acc)
                    if acc == 0xFF:
                        ent.append(0x00)
                    acc = 0
                    n = 0

        for op in ops:
            if op[0] == "sym":
                emit(code[op[1]], 9)
            else:
                emit(int(op[1]) & ((1 << op[2]) - 1), op[2])
        while n:
            emit(1, 1)
        out += ent
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_jpeg_pixels_match_baseline():
    """The full progressive ladder — spectral selection + DC and AC
    successive approximation (refine scans, EOB runs, ZRL with buffered
    correction bits) — must reconstruct EXACTLY the pixels the baseline
    encoding of the same data decodes to (entropy coding is lossless;
    quant/DCT identical)."""
    import numpy as np

    from vinum_spark.operators.multimodal import _jpeg_pixels

    px = _smooth_rgb(21, 24, 40)
    want = _jpeg_pixels(_encode_jpeg(px))
    assert want is not None
    for dc_al, ac_al in ((0, 0), (1, 0), (0, 1), (1, 1), (2, 2)):
        got = _jpeg_pixels(
            _encode_progressive_jpeg(px, dc_al=dc_al, ac_al=ac_al)
        )
        assert got is not None, (dc_al, ac_al)
        assert np.array_equal(got, want), (dc_al, ac_al)


def test_progressive_jpeg_420_subsampled():
    """Progressive + 4:2:0: interleaved DC scan over 2x2 luma blocks,
    per-component AC scans on each component's own block raster."""
    import numpy as np

    from vinum_spark.operators.multimodal import _jpeg_pixels

    px = _smooth_rgb(22, 32, 48)
    want = _jpeg_pixels(_encode_jpeg(px, subsampling="420"))
    got = _jpeg_pixels(
        _encode_progressive_jpeg(px, subsampling="420", dc_al=1, ac_al=1)
    )
    assert want is not None and got is not None
    assert np.array_equal(got, want)


def test_progressive_jpeg_hostile_bytes_degrade_to_none():
    from vinum_spark.operators.multimodal import (
        _jpeg_pixels,
        _jpeg_progressive_unsafe,
    )

    good = _encode_progressive_jpeg(_smooth_rgb(23, 16, 16))
    assert _jpeg_pixels(good) is not None
    # truncations at every stage must degrade, never raise
    for cut in (2, 20, len(good) // 2, len(good) - 3):
        assert _jpeg_pixels(good[:cut]) is None
    # flip entropy bytes: either decodes-to-something or None, no raise
    corrupt = bytearray(good)
    corrupt[len(good) // 2] ^= 0x55
    _jpeg_pixels(bytes(corrupt))
    assert _jpeg_progressive_unsafe(b"\xff\xd8\xff\xd9", 4 << 20) is None


# --------------------------------------------------------------------------
# WAV bit depths beyond PCM16 (round 9)
# --------------------------------------------------------------------------


def test_wav_pcm_samples_all_depths():
    """8/24/32-bit integer PCM and float32/64 must decode to the same
    normalized values as the 16-bit layout of the same waveform."""
    import numpy as np

    from vinum_spark.operators.multimodal import _wav_pcm_samples

    t = np.linspace(0, 1, 800, endpoint=False)
    wave = 0.5 * np.sin(2 * np.pi * 7 * t)

    i16 = (wave * 32767).astype("<i2")
    ref, ch, rate, label = _wav_pcm_samples(
        _wav_bytes(i16.tobytes(), 1, 1, 800, 16)
    )
    assert (ch, rate, label) == (1, 800, "pcm16")

    u8 = np.clip(np.round(wave * 127 + 128), 0, 255).astype("u1")
    s8, _, _, l8 = _wav_pcm_samples(_wav_bytes(u8.tobytes(), 1, 1, 800, 8))
    assert l8 == "pcm8"
    assert np.abs(s8 - wave).max() < 1 / 100

    i32 = (wave * 2147483647).astype("<i4")
    tri = i32.view("u1").reshape(-1, 4)[:, 1:]  # top 3 bytes = 24-bit LE
    s24, _, _, l24 = _wav_pcm_samples(_wav_bytes(tri.tobytes(), 1, 1, 800, 24))
    assert l24 == "pcm24"
    assert np.abs(s24 - wave).max() < 1 / 10000

    s32, _, _, l32 = _wav_pcm_samples(_wav_bytes(i32.tobytes(), 1, 1, 800, 32))
    assert l32 == "pcm32"
    assert np.abs(s32 - wave).max() < 1e-6

    f32 = wave.astype("<f4")
    sf, _, _, lf = _wav_pcm_samples(_wav_bytes(f32.tobytes(), 3, 1, 800, 32))
    assert lf == "float32"
    assert np.abs(sf - wave).max() < 1e-6

    f64 = wave.astype("<f8")
    sf8, _, _, lf8 = _wav_pcm_samples(_wav_bytes(f64.tobytes(), 3, 1, 800, 64))
    assert lf8 == "float64"
    assert np.abs(sf8 - wave).max() == 0.0

    # unsupported layouts stay None (never a crash): 12-bit PCM, MPEG WAV
    assert _wav_pcm_samples(_wav_bytes(b"\x00" * 24, 1, 1, 800, 12)) is None
    assert _wav_pcm_samples(_wav_bytes(b"\x00" * 24, 80, 1, 800, 16)) is None


def test_decode_audio_float32_wav(spark):
    import numpy as np

    from vinum_spark.operators.multimodal import decode_audio

    t = np.linspace(0, 0.5, 4000, endpoint=False)
    wave = (0.25 * np.sin(2 * np.pi * 440 * t)).astype("<f4")
    df = spark.createDataFrame(
        [(0, _wav_bytes(wave.tobytes(), 3, 1, 8000, 32))],
        "asset_id long, content binary",
    )
    row = decode_audio(df).toPandas().iloc[0]
    assert row["decoder"] == "float32"
    assert row["n_samples"] == 4000
    assert row["rms"] == pytest.approx(0.25 / np.sqrt(2), rel=1e-3)
    assert row["peak"] == pytest.approx(0.25, rel=1e-3)


def test_wav_g711_mulaw_alaw_decode():
    """G.711 companded WAV decodes for real: encoding a sine with an
    independent spec-built encoder and decoding through the table path
    reconstructs the waveform within companding quantization error."""
    import numpy as np

    from vinum_spark.operators.multimodal import _wav_pcm_samples

    t = np.linspace(0, 1, 800, endpoint=False)
    wave = 0.5 * np.sin(2 * np.pi * 7 * t)
    lin = (wave * 32767).astype(int)

    mu = bytes(_mulaw_encode_scalar(int(v)) for v in lin)
    smu, ch, rate, lmu = _wav_pcm_samples(_wav_bytes(mu, 7, 1, 800, 8))
    assert (ch, rate, lmu) == (1, 800, "mulaw")
    # top mu-law segment quantizes at 1024 linear units -> half-step tol
    assert np.abs(smu - wave).max() < 520 / 32768.0

    al = bytes(_alaw_encode_scalar(int(v)) for v in lin)
    sal, _, _, lal = _wav_pcm_samples(_wav_bytes(al, 6, 1, 800, 8))
    assert lal == "alaw"
    assert np.abs(sal - wave).max() < 1040 / 32768.0

    # sign symmetry of the table itself: code for -x mirrors +x
    assert _wav_pcm_samples(_wav_bytes(mu, 7, 1, 800, 8))[0][0] == -(
        _wav_pcm_samples(
            _wav_bytes(
                bytes(_mulaw_encode_scalar(-int(v)) for v in lin), 7, 1, 800, 8
            )
        )[0][0]
    )


def test_wav_ima_adpcm_mono_roundtrip():
    """IMA ADPCM WAV decodes with the true predictor recurrence: a
    spec-built encoder's output reconstructs the sine within the
    adaptive step error."""
    import numpy as np

    from vinum_spark.operators.multimodal import _wav_pcm_samples

    rate, block_align = 8000, 256  # 505 samples per mono block
    t = np.linspace(0, 0.25, 2020, endpoint=False)
    wave = 0.5 * np.sin(2 * np.pi * 50 * t)
    lin = np.round(wave * 32767).astype(int)
    payload, recon = _ima_encode(lin, 1, block_align, return_recon=True)
    out = _wav_pcm_samples(_wav_bytes(payload, 0x11, 1, rate, 4, block_align))
    assert out is not None
    samples, ch, r, label = out
    assert (ch, r, label) == (1, rate, "ima-adpcm")
    assert len(samples) == 2020  # 4 full blocks x 505
    # decoder shares the recurrence with the encoder: EXACT match
    assert np.array_equal(samples, recon)
    err = samples - wave
    assert float(np.sqrt(np.mean(err**2))) < 0.01


def test_wav_ima_adpcm_stereo_interleave(spark):
    """Stereo IMA ADPCM: the 4-byte-word round-robin interleave must
    land each channel's samples in the right interleaved slots, and
    decode_audio reports frame counts (not raw sample counts)."""
    import numpy as np

    from vinum_spark.operators.multimodal import (_wav_pcm_samples,
                                                  decode_audio)

    rate, block_align = 4000, 512  # (512-8)*2/2+1 = 505 frames/block
    n = 505 * 2
    t = np.arange(n) / rate
    left = 0.5 * np.sin(2 * np.pi * 30 * t)
    right = 0.2 * np.sin(2 * np.pi * 70 * t)
    frames = np.round(
        np.stack([left, right], axis=1) * 32767
    ).astype(int)
    payload, recon = _ima_encode(
        frames.ravel(), 2, block_align, return_recon=True
    )
    samples, ch, r, label = _wav_pcm_samples(
        _wav_bytes(payload, 0x11, 2, rate, 4, block_align)
    )
    assert (ch, r, label) == (2, rate, "ima-adpcm")
    # decoder reproduces the encoder recurrence EXACTLY, interleave and
    # all — any channel swap / word-order bug breaks this equality
    assert np.array_equal(samples, recon)
    dec = samples.reshape(-1, 2)
    assert len(dec) == n
    # past the onset transient the codec tracks the waveform closely
    assert np.abs(dec[50:, 0] - left[50:]).max() < 0.05
    assert np.abs(dec[50:, 1] - right[50:]).max() < 0.05
    # the two channels must not be swapped: amplitude identifies them
    assert np.abs(dec[:, 0]).max() > 2 * np.abs(dec[:, 1]).max()

    df = spark.createDataFrame(
        [(0, _wav_bytes(payload, 0x11, 2, rate, 4, block_align))],
        "asset_id long, content binary",
    )
    row = decode_audio(df).toPandas().iloc[0]
    assert row["decoder"] == "ima-adpcm"
    assert row["n_channels"] == 2
    assert row["n_samples"] == n
    assert row["duration_s"] == pytest.approx(n / rate)


def test_decode_audio_mulaw_stats(spark):
    """decode_audio end-to-end on a mu-law telephone-style WAV: true
    RMS/peak from the decoded companded samples."""
    import numpy as np

    from vinum_spark.operators.multimodal import decode_audio

    t = np.linspace(0, 0.5, 4000, endpoint=False)
    lin = np.round(0.25 * np.sin(2 * np.pi * 440 * t) * 32767).astype(int)
    mu = bytes(_mulaw_encode_scalar(int(v)) for v in lin)
    df = spark.createDataFrame(
        [(0, _wav_bytes(mu, 7, 1, 8000, 8))], "asset_id long, content binary"
    )
    row = decode_audio(df).toPandas().iloc[0]
    assert row["decoder"] == "mulaw"
    assert row["n_samples"] == 4000
    assert row["rms"] == pytest.approx(0.25 / np.sqrt(2), rel=2e-2)
    assert row["peak"] == pytest.approx(0.25, rel=2e-2)


def test_resample_audio_downsample_and_upsample(spark):
    """resample_audio normalizes rates for REAL: an 8 kHz sine lands on
    the 4 kHz grid as the directly-generated 4 kHz sine (within linear-
    interp error), and upsampling doubles the frame count. Output is a
    decodable PCM16 WAV that chains into decode_audio."""
    import numpy as np

    from vinum_spark.operators.multimodal import decode_audio, resample_audio

    n, rate = 4000, 8000
    wave = 0.25 * np.sin(2 * np.pi * 440 * np.arange(n) / rate)
    wav = _wav_bytes(
        np.round(wave * 32767).astype("<i2").tobytes(), 1, 1, rate, 16
    )
    df = spark.createDataFrame(
        [(0, wav), (1, b"not audio")], "asset_id long, content binary"
    )
    out = resample_audio(df, 4000).toPandas().set_index("asset_id")
    assert out.loc[0, "resampler"] == "pcm16-linear"
    assert out.loc[0, "sample_rate"] == 4000
    assert out.loc[0, "n_samples"] == 2000
    assert out.loc[1, "resampler"] == "stub"
    assert bytes(out.loc[1, "content"]) == b"not audio"

    from vinum_spark.operators.multimodal import _wav_pcm_samples

    dec, ch, r, _ = _wav_pcm_samples(bytes(out.loc[0, "content"]))
    want = 0.25 * np.sin(2 * np.pi * 440 * np.arange(2000) / 4000)
    # linear interp on a 440 Hz tone sampled at 8 kHz: curvature error
    # ~ amp*(2*pi*f/fs)^2/8 ~ 0.004, plus 16-bit quantization
    assert np.abs(dec - want).max() < 0.01

    up = resample_audio(df, 16000).toPandas().set_index("asset_id")
    assert up.loc[0, "n_samples"] == 8000

    # chains into decode_audio: uniform-rate corpus, true stats
    chained = decode_audio(
        resample_audio(df, 4000).select("asset_id", "content")
    ).toPandas().set_index("asset_id")
    assert chained.loc[0, "decoder"] == "pcm16"
    assert chained.loc[0, "sample_rate"] == 4000
    assert chained.loc[0, "rms"] == pytest.approx(0.25 / np.sqrt(2), rel=2e-2)


def test_resample_audio_empty_wav_is_stub(spark):
    """A decodable WAV with ZERO samples must pass through as stub
    (review-found: np.interp raises on an empty sample-point array)."""
    from vinum_spark.operators.multimodal import resample_audio

    empty = _wav_bytes(b"", 1, 1, 8000, 16)
    df = spark.createDataFrame([(0, empty)], "asset_id long, content binary")
    out = resample_audio(df, 4000).toPandas().iloc[0]
    assert out["resampler"] == "stub"
    assert bytes(out["content"]) == empty


def test_resample_audio_flac_and_stereo(spark):
    """FLAC input resamples through the real bitstream decode (label
    'flac-pcm-linear'); stereo interleave survives the per-channel
    interpolation."""
    import numpy as np

    from vinum_spark.operators.multimodal import (_wav_pcm_samples,
                                                  resample_audio)

    n, rate = 3840, 8000
    t = np.arange(n) / rate
    st = np.round(
        np.stack(
            [0.4 * 32767 * np.sin(2 * np.pi * 100 * t),
             0.1 * 32767 * np.sin(2 * np.pi * 250 * t)], axis=1
        )
    ).astype(np.int64)
    flac = _flac_encode(st, rate=rate, mode="fixed2", stereo="midside")
    df = spark.createDataFrame([(0, flac)], "asset_id long, content binary")
    out = resample_audio(df, 4000).toPandas().iloc[0]
    assert out["resampler"] == "flac-pcm-linear"
    dec, ch, r, _ = _wav_pcm_samples(bytes(out["content"]))
    assert (ch, r) == (2, 4000)
    pair = dec.reshape(-1, 2)
    t2 = np.arange(n // 2) / 4000
    assert np.abs(pair[:, 0] - 0.4 * np.sin(2 * np.pi * 100 * t2)).max() < 0.01
    assert np.abs(pair[:, 1] - 0.1 * np.sin(2 * np.pi * 250 * t2)).max() < 0.01


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn streams (the camera-JPEG staple) must decode pixel-
    identically to the same data without restarts: byte-aligned RSTn
    consumption, cycling marker index check, DC predictor reset."""
    import numpy as np

    from vinum_spark.operators.multimodal import _jpeg_pixels

    px = _smooth_rgb(31, 24, 48)  # 3x6 = 18 MCUs at 4:4:4
    plain = _jpeg_pixels(_encode_jpeg(px))
    assert plain is not None
    for ri in (1, 3, 5):
        got = _jpeg_pixels(_encode_jpeg(px, restart_interval=ri))
        assert got is not None, ri
        assert np.array_equal(got, plain), ri
    # 4:2:0 with restarts: 2x3 = 6 MCUs of 6 blocks
    plain420 = _jpeg_pixels(_encode_jpeg(px, subsampling="420"))
    got420 = _jpeg_pixels(
        _encode_jpeg(px, subsampling="420", restart_interval=2)
    )
    assert got420 is not None and np.array_equal(got420, plain420)


def test_jpeg_restart_wrong_marker_index_rejected():
    """A stream whose RSTn indices don't cycle 0-7 has lost sync — the
    decoder must return None, not misassemble pixels."""
    from vinum_spark.operators.multimodal import _jpeg_pixels

    good = _encode_jpeg(_smooth_rgb(32, 24, 48), restart_interval=1)
    assert _jpeg_pixels(good) is not None
    # corrupt the first restart marker RST0 -> RST5
    bad = good.replace(b"\xff\xd0", b"\xff\xd5", 1)
    assert _jpeg_pixels(bad) is None


# --------------------------------------------------------------------------
# Adam7 interlaced PNG (round 9)
# --------------------------------------------------------------------------


def _png_adam7(arr, filters_by_pass=None):
    """Spec-built Adam7 PNG encoder: the seven sub-images serialized in
    pass order, each filtered independently (filter code per scanline,
    default None; Sub/Up exercised via filters_by_pass)."""
    import binascii
    import zlib

    import numpy as np

    from vinum_spark.operators.multimodal import _PNG_ADAM7

    h, w, _ = arr.shape

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + binascii.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 1])  # 8-bit truecolor, Adam7
    )
    raw = b""
    for pi, (x0, y0, dx, dy) in enumerate(_PNG_ADAM7):
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw, _ = sub.shape
        f_rows = (filters_by_pass or {}).get(pi, [0] * ph)
        prev = np.zeros(pw * 3, dtype=np.int32)
        for y in range(ph):
            line = sub[y].reshape(-1).astype(np.int32)
            f = f_rows[y]
            if f == 0:
                filt = line
            elif f == 1:
                filt = (line - np.concatenate(
                    [np.zeros(3, np.int32), line[:-3]])) % 256
            elif f == 2:
                filt = (line - prev) % 256
            else:
                raise ValueError(f)
            raw += bytes([f]) + bytes(filt.astype(np.uint8))
            prev = line
    return (
        bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_adam7_roundtrip():
    """Interlaced PNG must reconstruct the exact source array: per-pass
    un-filtering (incl. Sub/Up inside a pass, where 'up' means the
    previous row OF THAT PASS) and grid scatter."""
    import numpy as np

    from vinum_spark.operators.multimodal import _png_pixels

    rng = np.random.RandomState(5)
    for shape in ((16, 16), (13, 11), (7, 5), (1, 1), (2, 9)):
        arr = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
        got = _png_pixels(_png_adam7(arr))
        assert got is not None, shape
        assert np.array_equal(got, arr), shape
    # mixed filters inside passes
    arr = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    png = _png_adam7(arr, filters_by_pass={6: [0, 1, 2, 1, 0, 2, 1, 0]})
    assert np.array_equal(_png_pixels(png), arr)


def test_png_adam7_truncated_is_none():
    import numpy as np

    from vinum_spark.operators.multimodal import _png_pixels

    rng = np.random.RandomState(6)
    arr = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    good = _png_adam7(arr)
    import zlib
    # re-compress a truncated raw stream so zlib succeeds but the pass
    # walk runs short
    raw_ok = zlib.decompress(good[41:-12][:len(good) - 53])  # IDAT body
    # simpler: chop the IDAT-decompressed stream and rebuild
    import binascii

    def chunk(ctype, body):
        return (len(body).to_bytes(4, "big") + ctype + body
                + binascii.crc32(ctype + body).to_bytes(4, "big"))

    ihdr_chunk = good[8:8 + 25]
    short = zlib.compress(raw_ok[: len(raw_ok) // 2])
    bad = (good[:8] + ihdr_chunk + chunk(b"IDAT", short) + chunk(b"IEND", b""))
    assert _png_pixels(bad) is None


# --------------------------------------------------------------------------
# Palette + 16-bit PNG (round 9)
# --------------------------------------------------------------------------


def _png_chunks(ihdr_tail, body_chunks, h, w):
    import binascii

    def chunk(ctype, body):
        return (len(body).to_bytes(4, "big") + ctype + body
                + binascii.crc32(ctype + body).to_bytes(4, "big"))

    out = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
    out += chunk(b"IHDR", w.to_bytes(4, "big") + h.to_bytes(4, "big") + ihdr_tail)
    for ctype, body in body_chunks:
        out += chunk(ctype, body)
    return out + chunk(b"IEND", b"")


def test_png_palette_all_depths():
    """1/2/4/8-bit palette PNGs: packed index rows bit-unpack to
    palette lookups; out-of-range indices reject the file."""
    import zlib

    import numpy as np

    from vinum_spark.operators.multimodal import _png_pixels

    rng = np.random.RandomState(9)
    for depth in (1, 2, 4, 8):
        n = 1 << depth
        pal = rng.randint(0, 256, (n, 3), dtype=np.uint8)
        h, w = 6, 11
        idx = rng.randint(0, n, (h, w), dtype=np.uint8)
        rows = b""
        for y in range(h):
            bits = np.unpackbits(
                idx[y][:, None] << (8 - depth), axis=1, count=depth
            ).ravel() if depth < 8 else None
            if depth == 8:
                packed = idx[y].tobytes()
            else:
                padded = np.zeros((-(-w * depth // 8)) * 8, dtype=np.uint8)
                padded[: w * depth] = bits
                packed = np.packbits(padded).tobytes()
            rows += b"\x00" + packed
        png = _png_chunks(
            bytes([depth, 3, 0, 0, 0]),
            [(b"PLTE", pal.tobytes()), (b"IDAT", zlib.compress(rows))],
            h, w,
        )
        got = _png_pixels(png)
        assert got is not None, depth
        assert np.array_equal(got, pal[idx]), depth
    # index past the palette end must reject, not wrap
    small_pal = pal[:3]
    png = _png_chunks(
        bytes([8, 3, 0, 0, 0]),
        [(b"PLTE", small_pal.tobytes()), (b"IDAT", zlib.compress(rows))],
        h, w,
    )
    assert _png_pixels(png) is None
    # palette image without PLTE rejects
    png = _png_chunks(bytes([8, 3, 0, 0, 0]),
                      [(b"IDAT", zlib.compress(rows))], h, w)
    assert _png_pixels(png) is None


def test_png_16bit_high_byte():
    """16-bit RGB decodes to the high-byte rendering, filters applied
    at the byte level with bpp=6."""
    import zlib

    import numpy as np

    from vinum_spark.operators.multimodal import _png_pixels

    rng = np.random.RandomState(10)
    h, w = 5, 7
    px16 = rng.randint(0, 65536, (h, w, 3), dtype=np.uint16)
    rows = b""
    for y in range(h):
        rows += b"\x00" + px16[y].astype(">u2").tobytes()
    png = _png_chunks(bytes([16, 2, 0, 0, 0]),
                      [(b"IDAT", zlib.compress(rows))], h, w)
    got = _png_pixels(png)
    assert got is not None
    assert np.array_equal(got, (px16 >> 8).astype(np.uint8))
    # Sub filter at byte level: encode row 1 with filter 1 (bpp=6)
    raw2 = bytearray()
    for y in range(h):
        line = px16[y].astype(">u2").tobytes()
        if y == 1:
            arr = np.frombuffer(line, np.uint8).astype(np.int32)
            prev_px = np.concatenate([np.zeros(6, np.int32), arr[:-6]])
            raw2 += b"\x01" + bytes(((arr - prev_px) % 256).astype(np.uint8))
        else:
            raw2 += b"\x00" + line
    png2 = _png_chunks(bytes([16, 2, 0, 0, 0]),
                       [(b"IDAT", zlib.compress(bytes(raw2)))], h, w)
    assert np.array_equal(_png_pixels(png2), (px16 >> 8).astype(np.uint8))


# --------------------------------------------------------------------------
# FLAC STREAMINFO + Ogg page walk (round 9)
# --------------------------------------------------------------------------


def _ogg_page(payload, granule, serial=7, htype=0):
    segs = []
    rest = len(payload)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (
        b"OggS" + bytes([0, htype])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + bytes([len(segs)]) + bytes(segs) + payload
    )


def _flac_test_wave(n=500, bits=16, channels=1):
    import numpy as np

    amp = (1 << (bits - 2)) - 1
    t = np.arange(n)
    if channels == 1:
        return np.round(amp * np.sin(t / 7.0)).astype(np.int64)
    return np.round(
        np.stack([amp * np.sin(t / 7.0), 0.4 * amp * np.sin(t / 3.0)],
                 axis=1)
    ).astype(np.int64)


def test_flac_decode_verbatim_and_constant():
    """Verbatim subframes reproduce samples EXACTLY; constant frames
    decode to the constant."""
    import numpy as np

    from vinum_spark.operators.multimodal import _flac_pcm_samples

    wave = _flac_test_wave(480)
    out = _flac_pcm_samples(_flac_encode(wave, mode="verbatim"))
    assert out is not None
    samples, ch, rate, label = out
    assert (ch, rate, label) == (1, 8000, "flac-pcm")
    assert np.array_equal(np.round(samples * 32768).astype(np.int64), wave)

    const = np.full(384, -1234, dtype=np.int64)
    s2, _, _, _ = _flac_pcm_samples(_flac_encode(const, mode="constant"))
    assert np.array_equal(np.round(s2 * 32768).astype(np.int64), const)


def test_flac_decode_fixed_orders_exact():
    """All five fixed predictor orders restore the signal EXACTLY (the
    decoder inverts the k-th difference with iterated cumsums)."""
    import numpy as np

    from vinum_spark.operators.multimodal import _flac_pcm_samples

    wave = _flac_test_wave(576)
    for order in range(5):
        out = _flac_pcm_samples(_flac_encode(wave, mode=f"fixed{order}"))
        assert out is not None, f"order {order}"
        dec = np.round(out[0] * 32768).astype(np.int64)
        assert np.array_equal(dec, wave), f"order {order}"


def test_flac_decode_lpc_exact():
    """LPC subframes: integer predictor with quantized coefficients and
    arithmetic shift must round-trip EXACTLY."""
    import numpy as np

    from vinum_spark.operators.multimodal import _flac_pcm_samples

    wave = _flac_test_wave(384)
    coefs, shift, prec = [1848, -871], 10, 12  # near 2cos(w), -1 shape
    out = _flac_pcm_samples(
        _flac_encode(wave, mode="lpc", lpc=(coefs, shift, prec))
    )
    assert out is not None
    dec = np.round(out[0] * 32768).astype(np.int64)
    assert np.array_equal(dec, wave)


def test_flac_decode_stereo_decorrelation_exact():
    """left/side, side/right and mid/side channel modes all reconstruct
    both channels EXACTLY, including the side channel's extra bit."""
    import numpy as np

    from vinum_spark.operators.multimodal import _flac_pcm_samples

    wave = _flac_test_wave(384, channels=2)
    for stereo in ("leftside", "rightside", "midside"):
        out = _flac_pcm_samples(
            _flac_encode(wave, mode="fixed1", stereo=stereo)
        )
        assert out is not None, stereo
        samples, ch, _, _ = out
        assert ch == 2
        dec = np.round(samples.reshape(-1, 2) * 32768).astype(np.int64)
        assert np.array_equal(dec, wave), stereo


def test_flac_decode_wasted_bits_escape_and_partitions():
    """Wasted-bits subframes, escape (verbatim) residual partitions and
    partition order > 0 all round-trip EXACTLY."""
    import numpy as np

    from vinum_spark.operators.multimodal import _flac_pcm_samples

    wave = _flac_test_wave(384) & ~0x7  # 3 wasted (zero) low bits
    dec = _flac_pcm_samples(_flac_encode(wave, mode="fixed2", wasted=3))
    assert dec is not None
    assert np.array_equal(np.round(dec[0] * 32768).astype(np.int64), wave)

    wave2 = _flac_test_wave(384)
    dec2 = _flac_pcm_samples(_flac_encode(wave2, mode="fixed1", escape=True))
    assert dec2 is not None
    assert np.array_equal(np.round(dec2[0] * 32768).astype(np.int64), wave2)

    dec3 = _flac_pcm_samples(_flac_encode(wave2, mode="fixed1", po=2))
    assert dec3 is not None
    assert np.array_equal(np.round(dec3[0] * 32768).astype(np.int64), wave2)


def test_decode_audio_flac_pcm_stats(spark):
    """decode_audio on a frame-bearing FLAC: REAL decoded rms/peak with
    decoder='flac-pcm'; a STREAMINFO-only FLAC still falls back to
    header stats with NULL amplitude."""
    import numpy as np

    from vinum_spark.operators.multimodal import decode_audio

    n = 2000
    wave = np.round(
        0.25 * 32767 * np.sin(2 * np.pi * 440 * np.arange(n) / 8000)
    ).astype(np.int64)
    flac = _flac_encode(wave, rate=8000, mode="fixed2")
    df = spark.createDataFrame(
        [(0, flac), (1, _flac_bytes(total=44100))],
        "asset_id long, content binary",
    )
    out = decode_audio(df).toPandas().set_index("asset_id").sort_index()
    assert out.loc[0, "decoder"] == "flac-pcm"
    assert out.loc[0, "n_samples"] == n
    assert out.loc[0, "duration_s"] == pytest.approx(n / 8000)
    assert out.loc[0, "rms"] == pytest.approx(0.25 / np.sqrt(2), rel=2e-2)
    assert out.loc[0, "peak"] == pytest.approx(0.25, rel=2e-2)
    assert out.loc[1, "decoder"] == "flac-streaminfo"
    assert np.isnan(out.loc[1, "rms"])


def test_parse_flac_streaminfo():
    from vinum_spark.operators.multimodal import _parse_flac, probe_media

    assert _parse_flac(_flac_bytes()) == (2, 44100, 16, 88200)
    assert _parse_flac(_flac_bytes(rate=96000, channels=6, bits=24,
                                   total=7_000_000_000)) == (
        6, 96000, 24, 7_000_000_000)  # >32-bit total uses the high nibble
    assert _parse_flac(b"fLaC" + b"\x00" * 10) is None
    assert _parse_flac(b"not flac") is None


def test_parse_ogg_vorbis_and_opus():
    from vinum_spark.operators.multimodal import _parse_ogg

    vorbis_id = (b"\x01vorbis" + (0).to_bytes(4, "little")
                 + bytes([2]) + (44100).to_bytes(4, "little") + b"\x00" * 14)
    data = (
        _ogg_page(vorbis_id, 0, htype=2)
        + _ogg_page(b"\x05" * 300, 22050)
        + _ogg_page(b"\x05" * 300, 88200, htype=4)
    )
    assert _parse_ogg(data) == (2, 44100, 88200, "vorbis")

    opus_id = (b"OpusHead" + bytes([1, 1]) + (312).to_bytes(2, "little")
               + (16000).to_bytes(4, "little") + b"\x00" * 3)
    data = (
        _ogg_page(opus_id, 0, htype=2)
        + _ogg_page(b"\x05" * 100, 48000 + 312, htype=4)
    )
    # Opus granules run at 48 kHz regardless of input rate; pre-skip off
    assert _parse_ogg(data) == (1, 48000, 48000, "opus")
    assert _parse_ogg(b"OggS" + b"\x00" * 10) is None
    assert _parse_ogg(b"junk") is None


def test_probe_and_decode_audio_flac_ogg(spark):
    from vinum_spark.operators.multimodal import (
        attach_metadata,
        decode_audio,
        probe_media,
    )

    vorbis_id = (b"\x01vorbis" + (0).to_bytes(4, "little")
                 + bytes([2]) + (8000).to_bytes(4, "little") + b"\x00" * 14)
    ogg = _ogg_page(vorbis_id, 0, htype=2) + _ogg_page(b"\x05" * 50, 4000, htype=4)
    df = spark.createDataFrame(
        [(0, _flac_bytes(total=44100)), (1, ogg)],
        "asset_id long, content binary",
    )
    probe = probe_media(df).toPandas().set_index("asset_id").sort_index()
    assert probe.loc[0, "decoder"] == "flac-streaminfo"
    assert probe.loc[0, "duration_s"] == pytest.approx(1.0)
    assert probe.loc[0, "bits_per_sample"] == 16
    assert probe.loc[1, "decoder"] == "ogg-vorbis"
    assert probe.loc[1, "duration_s"] == pytest.approx(0.5)
    aud = decode_audio(df).toPandas().set_index("asset_id").sort_index()
    assert aud.loc[0, "decoder"] == "flac-streaminfo"
    assert aud.loc[0, "n_samples"] == 44100
    assert pd.isna(aud.loc[0, "rms"])  # samples never decoded
    assert aud.loc[1, "decoder"] == "ogg-vorbis"
    mimes = attach_metadata(df).select("meta.mime").toPandas().mime.tolist()
    assert mimes == ["audio/flac", "audio/ogg"]


# --------------------------------------------------------------------------
# AVI + WebM video metadata (round 9)
# --------------------------------------------------------------------------


def _avi_bytes(us_per_frame=33333, frames=300, w=640, h=360,
               video_frames=(), audio_chunks=(), rec_frames=()):
    def chunk(cid, payload):
        return (cid + len(payload).to_bytes(4, "little") + payload
                + (b"\x00" if len(payload) & 1 else b""))

    avih = bytearray(56)
    avih[0:4] = us_per_frame.to_bytes(4, "little")
    avih[16:20] = frames.to_bytes(4, "little")
    avih[32:36] = w.to_bytes(4, "little")
    avih[36:40] = h.to_bytes(4, "little")
    hdrl = b"hdrl" + chunk(b"avih", bytes(avih))
    body = b"AVI " + b"LIST" + len(hdrl).to_bytes(4, "little") + hdrl
    if video_frames or audio_chunks or rec_frames:
        movi = b"movi"
        for i, payload in enumerate(video_frames):
            movi += chunk(b"00dc" if i % 2 == 0 else b"00db", payload)
        for payload in audio_chunks:
            movi += chunk(b"01wb", payload)
        if rec_frames:
            rec = b"rec "
            for payload in rec_frames:
                rec += chunk(b"00dc", payload)
            movi += b"LIST" + (len(rec)).to_bytes(4, "little") + rec
        body += b"LIST" + len(movi).to_bytes(4, "little") + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _ebml_size_bytes(n):
    if n < 127:
        return bytes([0x80 | n])
    assert n < (1 << 14) - 1
    return (0x4000 | n).to_bytes(2, "big")


def _ebml_el(eid_bytes, payload):
    return eid_bytes + _ebml_size_bytes(len(payload)) + payload


def _webm_block(payload, track=1, timecode=0, flags=0x80):
    # SimpleBlock body: track varint (1-byte form) + i16 timecode + flags
    return (bytes([0x80 | track]) + timecode.to_bytes(2, "big")
            + bytes([flags]) + payload)


def _webm_bytes(duration_units=5000.0, scale=None, w=1280, h=720,
                frames=(), laced_frames=(), grouped_frames=(),
                block_track=1):
    import struct

    info_body = b""
    if scale is not None:
        info_body += _ebml_el(bytes([0x2A, 0xD7, 0xB1]),
                              scale.to_bytes(4, "big"))
    info_body += _ebml_el(bytes([0x44, 0x89]),
                          struct.pack(">f", duration_units))
    info = _ebml_el(bytes([0x15, 0x49, 0xA9, 0x66]), info_body)
    video = _ebml_el(bytes([0xE0]),
                     _ebml_el(bytes([0xB0]), w.to_bytes(2, "big"))
                     + _ebml_el(bytes([0xBA]), h.to_bytes(2, "big")))
    track = _ebml_el(bytes([0xAE]), video)
    tracks = _ebml_el(bytes([0x16, 0x54, 0xAE, 0x6B]), track)
    seg_body = info + tracks
    if frames or laced_frames or grouped_frames:
        cluster_body = b""
        for t, payload in enumerate(frames):
            cluster_body += _ebml_el(
                bytes([0xA3]),
                _webm_block(payload, track=block_track, timecode=t),
            )
        for payload in laced_frames:  # EBML-laced: extractor must skip
            cluster_body += _ebml_el(
                bytes([0xA3]), _webm_block(payload, flags=0x86)
            )
        for payload in grouped_frames:  # BlockGroup > Block form
            cluster_body += _ebml_el(
                bytes([0xA0]),
                _ebml_el(bytes([0xA1]), _webm_block(payload)),
            )
        seg_body += _ebml_el(bytes([0x1F, 0x43, 0xB6, 0x75]), cluster_body)
    segment = (bytes([0x18, 0x53, 0x80, 0x67])
               + _ebml_size_bytes(len(seg_body)) + seg_body)
    ebml_hdr = _ebml_el(bytes([0x1A, 0x45, 0xDF, 0xA3]), b"")
    return ebml_hdr + segment


def test_parse_avi_header():
    from vinum_spark.operators.multimodal import _parse_avi

    kind, _, _, _, dur, h, w, dec = _parse_avi(_avi_bytes())
    assert (kind, dec) == ("video", "avi-avih")
    assert (w, h) == (640, 360)
    assert dur == pytest.approx(300 * 33333 / 1e6)
    assert _parse_avi(b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 30) is None
    assert _parse_avi(b"junk") is None


def test_parse_webm_info_and_tracks():
    from vinum_spark.operators.multimodal import _parse_webm

    # default timecode scale: 1 ms units -> 5000 units = 5 s
    kind, _, _, _, dur, h, w, dec = _parse_webm(_webm_bytes())
    assert (kind, dec) == ("video", "webm-ebml")
    assert dur == pytest.approx(5.0)
    assert (w, h) == (1280, 720)
    # explicit 100 us scale -> 5000 units = 0.5 s
    out = _parse_webm(_webm_bytes(scale=100_000))
    assert out[4] == pytest.approx(0.5)
    assert _parse_webm(b"\x1a\x45\xdf\xa3") is None  # header only
    assert _parse_webm(b"nope") is None


def test_probe_media_avi_webm_and_mime(spark):
    from vinum_spark.operators.multimodal import attach_metadata, probe_media

    df = spark.createDataFrame(
        [(0, _avi_bytes()), (1, _webm_bytes())],
        "asset_id long, content binary",
    )
    probe = probe_media(df).toPandas().set_index("asset_id").sort_index()
    assert probe.loc[0, "decoder"] == "avi-avih"
    assert (probe.loc[0, "width"], probe.loc[0, "height"]) == (640, 360)
    assert probe.loc[1, "decoder"] == "webm-ebml"
    assert probe.loc[1, "duration_s"] == pytest.approx(5.0)
    mimes = attach_metadata(df).select("meta.mime").toPandas().mime.tolist()
    assert mimes == ["video/x-msvideo", "video/webm"]


# --------------------------------------------------------------------------
# BMP / TIFF / WebP / HEIC header dims (round 9)
# --------------------------------------------------------------------------


def _bmp_header_bytes(w=320, h=200, bpp=24, topdown=False):
    hdr = bytearray(54)
    hdr[0:2] = b"BM"
    hdr[14:18] = (40).to_bytes(4, "little")
    hdr[18:22] = w.to_bytes(4, "little", signed=True)
    hdr[22:26] = (-h if topdown else h).to_bytes(4, "little", signed=True)
    hdr[28:30] = bpp.to_bytes(2, "little")
    return bytes(hdr)


def _bmp_core_bytes(w=320, h=200, bpp=24):
    """OS/2 BITMAPCOREHEADER: 12-byte DIB header, u16 dims at 18/20."""
    hdr = bytearray(26)
    hdr[0:2] = b"BM"
    hdr[14:18] = (12).to_bytes(4, "little")
    hdr[18:20] = w.to_bytes(2, "little")
    hdr[20:22] = h.to_bytes(2, "little")
    hdr[22:24] = (1).to_bytes(2, "little")  # planes
    hdr[24:26] = bpp.to_bytes(2, "little")
    return bytes(hdr)


def _tiff_bytes(w=640, h=480, spp=3, big_endian=False):
    bo = "big" if big_endian else "little"
    out = bytearray(b"MM\x00*" if big_endian else b"II*\x00")
    out += (8).to_bytes(4, bo)

    def entry(tag, typ, val):
        e = tag.to_bytes(2, bo) + typ.to_bytes(2, bo) + (1).to_bytes(4, bo)
        if typ == 3:
            e += val.to_bytes(2, bo) + b"\x00\x00"
        else:
            e += val.to_bytes(4, bo)
        return e

    out += (3).to_bytes(2, bo)
    out += entry(256, 4, w) + entry(257, 3, h) + entry(277, 3, spp)
    out += (0).to_bytes(4, bo)
    return bytes(out)


def _webp_bytes(kind="VP8X", w=1024, h=768):
    if kind == "VP8X":
        body = bytes(4) + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        chunk = b"VP8X" + len(body).to_bytes(4, "little") + body
    elif kind == "VP8 ":
        body = bytes(3) + b"\x9d\x01\x2a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
    else:  # VP8L, alpha bit set
        bits = (w - 1) | ((h - 1) << 14) | (1 << 28)
        body = b"\x2f" + bits.to_bytes(4, "little")
        chunk = b"VP8L" + len(body).to_bytes(4, "little") + body + b"\x00"
    payload = b"WEBP" + chunk
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


def _heic_bytes(w=4032, h=3024, brand=b"heic"):
    def box(btype, body):
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    ispe_big = box(b"ispe", bytes(4) + w.to_bytes(4, "big") + h.to_bytes(4, "big"))
    ispe_thumb = box(b"ispe", bytes(4) + (160).to_bytes(4, "big") + (120).to_bytes(4, "big"))
    ipco = box(b"ipco", ispe_thumb + ispe_big)
    iprp = box(b"iprp", ipco)
    meta = box(b"meta", bytes(4) + iprp)
    ftyp = box(b"ftyp", brand + bytes(4))
    return ftyp + meta


def test_header_dims_new_containers():
    from vinum_spark.operators.multimodal import _header_dims

    assert _header_dims(_bmp_header_bytes()) == (200, 320, 3, "bmp-header")
    assert _header_dims(_bmp_header_bytes(topdown=True)) == (200, 320, 3, "bmp-header")
    assert _header_dims(_bmp_header_bytes(bpp=8)) == (200, 320, 1, "bmp-header")
    # OS/2 core header: u16 dims, not i32 — the i32 read would see
    # width|height<<16 garbage; the DIB-size discriminator must catch it
    assert _header_dims(_bmp_core_bytes()) == (200, 320, 3, "bmp-header")
    assert _header_dims(_bmp_core_bytes(bpp=4)) == (200, 320, 1, "bmp-header")
    # unknown DIB header sizes return None rather than garbage dims
    bad = bytearray(_bmp_header_bytes())
    bad[14:18] = (17).to_bytes(4, "little")
    assert _header_dims(bytes(bad)) is None
    assert _header_dims(_tiff_bytes()) == (480, 640, 3, "tiff-ifd")
    assert _header_dims(_tiff_bytes(big_endian=True)) == (480, 640, 3, "tiff-ifd")
    assert _header_dims(_webp_bytes("VP8X")) == (768, 1024, 3, "webp-vp8x")
    assert _header_dims(_webp_bytes("VP8 ")) == (768, 1024, 3, "webp-vp8")
    assert _header_dims(_webp_bytes("VP8L")) == (768, 1024, 4, "webp-vp8l")
    # largest ispe wins (main image over thumbnail)
    assert _header_dims(_heic_bytes()) == (3024, 4032, 3, "heic-ispe")
    assert _header_dims(_heic_bytes(brand=b"avif")) == (3024, 4032, 3, "avif-ispe")
    # hostile: truncation never raises
    for fx in (_bmp_header_bytes(), _tiff_bytes(), _webp_bytes(), _heic_bytes()):
        for cut in (3, 9, len(fx) // 2):
            _header_dims(fx[:cut])


def test_decode_images_and_mime_new_containers(spark):
    from vinum_spark.operators.multimodal import attach_metadata, decode_images

    df = spark.createDataFrame(
        [(0, _bmp_header_bytes()), (1, _tiff_bytes()), (2, _webp_bytes("VP8L")),
         (3, _heic_bytes()), (4, _heic_bytes(brand=b"avif"))],
        "asset_id long, content binary",
    )
    out = decode_images(df).toPandas().set_index("asset_id").sort_index()
    assert out.decoder.tolist() == [
        "bmp-header", "tiff-ifd", "webp-vp8l", "heic-ispe", "avif-ispe"]
    assert (out.loc[3, "height"], out.loc[3, "width"]) == (3024, 4032)
    mimes = attach_metadata(df).select("meta.mime").toPandas().mime.tolist()
    assert mimes == ["image/bmp", "image/tiff", "image/webp",
                     "image/heic", "image/avif"]


# --------------------------------------------------------------------------
# Uncompressed TIFF pixel decode (round 9)
# --------------------------------------------------------------------------


def _packbits_encode(data):
    """Spec-built PackBits encoder: repeat packets for runs of >=3
    equal bytes, literal packets (<=128 bytes) otherwise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _tiff_lzw_encode(data):
    """Spec-built TIFF LZW encoder: MSB-first packing, Clear=256/
    EOI=257, EARLY-CHANGE width bumps at (1<<width)-1, Clear emitted
    when the table reaches 4094 codes."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    codes = [(256, 9)]
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        # the decoder's table lags one entry behind, so its EARLY-CHANGE
        # check at (1<<width)-1 pairs with an encoder bump at (1<<width)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            codes.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    acc = nbits = 0
    out = bytearray()
    for code, cw in codes:
        acc = (acc << cw) | code
        nbits += cw
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_full(arr, big_endian=False, rows_per_strip=None, planar=1,
               compression=1, predictor=None, bits=8, tile=None):
    """Spec-built TIFF with real strip OR tile data; strips are
    rows_per_strip rows (plane-major when planar=2), tiles are
    ``tile=(tw, tl)`` blocks (edge-padded, tags 322-325), each chunk
    independently compressed per the compression tag (1=none, 5=LZW,
    8=deflate, 32773=PackBits) after optional Predictor=2 differencing
    (which restarts per tile row). bits=16 expects a uint16 array and
    writes samples in the file's byte order."""
    import zlib

    import numpy as np

    h, w, spp = arr.shape
    bo = "big" if big_endian else "little"
    rps = rows_per_strip or h
    sample_dt = "u1" if bits == 8 else (">u2" if big_endian else "<u2")

    def diff2(a):
        d = a.astype(np.int32)
        d[:, 1:, :] -= a[:, :-1, :].astype(np.int32)
        return (d % (1 << bits)).astype(
            np.uint8 if bits == 8 else np.uint16
        )

    if tile is not None:
        tw, tl = tile
        ph, pw = -(-h // tl) * tl, -(-w // tw) * tw
        padded = np.pad(arr, ((0, ph - h), (0, pw - w), (0, 0)),
                        mode="edge")
        tiles = []
        plane_list = range(spp) if planar == 2 and spp > 1 else [None]
        for pl in plane_list:
            for ty in range(0, ph, tl):
                for tx in range(0, pw, tw):
                    t = padded[ty : ty + tl, tx : tx + tw]
                    t = t[:, :, pl : pl + 1] if pl is not None else t
                    if predictor == 2:
                        t = diff2(t)
                    tiles.append(t.astype(sample_dt).tobytes())
        raw_strips = tiles
    else:
        if predictor == 2:
            arr = diff2(arr)
        arr = arr.astype(sample_dt)
        if planar == 2:
            # plane-major: per sample plane, a full run of row strips
            raw_strips = [
                arr[y : y + rps, :, p].tobytes()
                for p in range(spp)
                for y in range(0, h, rps)
            ]
        else:
            raw_strips = [
                arr[y : y + rps].tobytes() for y in range(0, h, rps)
            ]
    enc = {
        1: lambda s: s,
        5: _tiff_lzw_encode,
        8: zlib.compress,
        32773: _packbits_encode,
    }[compression]
    strips = [enc(s) for s in raw_strips]
    k = len(strips)
    # layout: header(8) + IFD + value arrays + strip data
    n_entries = 9 + (predictor is not None) + (
        2 if tile is not None else (rows_per_strip is not None)
    )
    ifd_off = 8
    ifd_len = 2 + n_entries * 12 + 4
    arrays_off = ifd_off + ifd_len

    def entry(tag, typ, values, inline_pad=True):
        nonlocal extra, arrays_cursor
        size = {3: 2, 4: 4}[typ]
        e = tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
        e += len(values).to_bytes(4, bo)
        if len(values) * size <= 4:
            v = b"".join(x.to_bytes(size, bo) for x in values)
            e += v + b"\x00" * (4 - len(v))
        else:
            e += arrays_cursor.to_bytes(4, bo)
            extra += b"".join(x.to_bytes(size, bo) for x in values)
            arrays_cursor += len(values) * size
        return e

    # strip offsets are filled after we know the data start; two passes
    for offsets_known in (False, True):
        extra = b""
        arrays_cursor = arrays_off
        entries = []
        data_off = None
        if offsets_known:
            data_off = arrays_off + extra_len
            cur = data_off
            strip_offsets = []
            for s in strips:
                strip_offsets.append(cur)
                cur += len(s)
        else:
            strip_offsets = [0] * k
        entries.append(entry(256, 4, [w]))
        entries.append(entry(257, 4, [h]))
        entries.append(entry(258, 3, [bits] * spp))
        entries.append(entry(259, 3, [compression]))
        entries.append(entry(262, 3, [2]))
        if tile is not None:
            entries.append(entry(322, 4, [tile[0]]))
            entries.append(entry(323, 4, [tile[1]]))
            entries.append(entry(324, 4, strip_offsets))
            entries.append(entry(325, 4, [len(s) for s in strips]))
        else:
            entries.append(entry(273, 4, strip_offsets))
            if rows_per_strip is not None:
                entries.append(entry(278, 4, [rps]))
            entries.append(entry(279, 4, [len(s) for s in strips]))
        entries.append(entry(277, 3, [spp]))
        entries.append(entry(284, 3, [planar]))
        if predictor is not None:
            entries.append(entry(317, 3, [predictor]))
        extra_len = len(extra)
    hdr = (b"MM\x00*" if big_endian else b"II*\x00") + ifd_off.to_bytes(4, bo)
    ifd = n_entries.to_bytes(2, bo) + b"".join(entries) + (0).to_bytes(4, bo)
    return hdr + ifd + extra + b"".join(strips)


def test_tiff_pixels_roundtrip():
    import numpy as np

    from vinum_spark.operators.multimodal import _tiff_pixels

    rng = np.random.RandomState(12)
    arr = rng.randint(0, 256, (10, 7, 3), dtype=np.uint8)
    for be in (False, True):
        got = _tiff_pixels(_tiff_full(arr, big_endian=be))
        assert got is not None, be
        assert np.array_equal(got, arr), be
    # multi-strip (offsets/counts as pointed-to LONG arrays)
    got = _tiff_pixels(_tiff_full(arr, rows_per_strip=3))
    assert np.array_equal(got, arr)
    # grayscale single-sample
    gray = rng.randint(0, 256, (6, 9, 1), dtype=np.uint8)
    assert np.array_equal(_tiff_pixels(_tiff_full(gray)), gray)
    # planar (plane-major) storage decodes too, with a distinct label
    from vinum_spark.operators.multimodal import _tiff_pixels_labeled

    got = _tiff_pixels_labeled(_tiff_full(arr, planar=2))
    assert got is not None and got[1] == "tiff-strips-planar"
    assert np.array_equal(got[0], arr)
    # unknown planar values -> None (header dims still work)
    assert _tiff_pixels(_tiff_full(arr, planar=3)) is None
    from vinum_spark.operators.multimodal import _header_dims
    assert _header_dims(_tiff_full(arr, planar=3))[3] == "tiff-ifd"


def test_tiff_compressed_strips_roundtrip():
    """PackBits / TIFF-LZW / Deflate strips vs the spec-built encoders,
    pixel-exact, with and without Predictor=2 differencing, single- and
    multi-strip, both endiannesses; each compression gets its own
    decoder label."""
    import numpy as np

    from vinum_spark.operators.multimodal import (
        _tiff_pixels,
        _tiff_pixels_labeled,
    )

    rng = np.random.RandomState(42)
    # a gradient-plus-noise image: runs for PackBits, repeats for LZW
    base = np.arange(0, 240, 2, dtype=np.uint8).reshape(1, -1, 1)
    arr = np.broadcast_to(base, (40, 120, 1)).copy()
    arr[10:20] = 7  # flat band -> PackBits repeat packets
    rgb = np.repeat(arr, 3, axis=2).copy()
    rgb[:, :, 1] = rng.randint(0, 256, (40, 120), dtype=np.uint8)

    for comp, label in ((32773, "tiff-packbits"), (5, "tiff-lzw"),
                        (8, "tiff-deflate")):
        for img in (arr, rgb):
            for kwargs in (
                {},
                {"rows_per_strip": 7},
                {"predictor": 2},
                {"rows_per_strip": 7, "predictor": 2},
                {"big_endian": True},
            ):
                fx = _tiff_full(img, compression=comp, **kwargs)
                got = _tiff_pixels_labeled(fx)
                assert got is not None, (comp, kwargs)
                px, lab = got
                assert lab == label, (comp, kwargs)
                assert np.array_equal(px, img), (comp, kwargs)

    # LZW table growth across the early-change boundaries: enough
    # distinct 2-grams to push past codes 511/1023 (width 10/11)
    big = rng.randint(0, 256, (60, 90, 3), dtype=np.uint8)
    fx = _tiff_full(big, compression=5, rows_per_strip=16)
    assert np.array_equal(_tiff_pixels(fx), big)

    # predictor on uncompressed strips is legal too
    fx = _tiff_full(rgb, compression=1, predictor=2)
    px, lab = _tiff_pixels_labeled(fx)
    assert lab == "tiff-strips" and np.array_equal(px, rgb)

    # planar (plane-major) x every compression x predictor x multi-strip
    for comp, lab_want in ((1, "tiff-strips-planar"),
                           (32773, "tiff-packbits-planar"),
                           (5, "tiff-lzw-planar"),
                           (8, "tiff-deflate-planar")):
        for kwargs in ({}, {"rows_per_strip": 7}, {"predictor": 2},
                       {"rows_per_strip": 7, "predictor": 2}):
            fx = _tiff_full(rgb, compression=comp, planar=2, **kwargs)
            got = _tiff_pixels_labeled(fx)
            assert got is not None, (comp, kwargs)
            px, lab = got
            assert lab == lab_want and np.array_equal(px, rgb), (comp, kwargs)

    # 16-bit samples: high byte kept (the PNG 16-bit contract), both
    # endiannesses, compressed, planar, and predictor-at-sample-width
    rng16 = np.random.RandomState(21)
    deep = rng16.randint(0, 1 << 16, (14, 11, 3)).astype(np.uint16)
    for kwargs in ({}, {"big_endian": True}, {"compression": 8},
                   {"compression": 5, "predictor": 2},
                   {"planar": 2, "compression": 32773},
                   {"planar": 2, "predictor": 2, "rows_per_strip": 5}):
        fx = _tiff_full(deep, bits=16, **kwargs)
        got = _tiff_pixels_labeled(fx)
        assert got is not None, kwargs
        px, _ = got
        assert np.array_equal(px, (deep >> 8).astype(np.uint8)), kwargs
    # mixed / unsupported bit depths -> None
    assert _tiff_pixels(_tiff_full(deep.astype(np.uint8), bits=4)) is None

    # corrupt compressed payloads degrade to None, never raise
    fx = bytearray(_tiff_full(rgb, compression=8))
    fx[-20:] = b"\x00" * 20
    assert _tiff_pixels(bytes(fx)) is None


def test_tiff_tiled_roundtrip():
    """Tiled layout (tags 322-325): every compression x chunky/planar
    x 8/16-bit x predictor (which restarts per tile row), edge tiles
    cropped from their padded blocks."""
    import numpy as np

    from vinum_spark.operators.multimodal import _tiff_pixels_labeled

    rng = np.random.RandomState(33)
    rgb = rng.randint(0, 256, (40, 52, 3), dtype=np.uint8)  # 52 % 16 != 0
    for comp, base in ((1, "tiff-strips"), (32773, "tiff-packbits"),
                       (5, "tiff-lzw"), (8, "tiff-deflate")):
        for kwargs, suffix in (
            ({}, "-tiled"),
            ({"predictor": 2}, "-tiled"),
            ({"planar": 2}, "-planar-tiled"),
            ({"planar": 2, "predictor": 2}, "-planar-tiled"),
        ):
            fx = _tiff_full(rgb, compression=comp, tile=(16, 16), **kwargs)
            got = _tiff_pixels_labeled(fx)
            assert got is not None, (comp, kwargs)
            px, lab = got
            assert lab == base + suffix, (comp, kwargs, lab)
            assert np.array_equal(px, rgb), (comp, kwargs)
    # 16-bit tiled: high byte kept, both endiannesses
    deep = rng.randint(0, 1 << 16, (24, 33, 3)).astype(np.uint16)
    for be in (False, True):
        fx = _tiff_full(deep, bits=16, compression=8, tile=(16, 16),
                        predictor=2, big_endian=be)
        got = _tiff_pixels_labeled(fx)
        assert got is not None, be
        assert np.array_equal(got[0], (deep >> 8).astype(np.uint8)), be
    # non-multiple-of-16 tile dims are invalid per spec -> None
    from vinum_spark.operators.multimodal import _tiff_pixels

    assert _tiff_pixels(_tiff_full(rgb, tile=(12, 16))) is None


def _tiff_jpeg(px, rows_per_strip=None, shared_tables=False):
    """Spec-built new-style JPEG-in-TIFF (Compression=7): each strip is
    an _encode_jpeg stream of its row band; with shared_tables the
    DQT/DHT segments move into a JPEGTables (347) abbreviated stream
    and the strips keep only SOF/SOS."""
    import numpy as np

    h, w, spp = px.shape
    rps = rows_per_strip or h
    strips = [
        _encode_jpeg(px[y : y + rps], full_tables=shared_tables)
        for y in range(0, h, rps)
    ]
    tables_blob = None
    if shared_tables:
        def split(stream):
            i, segs, rest = 2, bytearray(), bytearray(b"\xff\xd8")
            while i + 4 <= len(stream):
                if stream[i] != 0xFF:
                    rest += stream[i:]
                    break
                marker = stream[i + 1]
                if marker == 0xDA:  # SOS: entropy data follows to EOI
                    rest += stream[i:]
                    break
                seg_len = int.from_bytes(stream[i + 2 : i + 4], "big")
                seg = stream[i : i + 2 + seg_len]
                if marker in (0xDB, 0xC4):  # DQT / DHT -> shared tables
                    segs += seg
                else:
                    rest += seg
                i += 2 + seg_len
            return bytes(segs), bytes(rest)

        all_segs = b""
        abbreviated = []
        for st_ in strips:
            segs, rest = split(st_)
            if not all_segs:
                all_segs = segs
            abbreviated.append(rest)
        strips = abbreviated
        tables_blob = b"\xff\xd8" + all_segs + b"\xff\xd9"

    bo = "little"
    n_entries = 8 + (rows_per_strip is not None) + (tables_blob is not None)
    ifd_off = 8
    ifd_len = 2 + n_entries * 12 + 4
    arrays_off = ifd_off + ifd_len
    extra_len = 0
    for offsets_known in (False, True):
        extra = b""
        cursor = arrays_off

        def entry(tag, typ, values, blob=None):
            nonlocal extra, cursor
            if blob is not None:  # type 7 UNDEFINED byte payload
                e = tag.to_bytes(2, bo) + (7).to_bytes(2, bo)
                e += len(blob).to_bytes(4, bo)
                if len(blob) <= 4:
                    e += blob + b"\x00" * (4 - len(blob))
                else:
                    e += cursor.to_bytes(4, bo)
                    extra += blob
                    cursor += len(blob)
                return e
            size = {3: 2, 4: 4}[typ]
            e = tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
            e += len(values).to_bytes(4, bo)
            if len(values) * size <= 4:
                v = b"".join(int(x).to_bytes(size, bo) for x in values)
                e += v + b"\x00" * (4 - len(v))
            else:
                e += cursor.to_bytes(4, bo)
                extra += b"".join(int(x).to_bytes(size, bo) for x in values)
                cursor += len(values) * size
            return e

        if offsets_known:
            data_off = arrays_off + extra_len
            offs = []
            cur = data_off
            for st_ in strips:
                offs.append(cur)
                cur += len(st_)
        else:
            offs = [0] * len(strips)
        ents = [
            entry(256, 4, [w]),
            entry(257, 4, [h]),
            entry(258, 3, [8] * spp),
            entry(259, 3, [7]),
            entry(262, 3, [6]),  # YCbCr
            entry(273, 4, offs),
            entry(277, 3, [spp]),
        ]
        if rows_per_strip is not None:
            ents.append(entry(278, 4, [rps]))
        ents.append(entry(279, 4, [len(st_) for st_ in strips]))
        if tables_blob is not None:
            ents.append(entry(347, 7, [], blob=tables_blob))
        extra_len = len(extra)
    hdr = b"II*\x00" + ifd_off.to_bytes(4, bo)
    ifd = n_entries.to_bytes(2, bo) + b"".join(ents) + (0).to_bytes(4, bo)
    return hdr + ifd + extra + b"".join(strips)


def test_tiff_jpeg_strips():
    """Compression=7: the TIFF path must produce EXACTLY what the plain
    JPEG decoder produces for the same streams (single-strip,
    MCU-unaligned multi-strip, and the shared-JPEGTables abbreviated
    form whose per-strip streams carry no DQT/DHT)."""
    import numpy as np

    from vinum_spark.operators.multimodal import (
        _jpeg_pixels,
        _tiff_pixels,
        _tiff_pixels_labeled,
    )

    px = _smooth_rgb(7, 40, 24)

    # single strip: identical to decoding the embedded JPEG directly
    got = _tiff_pixels_labeled(_tiff_jpeg(px))
    assert got is not None and got[1] == "tiff-jpeg"
    assert np.array_equal(got[0], _jpeg_pixels(_encode_jpeg(px)))

    # multi-strip with an MCU-unaligned last band (40 = 16+16+8)
    want = np.concatenate(
        [_jpeg_pixels(_encode_jpeg(px[y : y + 16])) for y in (0, 16, 32)],
        axis=0,
    )
    got = _tiff_pixels_labeled(_tiff_jpeg(px, rows_per_strip=16))
    assert got is not None and got[1] == "tiff-jpeg"
    assert np.array_equal(got[0], want)

    # shared JPEGTables: abbreviated strips decode identically
    got = _tiff_pixels_labeled(
        _tiff_jpeg(px, rows_per_strip=16, shared_tables=True)
    )
    assert got is not None and got[1] == "tiff-jpeg"
    assert np.array_equal(got[0], want)

    # an abbreviated strip WITHOUT its tables is undecodable -> None
    no_tables = bytearray(_tiff_jpeg(px, shared_tables=True))
    # zero out the JPEGTables tag id (347 -> 0) so the blob is ignored
    idx = bytes(no_tables).find((347).to_bytes(2, "little"), 8)
    no_tables[idx : idx + 2] = (0).to_bytes(2, "little")
    assert _tiff_pixels(bytes(no_tables)) is None


def test_decode_images_compressed_tiff_labels(spark):
    import numpy as np
    import pandas as pd

    from vinum_spark.operators.multimodal import decode_images

    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, (12, 9, 3), dtype=np.uint8)
    df = spark.createDataFrame(pd.DataFrame({
        "asset_id": [1, 2, 3],
        "content": [_tiff_full(img, compression=c, predictor=2)
                    for c in (32773, 5, 8)],
    }))
    rows = {r.asset_id: r for r in
            decode_images(df, pixels=True).collect()}
    assert rows[1].decoder == "tiff-packbits"
    assert rows[2].decoder == "tiff-lzw"
    assert rows[3].decoder == "tiff-deflate"
    for r in rows.values():
        assert (r.height, r.width, r.channels) == (12, 9, 3)


def test_decode_images_tiff_strips(spark):
    import numpy as np

    from vinum_spark.operators.multimodal import decode_images, extract_features

    rng = np.random.RandomState(13)
    arr = rng.randint(0, 256, (16, 12, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, _tiff_full(arr, rows_per_strip=4))],
        "asset_id long, content binary",
    )
    out = decode_images(df, pixels=True).toPandas().iloc[0]
    assert out["decoder"] == "tiff-strips"
    assert (out["height"], out["width"], out["channels"]) == (16, 12, 3)
    feats = extract_features(df).toPandas().iloc[0]
    assert feats["extractor"] == "tiff-pool8"


# ---------------------------------------------------------------------------
# BMP raster decode (uncompressed BI_RGB)


def test_bmp_pixels_roundtrip_24_32_palette():
    import numpy as np

    from vinum_spark.operators.media_synth import _bmp_bytes
    from vinum_spark.operators.multimodal import _bmp_pixels

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    for top_down in (False, True):
        px = _bmp_pixels(_bmp_bytes(img, 24, top_down=top_down))
        assert px is not None and np.array_equal(px, img), top_down
    img4 = rng.randint(0, 256, (4, 3, 4), dtype=np.uint8)
    assert np.array_equal(_bmp_pixels(_bmp_bytes(img4, 32)), img4)
    pal = [(250, 10, 30), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    idx = rng.randint(0, 4, (6, 9))
    px = _bmp_pixels(_bmp_bytes(idx, 8, palette=pal))
    assert np.array_equal(px, np.array(pal, np.uint8)[idx])


def test_bmp_compressed_or_truncated_falls_back_to_header():
    import numpy as np

    from vinum_spark.operators.media_synth import _bmp_bytes
    from vinum_spark.operators.multimodal import _bmp_pixels, _header_dims

    img = np.zeros((3, 5, 3), np.uint8)
    rle = bytearray(_bmp_bytes(img, 24))
    rle[30] = 1  # compression = BI_RLE8: pixel path declines
    assert _bmp_pixels(bytes(rle)) is None
    assert _header_dims(bytes(rle)) == (3, 5, 3, "bmp-header")
    trunc = _bmp_bytes(img, 24)[:-8]  # raster shorter than declared
    assert _bmp_pixels(trunc) is None
    assert _header_dims(trunc) == (3, 5, 3, "bmp-header")


def test_bmp_png_twins_identical_pixels_and_features(spark):
    """The SAME image encoded as BMP and as PNG must decode to
    identical pixels and identical pool8 features — the cross-format
    invariant the near-dup chain relies on."""
    import numpy as np

    from vinum_spark.operators.media_synth import _bmp_bytes
    from vinum_spark.operators.multimodal import (
        _bmp_pixels,
        _png_pixels,
        decode_images,
        extract_features,
    )

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    bmp, png = _bmp_bytes(img, 24), _png_rgb(img)
    assert np.array_equal(_bmp_pixels(bmp), _png_pixels(png))

    df = spark.createDataFrame(
        [(0, bytearray(bmp)), (1, bytearray(png))],
        "asset_id long, content binary",
    )
    dec = decode_images(df, pixels=True).toPandas().set_index("asset_id")
    assert dec.loc[0, "decoder"] == "bmp-raster"
    assert dec.loc[1, "decoder"] == "png-zlib"
    assert (dec.loc[0, ["height", "width"]] == [16, 16]).all()

    feats = extract_features(df).toPandas().set_index("asset_id")
    assert feats.loc[0, "extractor"] == "bmp-pool8"
    assert feats.loc[1, "extractor"] == "png-pool8"
    assert np.allclose(feats.loc[0, "feature"], feats.loc[1, "feature"])


# ---------------------------------------------------------------------------
# DCT perceptual hash


def test_phash64_resize_and_format_invariance():
    """The hash must survive exactly the transforms pool8 is brittle
    to: nearest-preserving upscale, gray->RGB re-encode, and the
    PNG<->BMP container swap."""
    import numpy as np

    from vinum_spark.operators.media_synth import _bmp_bytes
    from vinum_spark.operators.multimodal import (
        _bmp_pixels,
        _phash64,
        _png_pixels,
    )

    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    h = _phash64(img)
    assert h == _phash64(np.repeat(np.repeat(img, 2, 0), 2, 1))
    assert h == _phash64(np.stack([img] * 3, axis=2))
    assert h == _phash64(_bmp_pixels(_bmp_bytes(np.stack([img] * 3, 2), 24)))
    assert h == _phash64(_png_pixels(_png_rgb(np.stack([img] * 3, 2))))
    assert isinstance(h, int) and -(1 << 63) <= h < (1 << 63)


def test_phash_banding_pigeonhole_recall(spark):
    """A pair at hamming distance d < n_bands ALWAYS shares a band —
    the deterministic recall guarantee phash_candidate_pairs claims.
    Flip 7 scattered bits (one per band except one) and require the
    candidate; also require NULL hashes never enter banding."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.similarity import (
        hamming_verify,
        phash_candidate_pairs,
    )

    base = 0x0123456789ABCDEF
    # flip one bit in 7 of the 8 bands: distance 7, still one clean band
    twin = base
    for b in range(7):
        twin ^= 1 << (8 * b + 3)
    to_signed = lambda v: v - (1 << 64) if v >= 1 << 63 else v
    df = spark.createDataFrame(
        [(1, to_signed(base)), (2, to_signed(twin)), (3, None)],
        "asset_id long, phash long",
    )
    pairs = phash_candidate_pairs(df).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    got = hamming_verify(df, phash_candidate_pairs(df), max_dist=7).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 7)]
    # distance 8 (every band touched) may be missed by banding AND is
    # over the verify bound anyway — pin the verify side
    assert (
        hamming_verify(df, phash_candidate_pairs(df), max_dist=6).count() == 0
    )


def test_phash_images_labels_and_stub(spark):
    import numpy as np

    from vinum_spark.operators.media_synth import _bmp_bytes
    from vinum_spark.operators.multimodal import phash_images

    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    df = spark.createDataFrame(
        [
            (0, bytearray(_png_rgb(np.stack([img] * 3, 2)))),
            (1, bytearray(_bmp_bytes(np.stack([img] * 3, 2), 24))),
            (2, bytearray(b"not an image")),
        ],
        "asset_id long, content binary",
    )
    out = phash_images(df).toPandas().set_index("asset_id")
    assert out.loc[0, "decoder"] == "png-phash64"
    assert out.loc[1, "decoder"] == "bmp-phash64"
    assert out.loc[0, "phash"] == out.loc[1, "phash"]
    assert out.loc[2, "decoder"] == "stub" and pd.isna(out.loc[2, "phash"])


def test_png_zlib_bomb_and_huge_dims_bounded():
    """PNG was the one pixel decoder with an unbounded inflate: a
    few-KB IDAT can declare a ~1000:1 zlib ratio bomb, and IHDR dims
    are attacker bytes. Both must fail fast (bounded decompressobj at
    the exact filtered-stream size + max_pixels cap), in ~0 time,
    without ballooning executor memory."""
    import binascii
    import time
    import zlib

    import numpy as np

    from vinum_spark.operators.multimodal import _png_encode, _png_pixels

    def chunk(t, b):
        return (
            len(b).to_bytes(4, "big") + t + b
            + binascii.crc32(t + b).to_bytes(4, "big")
        )

    sig = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])

    # ratio bomb: ~100 KB of IDAT that inflates to 100 MB, dims 30x20
    bomb = zlib.compress(b"\x00" * (100 * 1024 * 1024), 9)
    ihdr = (
        (30).to_bytes(4, "big") + (20).to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    png = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    t0 = time.time()
    assert _png_pixels(png) is None
    assert time.time() - t0 < 1.0

    # huge declared dims (60000x60000 = 3.6 G pixels)
    ihdr2 = (
        (60000).to_bytes(4, "big") + (60000).to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    png2 = (
        sig + chunk(b"IHDR", ihdr2)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 100)) + chunk(b"IEND", b"")
    )
    assert _png_pixels(png2) is None

    # valid streams (both interlace modes) still round-trip exactly
    img = np.random.RandomState(3).randint(0, 256, (20, 30, 3), np.uint8)
    assert np.array_equal(_png_pixels(_png_encode(img)), img)


def test_phash_band_pair_keys_guarantee_and_occupancy(spark):
    """bands_per_key=2 (the >100k-corpus knob): distance <= n_bands-2
    still ALWAYS yields a candidate (two intact bands form a shared
    pair key), and the 16-bit keys shrink buckets ~256x vs single
    bands — the difference between ~n/256 and ~n/65536 rows per
    bucket at 500k assets."""
    from vinum_spark.operators.similarity import (
        hamming_verify,
        phash_candidate_pairs,
    )

    base = 0x0123456789ABCDEF
    twin6 = base
    for b in range(6):  # damage 6 of 8 bands: d=6 = n_bands-2
        twin6 ^= 1 << (8 * b + 5)
    far = base
    for b in range(7):  # damage 7 of 8 bands: <2 intact, no pair key
        far ^= 1 << (8 * b + 1)
    to_signed = lambda v: v - (1 << 64) if v >= 1 << 63 else v
    df = spark.createDataFrame(
        [(1, to_signed(base)), (2, to_signed(twin6)), (3, to_signed(far))],
        "asset_id long, phash long",
    )
    pairs = phash_candidate_pairs(df, bands_per_key=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) not in got
    v = hamming_verify(df, pairs, max_dist=6).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in v} == {(1, 2, 6)}


def test_phash_bands_per_key_auto_rule():
    """VERDICT r12 item 4: the auto-selection rule pins the documented
    occupancy cliff — single bands to 50k hashed assets (BASELINE.md's
    50k single-band run blew up to 38.6M candidates), pair keys past."""
    from vinum_spark.operators.similarity import (
        _PHASH_SINGLE_BAND_MAX,
        phash_bands_per_key,
    )

    assert _PHASH_SINGLE_BAND_MAX == 50_000
    assert phash_bands_per_key(0) == 1
    assert phash_bands_per_key(50_000) == 1
    assert phash_bands_per_key(50_001) == 2
    assert phash_bands_per_key(500_000) == 2


def test_phash_candidate_pairs_auto_matches_explicit(spark):
    """Default (auto) bands_per_key on a small corpus counts the
    hashed rows, picks single bands, and returns EXACTLY the explicit
    bands_per_key=1 candidate set; NULL hashes are excluded before the
    count (so they can't tip the threshold)."""
    from vinum_spark.operators.similarity import phash_candidate_pairs

    rs = __import__("numpy").random.RandomState(7)
    to_signed = lambda v: int(v - (1 << 64)) if v >= 1 << 63 else int(v)
    rows = []
    for i in range(200):
        h = int(rs.randint(0, 1 << 32)) << 32 | int(rs.randint(0, 1 << 32))
        rows.append((i, to_signed(h)))
        if i % 10 == 0:  # plant a distance-1 twin
            rows.append((i + 1000, to_signed(h ^ 1)))
    rows.append((9999, None))
    df = spark.createDataFrame(rows, "asset_id long, phash long")
    auto = {(r["id_a"], r["id_b"])
            for r in phash_candidate_pairs(df).collect()}
    exp1 = {(r["id_a"], r["id_b"])
            for r in phash_candidate_pairs(df, bands_per_key=1).collect()}
    assert auto == exp1
    for i in range(0, 200, 10):  # every planted twin is a candidate
        assert (i, i + 1000) in auto


def test_phash_candidate_pairs_rejects_bad_knob(spark):
    import pytest

    from vinum_spark.operators.similarity import phash_candidate_pairs

    df = spark.createDataFrame([(1, 5)], "asset_id long, phash long")
    with pytest.raises(ValueError, match="bands_per_key"):
        phash_candidate_pairs(df, bands_per_key=3)


def test_float_wav_nan_payload_sanitized():
    """A float32 WAV whose payload encodes NaN/inf bit patterns must
    decode to FINITE samples in [-1, 1] (NaN -> 0, inf -> the clip
    rails) — corrupt floats must not leak NaN into envelope/RMS
    stats. Signaling-NaN patterns also must not warn on the cast."""
    import struct
    import warnings

    import numpy as np

    from vinum_spark.operators.multimodal import _wav_pcm_samples

    vals = np.array(
        [0.5, float("nan"), float("inf"), -float("inf"), -0.25],
        dtype="<f4",
    )
    payload = vals.tobytes() + struct.pack("<I", 0x7F800001)  # sNaN
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = _wav_pcm_samples(wav)
    assert out is not None
    samples = out[0]
    assert np.isfinite(samples).all()
    assert samples.min() >= -1.0 and samples.max() <= 1.0
    assert samples[0] == np.float32(0.5) and samples[1] == 0.0
    assert samples[2] == 1.0 and samples[3] == -1.0


# --------------------------------------------------------------------------
# audio frame spans + external decoder hook (round 18)
# --------------------------------------------------------------------------


def test_audio_frame_spans_mp3_and_adts(spark):
    """The audio byte-span contract: every frame's exact payload bytes
    come back as a row with the stream's true rate and per-frame sample
    count; ID3 tags are skipped, non-audio bytes yield no rows, and
    every_n subsamples deterministically."""
    from vinum_spark.operators.multimodal import audio_frame_spans

    mp3 = _mp3_frames(12, id3v2=True, id3v1=True)
    aac = _adts_frames(9)
    df = spark.createDataFrame(
        [(1, bytearray(mp3)), (2, bytearray(aac)), (3, bytearray(b"junk"))],
        "asset_id long, content binary",
    )
    out = audio_frame_spans(df).toPandas()
    by = {k: g.sort_values("frame_idx") for k, g in out.groupby("asset_id")}
    assert set(by) == {1, 2}  # junk: honest empty, never invented spans

    m = by[1]
    assert m.codec.unique().tolist() == ["mpeg-frames"]
    assert len(m) == 12
    assert m.sample_rate.unique().tolist() == [44100]
    assert m.samples.unique().tolist() == [1152]
    flen = 144 * 128000 // 44100
    assert [len(bytes(f)) for f in m.frame] == [flen] * 12
    # each exported frame starts at a real sync word — the external
    # decoder consumes rows without re-walking the container
    assert all(bytes(f)[:2] == b"\xff\xfb" for f in m.frame)

    a = by[2]
    assert a.codec.unique().tolist() == ["adts-frames"]
    assert len(a) == 9
    assert a.sample_rate.unique().tolist() == [44100]
    assert a.samples.unique().tolist() == [1024]
    assert all(bytes(f)[:2] == b"\xff\xf1" for f in a.frame)

    # subsampling: every 5th frame of the 12 -> indices 0,1,2
    sub = audio_frame_spans(df, every_n=5).toPandas()
    assert sub[sub.asset_id == 1].frame_idx.tolist() == [0, 1, 2]


def test_decode_audio_external_hook(spark):
    """The MP3/AAC escape hatch: the hook runs ONLY for inputs every
    built-in decoder declined, a hook success carries real rms/peak
    with decoder='external', a raising hook degrades that row to the
    honest header stats, and built-in WAV decode never routes through
    the hook."""
    import numpy as np

    from vinum_spark.operators.multimodal import decode_audio

    # nested defs, not module-level: cloudpickle ships them by VALUE to
    # the workers (the test module is not importable there) — the same
    # constraint a real user hook has, documented in the operator
    def _fake_mp3_decoder(raw):
        """Deterministic stand-in for an ffmpeg-class hook (the real
        codec libraries are not in this container): 'decodes' any
        MP3-synced input to a fixed ramp with closed-form stats."""
        import numpy as np

        if raw[:3] == b"ID3" or raw[:2] in (b"\xff\xfb", b"\xff\xf3"):
            return np.linspace(0.0, 1.0, 5), 1, 44100
        return None

    def _raising_decoder(raw):
        raise RuntimeError("decoder exploded")

    # tiny valid WAV (pcm16 mono, 4 samples) — must stay built-in
    import struct

    pcm = struct.pack("<4h", 0, 16384, -16384, 32767)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    mp3 = _mp3_frames(10)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(mp3))],
        "asset_id long, content binary",
    )
    out = {
        r["asset_id"]: r
        for r in decode_audio(
            df, external_decoder=_fake_mp3_decoder
        ).collect()
    }
    assert out[1]["decoder"].startswith("pcm")  # hook never saw it
    ext = out[2]
    assert ext["decoder"] == "external"
    ramp = np.linspace(0.0, 1.0, 5)
    assert abs(ext["rms"] - float(np.sqrt(np.mean(ramp**2)))) < 1e-9
    assert ext["peak"] == 1.0
    assert ext["n_samples"] == 5 and ext["sample_rate"] == 44100

    # a raising hook must not lose the row OR the batch: the MP3 falls
    # back to the exact header walk, NULL rms (never invented)
    out2 = {
        r["asset_id"]: r
        for r in decode_audio(
            df, external_decoder=_raising_decoder
        ).collect()
    }
    assert out2[2]["decoder"] == "mpeg-frames"
    assert out2[2]["rms"] is None
    assert out2[2]["n_samples"] == 10 * 1152
