"""Multimodal column plumbing tests (synthetic binary assets)."""

from __future__ import annotations

import pytest
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
        assert len(v) == 32
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
    assert set(frames.columns) == {"asset_id", "frame_idx", "frame"}
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
