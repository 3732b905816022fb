"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed with Arrow-batched ``mapInPandas``.

Design (the 100 TB shape):

- content travels as a ``binary`` column next to a ``meta`` struct
  (mime/size/sha) — one row per asset, colocated with its features, so
  downstream joins are by key, never by re-reading blobs;
- cheap metadata (size, magic-byte mime sniffing, digest) is computed
  with JVM built-ins — no Python;
- decode/resize/feature-extract run as ``mapInPandas`` over Arrow
  batches: Python cost is per-batch, parallelism is per-partition, and
  memory stays bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual codec work is STUBBED (this container ships no image/audio
libraries): when PIL/soundfile are importable they are used; otherwise a
clearly-marked deterministic fake derives shapes/features from the bytes
so the Spark-side plumbing — schemas, batch iteration, UDF signatures —
is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes → mime, sniffed JVM-side via hex(substring(...))
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",  # RIFF (wav/avi; refined by codec stage)
    "494433": "audio/mpeg",
    "66747970": "video/mp4",  # ftyp at offset 4; see below
}


def attach_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Add a ``meta`` struct (size_bytes, sha1, mime) from built-ins only —
    runs fully inside codegen, no Python."""
    c = F.col(content_col)
    prefix = F.upper(F.hex(F.substring(c, 1, 4)))
    prefix3 = F.substring(prefix, 1, 6)
    mp4_marker = F.upper(F.hex(F.substring(c, 5, 4)))
    mime = F.lit("application/octet-stream")
    for magic, m in _MAGIC.items():
        cond = prefix3 == magic[:6] if len(magic) == 6 else prefix == magic
        mime = F.when(cond, F.lit(m)).otherwise(mime)
    mime = F.when(mp4_marker == "66747970", F.lit("video/mp4")).otherwise(mime)
    return df.withColumn(
        "meta",
        F.struct(
            F.length(c).cast("bigint").alias("size_bytes"),
            F.sha1(c).alias("sha1"),
            mime.alias("mime"),
        ),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _fake_shape(data: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode: derives a plausible (h, w, c) from the
    content digest. Replaces PIL in codec-less environments; the Spark
    plumbing around it is identical either way."""
    h = hashlib.sha1(data or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 3


def decode_images(
    df: DataFrame, content_col: str = "content", id_col: str = "asset_id"
) -> DataFrame:
    """Decode image dimensions per asset via Arrow-batched mapInPandas.

    Uses PIL when available; otherwise the deterministic fake (marked in
    the ``decoder`` output column as ``stub``).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # pragma: no cover - not in container
            import io

            def shape(data):
                with Image.open(io.BytesIO(data)) as im:
                    return im.height, im.width, len(im.getbands())

            decoder = "pil"
        except ImportError:
            shape = _fake_shape
            decoder = "stub"
        for pdf in it:
            hw = [shape(x) for x in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "height": [t[0] for t in hw],
                    "width": [t[1] for t in hw],
                    "channels": [t[2] for t in hw],
                    "decoder": decoder,
                }
            )

    return df.mapInPandas(batches, schema=_DECODE_SCHEMA)


_FEATURE_DIM = 32

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    df: DataFrame, content_col: str = "content", id_col: str = "asset_id"
) -> DataFrame:
    """Per-asset feature vector (array<float>) via mapInPandas.

    STUB embedding: bytes → sha-seeded unit vector (deterministic). A real
    model slots into the same batch loop; the output feeds straight into
    ``operators.similarity`` (cosine top-k / LSH) unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for data in pdf[content_col]:
                seed = int.from_bytes(
                    hashlib.sha1(bytes(data or b"")).digest()[:4], "big"
                )
                v = np.random.RandomState(seed).standard_normal(_FEATURE_DIM)
                feats.append((v / np.linalg.norm(v)).astype("float32").tolist())
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "feature": feats}
            )

    return df.mapInPandas(batches, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """Video → frame rows (1:N explode via mapInPandas yielding more rows
    than it consumes — the shape a real ffmpeg stage uses).

    STUB: emits byte-slices as 'frames'; a real decoder raises the row
    count the same way, so partition sizing/skew behavior is faithful.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_frames = [], [], []
            for aid, data in zip(pdf[id_col], pdf[content_col]):
                data = bytes(data or b"")
                n_frames = max(len(data) // max(every_n, 1), 1)
                for i in range(min(n_frames, 32)):
                    out_ids.append(int(aid))
                    out_idx.append(i)
                    lo = i * every_n
                    out_frames.append(data[lo : lo + every_n])
            yield pd.DataFrame(
                {"asset_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df.mapInPandas(batches, schema=_FRAME_SCHEMA)
