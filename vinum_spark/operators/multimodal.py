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

Header-level metadata is REAL and codec-free across the common web
containers: image dimensions (PNG IHDR, GIF LSD, JPEG SOF, BMP, TIFF
IFD, WebP VP8/VP8L/VP8X, HEIC/AVIF ispe), audio params + exact
duration (WAV fmt, MP3 and ADTS-AAC frame-header walks, FLAC
STREAMINFO, Ogg Vorbis/Opus page granules), and video duration +
display dims (MP4 mvhd/tkhd, AVI avih, WebM/Matroska EBML) are all
parsed from container bytes. Sample/pixel-level decode is ALSO real
where the SPEC suffices: linear-PCM WAV in every common layout
(``decode_audio``: u8/i16/i24/i32/f32/f64 → RMS/peak/duration), PNG
in full (``_png_pixels``: zlib + numpy un-filtering; gray/RGB/alpha,
palette at 1/2/4/8 bits, 16-bit high-byte, Adam7 interlace),
GIF87a/89a first frames (``_gif_pixels``: pure-Python variable-width
LZW + palette + interlace reorder), and BOTH JPEG modes
(``_jpeg_pixels``: marker walk + declared Huffman tables +
dequant/IDCT in numpy, 4:4:4/4:2:0/4:2:2 MCU layouts, DRI/RSTn
restart streams; ``_jpeg_progressive_unsafe``: multi-scan spectral
selection + successive approximation per T.81 G.1.2), all feeding the
REAL 8×8 pooled-grayscale feature in ``extract_features``. MP4
KEY-FRAME extraction is real too (``_mp4_keyframe_spans``: stbl
sample-table walk → sync-sample byte spans — no codec needed for
offsets). Only work requiring external codec libraries or models
(arithmetic-coded JPEG, compressed-audio SAMPLES, video frame PIXELS,
learned feature models) is STUBBED: when PIL is importable it is
used; otherwise a clearly-marked deterministic fake derives
shapes/features from the bytes so the Spark-side plumbing — schemas,
batch iteration, UDF signatures — is real and tested end-to-end.
Every parser here holds a fuzz-pinned no-crash contract
(tests/test_property.py): hostile bytes degrade to None/stub, never
a task failure.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vinum_spark.operators.vorbis import (
    vorbis_packets_pcm as _vorbis_packets_pcm,
    vorbis_pcm_samples as _vorbis_pcm_samples,
)

# magic-byte prefixes → mime, sniffed JVM-side via hex(substring(...))
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",  # RIFF (wav/avi/webp; refined below)
    "494433": "audio/mpeg",
    "664C6143": "audio/flac",  # fLaC
    "4F676753": "audio/ogg",  # OggS (vorbis/opus; refined by probe)
    "1A45DFA3": "video/webm",  # EBML (webm/matroska)
    "424D": "image/bmp",
    "49492A00": "image/tiff",  # II little-endian
    "4D4D002A": "image/tiff",  # MM big-endian
    "66747970": "video/mp4",  # ftyp at offset 4; see below
}


def attach_metadata(
    df: DataFrame, content_col: str = "content", hash_algo: str = "sha1"
) -> DataFrame:
    """Add a ``meta`` struct (size_bytes, digest, mime) from built-ins
    only — runs fully inside codegen, no Python.

    ``hash_algo``: ``sha1`` (default; field named ``sha1`` for back-
    compat) or ``sha256`` (field ``sha256``) — pick the algorithm the
    consuming system standardizes on; both digests are pinned against
    hashlib in tests/test_multimodal.py. (The oracle-gated inventory
    query q52 compares a hex-roundtrip digest instead, because its SQL
    oracle can hash only VARCHAR.)"""
    if hash_algo not in ("sha1", "sha256"):
        raise ValueError("hash_algo must be 'sha1' or 'sha256'")
    c = F.col(content_col)
    prefix = F.upper(F.hex(F.substring(c, 1, 4)))
    mp4_marker = F.upper(F.hex(F.substring(c, 5, 4)))
    mime = F.lit("application/octet-stream")
    for magic, m in _MAGIC.items():
        cond = F.substring(prefix, 1, len(magic)) == magic
        mime = F.when(cond, F.lit(m)).otherwise(mime)
    mime = F.when(mp4_marker == "66747970", F.lit("video/mp4")).otherwise(mime)
    # ISO-BMFF brand refinement: heif/avif stills share the ftyp layout
    brand = F.upper(F.hex(F.substring(c, 9, 4)))
    mime = F.when(
        (mp4_marker == "66747970")
        & brand.isin("68656963", "68656978", "6D696631"),  # heic/heix/mif1
        F.lit("image/heic"),
    ).otherwise(mime)
    mime = F.when(
        (mp4_marker == "66747970") & brand.isin("61766966", "61766973"),
        F.lit("image/avif"),  # avif/avis
    ).otherwise(mime)
    # RIFF refinement: form type at offset 9 picks AVI/WebP over WAV
    mime = F.when(
        (prefix == "52494646") & (brand == "41564920"),
        F.lit("video/x-msvideo"),
    ).otherwise(mime)
    mime = F.when(
        (prefix == "52494646") & (brand == "57454250"),
        F.lit("image/webp"),
    ).otherwise(mime)
    # tag-less MP3: 11-bit frame sync 0xFFE0 — hex prefix FFE*/FFF*
    # (cannot collide with FFD8FF jpeg at the 3rd hex char)
    mime = F.when(
        F.substring(prefix, 1, 3).isin("FFE", "FFF"), F.lit("audio/mpeg")
    ).otherwise(mime)
    digest = (
        F.sha1(c).alias("sha1")
        if hash_algo == "sha1"
        else F.sha2(c, 256).alias("sha256")
    )
    return df.withColumn(
        "meta",
        F.struct(
            F.length(c).cast("bigint").alias("size_bytes"),
            digest,
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
    content digest. Last resort for unrecognized containers in codec-less
    environments; the Spark plumbing around it is identical either way."""
    h = hashlib.sha1(data or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 3


# PNG color type → sample channels (greyscale, rgb, palette, grey+alpha,
# rgba); palette decodes to indexed single samples at the container level
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _header_dims(data: bytes):
    """TRUE (height, width, channels, decoder) parsed from the container
    header bytes alone — no codec library required. PNG IHDR, GIF logical
    screen descriptor, and JPEG SOF frame headers all carry dimensions in
    fixed, spec-defined positions. Returns None for other formats."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 26:
        # IHDR is mandated first: width/height big-endian at 16/20,
        # color type at 25 (PNG spec §11.2.2)
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return h, w, _PNG_CHANNELS.get(data[25], 3), "png-header"
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        # logical screen descriptor: little-endian u16 width, height
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return h, w, 3, "gif-header"
    if data[:3] == b"\xff\xd8\xff":
        # walk marker segments to the first SOFn (C0–CF minus DHT C4,
        # JPG C8, DAC CC): [marker][len][precision][height][width][ncomp]
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # bare markers
                i += 2
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                # Huffman progressive (SOF2) decodes for real now; the
                # distinct label matters for the ones that still fall
                # back to header-only dims (differential/arithmetic
                # SOF6/10/14, or a failed/absent scan decode) so a
                # corpus audit can count them
                prog = marker in (0xC2, 0xC6, 0xCA, 0xCE)
                label = "jpeg-sof-progressive" if prog else "jpeg-sof"
                return h, w, data[i + 9], label
            i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
        return None
    if data[:2] == b"BM" and len(data) >= 26:
        # DIB header size at 14 discriminates the two layouts: the
        # 12-byte BITMAPCOREHEADER (OS/2) packs u16 dims at 18/20;
        # BITMAPINFOHEADER and its v2-v5 extensions (40/52/56/108/124)
        # use i32 LE width/height (negative height = top-down)
        dib = int.from_bytes(data[14:18], "little")
        if dib == 12:
            w = int.from_bytes(data[18:20], "little")
            h = int.from_bytes(data[20:22], "little")
            bpp = int.from_bytes(data[24:26], "little")
            if w > 0 and h > 0:
                return h, w, 1 if bpp <= 8 else bpp // 8, "bmp-header"
            return None
        if dib in (40, 52, 56, 64, 108, 124) and len(data) >= 30:
            w = int.from_bytes(data[18:22], "little", signed=True)
            h = int.from_bytes(data[22:26], "little", signed=True)
            bpp = int.from_bytes(data[28:30], "little")
            if w > 0 and h != 0:
                return abs(h), w, 1 if bpp <= 8 else bpp // 8, "bmp-header"
        return None
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return _tiff_dims(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return _webp_dims(data)
    if data[4:8] == b"ftyp" and data[8:12] in (
        b"heic", b"heix", b"mif1", b"avif", b"avis"
    ):
        return _heif_dims(data)
    return None


def _tiff_ifd(data: bytes):
    """First-IFD entries as {tag: [values]} (SHORT/LONG only, both
    inline and pointed-to arrays), plus the byte order. Returns None
    for non-TIFF / truncated headers."""
    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    bo = "little" if data[:2] == b"II" else "big"
    off = int.from_bytes(data[4:8], bo)
    if off + 2 > len(data):
        return None
    n = int.from_bytes(data[off : off + 2], bo)
    tags: dict = {}
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(data):
            return None
        tag = int.from_bytes(data[e : e + 2], bo)
        typ = int.from_bytes(data[e + 2 : e + 4], bo)
        cnt = int.from_bytes(data[e + 4 : e + 8], bo)
        size = {3: 2, 4: 4}.get(typ)
        if size is None or cnt == 0 or cnt > 1_000_000:
            continue
        if cnt * size <= 4:
            base = e + 8
        else:
            base = int.from_bytes(data[e + 8 : e + 12], bo)
            if base + cnt * size > len(data):
                continue
        tags[tag] = [
            int.from_bytes(data[base + i * size : base + (i + 1) * size], bo)
            for i in range(cnt)
        ]
    return tags, bo


def _tiff_dims(data: bytes):
    """First-IFD ImageWidth/ImageLength/SamplesPerPixel (tags 256/257/
    277). Respects the header's declared endianness."""
    parsed = _tiff_ifd(data)
    if parsed is None:
        return None
    tags, _ = parsed
    w = tags.get(256, [None])[0]
    h = tags.get(257, [None])[0]
    spp = tags.get(277, [1])[0]
    if not w or not h:
        return None
    return h, w, spp, "tiff-ifd"


def _packbits_decode(data: bytes, max_bytes: int):
    """Apple PackBits RLE (TIFF Compression=32773): control byte n in
    0..127 copies n+1 literals, 129..255 repeats the next byte 257-n
    times, 128 is a no-op. Returns bytes or None on truncation."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:
            j = i + c + 1
            if j > n:
                return None
            out += data[i:j]
            i = j
        elif c > 128:
            if i >= n:
                return None
            out += data[i : i + 1] * (257 - c)
            i += 1
        if len(out) > max_bytes:
            return None
    return bytes(out)


def _tiff_lzw_decode(data: bytes, max_bytes: int):
    """TIFF-variant LZW over the byte alphabet: MSB-first bit packing
    (GIF packs LSB-first), Clear=256/EOI=257, and the spec's
    EARLY-CHANGE rule — the code width bumps when the next free code
    reaches (1<<width)-1, one code sooner than GIF's (1<<width). Same
    base-table-plus-added-codes strategy as :func:`_lzw_decode` so a
    Clear deletes only the extension codes. Returns bytes or None."""
    CLEAR, EOI = 256, 257
    width = 9
    table = {i: bytes([i]) for i in range(256)}
    added = []
    next_code = 258
    out = bytearray()
    prev = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1
            if code == CLEAR:
                for k in added:
                    table.pop(k, None)
                added.clear()
                next_code = 258
                width = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    return None
            elif code in table and code < next_code:
                entry = table[code]
                if next_code < 4096:
                    table[next_code] = table[prev] + entry[:1]
                    added.append(next_code)
                    next_code += 1
            elif code == next_code and next_code < 4096:
                entry = table[prev] + table[prev][:1]
                table[next_code] = entry
                added.append(next_code)
                next_code += 1
            else:
                return None
            out += entry
            if len(out) > max_bytes:
                return None
            if next_code == (1 << width) - 1 and width < 12:  # early change
                width += 1
            prev = code
    return bytes(out)


def _zlib_strip_decode(data: bytes, max_bytes: int):
    """Deflate one strip with the output BOUNDED while inflating
    (decompressobj max_length) — a hostile ratio bomb stops at
    max_bytes+1 produced bytes instead of ballooning memory. Requires
    the stream to END cleanly (obj.eof): a truncated or tail-corrupted
    stream returns None rather than silently yielding its valid
    prefix (plain zlib.decompress raises there; the bounded object
    form only sets eof=False)."""
    obj = zlib.decompressobj()
    try:
        out = obj.decompress(data, max_bytes + 1)
    except zlib.error:
        return None
    if not obj.eof or len(out) > max_bytes:
        return None
    return out


#: Compression tag (259) -> (per-strip decompressor, decoder label).
#: 32946 is the old-style "Deflate" code some writers still emit.
_TIFF_STRIP_CODECS = {
    1: (lambda data, max_bytes: data, "tiff-strips"),
    5: (_tiff_lzw_decode, "tiff-lzw"),
    8: (_zlib_strip_decode, "tiff-deflate"),
    32946: (_zlib_strip_decode, "tiff-deflate"),
    32773: (_packbits_decode, "tiff-packbits"),
}


def _jpeg_tables_segments(tables: bytes):
    """Table segments (DQT/DHT/DAC) from a JPEGTables (tag 347)
    abbreviated stream: SOI <segments> EOI. Returns the raw segment
    bytes to splice after a strip's SOI, or None if malformed."""
    if len(tables) < 4 or tables[:2] != b"\xff\xd8":
        return None
    i = 2
    out = bytearray()
    while i + 4 <= len(tables):
        if tables[i] != 0xFF:
            return None
        marker = tables[i + 1]
        if marker == 0xD9:  # EOI
            return bytes(out)
        seg_len = int.from_bytes(tables[i + 2 : i + 4], "big")
        if i + 2 + seg_len > len(tables):
            return None
        out += tables[i : i + 2 + seg_len]
        i += 2 + seg_len
    return bytes(out)


def _tiff_jpeg_strip(strip: bytes, tables, max_pixels: int):
    """Decode one new-style-JPEG strip: a complete JFIF stream, or an
    abbreviated one whose DQT/DHT live in the shared JPEGTables —
    spliced in right after SOI (tables always precede SOF/SOS)."""
    if strip[:2] != b"\xff\xd8":
        return None
    if tables:
        strip = b"\xff\xd8" + tables + strip[2:]
    return _jpeg_pixels(strip, max_pixels)


def _tiff_strip_rows(data, offsets, counts, decomp, rows_total, rps, stride):
    """Decompress a strip sequence covering ``rows_total`` rows of
    ``stride`` bytes each (strips of ``rps`` rows; the last may be
    short). Returns the concatenated row bytes or None."""
    need = rows_total * stride
    buf = bytearray()
    rows_done = 0
    for o, c in zip(offsets, counts):
        if o + c > len(data):
            return None
        rows_here = min(rps, rows_total - rows_done)
        if rows_here <= 0:
            break
        strip_need = rows_here * stride
        strip = decomp(data[o : o + c], strip_need + stride)
        if strip is None or len(strip) < strip_need:
            return None
        buf += strip[:strip_need]
        rows_done += rows_here
        if rows_done >= rows_total:
            break
    return bytes(buf[:need]) if len(buf) >= need else None


def _tiff_tiled_pixels(data, tags, bo, w, h, spp, bpp, decomp, label,
                       predictor, planar):
    """Tiled TIFF (tags 322/323/324/325): the large-imagery layout —
    every tile is a full TileLength x TileWidth block (edges padded by
    the writer; we crop), its own codec stream, placed onto the output
    grid. Predictor-2 differencing restarts per tile row, so the
    accumulate runs per tile BEFORE placement. Planar files store each
    plane's full tile grid consecutively."""
    tw = tags.get(322, [0])[0]
    tl = tags.get(323, [0])[0]
    offsets = tags.get(324)
    counts = tags.get(325)
    if not tw or not tl or tw % 16 or tl % 16:
        return None
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    across = -(-w // tw)
    down = -(-h // tl)
    per_plane = across * down
    n_planes = spp if (planar == 2 and spp > 1) else 1
    if len(offsets) != per_plane * n_planes:
        return None
    tile_ch = 1 if n_planes > 1 else spp
    tile_bytes = tl * tw * tile_ch * bpp
    sample_dt = "u1" if bpp == 1 else ("<u2" if bo == "little" else ">u2")
    acc_dt = np.uint8 if bpp == 1 else np.uint16
    out = np.zeros((h, w, spp), dtype=acc_dt)
    for idx, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(data):
            return None
        buf = decomp(data[o : o + c], tile_bytes + tw * tile_ch * bpp)
        if buf is None or len(buf) < tile_bytes:
            return None
        tile = np.frombuffer(
            buf[:tile_bytes], dtype=sample_dt
        ).reshape(tl, tw, tile_ch)
        if predictor == 2:  # differencing restarts at each tile row
            tile = np.add.accumulate(tile, axis=1, dtype=acc_dt)
        plane = idx // per_plane
        k = idx % per_plane
        ty, tx = (k // across) * tl, (k % across) * tw
        rows = min(tl, h - ty)
        cols = min(tw, w - tx)
        if rows <= 0 or cols <= 0:
            return None
        if n_planes > 1:
            out[ty : ty + rows, tx : tx + cols, plane] = tile[:rows, :cols, 0]
        else:
            out[ty : ty + rows, tx : tx + cols, :] = tile[:rows, :cols, :]
    if bpp == 2:
        out = (out >> 8).astype(np.uint8)
    return out, label + ("-planar" if n_planes > 1 else "") + "-tiled"


def _tiff_pixels_labeled(data: bytes, max_pixels: int = 16 * 1024 * 1024):
    """REAL pixel decode for 8-bit TIFF — uncompressed plus the three
    byte-oriented strip compressions (PackBits, TIFF-LZW with early
    change, Deflate via stdlib zlib), horizontal-differencing
    Predictor=2, and BOTH storage orders: chunky (PlanarConfiguration=1,
    samples interleaved per row) and planar (=2, plane-major strip
    sequence — StripsPerImage strips per sample plane, stacked last).
    Strips located by StripOffsets/ByteCounts (tags 273/279) are
    decompressed independently (each strip is its own codec stream per
    the spec); the predictor accumulate runs on the assembled array
    since rows never span strips (and in planar files differencing is
    per plane, which the per-channel accumulate preserves). New-style
    JPEG-in-TIFF (Compression=7) routes each strip through the
    in-house JPEG decoder, splicing shared JPEGTables (tag 347) after
    each strip's SOI. Returns (array, decoder_label) or None."""
    parsed = _tiff_ifd(data)
    if parsed is None:
        return None
    tags, bo = parsed
    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    spp = tags.get(277, [1])[0]
    if not w or not h or not 1 <= spp <= 4 or w * h > max_pixels:
        return None
    comp = tags.get(259, [1])[0]
    if comp == 7:  # new-style JPEG-in-TIFF: strips are JFIF streams
        return _tiff_jpeg_pixels(data, tags, w, h, spp, max_pixels)
    codec = _TIFF_STRIP_CODECS.get(comp)
    if codec is None:
        return None
    decomp, label = codec
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        return None
    planar = tags.get(284, [1])[0]
    if planar not in (1, 2):
        return None
    bits = tags.get(258, [8])
    if all(b == 8 for b in bits):
        bpp = 1
    elif all(b == 16 for b in bits):
        bpp = 2  # high byte kept after assembly — the 8-bit rendering,
        # same contract as the PNG 16-bit path
    else:
        return None
    if 322 in tags and 324 in tags:  # tiled layout, not strips
        return _tiff_tiled_pixels(
            data, tags, bo, w, h, spp, bpp, decomp, label, predictor,
            planar,
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    if planar == 2 and spp > 1:
        # plane-major: equal strip runs per plane; RowsPerStrip default
        # "all rows" means one strip per plane
        if len(offsets) % spp:
            return None
        per_plane = len(offsets) // spp
        rps = tags.get(278, [0])[0] or -(-h // per_plane)
        if rps < 1:
            return None
        sample_dt = "u1" if bpp == 1 else (
            "<u2" if bo == "little" else ">u2"
        )
        planes = []
        for p in range(spp):
            rows = _tiff_strip_rows(
                data, offsets[p * per_plane : (p + 1) * per_plane],
                counts[p * per_plane : (p + 1) * per_plane],
                decomp, h, rps, w * bpp,
            )
            if rows is None:
                return None
            planes.append(
                np.frombuffer(rows, dtype=sample_dt).reshape(h, w)
            )
        px = np.stack(planes, axis=2)
        label += "-planar"
    else:
        rps = tags.get(278, [0])[0] or -(-h // len(offsets))
        if rps < 1:
            return None
        rows = _tiff_strip_rows(
            data, offsets, counts, decomp, h, rps, w * spp * bpp
        )
        if rows is None:
            return None
        sample_dt = "u1" if bpp == 1 else (
            "<u2" if bo == "little" else ">u2"
        )
        px = np.frombuffer(rows, dtype=sample_dt).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing, per row per sample — at 16 bits the
        # accumulate must run at sample width BEFORE the 8-bit rendering
        px = np.add.accumulate(
            px, axis=1, dtype=np.uint8 if bpp == 1 else np.uint16
        )
    if bpp == 2:
        px = (px >> 8).astype(np.uint8)
    return px, label


def _tiff_tag_bytes(data: bytes, want_tag: int):
    """Raw payload of a BYTE/UNDEFINED (type 1/7) first-IFD tag —
    :func:`_tiff_ifd` only collects SHORT/LONG values, but JPEGTables
    (347) carries an opaque byte stream. Returns bytes or None."""
    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    bo = "little" if data[:2] == b"II" else "big"
    off = int.from_bytes(data[4:8], bo)
    if off + 2 > len(data):
        return None
    n = int.from_bytes(data[off : off + 2], bo)
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(data):
            return None
        tag = int.from_bytes(data[e : e + 2], bo)
        typ = int.from_bytes(data[e + 2 : e + 4], bo)
        cnt = int.from_bytes(data[e + 4 : e + 8], bo)
        if tag != want_tag or typ not in (1, 7) or not 0 < cnt <= 1_000_000:
            continue
        base = e + 8 if cnt <= 4 else int.from_bytes(data[e + 8 : e + 12], bo)
        if base + cnt > len(data):
            return None
        return data[base : base + cnt]
    return None


def _tiff_jpeg_pixels(data, tags, w, h, spp, max_pixels):
    """Compression=7: each strip is its own JPEG stream (complete, or
    abbreviated against the shared JPEGTables tag), decoded by the
    in-house baseline/progressive JPEG decoder and stacked. Strips may
    be MCU-padded taller than their row count; excess rows crop."""
    if tags.get(284, [1])[0] != 1:  # planar JPEG out of scope
        return None
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    rps = tags.get(278, [0])[0] or -(-h // len(offsets))
    if rps < 1:
        return None
    tables = _tiff_tag_bytes(data, 347)
    if tables is not None:
        tables = _jpeg_tables_segments(tables)
        if tables is None:
            return None
    parts = []
    rows_done = 0
    for o, c in zip(offsets, counts):
        if o + c > len(data):
            return None
        rows_here = min(rps, h - rows_done)
        if rows_here <= 0:
            break
        px = _tiff_jpeg_strip(data[o : o + c], tables, max_pixels)
        if px is None or px.shape[0] < rows_here or px.shape[1] != w:
            return None
        if px.ndim == 2:
            px = px[:, :, None]
        if px.shape[2] != spp:
            return None
        parts.append(px[:rows_here])
        rows_done += rows_here
        if rows_done >= h:
            break
    if rows_done < h:
        return None
    return np.concatenate(parts, axis=0), "tiff-jpeg"


def _tiff_pixels(data: bytes, max_pixels: int = 16 * 1024 * 1024):
    """Back-compat entry: the pixel array alone (see
    :func:`_tiff_pixels_labeled` for the decoder label)."""
    r = _tiff_pixels_labeled(data, max_pixels)
    return None if r is None else r[0]


def _webp_dims(data: bytes):
    """WebP dims from whichever header the first image chunk carries:
    VP8X canvas (3-byte minus-one fields), VP8 lossy key-frame header
    (14-bit LE dims after the 0x9D012A sync), or VP8L (14-bit packed
    minus-one)."""
    for cid, off, csize in _riff_chunks(data, form=b"WEBP"):
        # a declared size past EOF is a truncated/hostile file: reject
        # rather than parse short reads into wrong dimensions
        if cid == b"VP8X" and csize >= 10:
            if off + 10 > len(data):
                return None
            w = int.from_bytes(data[off + 4 : off + 7], "little") + 1
            h = int.from_bytes(data[off + 7 : off + 10], "little") + 1
            return h, w, 3, "webp-vp8x"
        if cid == b"VP8 " and csize >= 10:
            if off + 10 > len(data) or data[off + 3 : off + 6] != b"\x9d\x01\x2a":
                return None
            w = int.from_bytes(data[off + 6 : off + 8], "little") & 0x3FFF
            h = int.from_bytes(data[off + 8 : off + 10], "little") & 0x3FFF
            return h, w, 3, "webp-vp8"
        if cid == b"VP8L" and csize >= 5:
            if off + 5 > len(data) or data[off] != 0x2F:
                return None
            bits = int.from_bytes(data[off + 1 : off + 5], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return h, w, 4 if (bits >> 28) & 1 else 3, "webp-vp8l"
    return None


class _Vp8lEof(Exception):
    """Internal: ran off the end of / hit invalid VP8L bitstream."""


class _Vp8lBits:
    """LSB-first bit reader (VP8L convention, opposite of FLAC): k bits
    are extracted from a little-endian byte window with one
    ``int.from_bytes`` per call."""

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.i = start_byte * 8
        self.n = len(data) * 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        i = self.i
        if i + k > self.n:
            raise _Vp8lEof
        b0 = i >> 3
        nb = ((i & 7) + k + 7) >> 3
        w = int.from_bytes(self.data[b0 : b0 + nb], "little")
        self.i = i + k
        return (w >> (i & 7)) & ((1 << k) - 1)


def _vp8l_code(lengths):
    """Canonical prefix code from code lengths (DEFLATE-style canonical
    assignment; VP8L serves code bits most-significant-first within the
    LSB-first stream, which equals looking up the accumulated bits as
    read). Returns ('const', sym) for a 0-bit single-symbol code or a
    dict keyed by (nbits, bits-as-read)."""
    max_len = 0
    syms = []
    for s, ln in enumerate(lengths):
        if ln:
            syms.append(s)
            if ln > max_len:
                max_len = ln
    if not syms:
        raise _Vp8lEof
    if len(syms) == 1:
        return ("const", syms[0])
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    # Kraft check: over-subscribed or incomplete codes are invalid
    total = 0
    for ln in range(1, max_len + 1):
        total += bl_count[ln] << (max_len - ln)
    if total != (1 << max_len):
        raise _Vp8lEof
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table = {}
    for s, ln in enumerate(lengths):
        if not ln:
            continue
        c = next_code[ln]
        next_code[ln] += 1
        rev = int(format(c, f"0{ln}b")[::-1], 2)
        table[(ln, rev)] = s
    return table


def _vp8l_sym(br, code):
    if isinstance(code, tuple):  # ('const', sym): 0-bit code
        return code[1]
    acc = 0
    get = code.get
    read = br.read
    for depth in range(1, 16):
        acc |= read(1) << (depth - 1)
        s = get((depth, acc))
        if s is not None:
            return s
    raise _Vp8lEof


_VP8L_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                  13, 14, 15)


def _vp8l_read_code(br, alphabet_size):
    """One prefix code: the 'simple' 1/2-symbol form or the
    code-length-coded general form (spec §6.2)."""
    if br.read(1):  # simple
        num = br.read(1) + 1
        sym0 = br.read(8 if br.read(1) else 1)
        if num == 1:
            if sym0 >= alphabet_size:
                raise _Vp8lEof
            return ("const", sym0)
        sym1 = br.read(8)
        if sym0 == sym1 or max(sym0, sym1) >= alphabet_size:
            raise _Vp8lEof
        lengths = [0] * alphabet_size
        lengths[sym0] = lengths[sym1] = 1
        return _vp8l_code(lengths)
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_VP8L_CL_ORDER[i]] = br.read(3)
    cl_code = _vp8l_code(cl_lengths)
    if br.read(1):  # limited number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = _vp8l_sym(br, cl_code)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
    return _vp8l_code(lengths)


def _vp8l_distance_map():
    """The 120-entry close-neighbor distance map (spec §4.2.2),
    generated from its ordering rule: candidates (dx, dy) in the 8-
    neighborhood window, sorted by squared distance, then larger dy
    first, then positive dx before negative (validated against the
    spec's published table prefix)."""
    cands = []
    for dy in range(9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            if dy == 0 or abs(dx) <= 8:
                cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1],
                              0 if p[0] > 0 else 1, abs(p[0])))
    return cands[:120]


_VP8L_DIST_MAP = _vp8l_distance_map()


def _vp8l_lz77(br, sym):
    """LZ77 prefix-coded value (spec §4.2.1): 24 symbols covering
    lengths/distance codes with extra bits."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _vp8l_entropy_image(br, w, h, is_main, max_pixels):
    """One entropy-coded ARGB image (spec §5): optional color cache,
    optional meta prefix groups (main image only), 5 prefix codes per
    group, literal / LZ77 / cache-ref pixel stream. Returns a flat
    list of ARGB ints, row-major."""
    if w <= 0 or h <= 0 or w * h > max_pixels:
        raise _Vp8lEof
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise _Vp8lEof
    cache = [0] * (1 << cache_bits) if cache_bits else None
    groups_img = None
    prefix_bits = 0
    n_groups = 1
    if is_main and br.read(1):  # meta prefix codes
        prefix_bits = br.read(3) + 2
        gw = (w + (1 << prefix_bits) - 1) >> prefix_bits
        gh = (h + (1 << prefix_bits) - 1) >> prefix_bits
        groups_img = _vp8l_entropy_image(br, gw, gh, False, max_pixels)
        n_groups = max(((p >> 8) & 0xFFFF) for p in groups_img) + 1
    cache_syms = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        groups.append((
            _vp8l_read_code(br, 256 + 24 + cache_syms),  # green
            _vp8l_read_code(br, 256),                    # red
            _vp8l_read_code(br, 256),                    # blue
            _vp8l_read_code(br, 256),                    # alpha
            _vp8l_read_code(br, 40),                     # distance
        ))
    n = w * h
    out = [0] * n
    pos = 0
    shift = 32 - cache_bits if cache_bits else 0
    gw = ((w + (1 << prefix_bits) - 1) >> prefix_bits) if groups_img else 0
    while pos < n:
        if groups_img is not None:
            gp = groups_img[
                ((pos // w) >> prefix_bits) * gw + ((pos % w) >> prefix_bits)
            ]
            g_code, r_code, b_code, a_code, d_code = groups[
                (gp >> 8) & 0xFFFF
            ]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        s = _vp8l_sym(br, g_code)
        if s < 256:
            red = _vp8l_sym(br, r_code)      # spec channel order:
            blue = _vp8l_sym(br, b_code)     # green, red, blue, alpha
            alpha = _vp8l_sym(br, a_code)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_bits:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
        elif s < 256 + 24:
            length = _vp8l_lz77(br, s - 256)
            dist_code = _vp8l_lz77(br, _vp8l_sym(br, d_code))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _VP8L_DIST_MAP[dist_code - 1]
                dist = max(dy * w + dx, 1)
            if dist > pos or pos + length > n:
                raise _Vp8lEof
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_bits:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
        else:
            idx = s - 256 - 24
            if not cache_bits or idx >= len(cache):
                raise _Vp8lEof
            out[pos] = cache[idx]
            pos += 1
    return out


def _vp8l_avg2(a, b):
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _vp8l_clamp_add_sub_full(a, b, c):
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _vp8l_clamp_add_sub_half(a, b, c):
    # libwebp AddSubtractComponentHalf: a + (a - b) / 2 with C integer
    # division (truncation toward zero, NOT Python floor) — for odd
    # negative (ave - c) the two differ by one.
    out = 0
    for sh in (0, 8, 16, 24):
        ave = (((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) >> 1
        d = ave - ((c >> sh) & 0xFF)
        half = abs(d) >> 1
        v = ave + (half if d >= 0 else -half)
        out |= max(0, min(255, v)) << sh
    return out


def _vp8l_select(left, top, topleft):
    # Spec §4.1 Select: Manhattan distance of L and T to the unclamped
    # estimate L+T-TL; ties go to TOP (`if (pL < pT) return L; else T`).
    p_l = p_t = 0
    for sh in (0, 8, 16, 24):
        pred = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - (
            (topleft >> sh) & 0xFF
        )
        p_l += abs(pred - ((left >> sh) & 0xFF))
        p_t += abs(pred - ((top >> sh) & 0xFF))
    return left if p_l < p_t else top


def _vp8l_apply_predictor(px, w, h, modes, tile_bits):
    """Inverse predictor transform (spec §4.1): residuals in ``px`` are
    promoted to pixels in place, per-channel mod-256 adds."""
    tw = (w + (1 << tile_bits) - 1) >> tile_bits
    add = lambda a, b: (  # noqa: E731 - per-channel mod-256 add
        (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
        | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)
    )
    for y in range(h):
        row = y * w
        for x in range(w):
            pos = row + x
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[pos - 1]
            elif x == 0:
                pred = px[pos - w]
            else:
                mode = (modes[(y >> tile_bits) * tw + (x >> tile_bits)]
                        >> 8) & 0xFF
                left = px[pos - 1]
                top = px[pos - w]
                tl = px[pos - w - 1]
                tr = px[pos - w + 1]  # x==w-1: first pixel of this row
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _vp8l_avg2(_vp8l_avg2(left, tr), top)
                elif mode == 6:
                    pred = _vp8l_avg2(left, tl)
                elif mode == 7:
                    pred = _vp8l_avg2(left, top)
                elif mode == 8:
                    pred = _vp8l_avg2(tl, top)
                elif mode == 9:
                    pred = _vp8l_avg2(top, tr)
                elif mode == 10:
                    pred = _vp8l_avg2(_vp8l_avg2(left, tl),
                                      _vp8l_avg2(top, tr))
                elif mode == 11:
                    pred = _vp8l_select(left, top, tl)
                elif mode == 12:
                    pred = _vp8l_clamp_add_sub_full(left, top, tl)
                elif mode == 13:
                    pred = _vp8l_clamp_add_sub_half(left, top, tl)
                else:
                    raise _Vp8lEof
            px[pos] = add(px[pos], pred)


def _vp8l_delta(t, c):
    """Color-transform delta: (int8(t) * int8(c)) >> 5 (spec §4.1)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _vp8l_apply_color_transform(px, w, h, elements, tile_bits):
    tw = (w + (1 << tile_bits) - 1) >> tile_bits
    for y in range(h):
        row = y * w
        for x in range(w):
            pos = row + x
            el = elements[(y >> tile_bits) * tw + (x >> tile_bits)]
            g2r = el & 0xFF
            g2b = (el >> 8) & 0xFF
            r2b = (el >> 16) & 0xFF
            p = px[pos]
            g = (p >> 8) & 0xFF
            r = ((p >> 16) & 0xFF) + _vp8l_delta(g2r, g)
            r &= 0xFF
            b = (p & 0xFF) + _vp8l_delta(g2b, g)
            b = (b + _vp8l_delta(r2b, r)) & 0xFF
            px[pos] = (p & 0xFF00FF00) | (r << 16) | b


def _vp8l_pixels_unsafe(data: bytes, max_pixels: int):
    """REAL WebP-lossless (VP8L) pixel decode — the full public
    bitstream (RFC 9649 / WebP lossless spec): LSB-first bit reader,
    simple + code-length-coded canonical prefix codes, optional meta
    prefix groups and color cache, LZ77 with the 120-entry close-
    neighbor distance map, and all four inverse transforms (predictor,
    color, subtract-green, color-indexing incl. sub-byte pixel
    bundling). Returns (h, w, 4) uint8 RGBA."""
    payload = None
    for cid, off, csize in _riff_chunks(data, form=b"WEBP"):
        if cid == b"VP8L":
            payload = data[off : off + csize]
            break
    if payload is None or len(payload) < 5 or payload[0] != 0x2F:
        return None
    br = _Vp8lBits(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    if br.read(3) != 0:  # version must be 0
        return None
    if w * h > max_pixels:
        return None
    transforms = []
    seen = set()
    img_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:  # each transform may appear once
            raise _Vp8lEof
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color
            tile_bits = br.read(3) + 2
            tw = (img_w + (1 << tile_bits) - 1) >> tile_bits
            th = (h + (1 << tile_bits) - 1) >> tile_bits
            tiles = _vp8l_entropy_image(br, tw, th, False, max_pixels)
            # img_w at READ time is the width of the image state this
            # transform was applied to (bundled when listed after a
            # color-indexing transform) — its inverse must use it too
            transforms.append((ttype, tile_bits, tiles, img_w))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None, img_w))
        else:  # color indexing
            pal_size = br.read(8) + 1
            pal = _vp8l_entropy_image(br, pal_size, 1, False, max_pixels)
            for i in range(1, pal_size):  # palette is delta-coded
                a = pal[i - 1]
                d = pal[i]
                pal[i] = (
                    (((a >> 24) + (d >> 24)) & 0xFF) << 24
                    | ((((a >> 16) & 0xFF) + ((d >> 16) & 0xFF)) & 0xFF)
                    << 16
                    | ((((a >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF) << 8
                    | (((a & 0xFF) + (d & 0xFF)) & 0xFF)
                )
            if pal_size <= 2:
                width_bits = 3
            elif pal_size <= 4:
                width_bits = 2
            elif pal_size <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, width_bits, pal, img_w))
            img_w = (img_w + (1 << width_bits) - 1) >> width_bits
    px = _vp8l_entropy_image(br, img_w, h, True, max_pixels)
    for ttype, arg, tdata, t_w in reversed(transforms):
        if ttype == 3:  # color indexing (+ bundle unpack)
            width_bits, pal = arg, tdata
            if width_bits:
                per = 1 << width_bits
                bits = 8 >> width_bits
                mask = (1 << bits) - 1
                wide = []
                for y in range(h):
                    row = px[y * img_w : (y + 1) * img_w]
                    line = []
                    for p in row:
                        g = (p >> 8) & 0xFF
                        for k in range(per):
                            line.append((g >> (k * bits)) & mask)
                    wide.extend(line[:w])
                idxs = wide
            else:
                idxs = [(p >> 8) & 0xFF for p in px]
            px = [pal[i] if i < len(pal) else 0 for i in idxs]
            img_w = w
        elif ttype == 2:  # add green back
            for i, p in enumerate(px):
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) + g) & 0xFF
                b = ((p & 0xFF) + g) & 0xFF
                px[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif ttype == 1:
            _vp8l_apply_color_transform(px, t_w, h, tdata, arg)
        else:
            _vp8l_apply_predictor(px, t_w, h, tdata, arg)
    if len(px) != w * h:
        return None
    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (arr >> 16) & 0xFF  # R
    out[..., 1] = (arr >> 8) & 0xFF   # G
    out[..., 2] = arr & 0xFF          # B
    out[..., 3] = (arr >> 24) & 0xFF  # A
    if not alpha_hint:  # container declares no alpha: 3-channel, so
        return np.ascontiguousarray(out[..., :3])  # dims match headers
    return out


def _webp_pixels(data: bytes, max_pixels: int = 4 * 1024 * 1024):
    """Guarded VP8L decode: returns (h, w, 4) uint8 RGBA or None (lossy
    VP8/VP8X stay PERMANENTLY header-only BY DESIGN — bit-exact VP8
    intra decode needs the spec's boolean-coder probability tables and
    loop filter, and a partial decode would feed plausible-but-wrong
    pixels into dedup features; see README's media-decode boundary
    table)."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    try:
        return _vp8l_pixels_unsafe(data, max_pixels)
    except (_Vp8lEof, IndexError, ValueError, MemoryError):
        return None


def _heif_dims(data: bytes):
    """HEIC/AVIF dims from the ispe property (meta > iprp > ipco >
    ispe — meta is a FULL box: 4 version/flags bytes precede its
    children). Multiple ispe boxes (thumbnails) -> take the largest."""
    best = None
    for btype, ps, pe in _iter_boxes(data, 0, len(data)):
        if btype != b"meta":
            continue
        for m1, s1, e1 in _iter_boxes(data, ps + 4, pe):
            if m1 != b"iprp":
                continue
            for m2, s2, e2 in _iter_boxes(data, s1, e1):
                if m2 != b"ipco":
                    continue
                for m3, s3, e3 in _iter_boxes(data, s2, e2):
                    if m3 == b"ispe" and s3 + 12 <= e3:
                        w = int.from_bytes(data[s3 + 4 : s3 + 8], "big")
                        h = int.from_bytes(data[s3 + 8 : s3 + 12], "big")
                        if best is None or w * h > best[0] * best[1]:
                            best = (w, h)
    if best is None:
        return None
    label = "avif-ispe" if data[8:12] in (b"avif", b"avis") else "heic-ispe"
    return best[1], best[0], 3, label


#: Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _bmp_pixels(data: bytes, max_pixels: int = 4 * 1024 * 1024):
    """REAL raster decode for uncompressed BMP (BITMAPINFOHEADER
    family, BI_RGB): 8-bit palette, 24-bit BGR and 32-bit BGRA rows,
    4-byte row stride, bottom-up (positive height) or top-down
    (negative height) order. Returns (h, w, 3|4) uint8 RGB(A), or
    None for compressed (RLE/bitfields), OS/2-core, or exotic depths —
    those fall back to the true-dims header path, never invented
    pixels. Palette images decode to their RGB colors, so the pixel
    path reports 3 channels where the header path counts 1 storage
    byte per pixel (the GIF pixel/header split behaves the same way).
    """
    if data[:2] != b"BM" or len(data) < 54:
        return None
    try:
        off = int.from_bytes(data[10:14], "little")
        dib = int.from_bytes(data[14:18], "little")
        if dib not in (40, 52, 56, 64, 108, 124):
            return None
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        planes = int.from_bytes(data[26:28], "little")
        bpp = int.from_bytes(data[28:30], "little")
        comp = int.from_bytes(data[30:34], "little")
        if w <= 0 or h == 0 or planes != 1 or comp != 0:
            return None
        top_down = h < 0
        h_abs = abs(h)
        if w * h_abs > max_pixels or bpp not in (8, 24, 32):
            return None
        stride = (w * bpp // 8 + 3) & ~3
        if off + stride * h_abs > len(data):
            return None
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h_abs, offset=off
        ).reshape(h_abs, stride)
        if bpp == 8:
            n_colors = int.from_bytes(data[46:50], "little") or 256
            pal = np.frombuffer(
                data, dtype=np.uint8, count=n_colors * 4, offset=14 + dib
            ).reshape(-1, 4)
            if n_colors < 256:
                pal = np.vstack(
                    [pal, np.zeros((256 - n_colors, 4), np.uint8)]
                )
            px = pal[rows[:, :w]][:, :, [2, 1, 0]]  # BGRX quads -> RGB
        elif bpp == 24:
            px = rows[:, : w * 3].reshape(h_abs, w, 3)[:, :, ::-1]
        else:
            px = rows[:, : w * 4].reshape(h_abs, w, 4)[:, :, [2, 1, 0, 3]]
        if not top_down:
            px = px[::-1]
        return np.ascontiguousarray(px)
    except Exception:
        return None


def _png_pixels(data: bytes, max_pixels: int = 16 * 1024 * 1024):
    """REAL pixel decode for PNG — stdlib zlib + numpy scanline
    un-filtering, no codec library. Covers: 8-bit gray/RGB/gray+alpha/
    RGBA, PALETTE images (PLTE, 1/2/4/8-bit indices bit-unpacked per
    row), 16-bit samples (high byte kept — the 8-bit rendering), each
    both non-interlaced AND Adam7 interlaced (every pass is its own
    filtered sub-image, scattered onto the x0::dx / y0::dy grid).
    Returns an (H, W, C) uint8 array, or None for anything outside
    that (non-PNG, truncated, missing PLTE, ...).

    Hostile-input bounds (the executors feed untrusted corpus bytes
    here): declared dimensions cap at ``max_pixels``, and the IDAT
    inflate is BOUNDED at the exact filtered-stream size those
    dimensions imply (``_zlib_strip_decode``) — a few-KB zlib ratio
    bomb stops at that bound instead of ballooning executor memory.
    The bound rejects nothing a valid stream could need: the decode
    below already requires the decompressed length to EQUAL the
    expected size."""
    import zlib

    if len(data) < 33 or data[:8] != bytes(
        [0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A]
    ):
        return None
    pos, idat = 8, []
    h = w = channels = None
    bit_depth = 8
    color_type = 0
    palette = None
    interlace = 0
    while pos + 8 <= len(data):
        clen = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR" and clen >= 13:
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            bit_depth, color_type, _, _, interlace = body[8:13]
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
            ok = (
                channels is not None
                and interlace in (0, 1)
                and (
                    (color_type == 3 and bit_depth in (1, 2, 4, 8))
                    or (color_type != 3 and bit_depth in (8, 16))
                )
            )
            if not ok:
                return None
        elif ctype == b"PLTE" and clen % 3 == 0:
            palette = np.frombuffer(body, dtype="u1").reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + crc
    if not idat or not h or not w:
        return None
    if color_type == 3 and palette is None:
        return None
    if w * h > max_pixels:
        return None
    bits_pp = bit_depth * channels
    bpp = max(1, bits_pp // 8)

    def rb(width):  # filtered row bytes for a given pixel width
        return (width * bits_pp + 7) // 8

    if interlace == 0:
        expect = (rb(w) + 1) * h
    else:
        expect = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw and ph:
                expect += (rb(pw) + 1) * ph
    raw = _zlib_strip_decode(b"".join(idat), expect)
    if raw is None:
        return None

    def to_pixels(rows, ph, pw):
        """(ph, row_bytes) filtered bytes -> (ph, pw, out_ch) uint8."""
        if color_type == 3:
            if bit_depth == 8:
                idx = rows[:, :pw]
            else:
                bits = np.unpackbits(rows, axis=1)
                grouped = bits[:, : (bits.shape[1] // bit_depth) * bit_depth]
                grouped = grouped.reshape(ph, -1, bit_depth)
                weights = 1 << np.arange(bit_depth - 1, -1, -1)
                idx = (grouped * weights).sum(axis=2)[:, :pw]
            if idx.max(initial=0) >= len(palette):
                return None
            return palette[idx]
        if bit_depth == 16:
            arr = rows[:, : pw * channels * 2].reshape(ph, pw * channels, 2)
            return arr[:, :, 0].reshape(ph, pw, channels)  # high byte
        return rows[:, : pw * channels].reshape(ph, pw, channels)

    out_ch = 3 if color_type == 3 else channels
    if interlace == 0:
        if len(raw) != (rb(w) + 1) * h:
            return None
        sub = _png_unfilter(raw, 0, h, rb(w), bpp)
        if sub is None:
            return None
        return to_pixels(sub, h, w)
    # Adam7: seven independently-filtered sub-images, in order
    out = np.zeros((h, w, out_ch), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _PNG_ADAM7:
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        sub = _png_unfilter(raw, off, ph, rb(pw), bpp)
        if sub is None:
            return None
        px = to_pixels(sub, ph, pw)
        if px is None:
            return None
        out[y0::dy, x0::dx] = px
        off += (rb(pw) + 1) * ph
    if off != len(raw):
        return None
    return out


def _png_unfilter(raw: bytes, offset: int, h: int, stride: int, channels: int):
    """Un-filter ``h`` scanlines of ``stride`` bytes starting at
    ``offset`` in the decompressed stream; ``channels`` is the filter
    byte distance (bpp — bytes per complete pixel, min 1). Returns
    (h, stride) uint8 or None on truncation/unknown filter."""
    if offset + (stride + 1) * h > len(raw):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        base = offset + y * (stride + 1)
        f = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1)
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:  # None
            cur = line.copy()
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            if stride % channels:
                return None
            px = line.reshape(-1, channels).astype(np.uint32)
            cur = (np.cumsum(px, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up (uint8 addition wraps, as the spec requires)
            cur = line + prev
        elif f == 3:  # Average: sequential left-dependency
            cur = np.empty(stride, np.uint8)
            for i in range(stride):
                left = int(cur[i - channels]) if i >= channels else 0
                cur[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth: sequential left-dependency
            cur = np.empty(stride, np.uint8)
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            return None
        out[y] = cur
    return out


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
    pixels: bool = False,
) -> DataFrame:
    """Decode image dimensions per asset via Arrow-batched mapInPandas.

    Decode ladder, per asset: PIL when importable (full decode) →
    pure-byte header parsing for PNG/GIF/JPEG (true dimensions,
    ``decoder`` = ``png-header``/``gif-header``/``jpeg-sof``) →
    deterministic fake (``decoder`` = ``stub``). Dimensions come from
    ~26 header bytes — a dimension-filter pass over 100 TB must NOT
    pay zlib decompression per asset, so the REAL PNG pixel decode
    (``decoder`` = ``png-zlib``; stdlib zlib + numpy un-filtering, see
    ``_png_pixels``), the GIF first-frame decode (``decoder`` =
    ``gif-lzw``; pure-Python LZW, composited onto the logical screen so
    the dims match the header path), JPEG/TIFF, the WebP-lossless
    decode (``decoder`` = ``webp-vp8l-pixels``, see ``_webp_pixels``; lossy
    VP8 stays header-only BY DESIGN), and the uncompressed-BMP raster
    decode (``decoder`` = ``bmp-raster``, see ``_bmp_pixels``) are
    opt-in via ``pixels=True``,
    for callers that want pixel-verified dims; ``extract_features``
    always uses the pixel path (it needs the actual image).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def header_or_fake(data):
            if pixels:
                px = _png_pixels(data)
                if px is not None:
                    return (px.shape[0], px.shape[1], px.shape[2], "png-zlib")
                px = _gif_pixels(data)
                if px is not None:
                    return (px.shape[0], px.shape[1], px.shape[2], "gif-lzw")
                px = _jpeg_pixels(data)
                if px is not None:
                    return (px.shape[0], px.shape[1], px.shape[2], "jpeg-huff")
                labeled = _tiff_pixels_labeled(data)
                if labeled is not None:
                    px, tiff_label = labeled
                    return (px.shape[0], px.shape[1], px.shape[2], tiff_label)
                px = _webp_pixels(data)
                if px is not None:
                    return (px.shape[0], px.shape[1], px.shape[2],
                            "webp-vp8l-pixels")
                px = _bmp_pixels(data)
                if px is not None:
                    return (px.shape[0], px.shape[1], px.shape[2],
                            "bmp-raster")
            parsed = _header_dims(data)
            if parsed is not None:
                return parsed
            return (*_fake_shape(data), "stub")

        try:
            from PIL import Image  # pragma: no cover - not in container
            import io

            def shape(data):
                data = bytes(data or b"")
                try:
                    with Image.open(io.BytesIO(data)) as im:
                        return im.height, im.width, len(im.getbands()), "pil"
                except Exception:
                    # non-image / truncated bytes must not fail the task:
                    # continue down the ladder (header parse, then fake)
                    return header_or_fake(data)

        except ImportError:

            def shape(data):
                return header_or_fake(bytes(data or b""))

        for pdf in it:
            rows = [shape(x) for x in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "height": [t[0] for t in rows],
                    "width": [t[1] for t in rows],
                    "channels": [t[2] for t in rows],
                    "decoder": [t[3] for t in rows],
                }
            )

    return df.mapInPandas(batches, schema=_DECODE_SCHEMA)


_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)

_PROBE_NULL = (None, None, None, None, None, None)


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """Variable-width LZW decode (GIF flavor, LSB-first bit packing) —
    pure Python, no codec library. Returns a list of palette indices,
    or None on a malformed stream."""
    if not 2 <= min_code_size <= 11:
        # spec allows at most 8 (256-color palettes); anything larger is
        # corrupt and would make the base-table/dict work explode
        return None
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    base = {i: (i,) for i in range(clear)}
    table = dict(base)
    added = []  # extension codes since the last clear: a clear deletes
    next_code = end + 1  # just these, O(adds), never copies the base table
    out = []
    prev = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                for k in added:
                    table.pop(k, None)
                added.clear()
                next_code = end + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    return None
            elif code in table and code < next_code:
                entry = table[code]
                table[next_code] = table[prev] + (entry[0],)
                added.append(next_code)
                next_code += 1
            elif code == next_code:
                entry = table[prev] + (table[prev][0],)
                table[next_code] = entry
                added.append(next_code)
                next_code += 1
            else:
                return None
            out.extend(entry)
            if len(out) > max_pixels:
                return None
            if next_code == (1 << width) and width < 12:
                width += 1
            prev = code
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_pixels(data: bytes):
    """Guarded entry — see :func:`_jpeg_pixels`."""
    try:
        return _gif_pixels_unsafe(data)
    except Exception:
        return None


def _gif_pixels_unsafe(data: bytes):
    """REAL pixel decode for the FIRST frame of a GIF87a/89a — pure
    Python LZW (GIF's compression is spec-complete without any codec
    library) + palette mapping + interlace reordering. Returns an
    (H, W, 3) uint8 array, or None for non-GIF / malformed content."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    ls_w = int.from_bytes(data[6:8], "little")
    ls_h = int.from_bytes(data[8:10], "little")
    packed = data[10]
    bg_index = data[11]
    # sanity bound BEFORE decoding: dims are attacker-controlled bytes,
    # and this is a PURE-PYTHON per-symbol decode — 4 MP (any normal web
    # image) keeps worst-case legitimate decode in seconds, not hours
    if ls_w * ls_h > 4 * 1024 * 1024 or ls_w == 0 or ls_h == 0:
        return None
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = data[pos : pos + n]
        pos += n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                return None
            left = int.from_bytes(data[pos + 1 : pos + 3], "little")
            top = int.from_bytes(data[pos + 3 : pos + 5], "little")
            w = int.from_bytes(data[pos + 5 : pos + 7], "little")
            h = int.from_bytes(data[pos + 7 : pos + 9], "little")
            flags = data[pos + 9]
            if w * h > 4 * 1024 * 1024:
                return None
            pos += 10
            ct = gct
            if flags & 0x80:
                n = 3 * (2 << (flags & 0x07))
                ct = data[pos : pos + n]
                pos += n
            if ct is None or pos >= len(data) or w == 0 or h == 0:
                return None
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            indices = _lzw_decode(bytes(lzw), mcs, w * h)
            if indices is None or len(indices) < w * h:
                return None
            idx = np.asarray(indices[: w * h], dtype="int64").reshape(h, w)
            if flags & 0x40:  # interlaced: rows arrive in 4 passes
                ordered = np.empty_like(idx)
                src_row = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for r in range(start, h, step):
                        ordered[r] = idx[src_row]
                        src_row += 1
                idx = ordered
            palette = np.frombuffer(ct, dtype="uint8").reshape(-1, 3)
            if idx.max() >= palette.shape[0]:
                return None
            frame = palette[idx]
            if (left, top, w, h) == (0, 0, ls_w, ls_h):
                return frame
            # sub-rectangle frame: composite onto the logical screen at
            # its offset (background = LSD bg color) so pixels=True dims
            # agree with the header path for the same asset
            # background color comes from the GLOBAL table per spec —
            # `palette` may be a (smaller) local table for this frame
            gpal = (
                np.frombuffer(gct, dtype="uint8").reshape(-1, 3)
                if gct is not None
                else None
            )
            bg = (
                gpal[bg_index]
                if gpal is not None and bg_index < gpal.shape[0]
                else np.zeros(3, dtype="uint8")
            )
            canvas = np.tile(bg, (ls_h, ls_w, 1)).astype("uint8")
            ch = min(h, ls_h - top)
            cw = min(w, ls_w - left)
            if ch > 0 and cw > 0:
                canvas[top : top + ch, left : left + cw] = frame[:ch, :cw]
            return canvas
        else:  # trailer (0x3B) or junk
            return None
    return None


# ---------------------------------------------------------------------------
# Baseline JPEG decode — pure Python/numpy, no codec library. Supports
# the common web baseline profile: 8-bit, SOF0, 4:4:4 (or grayscale),
# no restart markers; everything else returns None and falls back to
# the header-dims / stub ladder. Like the GIF decoder, inputs are
# untrusted corpus bytes: dimensions are capped before any block work.
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


def _jpeg_dct_mat():
    D = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            D[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return D


_JPEG_D = _jpeg_dct_mat()


class _JpegBits:
    """MSB-first entropy-coded-segment reader with 0xFF00 unstuffing."""

    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self):
        if self.n == 0:
            if self.pos >= len(self.data):
                return None
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    return None  # a real marker ends the scan
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def restart(self):
        """Discard to the byte boundary and consume one RSTn marker.
        Returns n (0-7) or None when the next bytes are not a restart
        marker (corrupt stream / lost sync)."""
        self.n = 0
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1  # fill bytes
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            return None
        m = self.data[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            return None
        self.pos += 2
        return m - 0xD0


def _jpeg_build_huff(bits, vals):
    table = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if vi >= len(vals):
                return None
            table[(length, code)] = vals[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


def _jpeg_huff_decode(br, table):
    code = 0
    for length in range(1, 17):
        b = br.bit()
        if b is None:
            return None
        code = (code << 1) | b
        if (length, code) in table:
            return table[(length, code)]
    return None


def _jpeg_extend(v, s):
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_ycbcr_to_rgb(ycc):
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype("uint8")


def _jpeg_pixels(data: bytes, max_pixels: int = 4 * 1024 * 1024):
    """Guarded entry: any unforeseen parse error on untrusted bytes is
    a None, never a task-killing exception (explicit checks inside
    remain the fast path)."""
    try:
        px = _jpeg_pixels_unsafe(data, max_pixels)
        if px is not None:
            return px
        return _jpeg_progressive_unsafe(data, max_pixels)
    except Exception:
        return None


def _jpeg_entropy_end(data: bytes, start: int) -> int:
    """First byte offset at/after ``start`` holding a real marker (0xFF
    followed by neither 0x00 stuffing nor 0xFF fill) — the end of an
    entropy-coded segment."""
    i = start
    while i + 1 < len(data):
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            if nxt == 0xFF:
                i += 1
                continue
            return i
        i += 1
    return len(data)


def _jpeg_progressive_unsafe(data: bytes, max_pixels: int):
    """REAL pixel decode for PROGRESSIVE JPEG (SOF2): multi-scan
    spectral selection + successive approximation per ITU-T T.81 G.1.2
    (DC first/refine, AC first/refine with EOB-run codes), accumulating
    per-block coefficient arrays across scans, then the same dequant +
    IDCT + upsample + YCbCr pipeline as the baseline path. Returns
    (H, W, 3) uint8 or None outside the supported profile (8-bit, 1 or
    3 components, sampling factors 1-2, no restart intervals)."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict = {}
    huff: dict = {}
    comps = None
    h = w = None
    coef = None  # per component: (blocks_y, blocks_x, 64) zigzag-order ints
    geom = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    if p + 64 > len(body):
                        return None
                    qtables[tq] = np.array(list(body[p : p + 64]), dtype="int64")
                    p += 64
                else:
                    if p + 128 > len(body):
                        return None
                    qtables[tq] = np.array(
                        [int.from_bytes(body[p + 2 * i : p + 2 * i + 2], "big")
                         for i in range(64)], dtype="int64")
                    p += 128
        elif marker == 0xC2:  # SOF2 progressive
            if len(body) < 6:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if body[0] != 8 or nc not in (1, 3) or h == 0 or w == 0 or h * w > max_pixels:
                return None
            comps = []
            for i in range(nc):
                if 9 + 3 * i > len(body):
                    return None
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if nc == 1:
                    hi = vi = 1
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    return None
                comps.append((cid, hi, vi, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            nmy, nmx = -(-h // (8 * vmax)), -(-w // (8 * hmax))
            geom = (hmax, vmax, nmy, nmx)
            coef = [
                np.zeros((nmy * vi, nmx * hi, 64), dtype="int64")
                for _, hi, vi, _ in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # only SOF2 here; baseline took the other path
        elif marker == 0xC4:
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                t = _jpeg_build_huff(bits, vals)
                if t is None:
                    return None
                huff[(tc, th)] = t
                p += 17 + n
        elif marker == 0xDD:
            return None  # restart intervals unsupported
        elif marker == 0xDA:
            if comps is None or len(body) < 4:
                return None
            ns = body[0]
            if len(body) < 4 + 2 * ns or not 1 <= ns <= len(comps):
                return None
            scan = []  # (comp_index, dc_table, ac_table)
            for i in range(ns):
                cid, tbl = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(
                    (k for k, c in enumerate(comps) if c[0] == cid), None
                )
                if ci is None:
                    return None
                scan.append((ci, tbl >> 4, tbl & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            scan_start = pos + 2 + seglen
            scan_end = _jpeg_entropy_end(data, scan_start)
            ok = _jpeg_progressive_scan(
                data[scan_start:scan_end], comps, coef, geom, h, w,
                huff, scan, ss, se, ah, al,
            )
            if not ok:
                return None
            pos = scan_end
            continue
        pos += 2 + seglen
    if comps is None or coef is None:
        return None
    # dequant + IDCT every block, assemble planes, upsample, convert —
    # identical back half to the baseline path
    hmax, vmax, nmy, nmx = geom
    planes = []
    for (cid, hi, vi, tq), cf in zip(comps, coef):
        q = qtables.get(tq)
        if q is None:
            return None
        by, bx, _ = cf.shape
        plane = np.zeros((by * 8, bx * 8))
        dez = np.zeros(64)
        for yb in range(by):
            for xb in range(bx):
                dez[_JPEG_ZIGZAG] = cf[yb, xb] * q
                plane[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] = (
                    _JPEG_D.T @ dez.reshape(8, 8) @ _JPEG_D
                )
        planes.append(plane)
    if len(comps) == 1:
        gray = np.clip((planes[0] + 128.0).round(), 0, 255).astype("uint8")
        return np.stack([gray] * 3, axis=-1)[:h, :w]
    full = []
    for plane, (_, hi, vi, _) in zip(planes, comps):
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        full.append(plane)
    ycc = np.stack([p + 128.0 for p in full], axis=-1)
    return _jpeg_ycbcr_to_rgb(ycc)[:h, :w]


def _jpeg_progressive_scan(
    entropy, comps, coef, geom, h, w, huff, scan, ss, se, ah, al
):
    """Decode ONE progressive scan into the coefficient store. Returns
    False on any malformed input. Implements the four T.81 G.1.2 cases:
    DC first / DC refine (Ss=Se=0, interleaving allowed) and AC first /
    AC refine (single component, EOB-run codes)."""
    hmax, vmax, nmy, nmx = geom
    br = _JpegBits(entropy)
    if ss == 0:
        if se != 0:
            return False
        # DC scan: interleaved (MCU order, vi*hi blocks per comp per
        # MCU) when ns > 1, else the single component's own block
        # raster (one block per MCU — T.81 A.2)
        prev_dc = [0] * len(scan)
        tables = []
        for ci, dc_t, _ in scan:
            t = huff.get((0, dc_t))
            if t is None and ah == 0:
                return False
            tables.append(t)

        def dc_one(si, ci, yb, xb):
            if ah == 0:
                s = _jpeg_huff_decode(br, tables[si])
                if s is None or s > 15:
                    return False
                diff = 0
                if s:
                    v = br.bits(s)
                    if v is None:
                        return False
                    diff = _jpeg_extend(v, s)
                prev_dc[si] += diff
                coef[ci][yb, xb, 0] = prev_dc[si] << al
            else:
                b = br.bit()
                if b is None:
                    return False
                if b:
                    coef[ci][yb, xb, 0] |= 1 << al
            return True

        if len(scan) > 1:
            for my in range(nmy):
                for mx in range(nmx):
                    for si, (ci, _, _) in enumerate(scan):
                        _, hi, vi, _ = comps[ci]
                        for byi in range(vi):
                            for bxi in range(hi):
                                if not dc_one(
                                    si, ci, my * vi + byi, mx * hi + bxi
                                ):
                                    return False
        else:
            ci = scan[0][0]
            _, hi, vi, _ = comps[ci]
            comp_h = -(-(h * vi) // vmax)
            comp_w = -(-(w * hi) // hmax)
            by_n, bx_n = -(-comp_h // 8), -(-comp_w // 8)
            for yb in range(by_n):
                for xb in range(bx_n):
                    if not dc_one(0, ci, yb, xb):
                        return False
        return True
    # AC scan — exactly one component (T.81 B.2.3)
    if len(scan) != 1 or se > 63 or ss > se:
        return False
    ci, _, ac_t = scan[0]
    act = huff.get((1, ac_t))
    if act is None:
        return False
    _, hi, vi, _ = comps[ci]
    cw = -(-(w * hi) // hmax)
    chh = -(-(h * vi) // vmax)
    bx_n, by_n = -(-cw // 8), -(-chh // 8)
    cf = coef[ci]
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    for yb in range(by_n):
        for xb in range(bx_n):
            blk = cf[yb, xb]
            if ah == 0:  # AC first
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _jpeg_huff_decode(br, act)
                    if sym is None:
                        return False
                    r, s = sym >> 4, sym & 0x0F
                    if s:
                        k += r
                        if k > se:
                            return False
                        v = br.bits(s)
                        if v is None:
                            return False
                        blk[k] = _jpeg_extend(v, s) << al
                        k += 1
                    else:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                v = br.bits(r)
                                if v is None:
                                    return False
                                eobrun += v
                            break
                        k += 16  # ZRL
            else:  # AC refine (T.81 G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _jpeg_huff_decode(br, act)
                        if sym is None:
                            return False
                        r, s = sym >> 4, sym & 0x0F
                        newval = 0
                        if s:
                            if s != 1:
                                return False
                            b = br.bit()
                            if b is None:
                                return False
                            newval = p1 if b else m1
                        else:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    v = br.bits(r)
                                    if v is None:
                                        return False
                                    eobrun += v
                                break
                            # r == 15: pass over 16 zero-history coeffs
                        while k <= se:
                            if blk[k] != 0:
                                b = br.bit()
                                if b is None:
                                    return False
                                if b and (blk[k] & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if newval and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0:
                            b = br.bit()
                            if b is None:
                                return False
                            if b and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    return True


def _jpeg_pixels_unsafe(data: bytes, max_pixels: int = 4 * 1024 * 1024):
    """REAL pixel decode for baseline JPEG (SOF0, 8-bit, sampling
    factors 1-2 — 4:4:4, 4:2:0, 4:2:2, 4:4:0, grayscale — incl.
    DRI/RSTn restart intervals): marker walk -> declared Huffman/quant
    tables -> MCU-interleaved entropy decode -> dequant + inverse
    zigzag + IDCT -> chroma upsample (nearest) -> YCbCr→RGB. Returns
    (H, W, 3) uint8 or None for anything outside the supported profile
    (sampling factors >2, corrupt, oversized; progressive SOF2 returns
    None HERE and the ``_jpeg_pixels`` entry hands it to
    ``_jpeg_progressive_unsafe``, which keeps the header-dims fallback
    for DRI — progressive restart streams are rare enough that the
    honest label beats more state machinery).
    4:2:0 is the dominant layout in web corpora, so the subsampled MCU
    path is what makes the decoder useful on a real crawl."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables = {}
    huff = {}
    comps = None
    h = w = None
    ri = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:
            return None
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    if p + 64 > len(body):
                        return None
                    qtables[tq] = np.array(list(body[p : p + 64]), dtype="int64")
                    p += 64
                else:
                    if p + 128 > len(body):
                        return None
                    qtables[tq] = np.array(
                        [int.from_bytes(body[p + 2 * i : p + 2 * i + 2], "big")
                         for i in range(64)], dtype="int64")
                    p += 128
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            # max_pixels default 4 MP: the entropy decode is one Python
            # call per BIT — a 64 MP "valid" image would stall a task
            # for hours, the same denial class as a corrupt stream
            if body[0] != 8 or nc not in (1, 3) or h == 0 or w == 0 or h * w > max_pixels:
                return None
            comps = []
            for i in range(nc):
                if 9 + 3 * i > len(body):
                    return None
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if nc == 1:
                    # single-component scans are non-interleaved: one
                    # data unit per 8x8 tile regardless of declared
                    # sampling factors (ITU-T T.81 A.2)
                    hi = vi = 1
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    return None  # factors >2 are vanishingly rare; keep bounded
                comps.append((cid, hi, vi, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                t = _jpeg_build_huff(bits, vals)
                if t is None:
                    return None
                huff[(tc, th)] = t
                p += 17 + n
        elif marker == 0xDD:  # DRI — restart every `ri` MCUs
            if len(body) < 2:
                return None
            ri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS — decode and return
            # bound by the SCAN's own declared count: a corrupt body[0]
            # larger than the segment would read past it
            if comps is None or len(body) < 1 or len(body) < 1 + 2 * body[0]:
                return None
            if body[0] != len(comps):
                return None  # partial (non-interleaved multi-comp) scans
            sel = {}
            for i in range(body[0]):
                cid, tbl = body[1 + 2 * i], body[2 + 2 * i]
                sel[cid] = (tbl >> 4, tbl & 0x0F)
            if any(cid not in sel for cid, _, _, _ in comps):
                return None
            br = _JpegBits(data[pos + 2 + seglen :])
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            # MCU grid covers the image in (8*hmax) x (8*vmax) tiles;
            # component ci owns hi*vi blocks per MCU in raster order
            nmy, nmx = -(-h // (8 * vmax)), -(-w // (8 * hmax))
            planes = [
                np.zeros((nmy * 8 * vi, nmx * 8 * hi))
                for _, hi, vi, _ in comps
            ]
            prev_dc = [0] * len(comps)

            def read_block(ci):
                cid, _, _, tq = comps[ci]
                dc_t, ac_t = sel[cid]
                dct = huff.get((0, dc_t))
                act = huff.get((1, ac_t))
                q = qtables.get(tq)
                if dct is None or act is None or q is None:
                    return None
                s = _jpeg_huff_decode(br, dct)
                if s is None:
                    return None
                diff = 0
                if s:
                    v = br.bits(s)
                    if v is None:
                        return None
                    diff = _jpeg_extend(v, s)
                prev_dc[ci] += diff
                zz = np.zeros(64, dtype="int64")
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = _jpeg_huff_decode(br, act)
                    if sym is None:
                        return None
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k > 63 or size == 0:
                        return None
                    v = br.bits(size)
                    if v is None:
                        return None
                    zz[k] = _jpeg_extend(v, size)
                    k += 1
                coef = np.zeros(64)
                coef[_JPEG_ZIGZAG] = zz * q
                return _JPEG_D.T @ coef.reshape(8, 8) @ _JPEG_D

            for my in range(nmy):
                for mx in range(nmx):
                    mcu_idx = my * nmx + mx
                    if ri and mcu_idx and mcu_idx % ri == 0:
                        # restart boundary: byte-align, consume RSTn
                        # (indices cycle 0-7), reset DC predictors
                        n_rst = br.restart()
                        if n_rst != (mcu_idx // ri - 1) % 8:
                            return None
                        prev_dc[:] = [0] * len(comps)
                    for ci, (cid, hi, vi, tq) in enumerate(comps):
                        for byi in range(vi):
                            for bxi in range(hi):
                                blk = read_block(ci)
                                if blk is None:
                                    return None
                                r0 = (my * vi + byi) * 8
                                c0 = (mx * hi + bxi) * 8
                                planes[ci][r0 : r0 + 8, c0 : c0 + 8] = blk
            if len(comps) == 1:
                gray = np.clip((planes[0] + 128.0).round(), 0, 255).astype("uint8")
                return np.stack([gray] * 3, axis=-1)[:h, :w]
            # nearest-neighbor chroma upsample to the full MCU grid
            full = []
            for plane, (_, hi, vi, _) in zip(planes, comps):
                if vi < vmax:
                    plane = np.repeat(plane, vmax // vi, axis=0)
                if hi < hmax:
                    plane = np.repeat(plane, hmax // hi, axis=1)
                full.append(plane)
            ycc = np.stack([p + 128.0 for p in full], axis=-1)
            return _jpeg_ycbcr_to_rgb(ycc)[:h, :w]
        pos += 2 + seglen
    return None


def _riff_chunks(data: bytes, form: bytes = b"WAVE", start: int = 12,
                 end: int = None):
    """Walk a RIFF container of the given form type, yielding
    (chunk_id, payload_offset, payload_size). Chunks are word-aligned:
    odd sizes pad one byte. Yields nothing for non-matching input —
    the single chunk walk shared by WAV metadata (``_parse_wav``),
    sample decode (``_wav_pcm_samples``), and AVI (``_parse_avi``).
    Pass ``start``/``end`` to walk the sub-chunks of a LIST payload."""
    if start == 12 and (
        len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != form
    ):
        return
    i = start
    end = len(data) if end is None else min(end, len(data))
    while i + 8 <= end:
        cid = data[i : i + 4]
        csize = int.from_bytes(data[i + 4 : i + 8], "little")
        yield cid, i + 8, csize
        i += 8 + csize + (csize & 1)


def _parse_avi(data: bytes):
    """TRUE video metadata from the AVI main header (``avih`` inside
    ``LIST hdrl``): frame period (µs), total frames, display dims — no
    codec. Returns the probe tuple or None."""
    for cid, off, csize in _riff_chunks(data, form=b"AVI "):
        if cid != b"LIST" or data[off : off + 4] != b"hdrl":
            continue
        for scid, soff, ssize in _riff_chunks(
            data, start=off + 4, end=off + csize
        ):
            if scid != b"avih" or ssize < 40 or soff + 40 > len(data):
                continue
            us_per_frame = int.from_bytes(data[soff : soff + 4], "little")
            total_frames = int.from_bytes(data[soff + 16 : soff + 20], "little")
            width = int.from_bytes(data[soff + 32 : soff + 36], "little")
            height = int.from_bytes(data[soff + 36 : soff + 40], "little")
            duration = (
                total_frames * us_per_frame / 1e6 if us_per_frame else None
            )
            return ("video", None, None, None, duration,
                    height or None, width or None, "avi-avih")
    return None


def _riff_fmt(data: bytes, off: int):
    """Decode the fixed little-endian fmt-chunk fields at ``off``."""
    return {
        "format": int.from_bytes(data[off : off + 2], "little"),
        "channels": int.from_bytes(data[off + 2 : off + 4], "little"),
        "sample_rate": int.from_bytes(data[off + 4 : off + 8], "little"),
        "byte_rate": int.from_bytes(data[off + 8 : off + 12], "little"),
        "block_align": int.from_bytes(data[off + 12 : off + 14], "little"),
        "bits": int.from_bytes(data[off + 14 : off + 16], "little"),
    }


def _parse_wav(data: bytes):
    """TRUE audio metadata from the RIFF/WAVE chunk list alone — no codec
    library. The fmt chunk carries channels / sample rate / bit depth in
    fixed little-endian positions; duration is the data chunk's byte size
    over the fmt byte rate. Returns None unless both chunks parse."""
    fmt = None
    data_size = None
    for cid, off, csize in _riff_chunks(data):
        if cid == b"fmt " and off + 16 <= len(data):
            fmt = _riff_fmt(data, off)
        elif cid == b"data":
            data_size = csize
    if fmt is None or data_size is None or not fmt["byte_rate"]:
        return None
    return (
        "audio",
        fmt["channels"],
        fmt["sample_rate"],
        fmt["bits"],
        data_size / fmt["byte_rate"],
        None,
        None,
        "wav-fmt",
    )


# ---------------------------------------------------------------------------
# MPEG audio (MP3) — frame-header walk, public ISO/IEC 11172-3 layout.
# Same pure-byte class as the MP4 stbl walker: no codec library, TRUE
# duration/bitrate/channels from the 4-byte frame headers alone.

#: bitrate tables in kbps, header index 1-14 (0=free, 15=invalid)
_MP3_KBPS_V1 = {
    3: (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    1: (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}  # MPEG1, keyed by layer bits (3=Layer I, 2=II, 1=III)
_MP3_KBPS_V2_L1 = (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
_MP3_KBPS_V2_L23 = (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

#: sample-rate tables, keyed by version bits (3=MPEG1, 2=MPEG2, 0=MPEG2.5)
_MP3_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _mp3_header(data: bytes, i: int):
    """Decode one MPEG audio frame header at byte offset ``i``. Returns
    (frame_len_bytes, samples_per_frame, sample_rate, kbps, channels)
    or None when the 4 bytes are not a valid header (bad sync, reserved
    version/layer, free/invalid bitrate, reserved sample rate)."""
    if i + 4 > len(data):
        return None
    h = int.from_bytes(data[i : i + 4], "big")
    if h >> 21 != 0x7FF:  # 11-bit frame sync
        return None
    ver = (h >> 19) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (h >> 17) & 3  # 3=Layer I, 2=II, 1=III, 0=reserved
    br_idx = (h >> 12) & 15
    sr_idx = (h >> 10) & 3
    pad = (h >> 9) & 1
    mode = (h >> 6) & 3
    if ver == 1 or layer == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    rate = _MP3_RATES[ver][sr_idx]
    if ver == 3:
        kbps = _MP3_KBPS_V1[layer][br_idx - 1]
    else:
        kbps = (_MP3_KBPS_V2_L1 if layer == 3 else _MP3_KBPS_V2_L23)[br_idx - 1]
    if layer == 3:  # Layer I: 384 samples, slot = 4 bytes
        samples = 384
        flen = (12 * kbps * 1000 // rate + pad) * 4
    elif layer == 2:  # Layer II: 1152 samples
        samples = 1152
        flen = 144 * kbps * 1000 // rate + pad
    else:  # Layer III: MPEG1 1152, MPEG2/2.5 576
        samples = 1152 if ver == 3 else 576
        flen = (144 if ver == 3 else 72) * kbps * 1000 // rate + pad
    if flen < 4:
        return None
    return flen, samples, rate, kbps, (1 if mode == 3 else 2)


def _skip_id3v2(data: bytes) -> int:
    """Byte offset past a leading ID3v2 tag (syncsafe 28-bit size,
    +10-byte footer when flagged), 0 when no tag parses."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    size = 0
    for b in data[6:10]:
        if b & 0x80:  # size bytes must be syncsafe
            return 0
        size = (size << 7) | b
    off = 10 + size + (10 if data[5] & 0x10 else 0)
    return min(off, len(data))


def _parse_mp3(data: bytes):
    """TRUE MP3 stats from a full frame-header walk: total samples /
    sample rate gives exact duration even for VBR (no Xing header
    needed), byte-weighted average bitrate, channel mode. A sync match
    only counts when the header chains — the next frame boundary also
    parses (or is end-of-data) — which rejects false 0xFF syncs in tag
    padding. Returns (channels, rate, samples, duration_s, avg_kbps)
    or None; hostile/truncated bytes degrade to None, never raise.
    Delegates the sync-discipline walk to :func:`_frame_span_walk`
    (one shared loop with :func:`_parse_adts` and
    :func:`audio_frame_spans` — a fix to false-sync rejection or the
    truncated-final-frame rule lands everywhere at once)."""
    return _stats_from_walk(
        _frame_span_walk(data, _mp3_header, _skip_id3v2(data))
    )


def _stats_from_walk(walked):
    """(channels, rate, total_samples, duration_s, avg_kbps) from a
    :func:`_frame_span_walk` result — the shared tail of
    :func:`_parse_mp3` / :func:`_parse_adts`."""
    if walked is None:
        return None
    rate, channels, spans = walked
    total_samples = sum(s for _, _, s in spans)
    total_bytes = sum(hi - lo for lo, hi, _ in spans)
    duration = total_samples / rate
    avg_kbps = total_bytes * 8 / duration / 1000 if duration else 0.0
    return channels, rate, total_samples, duration, avg_kbps


def _parse_flac(data: bytes):
    """TRUE audio metadata from FLAC's mandatory first metadata block
    (STREAMINFO, 34 bytes after the 4-byte block header): sample rate
    (20 bits), channels (3 bits + 1), bits per sample (5 bits + 1),
    total inter-channel samples (36 bits) — exact duration without
    touching a single frame. Returns (channels, rate, bits, total) or
    None."""
    if len(data) < 42 or data[:4] != b"fLaC":
        return None
    # first metadata block header: 1 byte (last-flag + type), 3 bytes len
    btype = data[4] & 0x7F
    blen = int.from_bytes(data[5:8], "big")
    if btype != 0 or blen < 34:  # STREAMINFO must be first (spec)
        return None
    b = data[8 : 8 + 34]
    rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 0x07) + 1
    bits = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1
    total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
    if not rate:
        return None
    return channels, rate, bits, total


class _FlacEof(Exception):
    """Internal: ran off the end of the FLAC bitstream."""


class _FlacBits:
    """MSB-first bit reader tuned for Rice streams. ``read`` extracts k
    bits from a byte window with one ``int.from_bytes`` (no numpy per
    call); ``unary`` walks a precomputed sorted array of set-bit
    positions with a monotone cursor — amortized O(total set bits) over
    the whole stream, the dominant cost shape of Rice decoding."""

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.ones = np.flatnonzero(
            np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        )
        self.oi = 0  # monotone cursor into self.ones
        self.i = start_byte * 8
        self.n = len(data) * 8

    def read(self, k: int) -> int:
        i = self.i
        j = i + k
        if j > self.n:
            raise _FlacEof
        self.i = j
        if k == 0:
            return 0
        b0 = i >> 3
        nb = ((i & 7) + k + 7) >> 3
        w = int.from_bytes(self.data[b0 : b0 + nb], "big")
        return (w >> (nb * 8 - (i & 7) - k)) & ((1 << k) - 1)

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if k and v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        ones = self.ones
        oi = self.oi
        size = ones.size
        i = self.i
        while oi < size and ones[oi] < i:
            oi += 1
        if oi >= size:
            raise _FlacEof
        pos = int(ones[oi])
        self.oi = oi + 1
        self.i = pos + 1
        return pos - i

    def align(self):
        self.i = (self.i + 7) & ~7


#: frame-header lookup tables (FLAC spec / RFC 9639)
_FLAC_RATES = (0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
               32000, 44100, 48000, 96000, -1, -2, -3, None)
_FLAC_BPS = (0, 8, 12, None, 16, 20, 24, 32)


def _flac_utf8_num(br: "_FlacBits") -> int:
    """FLAC's UTF-8-style extended coded number (frame/sample index)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    k = 0
    while b0 & (0x80 >> k):
        k += 1
    if k < 2 or k > 7:
        raise _FlacEof  # continuation byte or overlong lead: corrupt
    val = b0 & (0x7F >> k)
    for _ in range(k - 1):
        nxt = br.read(8)
        if nxt & 0xC0 != 0x80:
            raise _FlacEof
        val = (val << 6) | (nxt & 0x3F)
    return val


def _flac_residual(br: "_FlacBits", blocksize: int, order: int):
    """Rice-coded residual section: 2-bit method (4- or 5-bit params),
    4-bit partition order, escape partitions verbatim."""
    method = br.read(2)
    if method > 1:
        raise _FlacEof
    pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise _FlacEof
    out = []
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise _FlacEof
        param = br.read(pbits)
        if param == escape:
            raw_bits = br.read(5)
            out.extend(br.read_signed(raw_bits) if raw_bits else 0
                       for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.unary()
                z = (q << param) | br.read(param)
                out.append((z >> 1) ^ -(z & 1))
    return out


def _flac_fixed_restore(warmup, resid, order: int):
    """Invert the order-k fixed predictor with k iterated cumsums (the
    k-th difference of the signal IS the residual) — vectorized, no
    per-sample Python loop."""
    out = np.asarray(resid, dtype=np.int64)
    w = np.asarray(warmup, dtype=np.int64)
    for j in range(order, 0, -1):
        lead = np.diff(w, n=j - 1)[-1] if j > 1 else w[-1]
        out = lead + np.cumsum(out)
    return np.concatenate([w, out]) if order else out


def _flac_subframe(br: "_FlacBits", blocksize: int, bps: int):
    """One subframe: constant / verbatim / fixed(0-4) / LPC(1-32), with
    the wasted-bits unary prefix."""
    if br.read(1):
        raise _FlacEof  # mandatory zero pad bit
    ftype = br.read(6)
    wasted = br.unary() + 1 if br.read(1) else 0
    ebps = bps - wasted
    if ebps <= 0:
        raise _FlacEof
    if ftype == 0:  # CONSTANT
        samples = np.full(blocksize, br.read_signed(ebps), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        samples = np.fromiter(
            (br.read_signed(ebps) for _ in range(blocksize)),
            dtype=np.int64, count=blocksize)
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        if order > blocksize:
            raise _FlacEof
        warm = [br.read_signed(ebps) for _ in range(order)]
        resid = _flac_residual(br, blocksize, order)
        samples = _flac_fixed_restore(warm, resid, order)
    elif ftype >= 32:  # LPC, order 1-32
        order = (ftype & 0x1F) + 1
        if order > blocksize:
            raise _FlacEof
        warm = [br.read_signed(ebps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:  # stored value 0b1111 is invalid
            raise _FlacEof
        shift = br.read_signed(5)
        if shift < 0:
            raise _FlacEof
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _flac_residual(br, blocksize, order)
        hist = list(warm)
        # wrap each sample into int64 two's complement: conforming
        # streams never leave the range, but a HOSTILE lpc frame can
        # feed its own predictions back until Python's bignums outgrow
        # np.int64 (found by the never-raise fuzz suite) — a fixed-
        # width C decoder would wrap, so wrap.
        u64, i63 = (1 << 64) - 1, 1 << 63
        for r in resid:
            pred = sum(c * h for c, h in zip(coefs, reversed(hist[-order:])))
            v = ((pred >> shift) + r) & u64
            hist.append(v - (1 << 64) if v >= i63 else v)
        samples = np.asarray(hist, dtype=np.int64)
    else:
        raise _FlacEof  # reserved subframe type
    return samples << wasted if wasted else samples


def _flac_pcm_samples(data: bytes, max_samples: int = 1 << 24):
    """REAL FLAC sample decode — pure numpy + Python over the public
    bitstream format (RFC 9639): metadata walk, frame headers with
    UTF-8 coded numbers, constant/verbatim/fixed/LPC subframes,
    4/5-bit Rice partitions with escapes, wasted bits, and all four
    stereo decorrelation modes. Returns (interleaved float64 samples
    in [-1, 1], channels, rate, 'flac-pcm') or None when the stream
    does not fully decode (callers fall back to STREAMINFO stats)."""
    info = _parse_flac(data)
    if info is None:
        return None
    if len(data) > (64 << 20):  # bound the upfront set-bit index build
        return None
    channels, rate, bits, total = info
    if total and total * channels > max_samples:
        return None
    # walk metadata blocks to the first frame
    pos = 4
    while pos + 4 <= len(data):
        last = data[pos] & 0x80
        pos += 4 + int.from_bytes(data[pos + 1 : pos + 4], "big")
        if last:
            break
    else:
        return None
    if pos >= len(data):
        return None
    try:
        br = _FlacBits(data, pos)
        frames = []
        got = 0
        while got < total:
            if br.read(14) != 0x3FFE:
                return None
            br.read(1)  # reserved
            br.read(1)  # blocking strategy
            bs_code = br.read(4)
            sr_code = br.read(4)
            chan_code = br.read(4)
            bps_code = br.read(3)
            if br.read(1):
                return None
            _flac_utf8_num(br)
            if bs_code == 0:
                return None
            elif bs_code == 1:
                blocksize = 192
            elif bs_code <= 5:
                blocksize = 576 << (bs_code - 2)
            elif bs_code == 6:
                blocksize = br.read(8) + 1
            elif bs_code == 7:
                blocksize = br.read(16) + 1
            else:
                blocksize = 256 << (bs_code - 8)
            if sr_code == 12:
                br.read(8)
            elif sr_code in (13, 14):
                br.read(16)
            elif _FLAC_RATES[sr_code] is None:
                return None
            bps = bits if bps_code == 0 else _FLAC_BPS[bps_code]
            if not bps:
                return None
            br.read(8)  # header CRC-8 (not validated)
            if chan_code < 8:
                nch = chan_code + 1
                if nch != channels:
                    return None
                chans = [_flac_subframe(br, blocksize, bps)
                         for _ in range(nch)]
            elif chan_code <= 10:
                if channels != 2:
                    return None
                # the side subframe carries one extra bit of precision
                w0 = bps + (1 if chan_code == 9 else 0)
                w1 = bps + (1 if chan_code in (8, 10) else 0)
                c0 = _flac_subframe(br, blocksize, w0)
                c1 = _flac_subframe(br, blocksize, w1)
                if chan_code == 8:  # left/side
                    chans = [c0, c0 - c1]
                elif chan_code == 9:  # side/right
                    chans = [c1 + c0, c1]
                else:  # mid/side
                    m2 = (c0 << 1) | (c1 & 1)
                    chans = [(m2 + c1) >> 1, (m2 - c1) >> 1]
            else:
                return None
            br.align()
            br.read(16)  # frame CRC-16 (not validated)
            take = min(blocksize, total - got) if total else blocksize
            frame = np.empty(take * channels, dtype=np.int64)
            for c, arr in enumerate(chans):
                frame[c::channels] = arr[:take]
            frames.append(frame)
            got += take
            if got * channels > max_samples:
                return None
    except _FlacEof:
        return None
    except (IndexError, ValueError):
        return None
    if not frames:
        return None
    samples = np.concatenate(frames).astype("float64") / float(1 << (bits - 1))
    return samples, channels, rate, "flac-pcm"


def _parse_ogg(data: bytes):
    """TRUE audio metadata from an Ogg page walk — pure page headers,
    no codec: the BOS page's identification header gives the codec
    (Vorbis ``\\x01vorbis`` / Opus ``OpusHead``), channel count, and
    rate; the last page's granule position gives the exact total
    samples (Opus granules run at 48 kHz minus the pre-skip). Returns
    (channels, rate, samples, codec) or None. Follows the FIRST
    logical stream only (multiplexed audio+video Ogg is out of
    scope)."""
    if data[:4] != b"OggS":
        return None
    pos = 0
    rate = channels = codec = None
    preskip = 0
    last_granule = None
    serial0 = None
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS" or data[pos + 4] != 0:
            break  # lost sync / unknown version: keep what we have
        nseg = data[pos + 26]
        if pos + 27 + nseg > len(data):
            break
        payload_len = sum(data[pos + 27 : pos + 27 + nseg])
        payload_start = pos + 27 + nseg
        granule = int.from_bytes(data[pos + 6 : pos + 14], "little", signed=True)
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        if serial0 is None:
            serial0 = serial
        if serial == serial0:
            if rate is None:
                pl = data[payload_start : payload_start + payload_len]
                if pl[:7] == b"\x01vorbis" and len(pl) >= 16:
                    codec = "vorbis"
                    channels = pl[11]
                    rate = int.from_bytes(pl[12:16], "little")
                elif pl[:8] == b"OpusHead" and len(pl) >= 14:
                    codec = "opus"
                    channels = pl[9]
                    preskip = int.from_bytes(pl[10:12], "little")
                    rate = 48000  # Opus granules always count at 48 kHz
            if granule >= 0:  # -1 marks a continued-packet page
                last_granule = granule
        pos = payload_start + payload_len
    if not rate or last_granule is None:
        return None
    samples = max(0, last_granule - (preskip if codec == "opus" else 0))
    return channels, rate, samples, codec


# ---------------------------------------------------------------------------
# ADTS AAC — same frame-header-walk class as MP3 (public ISO/IEC 13818-7
# / 14496-3 ADTS layout). An ADTS header has layer bits 00 where an MPEG
# audio header has 01/10/11, so the two walks are mutually exclusive on
# the same bytes.

_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350)


def _adts_header(data: bytes, i: int):
    """Decode one ADTS frame header at offset ``i``. Returns
    (frame_len_bytes, samples_per_frame, sample_rate, channels|None)
    or None. ``channels`` is None for channel_configuration 0 (layout
    deferred to an in-stream PCE the walk never parses)."""
    if i + 7 > len(data):
        return None
    # 12-bit sync + layer must be 00 (the MP3/ADTS discriminator)
    if data[i] != 0xFF or (data[i + 1] & 0xF6) != 0xF0:
        return None
    sfi = (data[i + 2] >> 2) & 0xF
    if sfi >= len(_ADTS_RATES):
        return None
    chan = ((data[i + 2] & 1) << 2) | (data[i + 3] >> 6)
    flen = ((data[i + 3] & 3) << 11) | (data[i + 4] << 3) | (data[i + 5] >> 5)
    header_len = 7 if (data[i + 1] & 1) else 9  # CRC adds 2 bytes
    if flen < header_len:
        return None
    blocks = (data[i + 6] & 3) + 1
    return flen, 1024 * blocks, _ADTS_RATES[sfi], (chan or None)


def _parse_adts(data: bytes):
    """TRUE AAC stats from an ADTS frame walk (same contract as
    :func:`_parse_mp3`): (channels|None, rate, samples, duration_s,
    avg_kbps) or None; hostile bytes degrade to None. Shares
    :func:`_frame_span_walk`'s sync discipline with the MP3 walker."""
    return _stats_from_walk(_frame_span_walk(data, _adts_header, 0))


def _frame_span_walk(data: bytes, header_fn, start_at: int):
    """Per-frame byte spans from a chained header walk — the shared
    machinery under :func:`audio_frame_spans` (same sync discipline as
    :func:`_parse_mp3` / :func:`_parse_adts`: a sync only counts when
    the next frame boundary also parses, rejecting false 0xFF syncs).
    Returns ``(rate, channels, [(lo, hi, samples_per_frame), ...])``
    or None; hostile/truncated bytes degrade to None, never raise."""
    start = None
    i = start_at
    scan_end = min(len(data), i + 65536)
    while i < scan_end:
        j = data.find(b"\xff", i, scan_end)
        if j < 0:
            return None
        h = header_fn(data, j)
        if h is not None:
            nxt = j + h[0]
            if nxt <= len(data) and (
                nxt == len(data) or header_fn(data, nxt) is not None
            ):
                start = j
                break
        i = j + 1
    if start is None:
        return None
    spans = []
    rate = channels = None
    i = start
    while True:
        h = header_fn(data, i)
        if h is None:
            break
        flen, samples, sr, ch = h[0], h[1], h[2], h[-1]
        if i + flen > len(data):  # truncated final frame: don't emit it
            break
        spans.append((i, i + flen, samples))
        if rate is None:
            rate, channels = sr, ch
        i += flen
    if not spans or not rate:
        return None
    return rate, channels, spans


_AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("samples", T.IntegerType()),
    ]
)


def audio_frame_spans(
    df: DataFrame,
    every_n: int = 1,
    max_frames: int = 4096,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """Compressed-audio FRAME PAYLOADS as rows — the audio analogue of
    :func:`sample_frames`' video byte-span contract (README media
    table). MP3 / ADTS-AAC sample decode stays a declared boundary
    (their Huffman / scalefactor-band / synthesis-window tables are
    recited constants with no offline-verifiable source — see
    :func:`decode_audio`), but the frame STRUCTURE is exactly
    parseable, so every ``every_n``-th frame's bytes are exported with
    the stream's true sample rate and the frame's sample count for an
    EXTERNAL decoder (ffmpeg, minimp3, libfdk-aac) to consume without
    re-walking the stream. ``codec`` is ``mpeg-frames`` or
    ``adts-frames``; inputs neither walker syncs on produce no rows
    (honest empty, never invented spans).

    Decoder caveat, documented not hidden: ADTS frames are
    self-contained, but an MPEG-1 Layer III frame may back-reference
    up to 511 bytes of earlier frames' payload via the bit reservoir
    (``main_data_begin``), so a sample-exact external decode of frame
    k may also need frames k-1/k-2 — feed consecutive row RANGES to
    the codec (group by ``asset_id``, order by ``frame_idx``), not
    isolated rows, when exactness matters.

    100 TB shape: scan → ``mapInPandas`` 1:N explode, ZERO shuffle; a
    multi-hour stream splits into independently-schedulable frame rows
    so a downstream codec stage parallelizes per-frame instead of
    per-file (the same argument as the MP4 key-frame spans)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_frames = [], [], []
            out_codec, out_rate, out_samp = [], [], []
            for aid, data in zip(pdf[id_col], pdf[content_col]):
                data = bytes(data or b"")
                walked = _frame_span_walk(
                    data, _mp3_header, _skip_id3v2(data)
                )
                codec = "mpeg-frames"
                if walked is None:
                    walked = _frame_span_walk(data, _adts_header, 0)
                    codec = "adts-frames"
                if walked is None:
                    continue
                rate, _, spans = walked
                for i, (lo, hi, samp) in enumerate(
                    spans[:: max(every_n, 1)][:max_frames]
                ):
                    out_ids.append(int(aid))
                    out_idx.append(i)
                    out_frames.append(data[lo:hi])
                    out_codec.append(codec)
                    out_rate.append(int(rate))
                    out_samp.append(int(samp))
            yield pd.DataFrame(
                {
                    "asset_id": out_ids,
                    "frame_idx": out_idx,
                    "frame": out_frames,
                    "codec": out_codec,
                    "sample_rate": out_rate,
                    "samples": out_samp,
                }
            )

    return df.mapInPandas(batches, schema=_AUDIO_FRAME_SCHEMA)


def _g711_tables():
    """Build the 256-entry G.711 mu-law / A-law decode tables from the
    segment formulas (ITU-T G.711): sign + 3-bit exponent (segment) +
    4-bit mantissa. Computed once, vectorized lookup thereafter."""
    codes = np.arange(256, dtype=np.int64)
    # mu-law: transmitted bytes are bit-inverted
    u = codes ^ 0xFF
    exp = (u >> 4) & 0x07
    man = u & 0x0F
    mu = (((man << 3) + 0x84) << exp) - 0x84
    mu = np.where(u & 0x80, -mu, mu).astype("float64") / 32768.0
    # A-law: even bits are inverted on the wire (XOR 0x55)
    a = codes ^ 0x55
    exp_a = (a >> 4) & 0x07
    man_a = a & 0x0F
    lin = np.where(
        exp_a == 0,
        (man_a << 4) + 8,
        ((man_a << 4) + 0x108) << np.maximum(exp_a - 1, 0),
    )
    # A-law sign convention is inverted vs mu-law: set bit = positive
    al = np.where(a & 0x80, lin, -lin).astype("float64") / 32768.0
    return mu, al


_G711_MULAW, _G711_ALAW = _g711_tables()

#: IMA/DVI ADPCM step-size table (89 entries) and index-adjust table —
#: public IMA ADPCM reference algorithm (also RFC 3551 app. and
#: Microsoft WAVE_FORMAT_IMA_ADPCM docs).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_tables():
    """Bake the IMA recurrence into 89x16 lookup rows: signed delta per
    (step index, nibble) and the next step index — the sequential loop
    then does two list indexes, one clamp and one append per sample."""
    deltas = []
    nxt = []
    for index in range(89):
        step = int(_IMA_STEPS[index])
        drow = []
        nrow = []
        for nib in range(16):
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            drow.append(-diff if nib & 8 else diff)
            nrow.append(min(max(index + int(_IMA_INDEX_ADJ[nib & 7]), 0), 88))
        deltas.append(drow)
        nxt.append(nrow)
    return deltas, nxt


_IMA_DELTA, _IMA_NEXT = _ima_tables()


def _ima_decode_channel(pred: int, index: int, nibbles) -> list:
    """Decode one channel's nibble stream with the IMA ADPCM recurrence.
    Inherently sequential (each step's size depends on the previous
    index); per-sample work is table lookups via _IMA_DELTA/_IMA_NEXT."""
    out = []
    append = out.append
    index = min(max(index, 0), 88)
    delta, nxt = _IMA_DELTA, _IMA_NEXT
    for nib in nibbles:
        pred += delta[index][nib]
        if pred > 32767:
            pred = 32767
        elif pred < -32768:
            pred = -32768
        index = nxt[index][nib]
        append(pred)
    return out


def _wav_ima_adpcm_samples(payload: bytes, channels: int, block_align: int,
                           max_samples: int = 1 << 24):
    """REAL IMA ADPCM (WAVE format 0x11) decode. Blocks are independent:
    each starts with a 4-byte per-channel header (initial i16 predictor,
    step index, reserved), then interleaves 4-byte words round-robin per
    channel, 2 nibbles per byte low-first. Returns interleaved float64
    samples in [-1, 1] (header sample included) or None."""
    if channels < 1 or channels > 8:
        return None
    head = 4 * channels
    if block_align <= head or block_align % 4:
        return None
    frames = []
    for b0 in range(0, len(payload) - head + 1, block_align):
        block = payload[b0 : b0 + block_align]
        chans = []
        for c in range(channels):
            pred = int.from_bytes(
                block[4 * c : 4 * c + 2], "little", signed=True
            )
            index = block[4 * c + 2]
            if index > 88:
                return None  # corrupt header: refuse, don't invent audio
            chans.append([pred])
            body = block[head:]
            # words for channel c: every channels-th 4-byte group
            nib_bytes = b"".join(
                body[i : i + 4]
                for i in range(4 * c, len(body) - 3, 4 * channels)
            )
            packed = np.frombuffer(nib_bytes, dtype=np.uint8)
            nibs = np.empty(packed.size * 2, dtype=np.uint8)
            nibs[0::2] = packed & 0x0F
            nibs[1::2] = packed >> 4
            chans[c].extend(
                _ima_decode_channel(pred, index, nibs.tolist())
            )
        n = min(len(ch) for ch in chans)
        arr = np.empty(n * channels, dtype="float64")
        for c, ch in enumerate(chans):
            arr[c::channels] = np.asarray(ch[:n], dtype="float64") / 32768.0
        frames.append(arr)
        if sum(len(f) for f in frames) > max_samples:
            break
    if not frames:
        return None
    return np.concatenate(frames)


def _wav_pcm_samples(data: bytes):
    """REAL sample decode for PCM WAV — no codec library, every common
    linear layout: unsigned 8-bit, 16/24/32-bit signed little-endian
    (24-bit unpacked via a zero-padded byte view), and IEEE float32/
    float64 (format 3); plus the companded G.711 layouts (format 6
    A-law, format 7 mu-law, table decode from the segment formulas) and
    IMA ADPCM (format 0x11, true predictor recurrence). Returns
    (float64 samples in [-1, 1], channels, sample_rate, label) or None
    for non-RIFF / unrecognized-format content."""
    fmt = None
    payload = None
    for cid, off, csize in _riff_chunks(data):
        if cid == b"fmt " and off + 16 <= len(data):
            fmt = _riff_fmt(data, off)
        elif cid == b"data":
            payload = data[off : off + csize]
    if fmt is None or payload is None or not fmt["channels"]:
        return None
    bits = fmt["bits"]
    if fmt["format"] == 1:  # integer PCM
        if bits == 16:
            raw = np.frombuffer(
                payload[: len(payload) - (len(payload) % 2)], dtype="<i2"
            )
            samples = raw.astype("float64") / 32768.0
        elif bits == 8:  # 8-bit WAV is UNSIGNED with 128 midpoint
            raw = np.frombuffer(payload, dtype="u1")
            samples = (raw.astype("float64") - 128.0) / 128.0
        elif bits == 24:  # packed 3-byte LE: widen to 4 and view as <i4
            usable = len(payload) - (len(payload) % 3)
            tri = np.frombuffer(payload[:usable], dtype="u1").reshape(-1, 3)
            quad = np.zeros((tri.shape[0], 4), dtype="u1")
            quad[:, 1:] = tri  # value << 8, sign carried by the top byte
            raw = quad.view("<i4").ravel()
            samples = raw.astype("float64") / 2147483648.0
        elif bits == 32:
            raw = np.frombuffer(
                payload[: len(payload) - (len(payload) % 4)], dtype="<i4"
            )
            samples = raw.astype("float64") / 2147483648.0
        else:
            return None
    elif fmt["format"] == 3:  # IEEE float
        # hostile payloads can encode NaN/inf bit patterns (signaling
        # NaNs even warn on the f4->f8 cast); sanitize so corrupt
        # samples can't leak NaN into downstream envelope/RMS stats —
        # NaN -> 0, +/-inf -> the [-1, 1] clip rails
        if bits == 32:
            with np.errstate(invalid="ignore"):
                samples = np.frombuffer(
                    payload[: len(payload) - (len(payload) % 4)], dtype="<f4"
                ).astype("float64")
        elif bits == 64:
            samples = np.frombuffer(
                payload[: len(payload) - (len(payload) % 8)], dtype="<f8"
            ).astype("float64")
        else:
            return None
        samples = np.clip(np.nan_to_num(samples, nan=0.0), -1.0, 1.0)
    elif fmt["format"] in (6, 7):  # G.711 A-law / mu-law, 8-bit codes
        if bits not in (0, 8):
            return None
        table = _G711_ALAW if fmt["format"] == 6 else _G711_MULAW
        samples = table[np.frombuffer(payload, dtype="u1")]
        return (samples, fmt["channels"], fmt["sample_rate"],
                "alaw" if fmt["format"] == 6 else "mulaw")
    elif fmt["format"] == 0x11:  # IMA ADPCM
        samples = _wav_ima_adpcm_samples(
            payload, fmt["channels"], fmt["block_align"]
        )
        if samples is None:
            return None
        return samples, fmt["channels"], fmt["sample_rate"], "ima-adpcm"
    else:
        return None
    label = f"pcm{bits}" if fmt["format"] == 1 else f"float{bits}"
    return samples, fmt["channels"], fmt["sample_rate"], label


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def decode_audio(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
    external_decoder=None,
) -> DataFrame:
    """Waveform statistics from REAL PCM decode (WAV: unsigned 8-bit,
    16/24/32-bit signed, float32/64, G.711 A-law/mu-law, IMA ADPCM):
    sample count, duration, RMS, peak — computed with numpy over the
    data chunk, no codec library; ``decoder`` records the layout
    (``pcm16``, ``pcm24``, ``float32``, ``mulaw``, ``ima-adpcm``,
    ...). FLAC gets a REAL bitstream decode too (fixed + LPC
    subframes, Rice residuals, stereo decorrelation;
    ``decoder='flac-pcm'``), falling back to exact STREAMINFO stats
    (``decoder='flac-streaminfo'``, NULL rms/peak) when the frames
    don't fully decode. Ogg Vorbis gets a REAL sample decode as well
    (in-stream Huffman codebooks, floor1, residues, coupling, IMDCT —
    ``decoder='vorbis-pcm'``, see operators/vorbis.py), falling back
    to the exact Ogg page-granule stats (``decoder='ogg-vorbis'``,
    NULL rms/peak) for streams the decoder declines (legacy floor0);
    chained and multiplexed Ogg decode too (chains concatenate while
    channels/rate match).
    Vorbis audio inside Matroska/WebM decodes too
    (``decoder='webm-vorbis-pcm'``: A_VORBIS CodecPrivate headers +
    laced Cluster blocks through the same packet decoder).
    MP3 gets a frame-header walk
    (``decoder='mpeg-frames'``): channels / rate / samples / duration
    are TRUE values from the headers, while rms/peak stay NULL — the
    samples are never decoded, and a NULL beats an invented amplitude.
    Anything else yields NULL stats with ``decoder='stub'``.

    ``external_decoder`` is the escape hatch for the declared MP3 /
    ADTS-AAC / Opus sample boundary (README media table): a picklable
    callable ``raw_bytes -> (samples_float_array, channels, rate)`` or
    None, run INSIDE the Arrow workers for exactly the inputs every
    built-in decoder declined — a user with ffmpeg gets real rms/peak
    without forking this operator, e.g.::

        def via_ffmpeg(raw):
            import subprocess, numpy as np
            p = subprocess.run(
                ["ffmpeg", "-i", "pipe:0", "-f", "f32le", "-ac", "1",
                 "-ar", "16000", "pipe:1"],
                input=raw, capture_output=True)
            if p.returncode:
                return None
            return np.frombuffer(p.stdout, "<f4"), 1, 16000

        decode_audio(df, external_decoder=via_ffmpeg)

    A hook success is labeled ``decoder='external'``; a hook that
    returns None or RAISES falls back to the honest built-in header
    stats for that row (one hostile input must not lose the batch).
    Built-in decodes never route through the hook, so its presence
    cannot change a format this operator already answers exactly.

    Arrow-batched ``mapInPandas``; per-partition parallelism, memory
    bounded by the Arrow batch size."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stats(data):
            raw = bytes(data or b"")
            parsed = _wav_pcm_samples(raw)
            if parsed is None:
                parsed = _flac_pcm_samples(raw)
            if parsed is None and raw[:4] == b"OggS":
                parsed = _vorbis_pcm_samples(raw)
            if parsed is None and raw[:4] == b"\x1a\x45\xdf\xa3":
                parsed = _webm_vorbis_pcm(raw)
            if parsed is None and external_decoder is not None:
                # the WHOLE hook interaction is guarded — call,
                # unpacking, coercion, sanity checks: a hook returning
                # a malformed tuple (wrong arity, channels=0, NaN rate)
                # must degrade to the honest built-in row, not kill the
                # task ('one hostile input must not lose the batch')
                try:
                    ext = external_decoder(raw)
                    if ext is not None:
                        samples, channels, rate = ext
                        samples = np.asarray(samples, dtype="float64")
                        channels, rate = int(channels), int(rate)
                        if channels > 0 and rate > 0:
                            parsed = (samples, channels, rate, "external")
                except Exception:
                    pass  # hook failure -> honest built-in row
            if parsed is None:
                for walker, label in (
                    (_parse_mp3, "mpeg-frames"),
                    (_parse_adts, "adts-frames"),
                ):
                    stats_ = walker(raw)
                    if stats_ is not None:
                        ch, rate, samples, duration, _ = stats_
                        return (ch, rate, samples, duration, None, None,
                                label)
                flac = _parse_flac(raw)
                if flac is not None:
                    ch, rate, _, total = flac
                    return (ch, rate, total,
                            total / rate if total else None, None, None,
                            "flac-streaminfo")
                ogg = _parse_ogg(raw)
                if ogg is not None:
                    ch, rate, samples, codec = ogg
                    return (ch, rate, samples, samples / rate, None, None,
                            f"ogg-{codec}")
                return (None, None, None, None, None, None, "stub")
            samples, channels, rate, label = parsed
            n_frames = len(samples) // channels
            rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
            peak = float(np.max(np.abs(samples))) if len(samples) else 0.0
            return (
                channels,
                rate,
                n_frames,
                n_frames / rate if rate else None,
                rms,
                peak,
                label,
            )

        for pdf in it:
            rows = [stats(x) for x in pdf[content_col]]
            out = pd.DataFrame(
                rows, columns=[f.name for f in _AUDIO_SCHEMA.fields[1:]]
            )
            out.insert(0, "asset_id", pdf[id_col].astype("int64").values)
            yield out

    return df.mapInPandas(batches, schema=_AUDIO_SCHEMA)


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) over an ISO-BMFF box
    range. Size 0 (to-end) and size 1 (64-bit largesize) per spec."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(data[i : i + 4], "big")
        btype = data[i + 4 : i + 8]
        payload = i + 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(data[i + 8 : i + 16], "big")
            payload = i + 16
        elif size == 0:
            size = end - i
        if size < 8 or i + size > end:
            return
        yield btype, payload, i + size
        i += size


def _parse_mp4(data: bytes):
    """TRUE video metadata from ISO-BMFF header boxes alone: duration =
    mvhd duration/timescale (version 0 and 1 layouts), display dims from
    the widest trak's tkhd 16.16 fixed-point width/height. Returns None
    unless an mvhd parses."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    duration = None
    width = height = None
    for btype, ps, pe in _iter_boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for ityp, is_, ie in _iter_boxes(data, ps, pe):
            if ityp == b"mvhd" and is_ + 4 <= ie:
                ver = data[is_]
                if ver == 1 and is_ + 32 <= ie:
                    ts = int.from_bytes(data[is_ + 20 : is_ + 24], "big")
                    dur = int.from_bytes(data[is_ + 24 : is_ + 32], "big")
                elif ver == 0 and is_ + 24 <= ie:
                    ts = int.from_bytes(data[is_ + 12 : is_ + 16], "big")
                    dur = int.from_bytes(data[is_ + 16 : is_ + 20], "big")
                else:
                    continue
                if ts:
                    duration = dur / ts
            elif ityp == b"trak":
                for ttyp, tps, tpe in _iter_boxes(data, is_, ie):
                    if ttyp != b"tkhd":
                        continue
                    # tkhd payload: ver/flags, times/track_id/duration
                    # (v1 widens the times), reserved, layer/volume,
                    # 36-byte matrix, then 16.16 fixed width/height —
                    # width lands at +76 (v0) / +88 (v1)
                    ver = data[tps]
                    off = tps + (88 if ver == 1 else 76)
                    if off + 8 <= tpe:
                        w = int.from_bytes(data[off : off + 4], "big") >> 16
                        h = int.from_bytes(data[off + 4 : off + 8], "big") >> 16
                        if w and h and (width is None or w > width):
                            width, height = w, h
    if duration is None:
        return None
    return ("video", None, None, None, duration, height, width, "mp4-mvhd")


def _ebml_id(data: bytes, i: int):
    """Read an EBML element ID (1-4 bytes, marker bits kept)."""
    if i >= len(data):
        return None
    b0 = data[i]
    for ln in range(1, 5):
        if b0 & (0x80 >> (ln - 1)):
            if i + ln > len(data):
                return None
            return int.from_bytes(data[i : i + ln], "big"), i + ln
    return None


def _ebml_vint(data: bytes, i: int):
    """Read a plain EBML varint (1-8 bytes, marker stripped) with NO
    unknown-size sentinel — block track numbers use this form, where
    the all-ones pattern is just a value (track 127 encodes as 0xFF)."""
    if i >= len(data):
        return None
    b0 = data[i]
    for ln in range(1, 9):
        if b0 & (0x80 >> (ln - 1)):
            if i + ln > len(data):
                return None
            v = int.from_bytes(data[i : i + ln], "big")
            v -= (0x80 >> (ln - 1)) << (8 * (ln - 1))
            return v, i + ln
    return None


def _ebml_size(data: bytes, i: int):
    """Read an EBML size varint (1-8 bytes, marker stripped); all-ones
    means unknown size (returned as None size)."""
    if i >= len(data):
        return None
    b0 = data[i]
    for ln in range(1, 9):
        if b0 & (0x80 >> (ln - 1)):
            if i + ln > len(data):
                return None
            v = int.from_bytes(data[i : i + ln], "big")
            v -= (0x80 >> (ln - 1)) << (8 * (ln - 1))
            if v == (1 << (7 * ln)) - 1:
                return None, i + ln  # unknown size (streamed files)
            return v, i + ln
    return None


def _ebml_walk(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end) across a range;
    unknown-size elements extend to the range end (only Segment and
    Cluster may legally be unknown-size)."""
    i = start
    while i < end:
        rid = _ebml_id(data, i)
        if rid is None:
            return
        eid, i = rid
        rsz = _ebml_size(data, i)
        if rsz is None:
            return
        size, i = rsz
        pe = end if size is None else min(i + size, end)
        yield eid, i, pe
        i = pe


def _ebml_svint(data: bytes, i: int):
    """Signed EBML varint (EBML-lacing size deltas): the plain varint
    minus 2^(7*len-1) - 1."""
    r = _ebml_vint(data, i)
    if r is None:
        return None
    v, j = r
    ln = j - i
    return v - ((1 << (7 * ln - 1)) - 1), j


def _xiph_private_packets(priv: bytes):
    """Split a Matroska CodecPrivate in Xiph lacing form: count-1
    byte, then 255-run sizes for all but the last packet, remainder is
    the last. A_VORBIS carries exactly the three Vorbis headers."""
    if not priv:
        return None
    count = priv[0] + 1
    off = 1
    sizes = []
    for _ in range(count - 1):
        sz = 0
        while off < len(priv):
            b = priv[off]
            off += 1
            sz += b
            if b < 255:
                break
        else:
            return None
        sizes.append(sz)
    packets = []
    for sz in sizes:
        if off + sz > len(priv):
            return None
        packets.append(priv[off : off + sz])
        off += sz
    packets.append(priv[off:])
    return packets


def _mkv_block_packets(data: bytes, lo: int, hi: int, track: int):
    """Frame payloads of one Matroska block for the given track:
    handles no lacing, Xiph, fixed-size and EBML lacing (audio blocks
    are commonly laced). Returns a list of bytes (empty when the block
    belongs to another track or is malformed)."""
    tv = _ebml_vint(data, lo)
    if tv is None:
        return []
    tn, off = tv
    if tn != track:
        return []
    off += 2  # relative timecode
    if off >= hi:
        return []
    flags = data[off]
    off += 1
    lace = flags & 0x06
    if lace == 0:
        return [data[off:hi]]
    if off >= hi:
        return []
    count = data[off] + 1
    off += 1
    sizes = []
    if lace == 0x02:  # Xiph
        for _ in range(count - 1):
            sz = 0
            while off < hi:
                b = data[off]
                off += 1
                sz += b
                if b < 255:
                    break
            else:
                return []
            sizes.append(sz)
    elif lace == 0x04:  # fixed-size
        rem = hi - off
        if count == 0 or rem % count:
            return []
        sizes = [rem // count] * (count - 1)
    elif count > 1:  # EBML lacing: first size plain, then signed
        # deltas; a single laced frame writes NO size fields at all
        fv = _ebml_vint(data, off)
        if fv is None:
            return []
        sz, off = fv
        sizes.append(sz)
        for _ in range(count - 2):
            dv = _ebml_svint(data, off)
            if dv is None:
                return []
            delta, off = dv
            sz += delta
            if sz < 0:
                return []
            sizes.append(sz)
    out = []
    for sz in sizes:
        if off + sz > hi:
            return []
        out.append(data[off : off + sz])
        off += sz
    out.append(data[off:hi])  # last frame: the remainder
    return out


def _webm_vorbis_pcm(data: bytes, max_samples: int = 1 << 24):
    """REAL sample decode for Vorbis audio inside Matroska/WebM: find
    the A_VORBIS TrackEntry, split its CodecPrivate (Xiph lacing) into
    the three Vorbis headers, collect that track's block frames across
    Clusters (all three lacing modes), and run the shared Vorbis
    packet decoder. Returns (samples, channels, rate,
    'webm-vorbis-pcm') or None (callers fall back to the EBML video
    header walk)."""
    if len(data) < 8 or not data.startswith(b"\x1a\x45\xdf\xa3"):
        return None
    track = None
    priv = None
    segment = None  # blocks come only from the segment that declared
    # the track: a later chained Segment has its own numbering
    for eid, ps, pe in _ebml_walk(data, 0, len(data)):
        if eid != 0x18538067:  # Segment
            continue
        for sid, ss, se in _ebml_walk(data, ps, pe):
            if sid != 0x1654AE6B:  # Tracks
                continue
            for tid, ts, te in _ebml_walk(data, ss, se):
                if tid != 0xAE:  # TrackEntry
                    continue
                tn = cid = cp = None
                for fid, fs, fe in _ebml_walk(data, ts, te):
                    if fid == 0xD7:
                        tn = int.from_bytes(data[fs:fe], "big")
                    elif fid == 0x86:
                        cid = data[fs:fe]
                    elif fid == 0x63A2:
                        cp = data[fs:fe]
                if cid == b"A_VORBIS" and tn is not None and cp:
                    track, priv, segment = tn, cp, (ps, pe)
                    break
            if track is not None:
                break
        if track is not None:
            break
    if track is None:
        return None
    headers = _xiph_private_packets(priv)
    if headers is None or len(headers) != 3:
        return None
    packets = list(headers)
    ps, pe = segment
    for cid_, cs, ce in _ebml_walk(data, ps, pe):
        if cid_ != 0x1F43B675:  # Cluster
            continue
        for bid, bs, be in _ebml_walk(data, cs, ce):
            if bid == 0xA3:  # SimpleBlock
                packets.extend(_mkv_block_packets(data, bs, be, track))
            elif bid == 0xA0:  # BlockGroup > Block
                for gid, gs, ge in _ebml_walk(data, bs, be):
                    if gid == 0xA1:
                        packets.extend(
                            _mkv_block_packets(data, gs, ge, track)
                        )
    out = _vorbis_packets_pcm(packets, max_samples=max_samples)
    if out is None:
        return None
    samples, ch, rate, _ = out
    return samples, ch, rate, "webm-vorbis-pcm"


def _parse_webm(data: bytes):
    """TRUE metadata from the Matroska/WebM EBML tree — no codec:
    Segment > Info gives TimecodeScale (default 1 ms) and Duration
    (float, in timecode units); Segment > Tracks > TrackEntry > Video
    gives PixelWidth/PixelHeight, > Audio gives SamplingFrequency and
    Channels. Files with an audio track and no video dims (audio rips)
    report kind='audio' with the true rate/channels. Returns the probe
    tuple or None. Bounded: only the known container path is
    descended."""
    if data[:4] != bytes([0x1A, 0x45, 0xDF, 0xA3]):
        return None
    duration = None
    width = height = None
    a_rate = a_ch = None
    for eid, ps, pe in _ebml_walk(data, 0, len(data)):
        if eid != 0x18538067:  # Segment
            continue
        for sid, ss, se in _ebml_walk(data, ps, pe):
            if sid == 0x1549A966:  # Info
                scale = 1_000_000  # ns per timecode unit (spec default)
                dur_units = None
                for iid, is_, ie in _ebml_walk(data, ss, se):
                    if iid == 0x2AD7B1:
                        scale = int.from_bytes(data[is_:ie], "big")
                    elif iid == 0x4489:
                        n = ie - is_
                        if n == 4:
                            dur_units = float(
                                np.frombuffer(data[is_:ie], ">f4")[0]
                            )
                        elif n == 8:
                            dur_units = float(
                                np.frombuffer(data[is_:ie], ">f8")[0]
                            )
                if dur_units is not None and scale:
                    duration = dur_units * scale / 1e9
            elif sid == 0x1654AE6B:  # Tracks
                for tid, ts, te in _ebml_walk(data, ss, se):
                    if tid != 0xAE:  # TrackEntry
                        continue
                    for vid, vs, ve in _ebml_walk(data, ts, te):
                        if vid == 0xE0:  # Video settings
                            for pid, pps, ppe in _ebml_walk(data, vs, ve):
                                if pid == 0xB0:
                                    w = int.from_bytes(data[pps:ppe], "big")
                                    if width is None or w > width:
                                        width = w
                                elif pid == 0xBA:
                                    height = int.from_bytes(
                                        data[pps:ppe], "big")
                        elif vid == 0xE1:  # Audio settings
                            # spec defaults: 8 kHz mono
                            a_rate = a_rate or 8000.0
                            a_ch = a_ch or 1
                            for aid, is_, ie in _ebml_walk(data, vs, ve):
                                if aid == 0xB5 and ie - is_ in (4, 8):
                                    r = float(np.frombuffer(
                                        data[is_:ie],
                                        ">f4" if ie - is_ == 4 else ">f8",
                                    )[0])
                                    # hostile NaN/inf bytes must not
                                    # reach int(round(...)) below
                                    if 0 < r < 1e7:
                                        a_rate = r
                                elif aid == 0x9F:
                                    a_ch = int.from_bytes(data[is_:ie],
                                                          "big")
    if duration is None and width is None and a_rate is None:
        return None
    if width is None and a_rate is not None:
        # audio-only Matroska (common for audio rips): report the
        # TRUE track parameters, not a dim-less "video"
        return ("audio", a_ch, int(round(a_rate)), None, duration, None,
                None, "webm-ebml-audio")
    return ("video", None, None, None, duration, height, width, "webm-ebml")


def probe_media(
    df: DataFrame, content_col: str = "content", id_col: str = "asset_id"
) -> DataFrame:
    """Audio/video metadata per asset via Arrow-batched ``mapInPandas``:
    WAV fmt-chunk (channels, sample rate, bit depth, duration), MP3
    frame-header walk (channels, sample rate, exact duration incl. VBR,
    with the byte-weighted average kbps in ``bits_per_sample``'s place
    left NULL — it is not a bit depth), MP4 mvhd/tkhd (duration,
    display dims), and image containers (kind='image', dims + channel
    count via the ~26-byte header parse — probing never decodes
    pixels; use decode_images for that) parsed from header BYTES — the
    pretraining-filter inputs that need no codec library.
    Unrecognized containers come
    back with ``decoder='stub'`` and NULL fields (never a fake value:
    a filter on duration must not act on invented numbers).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def probe(data):
            data = bytes(data or b"")
            parsed = (
                _parse_wav(data) or _parse_mp4(data)
                or _parse_avi(data) or _parse_webm(data)
            )
            if parsed is not None:
                return parsed
            for walker, label in (
                (_parse_mp3, "mpeg-frames"),
                (_parse_adts, "adts-frames"),
            ):
                stats_ = walker(data)
                if stats_ is not None:
                    ch, rate, _, duration, _ = stats_
                    return ("audio", ch, rate, None, duration, None, None,
                            label)
            flac = _parse_flac(data)
            if flac is not None:
                ch, rate, bits, total = flac
                return ("audio", ch, rate, bits,
                        total / rate if total else None, None, None,
                        "flac-streaminfo")
            ogg = _parse_ogg(data)
            if ogg is not None:
                ch, rate, samples, codec = ogg
                return ("audio", ch, rate, None, samples / rate,
                        None, None, f"ogg-{codec}")
            dims = _header_dims(data)
            if dims is not None:  # image containers: dims from ~26
                hh, ww, ch, label = dims  # header bytes, never a decode
                return ("image", ch, None, None, None, hh, ww, label)
            return ("unknown",) + _PROBE_NULL + ("stub",)

        for pdf in it:
            rows = [probe(x) for x in pdf[content_col]]
            out = pd.DataFrame(
                rows,
                columns=[f.name for f in _PROBE_SCHEMA.fields[1:]],
            )
            out.insert(0, "asset_id", pdf[id_col].astype("int64").values)
            yield out

    return df.mapInPandas(batches, schema=_PROBE_SCHEMA)


#: one dimensionality for EVERY extractor (= the 8x8 pool grid of the
#: real PNG path): a corpus mixing decodable and stubbed assets must
#: produce a single-dim feature column or downstream cosine/LSH breaks
_FEATURE_DIM = 64

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("extractor", T.StringType()),
    ]
)


def _png_encode(px: np.ndarray) -> bytes:
    """Minimal PNG encoder (stdlib zlib): 8-bit gray/gray+alpha/RGB/RGBA,
    filter-0 scanlines — the inverse of ``_png_pixels`` for round-trips."""
    import zlib

    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _resize_nearest(px: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index maps — exact, cheap,
    and deterministic (the standard thumbnail path when no filtering
    library is present)."""
    yi = (np.arange(height) * px.shape[0]) // height
    xi = (np.arange(width) * px.shape[1]) // width
    return px[yi][:, xi]


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("resizer", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """REAL image resize for every decodable format — no codec
    library: pixel decode (PNG / GIF / JPEG / TIFF / WebP-lossless,
    the same ladder as ``decode_images(pixels=True)``) →
    nearest-neighbor numpy resample → ``_png_encode`` re-encode
    (``resizer='<fmt>-nn'``, output always PNG; it decodes back to
    exactly (height, width)). Undecodable content passes through
    untouched with ``resizer='stub'`` — never invented pixels.
    Arrow-batched ``mapInPandas``, the same 100 TB shape as the other
    decode stages."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(data):
            data = bytes(data or b"")
            px = _png_pixels(data)
            fmt = "png"
            if px is None:
                px = _gif_pixels(data)
                fmt = "gif"
            if px is None:
                px = _jpeg_pixels(data)
                fmt = "jpeg"
            if px is None:
                px = _tiff_pixels(data)
                fmt = "tiff"
            if px is None:
                px = _webp_pixels(data)
                fmt = "webp"
            if px is None:
                px = _bmp_pixels(data)
                fmt = "bmp"
            if px is None:
                return (data, None, None, "stub")
            small = np.ascontiguousarray(_resize_nearest(px, height, width))
            return (_png_encode(small), height, width, f"{fmt}-nn")

        for pdf in it:
            rows = [one(x) for x in pdf[content_col]]
            out = pd.DataFrame(
                rows, columns=[f.name for f in _RESIZE_SCHEMA.fields[1:]]
            )
            out.insert(0, "asset_id", pdf[id_col].astype("int64").values)
            yield out

    return df.mapInPandas(batches, schema=_RESIZE_SCHEMA)


def _wav_encode_pcm16(samples: np.ndarray, channels: int, rate: int) -> bytes:
    """Encode interleaved float64 samples in [-1, 1] as a PCM16 WAV."""
    ints = np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2")
    payload = ints.tobytes()
    return (
        b"RIFF" + (36 + len(payload)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data" + len(payload).to_bytes(4, "little") + payload
    )


_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("resampler", T.StringType()),
    ]
)


def resample_audio(
    df: DataFrame,
    target_rate: int,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """REAL audio resample to a uniform ``target_rate`` — the rate-
    normalization stage a training corpus needs before batched feature
    extraction. Decodable audio (every WAV layout incl. G.711/ADPCM,
    frame-bearing FLAC, Ogg Vorbis) is decoded, linearly interpolated
    per channel
    onto the target grid with ``np.interp``, and re-encoded as a PCM16
    WAV (``resampler='<decoder>-linear'``, e.g. ``'flac-pcm-linear'``;
    the output feeds every downstream WAV consumer). Undecodable
    content passes through untouched with ``resampler='stub'`` — never
    invented samples. Arrow-batched ``mapInPandas``, embarrassingly
    parallel over assets, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(data):
            data = bytes(data or b"")
            dec = _wav_pcm_samples(data)
            if dec is None:
                dec = _flac_pcm_samples(data)
            if dec is None and data[:4] == b"OggS":
                dec = _vorbis_pcm_samples(data)
            if dec is None and data[:4] == b"\x1a\x45\xdf\xa3":
                dec = _webm_vorbis_pcm(data)
            if dec is None:
                return (data, None, None, "stub")
            samples, channels, rate, label = dec
            if not rate or channels < 1:
                return (data, None, None, "stub")
            frames = samples.size // channels
            if frames == 0:  # decodable but empty: nothing to resample
                return (data, None, None, "stub")
            n_out = max(1, int(round(frames * target_rate / rate)))
            x = np.arange(n_out, dtype="float64") * (rate / target_rate)
            xp = np.arange(frames, dtype="float64")
            out = np.empty(n_out * channels, dtype="float64")
            for c in range(channels):
                out[c::channels] = np.interp(x, xp, samples[c::channels])
            return (
                _wav_encode_pcm16(out, channels, target_rate),
                n_out,
                target_rate,
                f"{label}-linear",
            )

        for pdf in it:
            rows = [one(v) for v in pdf[content_col]]
            out = pd.DataFrame(
                rows, columns=[f.name for f in _RESAMPLE_SCHEMA.fields[1:]]
            )
            out.insert(0, "asset_id", pdf[id_col].astype("int64").values)
            yield out

    return df.mapInPandas(batches, schema=_RESAMPLE_SCHEMA)


def _pooled_gray_feature(px: np.ndarray) -> np.ndarray:
    """REAL 64-dim image feature: 8×8 block-averaged grayscale,
    mean-centered and L2-normalized (aHash-style). Perceptually
    meaningful — near-identical images land near in cosine space."""
    gray = px[..., :3].mean(axis=2) if px.shape[2] >= 3 else px[..., 0].astype("float64")
    pools = [
        block.astype("float64").mean()
        for rows in np.array_split(gray, 8, axis=0)
        for block in np.array_split(rows, 8, axis=1)
    ]
    v = np.asarray(pools, dtype="float64")
    v = v - v.mean()
    n = np.linalg.norm(v)
    if n < 1e-12:  # flat image: deterministic constant direction
        v = np.ones(_FEATURE_DIM)
        n = np.linalg.norm(v)
    return (v / n).astype("float32")


def _rms_envelope_feature(samples: "np.ndarray") -> "np.ndarray":
    """64-window RMS envelope of a mono-folded sample array, L2
    normalized — all numpy, no codec dependency."""
    n = samples.size - (samples.size % _FEATURE_DIM)
    windows = samples[:n].reshape(_FEATURE_DIM, -1)
    rms = np.sqrt((windows**2).mean(axis=1))
    norm = np.linalg.norm(rms)
    if norm < 1e-12:  # digital silence: deterministic constant direction
        rms = np.ones(_FEATURE_DIM)
        norm = np.linalg.norm(rms)
    return (rms / norm).astype("float32")


def extract_features(
    df: DataFrame, content_col: str = "content", id_col: str = "asset_id"
) -> DataFrame:
    """Per-asset feature vector (array<float>) via mapInPandas.

    REAL for decodable PNGs, GIFs, and baseline JPEGs: 8×8 mean-pooled
    grayscale over the actual pixels (``extractor='png-pool8'`` /
    ``'gif-pool8'`` / ``'jpeg-pool8'``).
    REAL for decodable WAVs (every linear/G.711/ADPCM layout) and
    FLACs: the 64-window RMS loudness envelope of the actual samples,
    L2-normalized (``extractor='wav-rms64'`` / ``'flac-rms64'``) — the
    classic codec-free audio fingerprint, enough for near-dup
    detection of re-encoded or trimmed copies (and the FLAC/WAV twin
    of the same recording lands on the SAME vector, since FLAC is
    lossless). STUB elsewhere: sha-seeded unit vector,
    deterministic, clearly labeled (``extractor='stub'``) — a real
    model slots into the same batch loop. Either way the output feeds
    straight into ``operators.similarity`` (cosine top-k / LSH)
    unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            kinds = []
            for data in pdf[content_col]:
                data = bytes(data or b"")
                px = _png_pixels(data)
                kind = "png-pool8"
                if px is None:
                    px = _gif_pixels(data)
                    kind = "gif-pool8"
                if px is None:
                    px = _jpeg_pixels(data)
                    kind = "jpeg-pool8"
                if px is None:
                    px = _tiff_pixels(data)
                    kind = "tiff-pool8"
                if px is None:
                    px = _webp_pixels(data)
                    kind = "webp-pool8"
                if px is None:
                    px = _bmp_pixels(data)
                    kind = "bmp-pool8"
                if px is not None and px.shape[0] >= 8 and px.shape[1] >= 8:
                    feats.append(_pooled_gray_feature(px).tolist())
                    kinds.append(kind)
                    continue
                wav = _wav_pcm_samples(data)
                akind = "wav-rms64"
                if wav is None:
                    wav = _flac_pcm_samples(data)
                    akind = "flac-rms64"
                if wav is None and data[:4] == b"OggS":
                    wav = _vorbis_pcm_samples(data)
                    akind = "vorbis-rms64"
                if wav is None and data[:4] == b"\x1a\x45\xdf\xa3":
                    wav = _webm_vorbis_pcm(data)
                    akind = "webm-vorbis-rms64"
                if wav is not None and wav[0].size >= _FEATURE_DIM:
                    feats.append(_rms_envelope_feature(wav[0]).tolist())
                    kinds.append(akind)
                    continue
                seed = int.from_bytes(hashlib.sha1(data).digest()[:4], "big")
                v = np.random.RandomState(seed).standard_normal(_FEATURE_DIM)
                feats.append((v / np.linalg.norm(v)).astype("float32").tolist())
                kinds.append("stub")
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "feature": feats,
                    "extractor": kinds,
                }
            )

    return df.mapInPandas(batches, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _gif_frame_spans(data: bytes, max_frames: int = 256):
    """REAL frame extraction for GIF87a/89a — pure byte-walk of the
    block structure (GIF89a spec §20-25), no LZW decode needed: every
    frame is an Image Descriptor (0x2C) whose extent is fixed-size
    header + optional local color table + LZW-min-code byte + length-
    prefixed sub-blocks, so frame boundaries are computable from
    lengths alone. Returns a list of (start, end) byte spans, one per
    frame, or None if the bytes aren't GIF / are truncated mid-block.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    pos = 6 + 7  # header + logical screen descriptor
    packed = data[10]
    if packed & 0x80:  # global color table present
        pos += 3 * (2 << (packed & 0x07))
    spans = []

    def skip_subblocks(p):
        while p < len(data):
            n = data[p]
            p += 1
            if n == 0:
                return p
            p += n
        return None

    while pos < len(data) and len(spans) < max_frames:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte then sub-blocks
            nxt = skip_subblocks(pos + 2)
            if nxt is None:
                return None
            pos = nxt
        elif b == 0x2C:  # image descriptor == one frame
            start = pos
            p = pos + 10  # separator + 2x2 u16 geometry + packed byte
            if p > len(data):
                return None
            ipacked = data[pos + 9]
            if ipacked & 0x80:  # local color table
                p += 3 * (2 << (ipacked & 0x07))
            p += 1  # LZW minimum code size
            nxt = skip_subblocks(p)
            if nxt is None:
                return None
            spans.append((start, nxt))
            pos = nxt
        else:
            return None  # out-of-spec byte: refuse rather than guess
    return spans


def _mp4_spans_from_tables(data: bytes, tables: dict):
    """Per-sample (start, end) byte spans from one trak's sample tables
    (ISO/IEC 14496-12 §8.7): stsz sizes + stsc sample→chunk runs +
    stco/co64 chunk offsets; stss then selects the sync samples.
    Returns None on missing/inconsistent tables — untrusted corpus
    bytes must degrade, never crash or invent offsets."""

    def u32(o):
        return int.from_bytes(data[o : o + 4], "big")

    def u64(o):
        return int.from_bytes(data[o : o + 8], "big")

    if b"stsz" not in tables or b"stsc" not in tables or not (
        b"stco" in tables or b"co64" in tables
    ):
        return None
    ts, te = tables[b"stsz"]
    if ts + 12 > te:
        return None
    fixed, count = u32(ts + 4), u32(ts + 8)
    if count == 0 or count > (1 << 20):  # bound table work on hostile counts
        return None
    if fixed:
        sizes = [fixed] * count
    else:
        if ts + 12 + 4 * count > te:
            return None
        sizes = [u32(ts + 12 + 4 * i) for i in range(count)]
    if b"stco" in tables:
        cs, ce = tables[b"stco"]
        n = u32(cs + 4)
        if n == 0 or n > (1 << 20) or cs + 8 + 4 * n > ce:
            return None
        offsets = [u32(cs + 8 + 4 * i) for i in range(n)]
    else:
        cs, ce = tables[b"co64"]
        n = u32(cs + 4)
        if n == 0 or n > (1 << 20) or cs + 8 + 8 * n > ce:
            return None
        offsets = [u64(cs + 8 + 8 * i) for i in range(n)]
    ss, se = tables[b"stsc"]
    m = u32(ss + 4)
    if m == 0 or m > (1 << 20) or ss + 8 + 12 * m > se:
        return None
    runs = [(u32(ss + 8 + 12 * j), u32(ss + 12 + 12 * j)) for j in range(m)]
    spc = []  # samples-per-chunk, expanded over the chunk list
    for j, (first, per) in enumerate(runs):
        last = runs[j + 1][0] - 1 if j + 1 < len(runs) else len(offsets)
        if first < 1 or first > last or last > len(offsets):
            return None
        spc.extend([per] * (last - first + 1))
    if len(spc) != len(offsets):
        return None
    spans = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        off = chunk_off
        for _ in range(spc[ci]):
            if si >= len(sizes):
                return None  # stsc promises more samples than stsz has
            spans.append((off, off + sizes[si]))
            off += sizes[si]
            si += 1
    if si != len(sizes):
        return None
    if any(lo >= hi or hi > len(data) for lo, hi in spans):
        return None  # offsets past EOF: truncated/hostile file
    if b"stss" in tables:
        ks, ke = tables[b"stss"]
        kn = u32(ks + 4)
        if kn > (1 << 20) or ks + 8 + 4 * kn > ke:
            return None
        keys = [u32(ks + 8 + 4 * i) for i in range(kn)]
        spans = [spans[k - 1] for k in keys if 1 <= k <= len(spans)]
    # no stss box = every sample is a sync sample (14496-12 §8.6.2)
    return spans or None


def _mp4_keyframe_spans(data: bytes, max_frames: int = 256):
    """REAL key-frame extraction for ISO-BMFF (MP4) — pure byte
    arithmetic over the moov/trak/mdia/minf/stbl sample tables, no
    codec: key-frame BYTE SPANS need only stts-family table walks, the
    same class as the mvhd/tkhd metadata parse above. Prefers the
    ``vide`` handler trak; falls back to the first trak whose tables
    parse. Returns a list of (start, end) spans or None."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    best = None
    for btype, ps, pe in _iter_boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for ityp, is_, ie in _iter_boxes(data, ps, pe):
            if ityp != b"trak":
                continue
            is_video = False
            tables = {}
            for mtyp, ms, me in _iter_boxes(data, is_, ie):
                if mtyp != b"mdia":
                    continue
                for ntyp, ns, ne in _iter_boxes(data, ms, me):
                    if ntyp == b"hdlr" and ns + 12 <= ne:
                        is_video = data[ns + 8 : ns + 12] == b"vide"
                    elif ntyp == b"minf":
                        for styp, ss, se in _iter_boxes(data, ns, ne):
                            if styp != b"stbl":
                                continue
                            for ttyp, t0, t1 in _iter_boxes(data, ss, se):
                                if ttyp in (b"stsz", b"stco", b"co64",
                                            b"stsc", b"stss"):
                                    tables[ttyp] = (t0, t1)
            spans = _mp4_spans_from_tables(data, tables)
            if spans:
                if is_video:
                    return spans[:max_frames]
                if best is None:
                    best = spans[:max_frames]
    return best


def _webm_frame_spans(data: bytes, max_frames: int = 4096):
    """REAL frame extraction for Matroska/WebM — EBML walk of Segment >
    Cluster > SimpleBlock (and BlockGroup > Block): returns (lo, hi)
    spans of the codec frame payloads, i.e. the block body after the
    track-number varint, the 2-byte relative timecode and the flags
    byte. Laced blocks (flags & 0x06) are skipped rather than split —
    emitting a concatenation as 'one frame' would be dishonest."""
    if len(data) < 8 or not data.startswith(b"\x1a\x45\xdf\xa3"):
        return []
    spans = []
    for eid, ps, pe in _ebml_walk(data, 0, len(data)):
        if eid != 0x18538067:  # Segment
            continue
        for cid, cs, ce in _ebml_walk(data, ps, pe):
            if cid != 0x1F43B675:  # Cluster
                continue
            for bid, bs, be in _ebml_walk(data, cs, ce):
                blocks = []
                if bid == 0xA3:  # SimpleBlock
                    blocks.append((bs, be))
                elif bid == 0xA0:  # BlockGroup > Block
                    blocks.extend(
                        (gs, ge)
                        for gid, gs, ge in _ebml_walk(data, bs, be)
                        if gid == 0xA1
                    )
                for lo, hi in blocks:
                    # plain varint, no unknown-size sentinel: track 127
                    # encodes as 0xFF and must not be skipped
                    tn = _ebml_vint(data, lo)
                    if tn is None:
                        continue
                    hdr_end = tn[1] + 3  # 2-byte timecode + flags
                    if hdr_end > hi:
                        continue
                    if data[hdr_end - 1] & 0x06:  # laced: skip
                        continue
                    spans.append((hdr_end, hi))
                    if len(spans) >= max_frames:
                        return spans
    return spans


def _avi_frame_spans(data: bytes, max_frames: int = 4096):
    """REAL frame extraction for AVI — walk ``LIST movi`` and return
    the (lo, hi) byte spans of the video-stream chunks (``##dc``
    compressed / ``##db`` uncompressed, any stream number): the
    compressed frame payloads a downstream codec stage would decode.
    Pure byte arithmetic via the shared RIFF chunk walk; no codec."""
    spans = []
    for cid, off, csize in _riff_chunks(data, form=b"AVI "):
        if cid != b"LIST" or data[off : off + 4] != b"movi":
            continue
        for scid, soff, ssize in _riff_chunks(
            data, start=off + 4, end=off + csize
        ):
            if scid == b"LIST":  # 'rec ' grouping: one level of nesting
                for rcid, roff, rsize in _riff_chunks(
                    data, start=soff + 4, end=soff + ssize
                ):
                    if rcid[2:4] in (b"dc", b"db") and rcid[:2].isdigit():
                        spans.append((roff, min(roff + rsize, len(data))))
            elif scid[2:4] in (b"dc", b"db") and scid[:2].isdigit():
                spans.append((soff, min(soff + ssize, len(data))))
            if len(spans) >= max_frames:
                return spans
    return spans


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """Animated media → frame rows (1:N explode via mapInPandas yielding
    more rows than it consumes — the shape a real ffmpeg stage uses).

    GIF inputs get REAL frame extraction: :func:`_gif_frame_spans`
    walks the block structure and every ``every_n``-th Image Descriptor
    is emitted as a standalone frame blob (``decoder='gif-blocks'``) —
    pure byte arithmetic, no LZW decode, no codec library. MP4 inputs
    get REAL key-frame extraction the same way:
    :func:`_mp4_keyframe_spans` walks the stbl sample tables
    (stsz/stsc/stco/stss) and emits every ``every_n``-th sync sample's
    byte span (``decoder='mp4-stbl'``) — the compressed key-frame
    payloads a downstream codec stage would decode. AVI inputs walk
    ``LIST movi`` for the video-stream ``##dc``/``##db`` chunks the
    same way (``decoder='avi-movi'``), and Matroska/WebM inputs walk
    Cluster SimpleBlocks/Blocks (``decoder='webm-blocks'``, laced
    blocks skipped). Unrecognized
    containers keep the labeled STUB path (``decoder='stub'``,
    byte-slices as 'frames'); a real decoder raises the row count the
    same way, so partition sizing and skew behavior stay faithful.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_frames, out_dec = [], [], [], []
            for aid, data in zip(pdf[id_col], pdf[content_col]):
                data = bytes(data or b"")
                spans = _gif_frame_spans(data)
                dec = "gif-blocks"
                if not spans:
                    spans = _mp4_keyframe_spans(data)
                    dec = "mp4-stbl"
                if not spans:
                    spans = _avi_frame_spans(data)
                    dec = "avi-movi"
                if not spans:
                    spans = _webm_frame_spans(data)
                    dec = "webm-blocks"
                if spans:
                    for i, (lo, hi) in enumerate(
                        spans[:: max(every_n, 1)][:32]
                    ):
                        out_ids.append(int(aid))
                        out_idx.append(i)
                        out_frames.append(data[lo:hi])
                        out_dec.append(dec)
                    continue
                n_frames = max(len(data) // max(every_n, 1), 1)
                for i in range(min(n_frames, 32)):
                    out_ids.append(int(aid))
                    out_idx.append(i)
                    lo = i * every_n
                    out_frames.append(data[lo : lo + every_n])
                    out_dec.append("stub")
            yield pd.DataFrame(
                {
                    "asset_id": out_ids,
                    "frame_idx": out_idx,
                    "frame": out_frames,
                    "decoder": out_dec,
                }
            )

    return df.mapInPandas(batches, schema=_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# DCT perceptual hash (pHash)


_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("phash", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)

_DCT32 = None  # 32-point DCT-II basis, built on first use per worker


def _phash64(px: np.ndarray):
    """64-bit DCT perceptual hash of a decoded image (the pHash family,
    imagehash-compatible construction): BT.601 luma -> nearest-neighbor
    resize to 32x32 -> 2D DCT-II -> 8x8 low-frequency block -> each bit
    is coefficient > block median (DC included, as imagehash does).

    Robust where the 8x8 mean-pool feature is brittle: re-encodes
    across formats and nearest-preserving resizes leave the low-band
    spectrum (and so the hash) intact, while pool8 cells smear under
    resampling. Returns a SIGNED 64-bit int (bit i of the hash is bit
    i of the value; values >= 2^63 wrap negative) for storage in a
    Spark LongType; compare with XOR + bit_count, never arithmetic.
    """
    global _DCT32
    if _DCT32 is None:
        k = np.arange(32)[:, None]
        n = np.arange(32)[None, :]
        _DCT32 = np.cos(np.pi * (2 * n + 1) * k / 64)
    if px.ndim == 3:
        if px.shape[2] >= 3:
            g = (
                0.299 * px[:, :, 0].astype(np.float64)
                + 0.587 * px[:, :, 1]
                + 0.114 * px[:, :, 2]
            )
        else:
            g = px[:, :, 0].astype(np.float64)
    else:
        g = px.astype(np.float64)
    if g.shape[0] < 1 or g.shape[1] < 1:
        return None
    ys = np.arange(32) * g.shape[0] // 32
    xs = np.arange(32) * g.shape[1] // 32
    small = g[np.ix_(ys, xs)]
    block = (_DCT32 @ small @ _DCT32.T)[:8, :8].ravel()
    bits = block > np.median(block)
    val = 0
    for i in range(64):
        if bits[i]:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def phash_images(
    df: DataFrame, content_col: str = "content", id_col: str = "asset_id"
) -> DataFrame:
    """Per-asset 64-bit perceptual hash via Arrow-batched mapInPandas —
    the image near-dup fingerprint that survives re-encode + resize
    combos (see ``_phash64``). Same decode ladder as
    ``decode_images(pixels=True)``: PNG/GIF/JPEG/TIFF/WebP-VP8L/BMP
    pixels for real (``decoder='<fmt>-phash64'``), honest NULL hash
    with ``decoder='stub'`` otherwise — a NULL never enters LSH
    banding. Shuffle-free: scan -> Python stage, the same 100 TB shape
    as the other decode operators. Pairs with
    ``similarity.phash_candidate_pairs`` (banded hamming LSH) +
    ``similarity.hamming_verify`` the way ``extract_features`` pairs
    with hyperplane LSH + cosine verify.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            kinds = []
            for data in pdf[content_col]:
                data = bytes(data or b"")
                px = _png_pixels(data)
                kind = "png-phash64"
                if px is None:
                    px = _gif_pixels(data)
                    kind = "gif-phash64"
                if px is None:
                    px = _jpeg_pixels(data)
                    kind = "jpeg-phash64"
                if px is None:
                    px = _tiff_pixels(data)
                    kind = "tiff-phash64"
                if px is None:
                    px = _webp_pixels(data)
                    kind = "webp-phash64"
                if px is None:
                    px = _bmp_pixels(data)
                    kind = "bmp-phash64"
                h = _phash64(px) if px is not None else None
                hashes.append(h)
                kinds.append(kind if h is not None else "stub")
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "phash": pd.array(hashes, dtype="Int64"),
                    "decoder": kinds,
                }
            )

    return df.mapInPandas(batches, schema=_PHASH_SCHEMA)
