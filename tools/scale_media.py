"""10x media-corpus scale measurement for the multimodal family (the
probe/decode analogue of the documents/embeddings/streaming scale runs
in BASELINE.md).

Corpus: M copies of an asset per sf0.1 document (5,000 base rows),
built ENTIRELY executor-side inside mapInPandas from doc_id-derived
parameters and written to parquet once per M:

- audio assets rotate FLAC / PCM-WAV / MPEG1-L3 by id%3 (the q80
  builders);
- image assets are real multi-strip TIFFs with deterministic gradient
  pixels, rotating uncompressed / PackBits / Deflate strips by id%3
  (the round-10 compressed-strip decoders);
- pcm assets are FULLY DECODABLE audio rotating frame-bearing FLAC
  (fixed-order subframes + Rice residuals) / IMA ADPCM WAV / G.711
  mu-law WAV by id%3 (~1.2-2k samples each), built with the spec-built
  test encoders;
- webp assets are FULLY DECODABLE VP8L (WebP-lossless) two-color
  images, built with the spec-built test encoder.

Measures, at M=1 / M=10 / M=100 (5k / 50k / 500k assets per kind),
median wall of a count()-drained pass on one warm session:

- probe_media over the audio corpus (frame/header walks, metadata only);
- decode_images(pixels=True) over the TIFF corpus (real strip
  decompression + predictor + reshape per asset);
- decode_audio over the pcm corpus (real bitstream/predictor/table
  sample decode + RMS/peak per asset);
- decode_images(pixels=True) over the webp corpus (full VP8L
  prefix-code pixel decode per asset).

All four pipelines are scan -> Arrow-batched mapInPandas with NO shuffle
(the plan ends at the Python stage), so wall must scale ~M and
per-asset cost must stay flat — the multimodal family's 100 TB story
is exactly "embarrassingly parallel over assets"; any cross-asset
state would show up here as superlinear wall.

Usage: python tools/scale_media.py
Writes corpora under /tmp/mediascale/ and prints one JSON line per M.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1/documents.parquet"
OUT_DIR = "/tmp/mediascale"


def _audio_bytes(d: int) -> bytes:
    if d % 3 == 0:
        rate, channels, total = 8000 + (d % 5) * 4000, 1 + d % 2, 1000 + d % 7000
        b = bytearray(34)
        b[10] = (rate >> 12) & 0xFF
        b[11] = (rate >> 4) & 0xFF
        b[12] = ((rate & 0xF) << 4) | ((channels - 1) << 1)
        b[12] |= (16 - 1) >> 4
        b[13] = (((16 - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
        b[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
        return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(b)
    if d % 3 == 1:
        rate, channels, total = 8000 + (d % 5) * 4000, 1 + d % 2, 1000 + d % 7000
        size = total * channels * 2
        return (
            b"RIFF" + (36 + size).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * channels * 2).to_bytes(4, "little")
            + (channels * 2).to_bytes(2, "little")
            + (16).to_bytes(2, "little")
            + b"data" + size.to_bytes(4, "little")
        )
    frame = bytes([0xFF, 0xFB, 0x90, 0x40]) + b"\x00" * (144 * 128000 // 44100 - 4)
    return frame * (10 + d % 20)


def _pcm_audio_bytes(d: int) -> bytes:
    """Fully-decodable audio asset: frame-bearing FLAC / IMA ADPCM WAV /
    G.711 mu-law WAV by id%3, deterministic sine content. Uses the
    shared spec-built encoders in vinum_spark.operators.media_synth
    (the same encoders the decoder round-trip tests pin against)."""
    import numpy as np

    from vinum_spark.operators.media_synth import (
        _flac_encode, _ima_encode, _mulaw_encode_scalar, _wav_bytes)

    rate = 8000
    n = 1200 + (d % 7) * 128
    wave = np.round(
        0.4 * 32767 * np.sin(2 * np.pi * (100 + d % 300)
                             * np.arange(n) / rate)
    ).astype(np.int64)
    k = d % 3
    if k == 0:
        return _flac_encode(wave[: (n // 192) * 192], rate=rate,
                            mode=f"fixed{1 + (d // 3) % 4}")
    if k == 1:
        return _wav_bytes(_ima_encode(wave, 1, 256), 0x11, 1, rate, 4, 256)
    global _MU_TABLE
    if _MU_TABLE is None:  # 64k scalar encodes once, table lookup after
        _MU_TABLE = np.array(
            [_mulaw_encode_scalar(v) for v in range(-32768, 32768)],
            dtype=np.uint8,
        )
    return _wav_bytes(
        _MU_TABLE[(wave + 32768).astype(np.int64)].tobytes(), 7, 1, rate, 8
    )


_MU_TABLE = None


def _webp_asset_bytes(d: int) -> bytes:
    """Fully-decodable VP8L asset: a 24x16 two-color checkerboard with
    id-derived colors, encoded with the spec-built test encoder
    (simple prefix codes)."""
    from vinum_spark.operators.media_synth import _vp8l_encode

    a = 0xFF000000 | ((d * 2654435761) & 0xFFFFFF)
    b = 0xFF000000 | ((~d * 40503) & 0xFFFFFF)
    if a == b:
        b ^= 0x010101
    w, h = 24, 16
    return _vp8l_encode(
        [("lit", a if (x + y) % 2 else b)
         for y in range(h) for x in range(w)], w, h,
    )


def _vorbis_asset_bytes(d: int) -> bytes:
    """Fully-decodable Ogg Vorbis asset (the q84 shape): mono 8 kHz,
    256-sample blocks, 5-9 audio packets, built with the shared
    spec-built encoder the decoder round-trips are pinned against."""
    from vinum_spark.operators.media_synth import (
        _comment_packet, _ident_packet, _mono_audio_packet,
        _mono_setup_packet, _ogg_stream)

    n_pkts = 5 + d % 5
    packets = [_ident_packet(1, 8000, 8, 8), _comment_packet(),
               _mono_setup_packet()]
    for s_ in range(n_pkts):
        packets.append(_mono_audio_packet(d * 7 + s_)[0])
    return _ogg_stream(packets, 128 * (n_pkts - 1))


def _packbits_encode(data: bytes) -> bytes:
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


def _tiff_bytes(d: int) -> bytes:
    """Spec-built 64x48x3 multi-strip TIFF; compression rotates
    uncompressed / PackBits / Deflate by id%3."""
    import zlib

    import numpy as np

    h, w, spp = 48, 64, 3
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(x * 4 + d) % 256, (y * 5 + d * 3) % 256, (x + y + d * 7) % 256],
        axis=2,
    ).astype(np.uint8)
    rps = 16
    raw = [px[r : r + rps].tobytes() for r in range(0, h, rps)]
    comp = d % 3
    if comp == 1:
        strips = [_packbits_encode(s) for s in raw]
    elif comp == 2:
        strips = [zlib.compress(s) for s in raw]
    else:
        strips = raw
    bo = "little"
    # build IFD in two passes (offsets known on the second)
    n_entries = 10
    ifd_off = 8
    ifd_len = 2 + n_entries * 12 + 4
    arrays_off = ifd_off + ifd_len
    extra_len = 0
    for offsets_known in (False, True):
        extra = b""
        cursor = arrays_off

        def entry(tag, typ, values):
            nonlocal extra, cursor
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
            for s in strips:
                offs.append(cur)
                cur += len(s)
        else:
            offs = [0] * len(strips)
        ents = [
            entry(256, 4, [w]),
            entry(257, 4, [h]),
            entry(258, 3, [8] * spp),
            entry(259, 3, [[1, 32773, 8][comp]]),
            entry(262, 3, [2]),
            entry(273, 4, offs),
            entry(277, 3, [spp]),
            entry(278, 4, [rps]),
            entry(279, 4, [len(s) for s in strips]),
            entry(284, 3, [1]),
        ]
        extra_len = len(extra)
    hdr = b"II*\x00" + ifd_off.to_bytes(4, bo)
    ifd = n_entries.to_bytes(2, bo) + b"".join(ents) + (0).to_bytes(4, bo)
    return hdr + ifd + extra + b"".join(strips)


def build_corpus(spark, m: int) -> tuple[str, str]:
    import pandas as pd
    from pyspark.sql import functions as F

    audio_path = os.path.join(OUT_DIR, f"audio_m{m}")
    image_path = os.path.join(OUT_DIR, f"image_m{m}")
    pcm_path = os.path.join(OUT_DIR, f"pcm_m{m}")
    webp_path = os.path.join(OUT_DIR, f"webp_m{m}")
    vorbis_path = os.path.join(OUT_DIR, f"vorbis_m{m}")
    if os.path.exists(os.path.join(vorbis_path, "_SUCCESS")):
        return audio_path, image_path, pcm_path, webp_path, vorbis_path
    base = spark.read.parquet(BASE).select("doc_id")
    copies = spark.range(m).withColumnRenamed("id", "copy")
    ids = base.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * 10_000_000).alias("asset_id")
    )

    def build_audio(it):
        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "content": [_audio_bytes(int(a)) for a in pdf["asset_id"]],
            })

    def build_image(it):
        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "content": [_tiff_bytes(int(a)) for a in pdf["asset_id"]],
            })

    def build_pcm(it):
        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "content": [_pcm_audio_bytes(int(a)) for a in pdf["asset_id"]],
            })

    schema = "asset_id long, content binary"
    parts = max(8, 4 * m)
    ids.repartition(parts).mapInPandas(build_audio, schema=schema) \
        .write.mode("overwrite").parquet(audio_path)
    ids.repartition(parts).mapInPandas(build_image, schema=schema) \
        .write.mode("overwrite").parquet(image_path)
    ids.repartition(parts).mapInPandas(build_pcm, schema=schema) \
        .write.mode("overwrite").parquet(pcm_path)

    def build_webp(it):
        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "content": [_webp_asset_bytes(int(a))
                            for a in pdf["asset_id"]],
            })

    ids.repartition(parts).mapInPandas(build_webp, schema=schema) \
        .write.mode("overwrite").parquet(webp_path)

    def build_vorbis(it):
        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "content": [_vorbis_asset_bytes(int(a))
                            for a in pdf["asset_id"]],
            })

    ids.repartition(parts).mapInPandas(build_vorbis, schema=schema) \
        .write.mode("overwrite").parquet(vorbis_path)
    return audio_path, image_path, pcm_path, webp_path, vorbis_path


def timed(fn, n=3):
    fn()
    runs = []
    rows = None
    for _ in range(n):
        t0 = time.perf_counter()
        rows = fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3), rows


def main() -> None:
    from pyspark.sql import functions as F

    from vinum_spark.operators.multimodal import (decode_audio,
                                                  decode_images,
                                                  phash_images, probe_media)
    from vinum_spark.session import get_spark

    spark = get_spark("mediascale")
    spark.sparkContext.setLogLevel("ERROR")

    for m in (1, 10, 100):
        (audio_path, image_path, pcm_path, webp_path,
         vorbis_path) = build_corpus(spark, m)
        audio = spark.read.parquet(audio_path)
        images = spark.read.parquet(image_path)
        pcm = spark.read.parquet(pcm_path)
        webps = spark.read.parquet(webp_path)
        vorbis = spark.read.parquet(vorbis_path)

        def probe():
            df = probe_media(audio, id_col="asset_id")
            return df.filter(df.decoder != "stub").count()

        def decode():
            df = decode_images(images, pixels=True)
            return df.filter(df.decoder.startswith("tiff")).count()

        def decode_pcm():
            df = decode_audio(pcm)
            return df.filter(F.col("rms").isNotNull()).count()

        def decode_webp():
            df = decode_images(webps, pixels=True)
            return df.filter(df.decoder == "webp-vp8l-pixels").count()

        def decode_vorbis():
            df = decode_audio(vorbis)
            return df.filter(df.decoder == "vorbis-pcm").count()

        def phash_webp():
            # round-12 pipeline: full VP8L pixel decode PLUS the 32x32
            # DCT hash per asset, over the same webp corpus — the q87
            # operator's scale measurement
            df = phash_images(webps)
            return df.filter(df.decoder == "webp-phash64").count()

        n = {1: 3, 10: 2}.get(m, 2)
        wall_p, rows_p = timed(probe, n=n)
        wall_d, rows_d = timed(decode, n=n)
        wall_a, rows_a = timed(decode_pcm, n=n)
        wall_w, rows_w = timed(decode_webp, n=n)
        wall_v, rows_v = timed(decode_vorbis, n=n)
        wall_h, rows_h = timed(phash_webp, n=n)
        print(
            json.dumps(
                {
                    "m": m,
                    "assets_per_kind": 5000 * m,
                    "probe_wall_s": wall_p,
                    "probe_parsed": int(rows_p),
                    "decode_wall_s": wall_d,
                    "decode_decoded": int(rows_d),
                    "audio_wall_s": wall_a,
                    "audio_decoded": int(rows_a),
                    "webp_wall_s": wall_w,
                    "webp_decoded": int(rows_w),
                    "vorbis_wall_s": wall_v,
                    "vorbis_decoded": int(rows_v),
                    "phash_wall_s": wall_h,
                    "phash_hashed": int(rows_h),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
