"""Spec-built synthetic media encoders shared by tests, gates, and tools.

These are INDEPENDENT, public-spec-built encoders (WebP-VP8L, FLAC,
WAV/G.711/IMA-ADPCM, Ogg Vorbis) originally written alongside the
decoder round-trip tests: each encodes from the published format
specification (RFC 3533 + Vorbis I spec, FLAC format spec, WebP
lossless bitstream spec, G.711/IMA ADPCM references), NOT by mirroring
the decoders in ``vinum_spark.operators.multimodal`` / ``vorbis`` —
so round-trips cross-check two implementations of each spec.

They live in the package (not ``tests/``) because they are also the
asset generators for the corpus-scale benchmarks (``tools/scale_media.py``
builds 500k decodable assets with them inside executors) — importing
from ``tests/`` inside an executor would couple the cluster code path
to the repo checkout layout. The leading-underscore names are kept
verbatim from their test-suite origin so the round-trip pins, the
gate builders, and the tools all share one definition.

Reference for coverage parity: the reference engine ships no media
codecs at all (SURVEY.md section 2 scope ends at relational operators);
this module supports the multimodal extension family only.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "_Vp8lW", "_vp8l_wrap", "_vp8l_tree", "_vp8l_lz77_sym",
    "_vp8l_byte_tree", "_vp8l_emit_stream", "_vp8l_encode",
    "_tf_subtract_green", "_tf_predictor", "_tf_color", "_tf_palette",
    "_wav_bytes", "_G711_SEG_ENDS", "_mulaw_encode_scalar",
    "_alaw_encode_scalar", "_ima_encode",
    "_flac_bytes", "_FlacW", "_flac_rice_write", "_flac_write_subframe",
    "_flac_encode",
    "_VW", "_f32_pack", "_ogg_crc", "_ogg_page", "_ogg_stream",
    "_ident_packet", "_comment_packet", "_write_codebook",
    "_MONO_MULTS", "_MONO_VQ", "_mono_setup_packet", "_mono_audio_packet",
]


# ---------------------------------------------------------------------------
# WebP VP8L (lossless) encoder

class _Vp8lW:
    """LSB-first bit writer for the spec-built VP8L encoder."""

    def __init__(self):
        self.bits = []

    def w(self, val, k):
        self.bits.extend((int(val) >> i) & 1 for i in range(k))

    def code(self, c, ln):
        # prefix-code bits are served MSB-first within the LSB stream
        for j in range(ln - 1, -1, -1):
            self.bits.append((c >> j) & 1)

    def tobytes(self):
        import numpy as np

        while len(self.bits) % 8:
            self.bits.append(0)
        arr = np.array(self.bits, dtype=np.uint8).reshape(-1, 8)
        return bytes((arr << np.arange(8, dtype=np.uint8)).sum(axis=1)
                     .astype(np.uint8).tobytes())


def _vp8l_wrap(body_bits: "_Vp8lW", width: int, height: int,
               alpha_hint: int = 1) -> bytes:
    head = _Vp8lW()
    head.w(width - 1, 14)
    head.w(height - 1, 14)
    head.w(alpha_hint, 1)
    head.w(0, 3)  # version
    head.bits.extend(body_bits.bits)
    body = b"\x2f" + head.tobytes()
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    return (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP"
            + chunk)


def _vp8l_tree(w: "_Vp8lW", syms, alphabet_size: int):
    """Write one prefix code; returns sym -> (code, nbits). Simple form
    when possible (all syms < 256, n<=2), else the code-length-coded
    form with ALL coded symbols sharing length L (so 2^L symbols)."""
    syms = sorted(set(syms))
    if len(syms) == 1 and syms[0] < 256:
        w.w(1, 1)
        w.w(0, 1)
        if syms[0] <= 1:
            w.w(0, 1)
            w.w(syms[0], 1)
        else:
            w.w(1, 1)
            w.w(syms[0], 8)
        return {syms[0]: (0, 0)}
    if len(syms) == 2 and syms[1] < 256:
        w.w(1, 1)
        w.w(1, 1)
        if syms[0] <= 1:
            w.w(0, 1)
            w.w(syms[0], 1)
        else:
            w.w(1, 1)
            w.w(syms[0], 8)
        w.w(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    # general form, equal length L so the code is complete; pad with
    # unused symbols up to the next power of two
    L = (len(syms) - 1).bit_length()
    pad = 0
    while len(syms) < (1 << L):
        while pad in syms:
            pad += 1
        if pad >= alphabet_size:
            raise AssertionError("no pad symbol available")
        syms.append(pad)
        pad += 1
    syms = sorted(syms)
    assert len(syms) == 1 << L and L <= 3, (len(syms), L)
    num_codes = {1: 4, 2: 5, 3: 6}[L]
    w.w(0, 1)
    w.w(num_codes - 4, 4)
    order = (17, 18, 0, 1, 2, 3)
    coded_cl = {17, 18, 0, L}
    for i in range(num_codes):
        w.w(2 if order[i] in coded_cl else 0, 3)
    # emitted cl-symbol count = runs + literals; use the max_symbol
    # limit so no trailing zero-runs are needed
    emits = []
    i = 0
    for s in syms:
        gap = s - i
        while gap >= 11:
            run = min(gap, 138)
            if gap - run in (1, 2):
                run -= 3  # keep leftover expressible
            emits.append((18, run - 11, 7))
            gap -= run
        while gap >= 3:
            run = min(gap, 10)
            if gap - run in (1, 2) and run > 3:
                run -= gap - run
            emits.append((17, run - 3, 3))
            gap -= run
        for _ in range(gap):
            emits.append((0, None, 0))
        emits.append((L, None, 0))
        i = s + 1
    n_emit = len(emits)
    k = 0
    while (2 + 2 * k) < 32 and n_emit - 2 >= (1 << (2 + 2 * k)):
        k += 1
    w.w(1, 1)
    w.w(k, 3)
    w.w(n_emit - 2, 2 + 2 * k)
    cl_sorted = sorted(coded_cl)  # canonical: by symbol value
    cl_codes = {s: (idx, 2) for idx, s in enumerate(cl_sorted)}
    for sym, extra, ebits in emits:
        c, ln = cl_codes[sym]
        w.code(c, ln)
        if ebits:
            w.w(extra, ebits)
    return {s: (idx, L) for idx, s in enumerate(syms)}


def _vp8l_lz77_sym(value: int):
    """Inverse of the decoder's prefix-coded LZ77 value: value ->
    (symbol, extra_bits, extra_value)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    rest = v - (2 << extra)
    return 2 + 2 * extra + (rest >> extra), extra, rest & ((1 << extra) - 1)


def _vp8l_byte_tree(w, alphabet_size):
    """The trivial complete code: all 256 byte symbols at length 8
    (Kraft-complete), written through the code-length-code machinery —
    lets the encoder emit ARBITRARY images. Returns sym -> (code, 8)."""
    w.w(0, 1)  # not simple
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8)
    w.w(len(order) - 4, 4)
    for v in order:
        w.w(2 if v in (17, 18, 0, 8) else 0, 3)
    # one cl symbol '8' repeated via 16-run? simpler: emit '8' 256x is
    # wasteful; use sym 16 (repeat previous)? cl code here covers
    # {0, 8, 17, 18}: emit 8 then... 16 not coded, so emit 256 '8's.
    emits = [(8, None, 0)] * 256
    n_emit = len(emits)
    k = 0
    while (2 + 2 * k) < 32 and n_emit - 2 >= (1 << (2 + 2 * k)):
        k += 1
    w.w(1, 1)
    w.w(k, 3)
    w.w(n_emit - 2, 2 + 2 * k)
    cl_sorted = sorted((0, 8, 17, 18))
    cl_codes = {s: (idx, 2) for idx, s in enumerate(cl_sorted)}
    for sym, _, _ in emits:
        c, ln = cl_codes[sym]
        w.code(c, ln)
    return {s: (s, 8) for s in range(256)}


def _vp8l_emit_stream(w, tokens, full_byte=False):
    """Trees + token emission shared by the main image and transform
    sub-images (cache/meta bits are written by the caller). With
    ``full_byte`` every channel uses the trivial 8-bit tree, so any
    literal image encodes."""
    if full_byte:
        g_map = _vp8l_byte_tree(w, 256 + 24)
        r_map = _vp8l_byte_tree(w, 256)
        b_map = _vp8l_byte_tree(w, 256)
        a_map = _vp8l_byte_tree(w, 256)
        _vp8l_tree(w, {0}, 40)
        for tok in tokens:
            px = tok[1]
            w.code(*g_map[(px >> 8) & 0xFF])
            w.code(*r_map[(px >> 16) & 0xFF])
            w.code(*b_map[px & 0xFF])
            w.code(*a_map[(px >> 24) & 0xFF])
        return
    greens, reds, blues, alphas, dists = set(), set(), set(), set(), set()
    for tok in tokens:
        if tok[0] == "lit":
            px = tok[1]
            greens.add((px >> 8) & 0xFF)
            reds.add((px >> 16) & 0xFF)
            blues.add(px & 0xFF)
            alphas.add((px >> 24) & 0xFF)
        elif tok[0] == "copy":
            ls, _, _ = _vp8l_lz77_sym(tok[1])
            greens.add(256 + ls)
            ds, _, _ = _vp8l_lz77_sym(tok[2])
            dists.add(ds)
        else:
            greens.add(256 + 24 + tok[1])
    if not reds:
        reds = {0}
    if not blues:
        blues = {0}
    if not alphas:
        alphas = {0xFF}
    if not dists:
        dists = {0}
    g_map = _vp8l_tree(w, greens, 256 + 24)
    r_map = _vp8l_tree(w, reds, 256)
    b_map = _vp8l_tree(w, blues, 256)
    a_map = _vp8l_tree(w, alphas, 256)
    d_map = _vp8l_tree(w, dists, 40)
    for tok in tokens:
        if tok[0] == "lit":
            px = tok[1]
            w.code(*g_map[(px >> 8) & 0xFF])
            w.code(*r_map[(px >> 16) & 0xFF])
            w.code(*b_map[px & 0xFF])
            w.code(*a_map[(px >> 24) & 0xFF])
        elif tok[0] == "copy":
            ls, le, lv = _vp8l_lz77_sym(tok[1])
            w.code(*g_map[256 + ls])
            w.w(lv, le)
            ds, de, dv = _vp8l_lz77_sym(tok[2])
            w.code(*d_map[ds])
            w.w(dv, de)
        else:
            w.code(*g_map[256 + 24 + tok[1]])


def _vp8l_encode(tokens, width, height, transforms=(), full_byte=False):
    """Spec-built VP8L encoder (no color cache — the cache test builds
    its own stream). ``tokens`` is the literal/copy stream of the
    (transformed) image: ('lit', argb) or ('copy', length, dist_code).
    ``transforms`` is a list of callables emitting transform bits."""
    w = _Vp8lW()
    for tfn in transforms:
        w.w(1, 1)  # transform present
        tfn(w)
    w.w(0, 1)  # no more transforms
    w.w(0, 1)  # no color cache
    w.w(0, 1)  # no meta prefix codes
    _vp8l_emit_stream(w, tokens, full_byte=full_byte)
    return _vp8l_wrap(w, width, height)


def _tf_subtract_green(w):
    w.w(2, 2)


def _tf_predictor(mode, tile_bits=9):
    def f(w):
        w.w(0, 2)
        w.w(tile_bits - 2, 3)
        w.w(0, 1)  # tile sub-image: no color cache
        modes = mode if isinstance(mode, (list, tuple)) else [mode]
        _vp8l_emit_stream(
            w, [("lit", m << 8) for m in modes], full_byte=len(modes) > 1
        )

    return f


def _tf_color(g2r, g2b=None, r2b=None, tile_bits=9):
    elements = (g2r if isinstance(g2r, (list, tuple))
                else [(r2b << 16) | (g2b << 8) | g2r])

    def f(w):
        w.w(1, 2)
        w.w(tile_bits - 2, 3)
        w.w(0, 1)
        _vp8l_emit_stream(w, [("lit", el) for el in elements],
                          full_byte=len(elements) > 1)

    return f


def _tf_palette(entries):
    def f(w):
        w.w(3, 2)
        w.w(len(entries) - 1, 8)
        w.w(0, 1)  # palette sub-image: no color cache
        deltas = [entries[0]]
        for i in range(1, len(entries)):
            a, b = entries[i - 1], entries[i]
            deltas.append(
                (((b >> 24) - (a >> 24)) & 0xFF) << 24
                | ((((b >> 16) & 0xFF) - ((a >> 16) & 0xFF)) & 0xFF) << 16
                | ((((b >> 8) & 0xFF) - ((a >> 8) & 0xFF)) & 0xFF) << 8
                | (((b & 0xFF) - (a & 0xFF)) & 0xFF)
            )
        _vp8l_emit_stream(w, [("lit", d) for d in deltas])

    return f


# ---------------------------------------------------------------------------
# WAV container + G.711 + IMA ADPCM encoders

def _wav_bytes(payload, fmt_code, channels, rate, bits, block_align=None):
    byte_rate = rate * channels * bits // 8
    if block_align is None:
        block_align = channels * bits // 8
    return (
        b"RIFF" + (36 + len(payload)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + fmt_code.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
        + b"data" + len(payload).to_bytes(4, "little")
        + payload
    )


_G711_SEG_ENDS = (0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)


def _mulaw_encode_scalar(x: int) -> int:
    """Independent G.711 mu-law encoder (canonical segment-search form,
    public-domain Sun g711.c lineage) — NOT the decode-table path under
    test."""
    sign = 0x80 if x < 0 else 0
    if x < 0:
        x = -x
    x = min(x + 0x84, 0x7FFF)
    seg = next(s for s, end in enumerate(_G711_SEG_ENDS) if x <= end)
    return ~(sign | (seg << 4) | ((x >> (seg + 3)) & 0x0F)) & 0xFF


def _alaw_encode_scalar(x: int) -> int:
    """Independent G.711 A-law encoder (canonical 13-bit segment-search
    form; sign bit SET means positive, even bits inverted via 0x55)."""
    x >>= 3  # 16-bit -> 13-bit magnitude domain
    if x >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        x = -x - 1
    seg_ends = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)
    seg = next((s for s, end in enumerate(seg_ends) if x <= end), 8)
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (x >> 1) & 0x0F if seg < 2 else (x >> seg) & 0x0F
    return aval ^ mask


def _ima_encode(samples, channels, block_align, return_recon=False):
    """Independent spec-built IMA ADPCM encoder (mono or stereo):
    4-byte per-channel block headers, low-nibble-first packing,
    4-byte-word round-robin channel interleave. With ``return_recon``
    also returns the encoder's own reconstructed sample sequence —
    the decoder shares the recurrence, so decode must match it
    EXACTLY."""
    import numpy as np

    from vinum_spark.operators.multimodal import _IMA_INDEX_ADJ, _IMA_STEPS

    head = 4 * channels
    spb = (block_align - head) * 2 // channels + 1  # samples per block
    frames = np.asarray(samples, dtype=int).reshape(-1, channels)
    out = bytearray()
    recon = []
    index = [0] * channels
    for b0 in range(0, len(frames), spb):
        blk = frames[b0 : b0 + spb]
        if len(blk) < spb:
            break  # encoder emits full blocks only
        preds = [int(blk[0, c]) for c in range(channels)]
        for c in range(channels):
            out += int(preds[c]).to_bytes(2, "little", signed=True)
            out += bytes([index[c], 0])
        nibs = [[] for _ in range(channels)]
        blk_recon = [[p] for p in preds]
        for c in range(channels):
            pred = preds[c]
            for v in blk[1:, c]:
                step = int(_IMA_STEPS[index[c]])
                delta = int(v) - pred
                nib = 0x8 if delta < 0 else 0
                delta = abs(delta)
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = min(max(pred + (-diff if nib & 8 else diff), -32768),
                           32767)
                index[c] = min(max(index[c] + int(_IMA_INDEX_ADJ[nib & 7]),
                                   0), 88)
                nibs[c].append(nib)
                blk_recon[c].append(pred)
        recon.extend(
            np.stack([np.asarray(r) for r in blk_recon], axis=1).ravel()
        )
        # pack: per channel 8 nibbles -> 4 bytes, words round-robin
        words = [
            bytes(
                (nibs[c][i + 2 * j] | (nibs[c][i + 2 * j + 1] << 4))
                for j in range(4)
            )
            for i in range(0, len(nibs[0]), 8)
            for c in range(channels)
        ]
        out += b"".join(words)
    if return_recon:
        return bytes(out), np.asarray(recon, dtype="float64") / 32768.0
    return bytes(out)


# ---------------------------------------------------------------------------
# FLAC encoder

def _flac_bytes(rate=44100, channels=2, bits=16, total=88200):
    b = bytearray(34)
    b[10] = (rate >> 12) & 0xFF
    b[11] = (rate >> 4) & 0xFF
    b[12] = ((rate & 0xF) << 4) | ((channels - 1) << 1) | ((bits - 1) >> 4)
    b[13] = (((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    b[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(b)


class _FlacW:
    """MSB-first bit writer for the spec-built FLAC encoder."""

    def __init__(self):
        self.bits = []

    def w(self, val, k):
        self.bits.extend((int(val) >> (k - 1 - i)) & 1 for i in range(k))

    def signed(self, val, k):
        self.w(int(val) & ((1 << k) - 1), k)

    def unary(self, q):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self):
        import numpy as np

        self.align()
        return np.packbits(np.array(self.bits, dtype=np.uint8)).tobytes()


def _flac_rice_write(w, resid, param, escape=False, pbits=4):
    esc = (1 << pbits) - 1
    if escape:
        w.w(esc, pbits)
        raw = max(
            (int(r).bit_length() + 1 for r in resid), default=1
        )
        w.w(raw, 5)
        for r in resid:
            w.signed(r, raw)
        return
    w.w(param, pbits)
    for r in resid:
        z = (int(r) << 1) ^ (int(r) >> 63)
        w.unary(z >> param)
        w.w(z & ((1 << param) - 1), param)


def _flac_write_subframe(w, samples, bps, mode, lpc=None, wasted=0,
                         escape=False, po=0):
    """One subframe in the requested shape. ``samples`` are final
    (already including any wasted-bit shift)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    w.w(0, 1)  # pad
    ebps = bps - wasted
    if mode == "constant":
        w.w(0, 6)
    elif mode == "verbatim":
        w.w(1, 6)
    elif mode.startswith("fixed"):
        w.w(8 + int(mode[5]), 6)
    elif mode == "lpc":
        w.w(32 + len(lpc[0]) - 1, 6)
    if wasted:
        w.w(1, 1)
        w.unary(wasted - 1)
        s = s >> wasted
    else:
        w.w(0, 1)
    if mode == "constant":
        w.signed(s[0], ebps)
        return
    if mode == "verbatim":
        for v in s:
            w.signed(v, ebps)
        return
    if mode.startswith("fixed"):
        order = int(mode[5])
        for v in s[:order]:
            w.signed(v, ebps)
        resid = np.diff(s, n=order) if order else s
    else:  # lpc
        coefs, shift, prec = lpc
        order = len(coefs)
        for v in s[:order]:
            w.signed(v, ebps)
        w.w(prec - 1, 4)
        w.signed(shift, 5)
        for c in coefs:
            w.signed(c, prec)
        resid = [
            int(s[i]) - (sum(c * int(s[i - 1 - j])
                             for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(s))
        ]
    # residual section: method 0 (4-bit params), partition order po
    w.w(0, 2)
    w.w(po, 4)
    nparts = 1 << po
    blocksize = len(s)
    assert blocksize % nparts == 0
    start = 0
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        part = list(resid[start : start + cnt])
        start += cnt
        zmax = max((abs(int(r)) * 2 for r in part), default=0)
        param = max(0, zmax.bit_length() - 3)
        if mode == "lpc" and lpc is None:
            param = 0
        _flac_rice_write(w, part, min(param, 14), escape=escape)
        # LPC subframe header pieces were written above for lpc mode
    return


def _flac_encode(frames, rate=8000, bits=16, blocksize=192, mode="fixed2",
                 stereo=None, lpc=None, wasted=0, escape=False, po=0):
    """Independent spec-built FLAC encoder: STREAMINFO + fixed-blocking
    frames (8-bit uncommon blocksize header), one subframe shape per
    call. ``frames`` is (n,) mono or (n, 2) stereo int samples."""
    import numpy as np

    s = np.asarray(frames, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    out = bytearray(_flac_bytes(rate=rate, channels=channels, bits=bits,
                                total=n))
    idx = 0
    for b0 in range(0, n, blocksize):
        blk = s[b0 : b0 + blocksize]
        w = _FlacW()
        w.w(0x3FFE, 14)
        w.w(0, 1)
        w.w(0, 1)  # fixed blocking
        w.w(6, 4)  # 8-bit uncommon blocksize follows
        w.w(0, 4)  # rate from streaminfo
        if stereo is None:
            w.w(channels - 1, 4)
        else:
            w.w({"leftside": 8, "rightside": 9, "midside": 10}[stereo], 4)
        w.w({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits], 3)
        w.w(0, 1)
        assert idx < 128
        w.w(idx, 8)  # UTF-8 coded frame number (single byte)
        w.w(len(blk) - 1, 8)
        w.w(0, 8)  # CRC-8 (decoder does not validate)
        if stereo is None:
            for c in range(channels):
                _flac_write_subframe(w, blk[:, c], bits, mode, lpc=lpc,
                                     wasted=wasted, escape=escape, po=po)
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo == "leftside":
                subs = [(left, bits), (side, bits + 1)]
            elif stereo == "rightside":
                subs = [(side, bits + 1), (right, bits)]
            else:
                subs = [((left + right) >> 1, bits), (side, bits + 1)]
            for vals, w_bits in subs:
                _flac_write_subframe(w, vals, w_bits, mode, lpc=lpc, po=po)
        w.align()
        w.w(0, 16)  # CRC-16 (decoder does not validate)
        out += w.tobytes()
        idx += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Ogg Vorbis encoder (mono one-book configuration)

class _VW:
    """LSB-first bit writer (Vorbis bitpacking convention)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, val, k):
        self.acc |= (int(val) & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, code, length):
        """Huffman codeword: MSB of the canonical code goes first."""
        for i in range(length - 1, -1, -1):
            self.w((code >> i) & 1, 1)

    def bytes(self):
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


def _f32_pack(x: float) -> int:
    if x == 0.0:
        return 0
    sign = 0
    if x < 0:
        sign = 0x80000000
        x = -x
    f, e = math.frexp(x)  # x = f * 2**e, f in [0.5, 1)
    mant = int(round(f * (1 << 21)))
    assert mant <= 0x1FFFFF
    return sign | ((e - 21 + 788) << 21) | mant


_CRC_TBL = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _CRC_TBL.append(_r & 0xFFFFFFFF)


def _ogg_crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TBL[((r >> 24) & 0xFF) ^ b]
    return r


def _ogg_page(packet_chunks, granule, serial, seq, htype):
    """One page: packet_chunks is a list of (bytes, complete) where
    complete=False means the packet continues on the next page."""
    lacing = bytearray()
    body = bytearray()
    for data, complete in packet_chunks:
        q, r = divmod(len(data), 255)
        lacing += b"\xff" * q
        if complete:
            lacing.append(r)
        else:
            assert r == 0, "continued chunk must be a multiple of 255"
        body += data
    assert len(lacing) <= 255
    hdr = bytearray(b"OggS\x00")
    hdr.append(htype)
    hdr += int(granule).to_bytes(8, "little", signed=True)
    hdr += int(serial).to_bytes(4, "little")
    hdr += int(seq).to_bytes(4, "little")
    hdr += b"\x00\x00\x00\x00"  # CRC placeholder
    hdr.append(len(lacing))
    hdr += lacing
    page = bytes(hdr) + bytes(body)
    crc = _ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def _ogg_stream(packets, granule, serial=0x1234, audio_page_split=None):
    """Standard layout: BOS page [ident], page [comment, setup], then
    audio packets. audio_page_split forces a page break after that many
    audio packets (continued-packet paging is exercised separately)."""
    pages = [
        _ogg_page([(packets[0], True)], 0, serial, 0, 0x02),
        _ogg_page([(packets[1], True), (packets[2], True)], 0, serial, 1, 0),
    ]
    audio = packets[3:]
    groups = (
        [audio]
        if audio_page_split is None
        else [audio[:audio_page_split], audio[audio_page_split:]]
    )
    seq = 2
    for gi, grp in enumerate(groups):
        last = gi == len(groups) - 1
        pages.append(
            _ogg_page(
                [(p, True) for p in grp],
                granule if last else -1,
                serial,
                seq,
                0x04 if last else 0,
            )
        )
        seq += 1
    return b"".join(pages)


def _ident_packet(channels, rate, log_bs0, log_bs1):
    w = _VW()
    w.w(0, 32)
    w.w(channels, 8)
    w.w(rate, 32)
    w.w(0, 32), w.w(0, 32), w.w(0, 32)
    w.w(log_bs0, 4)
    w.w(log_bs1, 4)
    w.w(1, 1)
    return b"\x01vorbis" + w.bytes()


def _comment_packet(vendor=b"test"):
    w = _VW()
    w.w(len(vendor), 32)
    for b in vendor:
        w.w(b, 8)
    w.w(0, 32)  # zero user comments
    w.w(1, 1)
    return b"\x03vorbis" + w.bytes()


def _write_codebook(w, dim, lengths, lookup=0, minv=0.0, delta=0.0,
                    value_bits=0, seq=0, mults=()):
    w.w(0x564342, 24)
    w.w(dim, 16)
    w.w(len(lengths), 24)
    w.w(0, 1)  # unordered
    w.w(0, 1)  # not sparse
    for l in lengths:
        w.w(l - 1, 5)
    w.w(lookup, 4)
    if lookup:
        w.w(_f32_pack(minv), 32)
        w.w(_f32_pack(delta), 32)
        w.w(value_bits - 1, 4)
        w.w(seq, 1)
        for m in mults:
            w.w(m, value_bits)


# --- mono configuration (one book pass, flat floor, residue type 1) -------

_MONO_MULTS = [(7 * j + 3) % 16 for j in range(64)]
_MONO_VQ = (np.array(_MONO_MULTS, dtype=np.float64).reshape(16, 4)
            * 0.25 - 2.0)


def _mono_setup_packet(rtype=1):
    w = _VW()
    w.w(1, 8)  # 2 codebooks
    _write_codebook(w, 1, [1])  # book0: classbook, single entry
    _write_codebook(w, 4, [4] * 16, lookup=2, minv=-2.0, delta=0.25,
                    value_bits=4, mults=_MONO_MULTS)
    w.w(0, 6)  # 1 time transform
    w.w(0, 16)
    w.w(0, 6)  # 1 floor
    w.w(1, 16)  # floor type 1
    w.w(1, 5)  # 1 partition
    w.w(0, 4)  # partition class 0
    w.w(1, 3)  # class 0 dims = 2
    w.w(0, 2)  # class 0 subs = 0
    w.w(0, 8)  # subbook: unused (0 -> None)
    w.w(0, 2)  # multiplier 1
    w.w(8, 4)  # rangebits 8 -> xs [0, 256]
    w.w(64, 8)  # extra X points (amplitude 0 -> excluded from render)
    w.w(192, 8)
    w.w(0, 6)  # 1 residue
    w.w(rtype, 16)  # residue type (1 default; 0 shares packet shape)
    w.w(0, 24)  # begin
    w.w(128, 24)  # end
    w.w(7, 24)  # psize 8
    w.w(0, 6)  # 1 classification
    w.w(0, 8)  # classbook 0
    w.w(1, 3)  # cascade low bits: pass 0 set
    w.w(0, 1)  # no high bits
    w.w(1, 8)  # pass-0 book = 1
    w.w(0, 6)  # 1 mapping
    w.w(0, 16)  # type 0
    w.w(0, 1)  # 1 submap
    w.w(0, 1)  # no coupling
    w.w(0, 2)  # reserved
    w.w(0, 8)  # time config (unused)
    w.w(0, 8)  # floor 0
    w.w(0, 8)  # residue 0
    w.w(0, 6)  # 1 mode
    w.w(0, 1)  # blockflag 0
    w.w(0, 16)
    w.w(0, 16)
    w.w(0, 8)  # mapping 0
    w.w(1, 1)  # framing
    return b"\x05vorbis" + w.bytes()


def _mono_audio_packet(seed):
    """One mono audio packet; returns (bytes, resid_vector, (y0, y1)).
    The floor is SLOPED (y0 != y1) and its X span (256) exceeds n2
    (128), so the Bresenham render's slope must come from the full
    x-extent, not a clamped one."""
    y0 = 140 + (seed % 30)
    y1 = 80 + (seed * 7) % 50
    entries = [(seed * 31 + t * 5 + 3) % 16 for t in range(32)]
    w = _VW()
    w.w(0, 1)  # audio packet
    # floor channel 0: nonzero, y0, y1 (8 bits each at range 256)
    w.w(1, 1)
    w.w(y0, 8)
    w.w(y1, 8)
    # residue: 16 partitions x (1 classword bit + 2 book-1 codewords)
    t = 0
    resid = np.zeros(128)
    for pc in range(16):
        w.w(0, 1)  # single-entry classbook: value ignored, 1 bit long
        for half in range(2):
            e = entries[t]
            t += 1
            w.code(e, 4)  # equal-length book: code == entry
            off = pc * 8 + half * 4
            resid[off : off + 4] += _MONO_VQ[e]
    return w.bytes(), resid, (y0, y1)


# ---------------------------------------------------------------------------
# BMP encoder (uncompressed BI_RGB)


def _bmp_bytes(arr, bpp=24, top_down=False, palette=None):
    """Uncompressed BMP (BITMAPINFOHEADER, BI_RGB). ``arr`` is a
    (h, w) palette-index array when ``bpp == 8`` (with ``palette`` a
    list of (r, g, b)), a (h, w, 3) RGB array for 24-bit, or a
    (h, w, 4) RGBA array for 32-bit. Rows are padded to 4 bytes and
    written bottom-up unless ``top_down``."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    stride = (w * bpp // 8 + 3) & ~3
    pal_bytes = b""
    if bpp == 8:
        rows = a
        pal_bytes = b"".join(
            bytes([b_, g_, r_, 0]) for r_, g_, b_ in palette
        )
    elif bpp == 24:
        rows = a[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    else:
        rows = a[:, :, [2, 1, 0, 3]].reshape(h, w * 4)  # RGBA -> BGRA
    raster = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bytes(rows[y])
        raster += row + b"\x00" * (stride - len(row))
    off = 14 + 40 + len(pal_bytes)
    hdr = (
        b"BM" + (off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00" + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h if top_down else h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (len(palette) if palette else 0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return hdr + pal_bytes + bytes(raster)
