"""Ogg Vorbis decoder tests: spec-built encoder -> exact round-trip.

The encoder here is written against the public Xiph.org Vorbis I
specification and RFC 3533, like the FLAC/JPEG/VP8L encoders in
test_multimodal.py. The round-trip expectation is computed by
INDEPENDENT naive implementations (direct cosine-sum IMDCT, scalar
Bresenham floor render, scalar coupling, spec window formula), so the
decoder's FFT/vectorized paths are cross-checked rather than mirrored.
The canonical Huffman codeword assignment is pinned against the spec
Section 3.2.1 worked example before the encoder is allowed to reuse it.
"""

import math

import numpy as np
import pytest
from vinum_spark.operators.media_synth import (  # shared spec-built encoder
    _MONO_MULTS,
    _MONO_VQ,
    _VW,
    _comment_packet,
    _f32_pack,
    _ident_packet,
    _mono_audio_packet,
    _mono_setup_packet,
    _ogg_crc,
    _ogg_page,
    _ogg_stream,
    _write_codebook,
)

from vinum_spark.operators.vorbis import (
    _INVERSE_DB,
    _assign_codewords,
    _float32_unpack,
    _imdct,
    _lookup1_values,
    _ogg_packets,
    vorbis_pcm_samples,
)


# ---------------------------------------------------------------------------
# Primitive pins


def test_assign_codewords_spec_example():
    # Vorbis I spec section 3.2.1 worked example: lengths
    # [2,4,4,4,4,2,3,3] -> codewords 00,0100,0101,0110,0111,10,110,111
    codes = _assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    want = {
        0: (0b00, 2),
        1: (0b0100, 4),
        2: (0b0101, 4),
        3: (0b0110, 4),
        4: (0b0111, 4),
        5: (0b10, 2),
        6: (0b110, 3),
        7: (0b111, 3),
    }
    assert codes == want


def test_assign_codewords_validation():
    import vinum_spark.operators.vorbis as V

    with pytest.raises(V._VorbisError):
        _assign_codewords([1, 1, 1])  # overspecified
    with pytest.raises(V._VorbisError):
        _assign_codewords([2, 2, 2])  # underspecified
    # single used entry: codeword 0 at its declared length
    assert _assign_codewords([None, 3, None]) == {1: (0, 3)}
    # equal lengths assign sequential codes (relied on by the q84
    # builder's inline encoder)
    eq = _assign_codewords([4] * 16)
    assert all(eq[e] == (e, 4) for e in range(16))


def test_float32_pack_unpack_roundtrip():
    for x in (0.25, -2.0, 1.0, -0.0078125, 3.5, -10.0):
        assert _float32_unpack(_f32_pack(x)) == x


def test_lookup1_values():
    assert _lookup1_values(16, 4) == 2
    assert _lookup1_values(8, 2) == 2
    assert _lookup1_values(9, 2) == 3
    assert _lookup1_values(1, 1) == 1


def _imdct_direct(X, n):
    """Direct cosine-sum IMDCT per the spec transform definition."""
    j = np.arange(n)[:, None]
    k = np.arange(n // 2)[None, :]
    c = np.cos(np.pi / (4.0 * n) * (2 * j + 1 + n // 2) * (2 * k + 1))
    return (np.asarray(X)[None, :] * c).sum(axis=1)


def test_imdct_matches_direct_cosine():
    rng = np.random.RandomState(7)
    for n in (64, 256, 2048):
        X = rng.standard_normal(n // 2)
        got = _imdct(X, n)
        want = _imdct_direct(X, n)
        assert np.allclose(got, want, atol=1e-9)


# ---------------------------------------------------------------------------
# Encoder: bit writer, Ogg paging, setup/audio packet construction


def _vorbis_window(n, left_start, left_size, right_start, right_size):
    w = np.zeros(n)
    for i in range(left_size):
        w[left_start + i] = math.sin(
            0.5 * math.pi * math.sin((i + 0.5) / left_size * 0.5 * math.pi) ** 2
        )
    for i in range(left_start + left_size, right_start):
        w[i] = 1.0
    for i in range(right_size):
        w[right_start + i] = math.sin(
            0.5 * math.pi
            * math.sin((i + 0.5) / right_size * 0.5 * math.pi
                       + 0.5 * math.pi) ** 2
        )
    return w


def _render_line_naive(x0, y0, x1, y1, n2):
    """Scalar spec-pseudocode render_line over [x0, min(x1, n2))."""
    out = {}
    dy = y1 - y0
    adx = x1 - x0
    base = abs(dy) // adx
    if dy < 0:
        base = -base
    sy = base - 1 if dy < 0 else base + 1
    ady = abs(dy) - abs(base) * adx
    if x0 < n2:
        out[x0] = y0
    err = 0
    y = y0
    for x in range(x0 + 1, min(x1, n2)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        out[x] = y
    return out


def _mono_floor_curve(y0, y1, n2=128):
    """Naive expected floor curve: one line (0,y0)->(256,y1), range
    256, multiplier 1, rendered with the scalar spec pseudocode."""
    pts = _render_line_naive(0, y0, 256, y1, n2)
    ys = np.array([pts[x] for x in range(n2)])
    return 10.0 ** ((np.clip(ys, 0, 255) - 255) * (7.0 / 256.0))


def _mono_stream(n_packets=6, granule=None, rate=8000,
                 audio_page_split=None):
    packets = [_ident_packet(1, rate, 8, 8), _comment_packet(),
               _mono_setup_packet()]
    blocks = []
    for s in range(n_packets):
        pkt, resid, ypair = _mono_audio_packet(s)
        packets.append(pkt)
        blocks.append((resid, ypair))
    full = 128 * (n_packets - 1)
    g = full if granule is None else granule
    data = _ogg_stream(packets, g, audio_page_split=audio_page_split)
    # independent expected PCM: naive sloped floor render,
    # direct-cosine IMDCT, spec window, overlap-add at 128-sample hops
    acc = np.zeros(128 * (n_packets + 1))
    win = _vorbis_window(256, 0, 128, 128, 128)
    for t, (resid, (y0, y1)) in enumerate(blocks):
        spectrum = resid * _mono_floor_curve(y0, y1)
        acc[128 * t : 128 * t + 256] += _imdct_direct(spectrum, 256) * win
    expected = acc[128 : 128 + min(full, g)]
    return data, expected, rate


def test_mono_roundtrip_exact():
    data, expected, rate = _mono_stream()
    out = vorbis_pcm_samples(data)
    assert out is not None
    samples, ch, got_rate, label = out
    assert (ch, got_rate, label) == (1, rate, "vorbis-pcm")
    assert samples.shape == expected.shape
    assert np.allclose(samples, expected, atol=1e-8)
    assert float(np.abs(expected).max()) > 1e-4  # non-silent stream


def test_mono_granule_trim():
    data, expected, _ = _mono_stream(granule=500)
    out = vorbis_pcm_samples(data)
    assert out is not None
    assert out[0].shape == (500,)
    assert np.allclose(out[0], expected, atol=1e-8)


def test_mono_multi_page():
    data, expected, _ = _mono_stream(n_packets=8, audio_page_split=3)
    out = vorbis_pcm_samples(data)
    assert out is not None
    assert np.allclose(out[0], expected, atol=1e-8)


def test_ogg_continued_packet_reassembly():
    # force a packet to straddle a page boundary: the first 255 bytes
    # on one page (lacing 255, no terminator), the rest on a continued
    # page (htype 0x01)
    packets = [_ident_packet(1, 8000, 8, 8), _comment_packet(b"v" * 300),
               _mono_setup_packet()]
    comment = packets[1]
    assert len(comment) > 255
    pages = [
        _ogg_page([(packets[0], True)], 0, 9, 0, 0x02),
        _ogg_page([(comment[:255], False)], -1, 9, 1, 0),
        _ogg_page([(comment[255:], True), (packets[2], True)], 0, 9, 2,
                  0x05),
    ]
    got, granule = _ogg_packets(b"".join(pages))
    assert got == packets
    assert granule == 0


def test_ogg_second_stream_ignored():
    data, expected, _ = _mono_stream()
    # splice an alien-serial page between the header and audio pages
    alien = _ogg_page([(b"\x01other", True)], 0, 0xDEAD, 0, 0x02)
    # pages of our stream: find the third page start by walking
    packets_before = data
    # simplest: rebuild with the alien page appended at the very end
    out = vorbis_pcm_samples(packets_before + alien)
    assert out is not None
    assert np.allclose(out[0], expected, atol=1e-8)


# ---------------------------------------------------------------------------
# Hostile input: never raises, never hangs


def test_fuzz_truncation_and_flips():
    data, _, _ = _mono_stream()
    for cut in range(0, len(data), 7):
        r = vorbis_pcm_samples(data[:cut])
        assert r is None or np.isfinite(r[0]).all()
    rng = np.random.RandomState(11)
    for _ in range(150):
        buf = bytearray(data)
        for _ in range(rng.randint(1, 6)):
            buf[rng.randint(len(buf))] = rng.randint(256)
        r = vorbis_pcm_samples(bytes(buf))
        assert r is None or np.isfinite(r[0]).all()


def test_fuzz_random_bytes():
    rng = np.random.RandomState(5)
    for _ in range(60):
        blob = rng.bytes(rng.randint(1, 400))
        for payload in (b"OggS" + blob, blob):
            r = vorbis_pcm_samples(payload)
            assert r is None or np.isfinite(r[0]).all()


def test_hostile_dim0_lookup_codebook_returns_none():
    # a setup header declaring a VQ codebook with dimensions=0 used to
    # spin _lookup1_values forever (code-review confirmed hang): the
    # parse must reject it and the decode degrade to None
    w = _VW()
    w.w(0, 8)  # 1 codebook
    w.w(0x564342, 24)
    w.w(0, 16)  # dim 0
    w.w(1, 24)  # 1 entry
    w.w(0, 1), w.w(0, 1), w.w(0, 5)  # unordered, len 1
    w.w(1, 4)  # lookup type 1 -> _lookup1_values(1, 0)
    w.w(0, 32), w.w(0, 32), w.w(0, 4), w.w(0, 1)
    setup = b"\x05vorbis" + w.bytes()
    packets = [_ident_packet(1, 8000, 8, 8), _comment_packet(), setup,
               b"\x00" * 4]
    assert vorbis_pcm_samples(_ogg_stream(packets, 128)) is None


# ---------------------------------------------------------------------------
# Residue type 0 (same packet bytes as type 1, different placement)


def test_mono_residue_type0():
    # identical setup except residue type 0: per partition the book's
    # dim-4 vectors scatter with stride step = psize/dim = 2
    packets = [_ident_packet(1, 8000, 8, 8), _comment_packet(),
               _mono_setup_packet(rtype=0)]
    blocks = []
    for s in range(5):
        pkt, _, ypair = _mono_audio_packet(s)
        packets.append(pkt)
        # recompute expected placement for type 0
        entries = [(s * 31 + t * 5 + 3) % 16 for t in range(32)]
        resid = np.zeros(128)
        t = 0
        for pc in range(16):
            for half in range(2):
                e = entries[t]
                t += 1
                resid[pc * 8 + half : pc * 8 + half + 8 : 2] += _MONO_VQ[e]
        blocks.append((resid, ypair))
    data = _ogg_stream(packets, 128 * 4)
    acc = np.zeros(128 * 6)
    win = _vorbis_window(256, 0, 128, 128, 128)
    for t, (resid, (y0, y1)) in enumerate(blocks):
        spectrum = resid * _mono_floor_curve(y0, y1)
        acc[128 * t : 128 * t + 256] += _imdct_direct(spectrum, 256) * win
    out = vorbis_pcm_samples(data)
    assert out is not None and out[3] == "vorbis-pcm"
    assert np.allclose(out[0], acc[128 : 128 * 5], atol=1e-8)


# ---------------------------------------------------------------------------
# Stereo, block switching, coupling, rich floors (configuration B)

_B_RNG = 128  # floor range at multiplier 2
_B_XS = [0, 128, 16, 32, 48, 64, 96]
_B_L1 = [2, 2, 3, 3, 3, 4, 5, 5]  # pass-0 book, Kraft sum exactly 1
_B_COMB = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 12]  # slow-path book
_B_MULTS2 = [(j * 5 + 1) % 8 for j in range(52)]
_B_MB_LENS = [1, 2, 3, 3]


def _b_vq1():
    """Book 1 value table: lookup type 1, l1v=2, mults [0,2],
    minv=-1, delta=1, sequence_p folds into a cumsum."""
    mults = np.array([0.0, 2.0])
    vq = np.zeros((8, 2))
    for e in range(8):
        vq[e, 0] = mults[e % 2] - 1.0
        vq[e, 1] = mults[(e // 2) % 2] - 1.0
    return np.cumsum(vq, axis=1)


def _b_vq2():
    return (np.array(_B_MULTS2, dtype=np.float64).reshape(13, 4)
            * 0.25 - 0.75)


_B_VQ1 = _b_vq1()
_B_VQ2 = _b_vq2()


def _b_setup_packet():
    w = _VW()
    w.w(5, 8)  # 6 codebooks
    _write_codebook(w, 2, [2, 2, 2, 2])  # 0: residue classbook
    _write_codebook(w, 2, _B_L1, lookup=1, minv=-1.0, delta=1.0,
                    value_bits=2, seq=1, mults=[0, 2])  # 1: pass-0 VQ
    _write_codebook(w, 4, _B_COMB, lookup=2, minv=-0.75, delta=0.25,
                    value_bits=3, mults=_B_MULTS2)  # 2: pass-1 VQ
    _write_codebook(w, 1, _B_MB_LENS)  # 3: floor masterbook
    _write_codebook(w, 1, [7] * 128)  # 4: floor subbook A
    _write_codebook(w, 1, [6] * 64)  # 5: floor subbook B
    w.w(0, 6)
    w.w(0, 16)  # 1 time transform
    w.w(0, 6)  # 1 floor
    w.w(1, 16)  # type 1
    w.w(2, 5)  # 2 partitions
    w.w(0, 4)  # partition 0 -> class 0
    w.w(1, 4)  # partition 1 -> class 1
    # class 0: dims 2, no subclasses, subbook A
    w.w(1, 3)
    w.w(0, 2)
    w.w(5, 8)  # book 4 (written +1)
    # class 1: dims 3, 1 subclass bit, masterbook 3, subbooks A/B
    w.w(2, 3)
    w.w(1, 2)
    w.w(3, 8)
    w.w(5, 8)
    w.w(6, 8)
    w.w(1, 2)  # multiplier 2
    w.w(7, 4)  # rangebits 7 -> xs [0, 128]
    for x in _B_XS[2:]:
        w.w(x, 7)
    w.w(0, 6)  # 1 residue
    w.w(2, 16)  # type 2
    w.w(0, 24)  # begin
    w.w(1024, 24)  # end
    w.w(15, 24)  # psize 16
    w.w(1, 6)  # 2 classifications
    w.w(0, 8)  # classbook 0
    w.w(1, 3)
    w.w(0, 1)  # class 0 cascade: pass 0
    w.w(3, 3)
    w.w(0, 1)  # class 1 cascade: passes 0,1
    w.w(1, 8)  # class 0 pass-0 book = 1 (raw index, no +1 here)
    w.w(1, 8), w.w(2, 8)  # class 1 pass-0/1 books = 1, 2
    w.w(0, 6)  # 1 mapping
    w.w(0, 16)
    w.w(0, 1)  # 1 submap
    w.w(1, 1)  # coupling present
    w.w(0, 8)  # 1 step
    w.w(0, 1)  # magnitude channel 0
    w.w(1, 1)  # angle channel 1
    w.w(0, 2)  # reserved
    w.w(0, 8)
    w.w(0, 8)
    w.w(0, 8)  # submap: floor 0, residue 0
    w.w(1, 6)  # 2 modes
    w.w(0, 1)
    w.w(0, 16)
    w.w(0, 16)
    w.w(0, 8)  # mode 0: short
    w.w(1, 1)
    w.w(0, 16)
    w.w(0, 16)
    w.w(0, 8)  # mode 1: long
    w.w(1, 1)  # framing
    return b"\x05vorbis" + w.bytes()


def _render_point_naive(x0, y0, x1, y1, x):
    dy = y1 - y0
    adx = x1 - x0
    off = abs(dy) * (x - x0) // adx
    return y0 - off if dy < 0 else y0 + off


def _floor_vals_from_finals(xs, finals):
    """Invert the spec's floor1 amplitude synthesis: desired final_Y
    -> transmitted vals, exercising both the parity and the >=room
    escape encodings. Forward-checks every point."""
    vals = [finals[0], finals[1]]
    step2 = [True, True] + [False] * (len(xs) - 2)
    for i in range(2, len(xs)):
        lo = hi = None
        for j in range(i):
            if xs[j] < xs[i] and (lo is None or xs[j] > xs[lo]):
                lo = j
            if xs[j] > xs[i] and (hi is None or xs[j] < xs[hi]):
                hi = j
        pred = _render_point_naive(xs[lo], finals[lo], xs[hi], finals[hi],
                                   xs[i])
        want = finals[i]
        highroom = _B_RNG - pred
        lowroom = pred
        room = 2 * min(highroom, lowroom)
        diff = want - pred
        if diff == 0:
            val = 0
        elif diff > 0:
            val = 2 * diff if 2 * diff < room else (
                diff + lowroom if highroom > lowroom else None)
        else:
            v = 2 * (-diff) - 1
            val = v if v < room else (
                pred + highroom - 1 - want if highroom <= lowroom else None)
        assert val is not None, (i, pred, want)
        # forward check (decoder synthesis logic)
        if val:
            if val >= room:
                dec = (val - lowroom + pred if highroom > lowroom
                       else pred - val + highroom - 1)
            elif val & 1:
                dec = pred - ((val + 1) >> 1)
            else:
                dec = pred + (val >> 1)
            assert dec == want, (i, val, dec, want)
            step2[i] = step2[lo] = step2[hi] = True
        else:
            assert pred == want
        vals.append(val)
    return vals, step2


def _floor_curve_naive(xs, finals, step2, mult, n2):
    pts = sorted((xs[i], finals[i] * mult)
                 for i in range(len(xs)) if step2[i])
    yv = np.zeros(n2, dtype=np.int64)
    x0, y0 = pts[0]
    for x1, y1 in pts[1:]:
        for x, y in _render_line_naive(x0, y0, x1, y1, n2).items():
            yv[x] = y
        x0, y0 = x1, y1
    if x0 < n2:
        yv[x0:] = y0
    return 10.0 ** ((np.clip(yv, 0, 255) - 255) * (7.0 / 256.0))


_B_CODES_MB = None
_B_CODES_1 = None
_B_CODES_2 = None


def _b_codes():
    global _B_CODES_MB, _B_CODES_1, _B_CODES_2
    if _B_CODES_MB is None:
        _B_CODES_MB = _assign_codewords(_B_MB_LENS)
        _B_CODES_1 = _assign_codewords(_B_L1)
        _B_CODES_2 = _assign_codewords(_B_COMB)
    return _B_CODES_MB, _B_CODES_1, _B_CODES_2


def _b_encode_floor(w, finals):
    """Encode one channel's floor; returns (vals, step2)."""
    mb_codes, _, _ = _b_codes()
    vals, step2 = _floor_vals_from_finals(_B_XS, finals)
    w.w(1, 1)  # nonzero
    w.w(finals[0], 7)
    w.w(finals[1], 7)
    # partition 0 (class 0, no subclasses): dims 2 from subbook A
    assert vals[2] < 128 and vals[3] < 128
    w.code(vals[2], 7)
    w.code(vals[3], 7)
    # partition 1 (class 1, 1 subclass bit): pick a masterbook cval
    # whose subbook choice fits every val (book B holds only 64)
    for cval in range(4):
        ok = all(
            vals[4 + d] < (64 if (cval >> d) & 1 else 128)
            for d in range(3)
        )
        if ok:
            break
    assert ok
    w.code(*mb_codes[cval])
    for d in range(3):
        if (cval >> d) & 1:
            w.code(vals[4 + d], 6)
        else:
            w.code(vals[4 + d], 7)
    return vals, step2


def _b_audio_packet(mode, prev_flag, next_flag, floors, seed):
    """One config-B audio packet. floors: per channel, a finals list
    or None (floor unused). Returns (bytes, per-channel curves or
    None, pre-coupling interleaved residue)."""
    _, codes1, codes2 = _b_codes()
    n = 1024 if mode else 256
    n2 = n // 2
    w = _VW()
    w.w(0, 1)
    w.w(mode, 1)
    if mode:
        w.w(prev_flag, 1)
        w.w(next_flag, 1)
    curves = []
    for finals in floors:
        if finals is None:
            w.w(0, 1)  # floor unused
            curves.append(None)
        else:
            vals, step2 = _b_encode_floor(w, finals)
            curves.append(_floor_curve_naive(_B_XS, finals, step2, 2, n2))
    # residue type 2: one interleaved vector of length 2*n2, clamped
    # by end=1024; psize 16, classbook dim 2
    total = min(1024, 2 * n2)
    parts = total // 16
    cls = [(seed + pc) % 2 for pc in range(parts)]
    inter = np.zeros(2 * n2)
    # pass 0: classwords interleaved with the first-pass codewords
    t = 0
    for pc0 in range(0, parts, 2):
        cw = cls[pc0] * 2 + (cls[pc0 + 1] if pc0 + 1 < parts else 0)
        w.code(cw, 2)  # classbook: equal lengths, code == entry
        for pc in (pc0, pc0 + 1):
            if pc >= parts:
                break
            for i in range(8):  # psize/dim = 16/2
                e = (seed * 7 + pc * 3 + i + t) % 8
                t += 1
                w.code(*codes1[e])
                inter[pc * 16 + i * 2 : pc * 16 + i * 2 + 2] += _B_VQ1[e]
    # pass 1: only class-1 partitions, book 2 (dim 4)
    for pc in range(parts):
        if cls[pc] != 1:
            continue
        for i in range(4):
            e = (seed * 5 + pc + i) % 13
            w.code(*codes2[e])
            inter[pc * 16 + i * 4 : pc * 16 + i * 4 + 4] += _B_VQ2[e]
    return w.bytes(), curves, inter


def _b_finals(seed):
    """Pseudo-random but always-encodable final_Y choices, covering
    the escape branches on some seeds."""
    base = [10 + (seed * 13) % 100, 20 + (seed * 29) % 100]
    rest = [(seed * 7 + k * 37 + 11) % _B_RNG for k in range(5)]
    if seed % 3 == 0:
        base = [10, 120]
        rest[0] = 100  # positive >=room escape at x=16 (pred 23)
    return base + rest


def _b_geometry(n, blockflag, prev_flag, next_flag, bs0=256):
    if blockflag and not prev_flag:
        ls, lsz = n // 4 - bs0 // 4, bs0 // 2
    else:
        ls, lsz = 0, n // 2
    if blockflag and not next_flag:
        rs, rsz = 3 * n // 4 - bs0 // 4, bs0 // 2
    else:
        rs, rsz = n // 2, n // 2
    return ls, lsz, rs, rsz


def _couple_naive(M, A):
    m2 = M.copy()
    a2 = A.copy()
    for i in range(len(M)):
        m, a = M[i], A[i]
        if m > 0:
            if a > 0:
                m2[i], a2[i] = m, m - a
            else:
                a2[i], m2[i] = m, m + a
        else:
            if a > 0:
                m2[i], a2[i] = m, m + a
            else:
                a2[i], m2[i] = m, m - a
    return m2, a2


def _b_stream_and_expected(plan):
    """plan: list of (mode, floors_spec) where floors_spec is a pair
    of 'use'/None markers; returns (ogg bytes, expected (2, total))."""
    packets = [_ident_packet(2, 16000, 8, 10), _comment_packet(),
               _b_setup_packet()]
    # window flags describe the true neighbors
    blocks = []
    for t, (mode, fspec) in enumerate(plan):
        prev_flag = plan[t - 1][0] if t > 0 else 0
        next_flag = plan[t + 1][0] if t + 1 < len(plan) else 0
        floors = [
            _b_finals(t * 2 + c) if use else None
            for c, use in enumerate(fspec)
        ]
        pkt, curves, inter = _b_audio_packet(mode, prev_flag, next_flag,
                                             floors, seed=t + 1)
        packets.append(pkt)
        blocks.append((mode, prev_flag, next_flag, curves, inter))
    # expected OLA with naive scalar components; origin biased by bs1
    # because a long block after a short first block starts early
    acc = np.zeros((2, 1024 * (len(plan) + 4)))
    offset = 1024
    prev_rs_abs = None
    emit_start = None
    for mode, prev_flag, next_flag, curves, inter in blocks:
        n = 1024 if mode else 256
        n2 = n // 2
        ls, lsz, rs, rsz = _b_geometry(n, mode, prev_flag, next_flag)
        win = _vorbis_window(n, ls, lsz, rs, rsz)
        M, A = _couple_naive(inter[0::2], inter[1::2])
        if prev_rs_abs is not None:
            offset = prev_rs_abs - ls
        if emit_start is None:
            emit_start = offset + rs
        for c, resid in enumerate((M, A)):
            if curves[c] is None:
                continue
            spectrum = resid * curves[c]
            acc[c, offset : offset + n] += _imdct_direct(spectrum, n) * win
        prev_rs_abs = offset + rs
    total = prev_rs_abs - emit_start
    expected = acc[:, emit_start : emit_start + total]
    data = _ogg_stream(packets, total)
    return data, expected


def test_stereo_coupled_blockswitch_roundtrip():
    plan = [
        (0, (1, 1)),
        (0, (1, 1)),
        (1, (1, 1)),  # long, prev short, next long
        (1, (1, 1)),  # long, prev long, next short
        (0, (1, 0)),  # channel-1 floor unused (coupling still decodes)
        (1, (1, 1)),  # long with short on both sides
        (0, (1, 1)),
        (0, (1, 1)),
    ]
    data, expected = _b_stream_and_expected(plan)
    out = vorbis_pcm_samples(data)
    assert out is not None
    samples, ch, rate, label = out
    assert (ch, rate, label) == (2, 16000, "vorbis-pcm")
    n = expected.shape[1]
    assert samples.shape == (2 * n,)
    got = np.stack([samples[0::2], samples[1::2]])
    assert np.allclose(got, expected, atol=1e-8)
    assert float(np.abs(expected).max()) > 1e-4


def test_stereo_long_after_first_short_exact():
    # the long block's window starts BEFORE the stream's first sample
    # (negative unbiased offset) — pin the biased-origin lap math
    plan = [(0, (1, 1)), (1, (1, 1)), (0, (1, 1))]
    data, expected = _b_stream_and_expected(plan)
    out = vorbis_pcm_samples(data)
    assert out is not None
    got = np.stack([out[0][0::2], out[0][1::2]])
    assert got.shape == expected.shape
    assert np.allclose(got, expected, atol=1e-8)


def test_stereo_fuzz_never_raises():
    plan = [(0, (1, 1)), (1, (1, 1)), (0, (1, 1))]
    data, _ = _b_stream_and_expected(plan)
    rng = np.random.RandomState(23)
    for _ in range(120):
        buf = bytearray(data)
        for _ in range(rng.randint(1, 8)):
            buf[rng.randint(len(buf))] = rng.randint(256)
        r = vorbis_pcm_samples(bytes(buf))
        assert r is None or np.isfinite(r[0]).all()
    for cut in range(0, len(data), 11):
        r = vorbis_pcm_samples(data[:cut])
        assert r is None or np.isfinite(r[0]).all()


# ---------------------------------------------------------------------------
# Spark integration: decode_audio / resample_audio / extract_features


def test_spark_decode_audio_vorbis(spark):
    data, expected, rate = _mono_stream(n_packets=6)
    sdata, sexp = _b_stream_and_expected([(0, (1, 1)), (0, (1, 1)),
                                          (1, (1, 1)), (0, (1, 1))])
    from vinum_spark.operators.multimodal import decode_audio

    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(sdata)),
         (3, bytearray(b"OggS" + b"\x00" * 40))],
        "asset_id long, content binary",
    )
    rows = {r["asset_id"]: r for r in decode_audio(df).collect()}
    r1 = rows[1]
    assert r1["decoder"] == "vorbis-pcm"
    assert r1["n_channels"] == 1 and r1["sample_rate"] == rate
    assert r1["n_samples"] == len(expected)
    assert r1["duration_s"] == pytest.approx(len(expected) / rate)
    assert r1["rms"] == pytest.approx(
        float(np.sqrt(np.mean(expected**2))), rel=1e-9)
    assert r1["peak"] == pytest.approx(float(np.abs(expected).max()),
                                       rel=1e-9)
    r2 = rows[2]
    assert r2["decoder"] == "vorbis-pcm"
    assert r2["n_channels"] == 2 and r2["sample_rate"] == 16000
    assert r2["n_samples"] == sexp.shape[1]
    # garbage Ogg degrades to stub (not even header stats parse)
    assert rows[3]["rms"] is None


def test_spark_resample_audio_vorbis(spark):
    data, expected, rate = _mono_stream(n_packets=6)
    from vinum_spark.operators.multimodal import resample_audio

    df = spark.createDataFrame([(1, bytearray(data))],
                               "asset_id long, content binary")
    row = resample_audio(df, target_rate=4000).collect()[0]
    assert row["resampler"] == "vorbis-pcm-linear"
    assert row["n_samples"] == int(round(len(expected) * 4000 / rate))


def test_spark_extract_features_vorbis(spark):
    # long enough for the 64-dim RMS envelope: 8 packets = 896 samples
    data, _, _ = _mono_stream(n_packets=8)
    from vinum_spark.operators.multimodal import extract_features

    df = spark.createDataFrame([(1, bytearray(data))],
                               "asset_id long, content binary")
    row = extract_features(df).collect()[0]
    assert row["extractor"] == "vorbis-rms64"
    v = np.array(row["feature"])
    assert v.shape == (64,) and np.isfinite(v).all()


def test_floor0_stream_falls_back_to_header_stats():
    # legacy LSP floors are parsed for sync but not synthesized: the
    # decoder declines the stream and decode_audio's caller falls back
    # to the exact Ogg page-granule stats
    w = _VW()
    w.w(0, 8)  # 1 codebook
    _write_codebook(w, 1, [1])
    w.w(0, 6)
    w.w(0, 16)  # time
    w.w(0, 6)
    w.w(0, 16)  # floor type 0
    w.w(8, 8)  # order
    w.w(8000, 16)  # rate
    w.w(128, 16)  # bark_map_size
    w.w(6, 6)  # amp_bits
    w.w(100, 8)  # amp_offset
    w.w(0, 4)  # 1 book
    w.w(0, 8)  # book 0
    w.w(0, 6)
    w.w(0, 16)  # residue type 0
    w.w(0, 24), w.w(128, 24), w.w(7, 24), w.w(0, 6), w.w(0, 8)
    w.w(0, 3), w.w(0, 1)  # empty cascade
    w.w(0, 6), w.w(0, 16), w.w(0, 1), w.w(0, 1), w.w(0, 2)
    w.w(0, 8), w.w(0, 8), w.w(0, 8)  # mapping
    w.w(0, 6), w.w(0, 1), w.w(0, 16), w.w(0, 16), w.w(0, 8)
    w.w(1, 1)
    setup = b"\x05vorbis" + w.bytes()
    packets = [_ident_packet(1, 8000, 8, 8), _comment_packet(), setup,
               b"\x00" * 8]
    data = _ogg_stream(packets, 640)
    assert vorbis_pcm_samples(data) is None
    from vinum_spark.operators.multimodal import _parse_ogg

    ch, rate, samples, codec = _parse_ogg(data)
    assert (ch, rate, samples, codec) == (1, 8000, 640, "vorbis")


def test_muxed_ogg_vorbis_after_video_bos():
    # grouped (multiplexed) Ogg: a non-Vorbis BOS page (e.g. Theora)
    # precedes the Vorbis BOS per RFC 3533; the walk must lock onto
    # the Vorbis serial, not the first serial seen
    data, expected, rate = _mono_stream()
    packets, _ = _ogg_packets(data)
    alien_bos = _ogg_page([(b"\x80theora" + b"\x00" * 30, True)], 0,
                          0xBEEF, 0, 0x02)
    alien_data = _ogg_page([(b"\x00" * 50, True)], 99, 0xBEEF, 1, 0x04)
    pages = [
        alien_bos,
        _ogg_page([(packets[0], True)], 0, 7, 0, 0x02),
        _ogg_page([(packets[1], True), (packets[2], True)], 0, 7, 1, 0),
        alien_data,
        _ogg_page([(p, True) for p in packets[3:]],
                  128 * (len(packets) - 4), 7, 2, 0x04),
    ]
    out = vorbis_pcm_samples(b"".join(pages))
    assert out is not None
    samples, ch, got_rate, label = out
    assert (ch, got_rate, label) == (1, rate, "vorbis-pcm")
    assert np.allclose(samples, expected, atol=1e-8)


def test_randomized_plans_roundtrip_exact():
    # randomized block sequences and floor/residue content through the
    # config-B encoder: every combination of window transitions the
    # plan generator emits must round-trip against the independent
    # expectation (regression net for lap-geometry combinations not
    # hand-enumerated above)
    rng = np.random.RandomState(1234)
    for trial in range(6):
        n_blocks = int(rng.randint(3, 9))
        plan = []
        for t in range(n_blocks):
            mode = int(rng.randint(2))
            fspec = (1, int(rng.randint(2)))
            plan.append((mode, fspec))
        data, expected = _b_stream_and_expected(plan)
        out = vorbis_pcm_samples(data)
        assert out is not None, plan
        got = np.stack([out[0][0::2], out[0][1::2]])
        assert got.shape == expected.shape, plan
        assert np.allclose(got, expected, atol=1e-8), plan


# ---------------------------------------------------------------------------
# Vorbis inside Matroska/WebM (A_VORBIS track, all three lacing modes)


def _ebml_size_enc(n, ln=None):
    if ln is None:
        ln = 1
        while n >= (1 << (7 * ln)) - 1:
            ln += 1
    v = n + ((0x80 >> (ln - 1)) << (8 * (ln - 1)))
    return v.to_bytes(ln, "big")


def _ebml_el(eid: bytes, payload: bytes) -> bytes:
    return eid + _ebml_size_enc(len(payload)) + payload


def _xiph_lace_private(packets):
    out = bytearray([len(packets) - 1])
    for p in packets[:-1]:
        n = len(p)
        out += b"\xff" * (n // 255) + bytes([n % 255])
    for p in packets:
        out += p
    return bytes(out)


def _simple_block(track, payloads, lacing):
    body = bytearray([0x80 | track, 0, 0])  # 1-byte track vint + timecode
    if lacing is None:
        assert len(payloads) == 1
        body.append(0x80)
        body += payloads[0]
    elif lacing == "xiph":
        body.append(0x80 | 0x02)
        body.append(len(payloads) - 1)
        for p in payloads[:-1]:
            n = len(p)
            body += b"\xff" * (n // 255) + bytes([n % 255])
        for p in payloads:
            body += p
    elif lacing == "fixed":
        assert len({len(p) for p in payloads}) == 1
        body.append(0x80 | 0x04)
        body.append(len(payloads) - 1)
        for p in payloads:
            body += p
    else:  # ebml lacing: first size plain, then signed deltas
        body.append(0x80 | 0x06)
        body.append(len(payloads) - 1)
        body += _ebml_size_enc(len(payloads[0]))
        prev = len(payloads[0])
        for p in payloads[1:-1]:
            delta = len(p) - prev
            prev = len(p)
            u = delta + ((1 << 6) - 1)
            assert 0 <= u < 127
            body += bytes([0x80 | u])
        for p in payloads:
            body += p
    return _ebml_el(b"\xa3", bytes(body))


def _webm_vorbis_file(n_packets=8):
    """A two-track WebM: track 1 A_VORBIS (the mono test stream's
    packets spread over all three lacing modes + unlaced), track 2 a
    V_VP8 video decoy whose blocks must be ignored. Returns
    (file bytes, expected PCM)."""
    headers = [_ident_packet(1, 8000, 8, 8), _comment_packet(),
               _mono_setup_packet()]
    audio = []
    blocks_sem = []
    for s in range(n_packets):
        pkt, resid, ypair = _mono_audio_packet(s)
        audio.append(pkt)
        blocks_sem.append((resid, ypair))
    track1 = _ebml_el(b"\xae", b"".join([
        _ebml_el(b"\xd7", b"\x01"),
        _ebml_el(b"\x86", b"A_VORBIS"),
        _ebml_el(b"\x63\xa2", _xiph_lace_private(headers)),
    ]))
    track2 = _ebml_el(b"\xae", b"".join([
        _ebml_el(b"\xd7", b"\x02"),
        _ebml_el(b"\x86", b"V_VP8"),
    ]))
    tracks = _ebml_el(b"\x16\x54\xae\x6b", track1 + track2)
    decoy = _simple_block(2, [b"\x9d\x01\x2a" + b"\x00" * 20], None)
    cluster1 = _ebml_el(b"\x1f\x43\xb6\x75", b"".join([
        _ebml_el(b"\xe7", b"\x00"),  # Timecode
        decoy,
        _simple_block(1, [audio[0]], None),
        _simple_block(1, audio[1:4], "xiph"),
    ]))
    # BlockGroup-wrapped Block with fixed lacing (all packets 21 bytes)
    bg = _ebml_el(b"\xa0", _simple_block(1, audio[4:6], "fixed")
                  .replace(b"\xa3", b"\xa1", 1))
    cluster2 = _ebml_el(b"\x1f\x43\xb6\x75", b"".join([
        _ebml_el(b"\xe7", b"\x40"),
        bg,
        decoy,
        _simple_block(1, audio[6:8], "ebml"),
    ]))
    segment = _ebml_el(b"\x18\x53\x80\x67", tracks + cluster1 + cluster2)
    ebml_hdr = _ebml_el(b"\x1a\x45\xdf\xa3",
                        _ebml_el(b"\x42\x82", b"webm"))
    data = ebml_hdr + segment
    # expected: same OLA as the Ogg mono stream, full lapped output
    acc = np.zeros(128 * (n_packets + 1))
    win = _vorbis_window(256, 0, 128, 128, 128)
    for t, (resid, (y0, y1)) in enumerate(blocks_sem):
        spectrum = resid * _mono_floor_curve(y0, y1)
        acc[128 * t : 128 * t + 256] += _imdct_direct(spectrum, 256) * win
    return data, acc[128 : 128 * n_packets]


def test_webm_vorbis_decode_exact():
    from vinum_spark.operators.multimodal import _webm_vorbis_pcm

    data, expected = _webm_vorbis_file()
    out = _webm_vorbis_pcm(data)
    assert out is not None
    samples, ch, rate, label = out
    assert (ch, rate, label) == (1, 8000, "webm-vorbis-pcm")
    assert samples.shape == expected.shape
    assert np.allclose(samples, expected, atol=1e-8)


def test_webm_vorbis_fuzz_never_raises():
    from vinum_spark.operators.multimodal import _webm_vorbis_pcm

    data, _ = _webm_vorbis_file()
    rng = np.random.RandomState(77)
    for _ in range(120):
        buf = bytearray(data)
        for _ in range(rng.randint(1, 8)):
            buf[rng.randint(len(buf))] = rng.randint(256)
        r = _webm_vorbis_pcm(bytes(buf))
        assert r is None or np.isfinite(r[0]).all()
    for cut in range(0, len(data), 13):
        r = _webm_vorbis_pcm(data[:cut])
        assert r is None or np.isfinite(r[0]).all()


def test_spark_decode_audio_webm_vorbis(spark):
    from vinum_spark.operators.multimodal import decode_audio

    data, expected = _webm_vorbis_file()
    df = spark.createDataFrame([(1, bytearray(data))],
                               "asset_id long, content binary")
    row = decode_audio(df).collect()[0]
    assert row["decoder"] == "webm-vorbis-pcm"
    assert row["n_samples"] == len(expected)
    assert row["rms"] == pytest.approx(
        float(np.sqrt(np.mean(expected**2))), rel=1e-9)


# ---------------------------------------------------------------------------
# Chained Ogg streams


def test_chained_streams_concatenate():
    d1, e1, _ = _mono_stream(n_packets=5)
    # second chain: different serial, different content, same params
    packets = [_ident_packet(1, 8000, 8, 8), _comment_packet(),
               _mono_setup_packet()]
    blocks = []
    for s in range(7, 11):
        pkt, resid, ypair = _mono_audio_packet(s)
        packets.append(pkt)
        blocks.append((resid, ypair))
    d2 = _ogg_stream(packets, 128 * 3, serial=0x9999)
    acc = np.zeros(128 * 6)
    win = _vorbis_window(256, 0, 128, 128, 128)
    for t, (resid, (y0, y1)) in enumerate(blocks):
        spectrum = resid * _mono_floor_curve(y0, y1)
        acc[128 * t : 128 * t + 256] += _imdct_direct(spectrum, 256) * win
    e2 = acc[128 : 128 * 4]
    out = vorbis_pcm_samples(d1 + d2)
    assert out is not None
    assert out[0].shape == (len(e1) + len(e2),)
    assert np.allclose(out[0], np.concatenate([e1, e2]), atol=1e-8)


def test_chained_rate_change_stops_at_boundary():
    d1, e1, _ = _mono_stream(n_packets=5)
    d2, _, _ = _mono_stream(n_packets=4, rate=16000)
    out = vorbis_pcm_samples(d1 + d2)
    assert out is not None
    assert out[2] == 8000
    assert np.allclose(out[0], e1, atol=1e-8)


def test_chained_garbage_tail_keeps_prefix():
    d1, e1, _ = _mono_stream(n_packets=5)
    junk = _ogg_page([(b"\x01vorbis" + b"\x7f" * 40, True)], 0, 5, 0, 0x02)
    out = vorbis_pcm_samples(d1 + junk)
    assert out is not None
    assert np.allclose(out[0], e1, atol=1e-8)


def test_parse_webm_audio_only_reports_audio_kind():
    import struct

    from vinum_spark.operators.multimodal import _parse_webm

    headers = [_ident_packet(1, 8000, 8, 8), _comment_packet(),
               _mono_setup_packet()]
    audio_el = _ebml_el(b"\xe1", b"".join([
        _ebml_el(b"\xb5", struct.pack(">f", 8000.0)),
        _ebml_el(b"\x9f", b"\x01"),
    ]))
    track = _ebml_el(b"\xae", b"".join([
        _ebml_el(b"\xd7", b"\x01"),
        _ebml_el(b"\x86", b"A_VORBIS"),
        _ebml_el(b"\x63\xa2", _xiph_lace_private(headers)),
        audio_el,
    ]))
    segment = _ebml_el(b"\x18\x53\x80\x67",
                       _ebml_el(b"\x16\x54\xae\x6b", track))
    data = _ebml_el(b"\x1a\x45\xdf\xa3",
                    _ebml_el(b"\x42\x82", b"webm")) + segment
    kind, ch, rate, _, _, h, w, label = _parse_webm(data)
    assert (kind, ch, rate, label) == ("audio", 1, 8000,
                                       "webm-ebml-audio")
    assert h is None and w is None


def test_streaming_decode_audio_vorbis(spark, tmp_path):
    # media decode composes with Structured Streaming: the same
    # mapInPandas plan runs over readStream (the streaming-ingest shape
    # a training-corpus pipeline uses for continuously arriving assets)
    from vinum_spark.operators.multimodal import decode_audio

    data, expected, rate = _mono_stream()
    src = str(tmp_path / "assets")
    spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(b"not audio"))],
        "asset_id long, content binary",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "asset_id long, content binary").parquet(src)
    q = (
        decode_audio(stream)
        .writeStream.format("memory")
        .queryName("vorbis_stream_decode")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["asset_id"]: r
            for r in spark.sql("SELECT * FROM vorbis_stream_decode").collect()}
    assert rows[1]["decoder"] == "vorbis-pcm"
    assert rows[1]["n_samples"] == len(expected)
    assert rows[2]["decoder"] == "stub"


def test_mkv_lacing_roundtrip_random_sizes():
    # random frame sizes including >255 (multi-byte Xiph runs) and the
    # EBML signed-delta encoding across wide jumps: every lacing mode
    # must split back to exactly the packed frames
    from vinum_spark.operators.multimodal import (_mkv_block_packets,
                                                  _xiph_private_packets)

    rng = np.random.RandomState(42)
    for trial in range(40):
        n = int(rng.randint(1, 7))
        frames = [bytes(rng.bytes(int(rng.randint(0, 700))))
                  for _ in range(n)]
        # xiph lacing (any sizes)
        body = bytearray([0x81, 0, 0, 0x82, n - 1])
        for f in frames[:-1]:
            sz = len(f)
            body += b"\xff" * (sz // 255) + bytes([sz % 255])
        for f in frames:
            body += f
        got = _mkv_block_packets(bytes(body), 0, len(body), 1)
        assert got == frames, ("xiph", trial)
        # fixed lacing (equal sizes)
        eq = [frames[0]] * n
        body = bytearray([0x81, 0, 0, 0x84, n - 1]) + b"".join(eq)
        got = _mkv_block_packets(bytes(body), 0, len(body), 1)
        assert got == eq, ("fixed", trial)
        # ebml lacing: deltas must fit the 1-byte signed vint the
        # helper under test reads via _ebml_svint (any length); encode
        # each delta minimally
        body = bytearray([0x81, 0, 0, 0x86, n - 1])
        prev = len(frames[0])
        if n > 1:  # a single laced frame writes no size fields
            ln = 1
            while prev >= (1 << (7 * ln)) - 1:
                ln += 1
            body += (prev + ((0x80 >> (ln - 1)) << (8 * (ln - 1)))
                     ).to_bytes(ln, "big")
        for f in frames[1:-1]:
            delta = len(f) - prev
            prev = len(f)
            ln = 1
            while not (-(1 << (7 * ln - 1)) + 1 <= delta
                       <= (1 << (7 * ln - 1)) - 1):
                ln += 1
            u = delta + (1 << (7 * ln - 1)) - 1
            body += (u + ((0x80 >> (ln - 1)) << (8 * (ln - 1)))).to_bytes(
                ln, "big")
        for f in frames:
            body += f
        got = _mkv_block_packets(bytes(body), 0, len(body), 1)
        assert got == frames, ("ebml", trial)
        # CodecPrivate xiph split with >255-byte headers
        priv = bytearray([n - 1])
        for f in frames[:-1]:
            sz = len(f)
            priv += b"\xff" * (sz // 255) + bytes([sz % 255])
        for f in frames:
            priv += f
        assert _xiph_private_packets(bytes(priv)) == frames, trial


# ---------------------------------------------------------------------------
# Hostile-input parse budget (resource-exhaustion guard)


class _BitWriter:
    """LSB-first bit packer matching the Vorbis packet bit order."""

    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _ilog(x):
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def _huge_ordered_book_bits(bw, entries=1 << 18):
    """~12 bytes that declare a COMPLETE 2^18-entry codebook via the
    ordered-length mode (all lengths 18 in one run) — the cheapest
    bytes-to-CPU amplifier in the codec."""
    bw.w(0x564342, 24)
    bw.w(1, 16)  # dim
    bw.w(entries, 24)
    bw.w(1, 1)  # ordered
    bw.w(18 - 1, 5)  # cur_len = 18 (complete tree at 2^18 leaves)
    bw.w(entries, _ilog(entries))  # one run covering every entry
    bw.w(0, 4)  # lookup type 0


def test_codebook_entry_budget_bounds_setup_header():
    """A crafted setup header may declare up to 256 maximal books from
    a few KB; the per-decode _ParseBudget must stop it after ~1s of
    work (2^20 entries), not grind through ~70s / GBs of tables."""
    import time

    import vinum_spark.operators.vorbis as V

    bw = _BitWriter()
    bw.w(255, 8)  # 256 codebooks
    for _ in range(8):  # 8 are plenty: budget dies at book 5
        _huge_ordered_book_bits(bw)
    pkt = b"\x05vorbis" + bw.bytes()
    s = V._Setup()
    t0 = time.time()
    with pytest.raises(V._VorbisError):
        V._parse_setup(pkt, s)
    assert time.time() - t0 < 10.0


def test_chained_headers_share_one_parse_budget():
    """Chaining many logical streams must NOT reset the codebook parse
    budget: vorbis_pcm_samples creates ONE _ParseBudget for all
    chains, so a file with dozens of crafted setup headers degrades
    fast instead of multiplying the per-header cost."""
    import time

    import vinum_spark.operators.vorbis as V

    calls = []
    orig = V._Codebook.__init__

    def spy(self, bits, budget=None):
        calls.append(budget)
        return orig(self, bits, budget)

    # build one hostile chain: BOS ident page, comment+setup page with
    # a huge book, repeated with distinct serials (chained layout)
    def page(serial, seq, typ, granule, segs):
        body = b"".join(segs)
        lacing = b""
        for s_ in segs:
            n = len(s_)
            lacing += b"\xff" * (n // 255) + bytes([n % 255])
        hdr = (
            b"OggS\x00" + bytes([typ])
            + granule.to_bytes(8, "little", signed=True)
            + serial.to_bytes(4, "little")
            + seq.to_bytes(4, "little")
            + b"\x00\x00\x00\x00"  # zero CRC: page scan is structural
            + bytes([len(lacing)])
            + lacing
        )
        return hdr + body

    ident = bytearray(b"\x01vorbis")
    bwi = _BitWriter()
    bwi.w(0, 32)  # version
    bwi.w(1, 8)  # channels
    bwi.w(8000, 32)  # rate
    bwi.w(0, 32), bwi.w(0, 32), bwi.w(0, 32)
    bwi.w(6, 4), bwi.w(6, 4)  # blocksizes 64/64
    bwi.w(1, 1)
    ident += bwi.bytes()
    comment = b"\x03vorbis" + b"\x00" * 8
    bws = _BitWriter()
    bws.w(0, 8)  # 1 codebook
    _huge_ordered_book_bits(bws)
    setup = b"\x05vorbis" + bws.bytes()

    chains = b""
    for k in range(12):
        serial = 1000 + k
        chains += page(serial, 0, 2, 0, [bytes(ident)])
        chains += page(serial, 1, 0, 0, [comment, setup])
        chains += page(serial, 2, 4, 0, [b"\x00"])  # EOS, empty-ish pkt

    V._Codebook.__init__ = spy
    try:
        t0 = time.time()
        out = vorbis_pcm_samples(chains)
        dt = time.time() - t0
    finally:
        V._Codebook.__init__ = orig
    assert out is None  # first chain has no decodable audio
    assert dt < 15.0
    # every codebook parse across every chain saw the SAME budget
    budgets = {id(b) for b in calls if b is not None}
    assert len(budgets) <= 1
    assert None not in calls


def test_unordered_codebook_exceeds_packet_fast_fail():
    """Unordered mode needs >=5 bits per entry (1 if sparse): a book
    declaring 2^18 entries inside a 20-byte packet is rejected up
    front, before the per-entry read loop."""
    import vinum_spark.operators.vorbis as V

    bw = _BitWriter()
    bw.w(0x564342, 24)
    bw.w(1, 16)
    bw.w(1 << 18, 24)
    bw.w(0, 1)  # unordered
    bw.w(0, 1)  # non-sparse
    bw.w(0, 40)  # a few filler bits, nowhere near 5*2^18
    with pytest.raises(V._VorbisError, match="exceeds packet"):
        V._Codebook(V._Bits(bw.bytes()))


def test_vq_cell_budget_is_cumulative():
    """Type-2 VQ tables are budgeted across the whole decode: many
    books each under the 2^22 per-book cap must still trip the
    cumulative 2^23 cell budget."""
    import vinum_spark.operators.vorbis as V

    def vq_book_bits(bw):
        # 4 entries x dim 2, lookup type 2 -> 8 cells, tiny but real
        bw.w(0x564342, 24)
        bw.w(2, 16)
        bw.w(4, 24)
        bw.w(0, 1)  # unordered
        bw.w(0, 1)  # non-sparse
        for _ in range(4):
            bw.w(1, 5)  # length 2 each -> complete tree
        bw.w(2, 4)  # lookup type 2
        bw.w(0, 32)  # minv
        bw.w(0x38800000 >> 0, 32)  # delta (some float)
        bw.w(0, 4)  # value_bits = 1
        bw.w(0, 1)  # no sequence
        for _ in range(8):
            bw.w(0, 1)

    budget = V._ParseBudget()
    budget.vq_cells_left = 20  # room for two 8-cell books, not three
    bw = _BitWriter()
    for _ in range(3):
        vq_book_bits(bw)
    bits = V._Bits(bw.bytes())
    V._Codebook(bits, budget)
    V._Codebook(bits, budget)
    with pytest.raises(V._VorbisError, match="budget"):
        V._Codebook(bits, budget)
