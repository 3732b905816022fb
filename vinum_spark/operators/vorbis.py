"""Pure-numpy Ogg Vorbis (Vorbis I) sample decoder.

Implements the REAL decode path for ``decode_audio``'s
``decoder='vorbis-pcm'`` label: Ogg page walk + packet reassembly
(RFC 3533), Vorbis identification/setup header parse, in-stream
Huffman codebooks (canonical first-fit codeword assignment), floor
type 1 (piecewise-linear dB curve with the spec's integer Bresenham
render), residue types 0/1/2, square-polar channel coupling, the
inverse MDCT, and Vorbis-window overlap-add — all written against the
public Xiph.org *Vorbis I specification* and RFC 3533, with no codec
library.

Everything here is algorithmic rather than recited: Vorbis carries its
Huffman codebooks, floor curves and residue configuration inside the
stream's setup header, and the one constant table the spec lists
explicitly (``floor1_inverse_dB_table``) is exactly
``10 ** ((i - 255) * (7 / 256))`` and is generated, not transcribed.
That is why Vorbis (and not MP3, whose ISO Table B.7 Huffman data
cannot be verified offline) is the lossy codec this engine decodes to
samples; see README's media-decode boundary table.

Reference parity: the reference engine (dmitrykoval/vinum) has no
audio decode at all — media operators are part of this repo's
LLM-pipeline extension family (SURVEY.md §2 extensions), hosted in
``operators/multimodal.py`` which dispatches to this module.

Scope boundaries (all degrade to ``None`` so callers fall back to the
exact Ogg header stats, never to invented samples):
- floor type 0 (legacy LSP floors, unused by every known encoder since
  ~2001) is parsed for stream sync but not synthesized;
- in a multiplexed group the Vorbis stream is selected by its BOS
  signature (other codecs' pages are skipped); CHAINED streams decode
  chain-by-chain and concatenate while channels/rate match, stopping
  honestly at a parameter change;
- streams whose decoded size would exceed ``max_samples`` fall back to
  header stats (same bound as the FLAC decoder).

Hostile input: every read is bounds-checked through ``_Bits``; parse
errors raise ``_VorbisError`` and the entry point returns ``None`` —
fuzz-pinned in tests/test_property.py alongside the other byte
walkers.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["vorbis_pcm_samples", "vorbis_packets_pcm"]


class _VorbisError(Exception):
    """Unrecoverable parse error — callers degrade to header stats."""


class _Eop(Exception):
    """End-of-packet. A real bitstream condition in Vorbis (audio
    packets may legally end mid-vector: the remainder is zeros), an
    error in header packets."""


# floor1_inverse_dB_table (spec §10): value i is 10^((i-255)*7/256);
# endpoints 1.0649863e-07 and 1.0 match the spec listing.
_INVERSE_DB = 10.0 ** ((np.arange(256) - 255) * (7.0 / 256.0))
_FLOOR1_RANGES = (256, 128, 86, 64)


def _ilog(x: int) -> int:
    """Bits needed for x per spec §9.2.1: ilog(0)=0, ilog(7)=3."""
    return max(x, 0).bit_length()


def _float32_unpack(x: int) -> float:
    """Vorbis packed float (spec §9.2.2): 21-bit mantissa, 10-bit
    biased exponent, sign bit."""
    mant = x & 0x1FFFFF
    if x & 0x80000000:
        mant = -mant
    exp = (x >> 21) & 0x3FF
    return float(mant) * 2.0 ** (exp - 788)


def _lookup1_values(entries: int, dim: int) -> int:
    """Largest v with v**dim <= entries (spec §9.2.3). dim < 1 is
    rejected before the search: (v+1)**0 == 1 <= entries for every v,
    so a hostile dim-0 header would otherwise spin this loop forever."""
    if dim < 1:
        raise _VorbisError("lookup codebook with zero dimension")
    v = int(entries ** (1.0 / dim))
    while (v + 1) ** dim <= entries:
        v += 1
    while v > 0 and v**dim > entries:
        v -= 1
    return v


class _Bits:
    """LSB-first bit reader over one packet (Vorbis bitpacking,
    spec §2). ``read`` raises ``_Eop`` past the end; ``peek`` pads
    with zeros so table-accelerated Huffman lookups stay branch-free
    (the consumer re-checks the true remaining count before
    committing)."""

    __slots__ = ("d", "pos", "acc", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.pos = 0
        self.acc = 0
        self.n = 0

    def remaining(self) -> int:
        return (len(self.d) - self.pos) * 8 + self.n

    def read(self, k: int) -> int:
        acc, n, pos, d = self.acc, self.n, self.pos, self.d
        while n < k:
            if pos >= len(d):
                raise _Eop
            acc |= d[pos] << n
            pos += 1
            n += 8
        self.acc = acc >> k
        self.n = n - k
        self.pos = pos
        return acc & ((1 << k) - 1)

    def peek(self, k: int) -> int:
        acc, n, pos, d = self.acc, self.n, self.pos, self.d
        while n < k and pos < len(d):
            acc |= d[pos] << n
            pos += 1
            n += 8
        self.acc, self.n, self.pos = acc, n, pos
        return acc & ((1 << k) - 1)

    def skip(self, k: int) -> None:
        if self.n < k:
            raise _Eop
        self.acc >>= k
        self.n -= k


# ---------------------------------------------------------------------------
# Codebooks


def _assign_codewords(lengths):
    """Canonical Vorbis codeword assignment (spec §3.2.1): entries are
    taken in order and each receives the leftmost unused leaf at its
    depth in a binary tree whose branches fill left-first.  The free
    subtree roots form at most one per depth (the right-siblings along
    the last allocated path), so an ``available``-per-depth array
    realizes the spec tree exactly.  Returns {entry: (code, len)} with
    codewords as MSB-first integers; raises on an over- or
    under-specified tree (single-used-entry books excepted, which get
    codeword 0 per the spec's special case)."""
    used = [(e, l) for e, l in enumerate(lengths) if l is not None]
    if not used:
        raise _VorbisError("codebook with no used entries")
    if len(used) == 1:
        e, l = used[0]
        return {e: (0, l)}
    codes = {}
    available = [0] * 33
    first_entry, first_len = used[0]
    codes[first_entry] = (0, first_len)
    for depth in range(1, first_len + 1):
        available[depth] = 1 << (32 - depth)
    for e, l in used[1:]:
        d = l
        while d > 0 and not available[d]:
            d -= 1
        if d == 0:
            raise _VorbisError("overspecified codebook")
        res = available[d]
        available[d] = 0
        codes[e] = (res >> (32 - l), l)
        for depth in range(d + 1, l + 1):
            available[depth] = res | (1 << (32 - depth))
    if any(available[1:]):
        raise _VorbisError("underspecified codebook")
    return codes


_FAST_BITS = 10


class _ParseBudget:
    """Cumulative header-parse resource budget for ONE decode call.

    Hostile-input guard: the ordered-length codebook mode lets ~12
    bytes declare a complete 2^18-entry book (measured ~0.3 s CPU and
    tens of MB to build the code tables on this host), the setup
    header allows 256 books, and a chained Ogg file can carry
    thousands of setup headers — so per-book caps alone leave a
    few-KB crafted file able to burn minutes of CPU and GBs of RAM
    per asset inside executors (decode_audio feeds untrusted corpus
    bytes here). One ``_ParseBudget`` is created per top-level decode
    (``vorbis_pcm_samples`` / ``vorbis_packets_pcm``) and charged by
    every codebook across every chain's setup header BEFORE the
    expensive build, bounding total parse work per asset to ~1 s CPU
    regardless of how the stream is crafted. Real headers total well
    under 2^15 entries, so the caps carry ~30x headroom; a legit
    many-chain file that somehow exhausts the pool degrades to the
    honest-prefix semantics chained decode already has.
    """

    __slots__ = ("entries_left", "vq_cells_left")

    _ENTRIES = 1 << 20
    _VQ_CELLS = 1 << 23

    def __init__(self):
        self.entries_left = self._ENTRIES
        self.vq_cells_left = self._VQ_CELLS

    def charge_entries(self, n: int) -> None:
        self.entries_left -= n
        if self.entries_left < 0:
            raise _VorbisError("codebook entry budget exceeded")

    def charge_vq_cells(self, n: int) -> None:
        self.vq_cells_left -= n
        if self.vq_cells_left < 0:
            raise _VorbisError("VQ table budget exceeded")


class _Codebook:
    """One in-stream codebook: Huffman decode (two-level accelerated:
    a 2^10 primary table over raw stream bits, dict walk for longer
    codes) plus the optional VQ value table (lookup types 1/2),
    precomputed dense as float64 (entries, dim) — sequence_p folds
    into a cumsum at build time."""

    __slots__ = ("dim", "entries", "codes", "fast_entry", "fast_len",
                 "vq", "single", "slow")

    def __init__(self, bits: _Bits, budget: "_ParseBudget | None" = None):
        if budget is None:
            budget = _ParseBudget()
        if bits.read(24) != 0x564342:
            raise _VorbisError("bad codebook sync")
        self.dim = bits.read(16)
        self.entries = bits.read(24)
        if self.entries > (1 << 18) or self.dim > (1 << 10):
            raise _VorbisError("codebook too large")
        budget.charge_entries(self.entries)
        lengths = [None] * self.entries
        if not bits.read(1):  # unordered
            sparse = bits.read(1)
            # fast-fail: each entry consumes >=1 bit (sparse flag) or
            # exactly 5 bits (non-sparse), so a book whose declared
            # entry count exceeds what the remaining packet bits can
            # describe is rejected before the allocation, not after
            # grinding through it to an _Eop
            if bits.remaining() < self.entries * (1 if sparse else 5):
                raise _VorbisError("codebook exceeds packet")
            for e in range(self.entries):
                if not sparse or bits.read(1):
                    lengths[e] = bits.read(5) + 1
        else:  # ordered: runs of ascending code length
            cur_len = bits.read(5) + 1
            cur = 0
            while cur < self.entries:
                num = bits.read(_ilog(self.entries - cur))
                if cur + num > self.entries or cur_len > 32:
                    raise _VorbisError("ordered lengths overflow")
                lengths[cur : cur + num] = [cur_len] * num
                cur += num
                cur_len += 1
        self.codes = _assign_codewords(lengths)
        if len(self.codes) == 1:
            ((entry, (_, length)),) = self.codes.items()
            self.single = (entry, length)
        else:
            self.single = None
        self._build_fast()
        lookup = bits.read(4)
        if lookup == 0:
            self.vq = None
        elif lookup in (1, 2):
            if self.dim < 1:
                raise _VorbisError("VQ codebook with zero dimension")
            minv = _float32_unpack(bits.read(32))
            delta = _float32_unpack(bits.read(32))
            value_bits = bits.read(4) + 1
            seq = bits.read(1)
            if lookup == 1:
                l1v = _lookup1_values(self.entries, self.dim)
                mults = np.array(
                    [bits.read(value_bits) for _ in range(l1v)], dtype=np.float64
                )
                if self.entries * self.dim > (1 << 22):
                    raise _VorbisError("VQ table too large")
                budget.charge_vq_cells(self.entries * self.dim)
                idiv = (l1v ** np.arange(self.dim, dtype=np.uint64)).astype(
                    np.int64
                )
                offs = (
                    np.arange(self.entries, dtype=np.int64)[:, None]
                    // idiv[None, :]
                ) % max(l1v, 1)
                self.vq = mults[offs] * delta + minv if l1v else np.zeros(
                    (self.entries, self.dim)
                )
            else:
                count = self.entries * self.dim
                if count > (1 << 22):
                    raise _VorbisError("VQ table too large")
                budget.charge_vq_cells(count)
                mults = np.array(
                    [bits.read(value_bits) for _ in range(count)],
                    dtype=np.float64,
                )
                self.vq = mults.reshape(self.entries, self.dim) * delta + minv
            if seq:
                self.vq = np.cumsum(self.vq, axis=1)
        else:
            raise _VorbisError("reserved lookup type")

    def _build_fast(self):
        # plain Python lists: scalar indexing is ~5x cheaper than
        # numpy item access in the per-codeword hot loop
        fe = [-1] * (1 << _FAST_BITS)
        fl = [0] * (1 << _FAST_BITS)
        self.slow = {}
        for e, (code, l) in self.codes.items():
            if l <= _FAST_BITS:
                # raw stream bits arrive LSB-first; the first codeword
                # bit (MSB of `code`) is the lowest raw bit
                rev = 0
                for i in range(l):
                    rev |= ((code >> (l - 1 - i)) & 1) << i
                for j in range(rev, 1 << _FAST_BITS, 1 << l):
                    fe[j] = e
                    fl[j] = l
            else:
                self.slow[(code, l)] = e
        self.fast_entry = fe
        self.fast_len = fl

    def decode(self, bits: _Bits) -> int:
        """Decode one codeword to its entry number (scalar context)."""
        if self.single is not None:
            # single-used-entry book: sink the declared length and
            # return the entry; bit values are not inspected
            entry, declared = self.single
            if bits.remaining() < declared:
                raise _Eop
            bits.read(declared)
            return entry
        raw = bits.peek(_FAST_BITS)
        e = self.fast_entry[raw]
        if e >= 0:
            l = self.fast_len[raw]
            if bits.remaining() < l:
                raise _Eop
            bits.skip(l)
            return e
        code = 0
        for ln in range(1, 33):
            code = (code << 1) | bits.read(1)
            if ln > _FAST_BITS:
                ent = self.slow.get((code, ln))
                if ent is not None:
                    return ent
        raise _VorbisError("undecodable codeword")


# ---------------------------------------------------------------------------
# Setup structures (plain attribute bags)


class _Floor0:
    __slots__ = ("order", "rate", "bark_map_size", "amp_bits",
                 "amp_offset", "books")

    def __init__(self, bits, n_books):
        self.order = bits.read(8)
        self.rate = bits.read(16)
        self.bark_map_size = bits.read(16)
        self.amp_bits = bits.read(6)
        self.amp_offset = bits.read(8)
        count = bits.read(4) + 1
        self.books = [bits.read(8) for _ in range(count)]
        if any(b >= n_books for b in self.books):
            raise _VorbisError("floor0 book out of range")


class _Floor1:
    __slots__ = ("partition_classes", "class_dims", "class_subs",
                 "masterbooks", "subbooks", "multiplier", "xs",
                 "sort_order", "lo_nbr", "hi_nbr")

    def __init__(self, bits, n_books):
        partitions = bits.read(5)
        self.partition_classes = [bits.read(4) for _ in range(partitions)]
        maxc = (max(self.partition_classes) + 1) if partitions else 0
        self.class_dims = []
        self.class_subs = []
        self.masterbooks = []
        self.subbooks = []
        for _ in range(maxc):
            self.class_dims.append(bits.read(3) + 1)
            subs = bits.read(2)
            self.class_subs.append(subs)
            if subs:
                mb = bits.read(8)
                if mb >= n_books:
                    raise _VorbisError("floor1 masterbook out of range")
                self.masterbooks.append(mb)
            else:
                self.masterbooks.append(None)
            sb = []
            for _ in range(1 << subs):
                b = bits.read(8) - 1
                if b >= n_books:
                    raise _VorbisError("floor1 subbook out of range")
                sb.append(b if b >= 0 else None)
            self.subbooks.append(sb)
        self.multiplier = bits.read(2) + 1
        rangebits = bits.read(4)
        xs = [0, 1 << rangebits]
        for pc in self.partition_classes:
            for _ in range(self.class_dims[pc]):
                xs.append(bits.read(rangebits))
        if len(xs) > 65 or len(set(xs)) != len(xs):
            raise _VorbisError("floor1 X list invalid")
        self.xs = xs
        # spec §7.2.2: neighbor search and the final sort both use the
        # (static) X list — precompute here
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        self.sort_order = order
        self.lo_nbr = [0] * len(xs)
        self.hi_nbr = [0] * len(xs)
        for i in range(2, len(xs)):
            lo = hi = None
            for j in range(i):
                if xs[j] < xs[i] and (lo is None or xs[j] > xs[lo]):
                    lo = j
                if xs[j] > xs[i] and (hi is None or xs[j] < xs[hi]):
                    hi = j
            self.lo_nbr[i] = lo
            self.hi_nbr[i] = hi


class _Residue:
    __slots__ = ("rtype", "begin", "end", "psize", "classifications",
                 "classbook", "books", "active_passes")

    def __init__(self, bits, rtype, n_books):
        self.rtype = rtype
        self.begin = bits.read(24)
        self.end = bits.read(24)
        self.psize = bits.read(24) + 1
        self.classifications = bits.read(6) + 1
        self.classbook = bits.read(8)
        if self.classbook >= n_books:
            raise _VorbisError("residue classbook out of range")
        cascade = []
        for _ in range(self.classifications):
            low = bits.read(3)
            high = bits.read(5) if bits.read(1) else 0
            cascade.append((high << 3) | low)
        self.books = []
        for c in cascade:
            row = []
            for p in range(8):
                if c & (1 << p):
                    b = bits.read(8)
                    if b >= n_books:
                        raise _VorbisError("residue book out of range")
                    row.append(b)
                else:
                    row.append(None)
            self.books.append(row)
        # pass 0 always runs (it carries the classwords); later passes
        # with no book in ANY class decode nothing and are skipped
        self.active_passes = tuple(
            p for p in range(8)
            if p == 0 or any(row[p] is not None for row in self.books)
        )


class _Mapping:
    __slots__ = ("submaps", "coupling", "mux", "floor", "residue")

    def __init__(self, bits, channels, n_floors, n_residues):
        if bits.read(16) != 0:
            raise _VorbisError("nonzero mapping type")
        self.submaps = (bits.read(4) + 1) if bits.read(1) else 1
        self.coupling = []
        if bits.read(1):
            steps = bits.read(8) + 1
            cb = _ilog(channels - 1)
            for _ in range(steps):
                mag = bits.read(cb)
                ang = bits.read(cb)
                if mag == ang or mag >= channels or ang >= channels:
                    raise _VorbisError("bad coupling step")
                self.coupling.append((mag, ang))
        if bits.read(2) != 0:
            raise _VorbisError("nonzero mapping reserved bits")
        if self.submaps > 1:
            self.mux = [bits.read(4) for _ in range(channels)]
            if any(m >= self.submaps for m in self.mux):
                raise _VorbisError("mux out of range")
        else:
            self.mux = [0] * channels
        self.floor = []
        self.residue = []
        for _ in range(self.submaps):
            bits.read(8)  # unused time config
            f = bits.read(8)
            r = bits.read(8)
            if f >= n_floors or r >= n_residues:
                raise _VorbisError("submap floor/residue out of range")
            self.floor.append(f)
            self.residue.append(r)


class _Setup:
    __slots__ = ("channels", "rate", "bs", "codebooks", "floors",
                 "floor_types", "residues", "mappings", "modes")


def _parse_ident(pkt: bytes) -> _Setup:
    if len(pkt) < 30 or pkt[:7] != b"\x01vorbis":
        raise _VorbisError("bad identification header")
    b = _Bits(pkt[7:])
    if b.read(32) != 0:
        raise _VorbisError("unknown vorbis version")
    s = _Setup()
    s.channels = b.read(8)
    s.rate = b.read(32)
    if not s.channels or not s.rate:
        raise _VorbisError("zero channels or rate")
    b.read(32), b.read(32), b.read(32)  # bitrate hints
    bs0 = 1 << b.read(4)
    bs1 = 1 << b.read(4)
    if not (64 <= bs0 <= bs1 <= 8192):
        raise _VorbisError("bad blocksizes")
    s.bs = (bs0, bs1)
    if not b.read(1):
        raise _VorbisError("ident framing bit")
    return s


def _parse_setup(
    pkt: bytes, s: _Setup, budget: "_ParseBudget | None" = None
) -> None:
    if pkt[:7] != b"\x05vorbis":
        raise _VorbisError("bad setup header")
    if budget is None:
        budget = _ParseBudget()
    b = _Bits(pkt[7:])
    try:
        s.codebooks = [_Codebook(b, budget) for _ in range(b.read(8) + 1)]
        nb = len(s.codebooks)
        for _ in range(b.read(6) + 1):  # time domain transforms
            if b.read(16) != 0:
                raise _VorbisError("nonzero time transform")
        s.floors = []
        s.floor_types = []
        for _ in range(b.read(6) + 1):
            ft = b.read(16)
            if ft == 0:
                s.floors.append(_Floor0(b, nb))
            elif ft == 1:
                s.floors.append(_Floor1(b, nb))
            else:
                raise _VorbisError("reserved floor type")
            s.floor_types.append(ft)
        s.residues = []
        for _ in range(b.read(6) + 1):
            rt = b.read(16)
            if rt > 2:
                raise _VorbisError("reserved residue type")
            s.residues.append(_Residue(b, rt, nb))
        s.mappings = [
            _Mapping(b, s.channels, len(s.floors), len(s.residues))
            for _ in range(b.read(6) + 1)
        ]
        s.modes = []
        for _ in range(b.read(6) + 1):
            blockflag = b.read(1)
            if b.read(16) != 0 or b.read(16) != 0:
                raise _VorbisError("nonzero window/transform type")
            mapping = b.read(8)
            if mapping >= len(s.mappings):
                raise _VorbisError("mode mapping out of range")
            s.modes.append((blockflag, mapping))
        if not b.read(1):
            raise _VorbisError("setup framing bit")
    except _Eop:
        raise _VorbisError("truncated setup header")


# ---------------------------------------------------------------------------
# Floor 1 decode + curve


def _floor1_decode(b: _Bits, fl: _Floor1, books):
    """Per-packet floor1 amplitude decode (spec §7.2.3 step 1 input
    read). Returns the Y list or None when the channel is unused."""
    if not b.read(1):
        return None
    rng = _FLOOR1_RANGES[fl.multiplier - 1]
    ybits = _ilog(rng - 1)
    ys = [b.read(ybits), b.read(ybits)]
    for pc in fl.partition_classes:
        cdim = fl.class_dims[pc]
        cbits = fl.class_subs[pc]
        csub = (1 << cbits) - 1
        cval = books[fl.masterbooks[pc]].decode(b) if cbits else 0
        for _ in range(cdim):
            book = fl.subbooks[pc][cval & csub]
            cval >>= cbits
            ys.append(books[book].decode(b) if book is not None else 0)
    return ys


def _render_point(x0, y0, x1, y1, x):
    """spec §9.2.6 — integer midpoint prediction."""
    dy = y1 - y0
    adx = x1 - x0
    off = abs(dy) * (x - x0) // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0, y0, x1, y1, v):
    """spec §9.2.7 — integer Bresenham into v[x0:x1]. `base` uses C
    truncation-toward-zero division (same pitfall as VP8L predictor
    13: Python floor division would be off by one for negative dy).
    Vectorized via the exact closed form of the error recurrence:
    after s steps the accumulated error has overflowed exactly
    floor(ady*s/adx) times, so y(s) = y0 + base*s + d*(ady*s//adx)
    with d = +/-1 the overflow step direction (scalar-loop-equivalent,
    pinned against the naive per-pixel render in tests/test_vorbis)."""
    dy = y1 - y0
    adx = x1 - x0
    base = abs(dy) // adx
    d = 1
    if dy < 0:
        base = -base
        d = -1
    ady = abs(dy) - abs(base) * adx
    lim = min(x1, len(v))
    if x0 < len(v):
        v[x0] = y0
    if lim - x0 > 1:
        s = np.arange(1, lim - x0)
        v[x0 + 1 : lim] = y0 + base * s + d * ((ady * s) // adx)


def _floor1_curve(fl: _Floor1, ys, n2: int) -> np.ndarray:
    """spec §7.2.3 steps 1+2: predictive final_Y synthesis, then the
    sorted render pass through floor1_inverse_dB_table."""
    rng = _FLOOR1_RANGES[fl.multiplier - 1]
    count = len(fl.xs)
    final = [0] * count
    step2 = [False] * count
    final[0], final[1] = ys[0], ys[1]
    step2[0] = step2[1] = True
    for i in range(2, count):
        lo, hi = fl.lo_nbr[i], fl.hi_nbr[i]
        pred = _render_point(
            fl.xs[lo], final[lo], fl.xs[hi], final[hi], fl.xs[i]
        )
        val = ys[i]
        highroom = rng - pred
        lowroom = pred
        room = 2 * min(highroom, lowroom)
        if val:
            step2[lo] = step2[hi] = step2[i] = True
            if val >= room:
                final[i] = (
                    val - lowroom + pred
                    if highroom > lowroom
                    else pred - val + highroom - 1
                )
            elif val & 1:
                final[i] = pred - ((val + 1) >> 1)
            else:
                final[i] = pred + (val >> 1)
        else:
            final[i] = pred
        # NO range clamp here: spec §7.2.4 and libvorbis/stb_vorbis
        # carry out-of-range final_Y values into later _render_point
        # predictions unclamped; the render pass's np.clip(yv, 0, 255)
        # is the only clip, matching reference decoders bit-for-bit on
        # streams where val >= room pushes a point out of range
    # step 2: render along sorted X
    yv = np.zeros(n2, dtype=np.int64)
    order = fl.sort_order
    hx = 0
    lx = 0
    ly = final[order[0]] * fl.multiplier
    hy = ly
    for i in order[1:]:
        if not step2[i]:
            continue
        hy = final[i] * fl.multiplier
        hx = fl.xs[i]
        if lx < n2:
            # pass hx UNclamped: _render_line clamps the write range
            # itself, and clamping x1 here would flatten the slope
            # (dy/adx) whenever the floor's X span exceeds n2
            _render_line(lx, ly, hx, hy, yv)
        lx, ly = hx, hy
    if hx < n2:
        yv[hx:] = ly if hx == 0 else hy
    np.clip(yv, 0, 255, out=yv)
    return _INVERSE_DB[yv]


# ---------------------------------------------------------------------------
# Residue decode


def _residue_decode(b: _Bits, res: _Residue, books, dnd, n2: int):
    """Decode one residue set (spec §8.6.2) for ``len(dnd)`` channels;
    returns float64 (channels, n2). Type 2 interleaves all channels
    into one vector unless every channel is do-not-decode."""
    ch = len(dnd)
    out = np.zeros((ch, n2), dtype=np.float64)
    if res.rtype == 2:
        if all(dnd):
            return out
        inter = np.zeros(ch * n2, dtype=np.float64)
        _residue_partitions(b, res, books, [inter], [False], ch * n2)
        for c in range(ch):
            out[c] = inter[c::ch]
        return out
    vecs = [out[c] for c in range(ch)]
    _residue_partitions(b, res, books, vecs, dnd, n2)
    return out


def _residue_partitions(b, res, books, vecs, dnd, actual_size):
    begin = min(res.begin, actual_size)
    end = min(res.end, actual_size)
    n_read = end - begin
    if n_read <= 0:
        return
    psize = res.psize
    parts = n_read // psize
    classbook = books[res.classbook]
    cwords = classbook.dim
    if cwords < 1:
        # a dim-0 classbook would never advance the partition cursor
        raise _VorbisError("residue classbook with zero dimension")
    ch = len(vecs)
    classes = [[0] * (parts + cwords) for _ in range(ch)]
    try:
        for p in res.active_passes:
            pc = 0
            while pc < parts:
                if p == 0:
                    for j in range(ch):
                        if dnd[j]:
                            continue
                        temp = classbook.decode(b)
                        for i in range(cwords - 1, -1, -1):
                            classes[j][pc + i] = temp % res.classifications
                            temp //= res.classifications
                for _ in range(cwords):
                    if pc >= parts:
                        break
                    for j in range(ch):
                        if dnd[j]:
                            continue
                        vqbook = res.books[classes[j][pc]][p]
                        if vqbook is None:
                            continue
                        book = books[vqbook]
                        if book.vq is None or book.dim < 1:
                            raise _VorbisError("residue book has no VQ")
                        off = begin + pc * psize
                        v = vecs[j]
                        dim = book.dim
                        dec = book.decode
                        # decode the partition's codewords first, then
                        # apply ONE gathered add — tiny per-codeword
                        # slice adds dominate the profile otherwise
                        if res.rtype == 0:
                            step = psize // dim
                            entries = [dec(b) for _ in range(step)]
                            # value i of codeword s lands at off+s+i*step
                            v[off : off + dim * step] += (
                                book.vq[entries].T.ravel())
                        else:  # types 1 and 2 lay values sequentially
                            entries = [dec(b)
                                       for _ in range(psize // dim)]
                            n_fill = len(entries) * dim
                            v[off : off + n_fill] += (
                                book.vq[entries].ravel())
                            # dim not dividing psize: the straddling
                            # vector writes its FULL dim past the
                            # partition limit (spec pseudocode),
                            # clipped only at the vector end
                            i = n_fill
                            while i < psize:
                                vt = book.vq[dec(b)]
                                k = min(dim, len(v) - (off + i))
                                if k > 0:
                                    v[off + i : off + i + k] += vt[:k]
                                i += dim
                    pc += 1
    except _Eop:
        pass  # spec: EOP mid-residue leaves the remainder zero


# ---------------------------------------------------------------------------
# IMDCT + windows


@lru_cache(maxsize=16)
def _imdct_consts(n: int):
    j = np.arange(n)
    m = 2 * j + 1 + n // 2
    tw = np.exp(1j * np.pi * m / (4 * n))
    return (m % (4 * n), tw)


def _imdct(X: np.ndarray, n: int) -> np.ndarray:
    """Inverse MDCT per the spec transform:
    y[j] = sum_k X[k] cos(pi/(4n) * (2j+1+n/2) * (2k+1)), k < n/2 —
    realized exactly via a length-4n inverse FFT (pinned against the
    direct cosine sum in tests/test_vorbis.py)."""
    idx, tw = _imdct_consts(n)
    G = np.fft.ifft(X, 4 * n) * (4 * n)
    return np.real(tw * G[idx])


@lru_cache(maxsize=32)
def _window_shape(n, left_start, left_size, right_start, right_size):
    """Vorbis window (spec §4.3.1): sin(pi/2 * sin^2(...)) slopes with
    zero/one flats determined by the block transition geometry."""
    w = np.zeros(n, dtype=np.float64)
    i = np.arange(left_size)
    w[left_start : left_start + left_size] = np.sin(
        0.5 * np.pi * np.sin((i + 0.5) / left_size * 0.5 * np.pi) ** 2
    )
    w[left_start + left_size : right_start] = 1.0
    j = np.arange(right_size)
    w[right_start : right_start + right_size] = np.sin(
        0.5 * np.pi
        * np.sin((j + 0.5) / right_size * 0.5 * np.pi + 0.5 * np.pi) ** 2
    )
    return w


def _window_geometry(n, blockflag, prev_flag, next_flag, bs0):
    """Left/right slope placement per spec §4.3.1's long-block
    transition rules; short blocks always use full-width slopes."""
    if blockflag and not prev_flag:
        left_start = n // 4 - bs0 // 4
        left_size = bs0 // 2
    else:
        left_start = 0
        left_size = n // 2
    if blockflag and not next_flag:
        right_start = 3 * n // 4 - bs0 // 4
        right_size = bs0 // 2
    else:
        right_start = n // 2
        right_size = n // 2
    return left_start, left_size, right_start, right_size


# ---------------------------------------------------------------------------
# Ogg framing


def _ogg_chain(data: bytes, start: int, max_pages: int, first: bool):
    """Reassemble the packets of ONE Vorbis logical stream starting at
    byte ``start`` (lacing values, continued packets, BOS/EOS) per
    RFC 3533. In a multiplexed group (audio+video) all BOS pages come
    first, so the walk locks onto the first BOS page whose packet
    starts with the Vorbis identification signature; non-Vorbis pages
    (other codecs' BOS, their data pages) are skipped. ``first``
    preserves the degenerate fallback for headerless input: the very
    first page's serial is accepted even without a Vorbis BOS (the
    header parse then rejects garbage). Page CRCs are not verified
    (liberal acceptance — same stance as the header walker). Returns
    (packets, last_granule, end_pos) with end_pos just past this
    chain's EOS page (the scan cursor for the next chain)."""
    packets = []
    partial = bytearray()
    serial0 = None
    last_granule = None
    pos = start
    pages = 0
    while pos + 27 <= len(data) and pages < max_pages:
        if data[pos : pos + 4] != b"OggS" or data[pos + 4] != 0:
            break
        htype = data[pos + 5]
        granule = int.from_bytes(data[pos + 6 : pos + 14], "little",
                                 signed=True)
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        nseg = data[pos + 26]
        seg_table = data[pos + 27 : pos + 27 + nseg]
        if len(seg_table) < nseg:
            break
        body = pos + 27 + nseg
        if serial0 is None:
            is_bos = bool(htype & 0x02)
            is_vorbis_bos = is_bos and (
                data[body : body + 7] == b"\x01vorbis")
            # degenerate fallback: a headerless FIRST page (no BOS at
            # all) is accepted so the header parse can reject it; a
            # non-Vorbis BOS is always skipped (mux groups)
            degenerate = first and pos == start and not is_bos
            if not (is_vorbis_bos or degenerate):
                # another codec's page (its BOS, or its data pages
                # trailing a previous chain): skip, keep scanning
                pos = body + sum(seg_table)
                pages += 1
                continue
            serial0 = serial
        mine = serial == serial0
        if mine and not (htype & 0x01):
            partial = bytearray()  # fresh page must not continue
        off = body
        for k, lace in enumerate(seg_table):
            seg = data[off : off + lace]
            off += lace
            if not mine:
                continue
            partial += seg
            if lace < 255:
                packets.append(bytes(partial))
                partial = bytearray()
        if mine and granule >= 0:
            last_granule = granule
        pos = body + sum(seg_table)
        pages += 1
        if mine and (htype & 0x04):
            break
    return packets, last_granule, pos


def _ogg_packets(data: bytes, max_pages: int = 1 << 20):
    """First Vorbis chain of an Ogg stream (the single-chain entry the
    tests and header walkers use). Returns (packets, last_granule)."""
    if data[:4] != b"OggS":
        raise _VorbisError("not an Ogg stream")
    packets, last_granule, _ = _ogg_chain(data, 0, max_pages, True)
    return packets, last_granule


# ---------------------------------------------------------------------------
# Top-level decode


def vorbis_pcm_samples(data: bytes, max_samples: int = 1 << 24):
    """REAL Vorbis sample decode of an Ogg stream, including CHAINED
    streams (sequential logical streams in one file — webradio dumps,
    concatenated encodes): every chain decodes with its own setup
    header, and chains whose channel count and rate match the first
    are concatenated; a parameter-changing chain ends the decode at
    that boundary (honest prefix, never resampled glue). Returns
    (interleaved float64 samples, channels, rate, 'vorbis-pcm') or
    None when the first chain is not fully decodable (callers fall
    back to Ogg header stats)."""
    try:
        if len(data) > (64 << 20):
            return None
        if data[:4] != b"OggS":
            return None
        pos = 0
        first = True
        out = None
        parts = []
        budget = max_samples
        # ONE parse budget across ALL chains: a crafted file cannot
        # multiply the per-header codebook cost by chaining thousands
        # of setup headers (see _ParseBudget)
        parse_budget = _ParseBudget()
        while pos + 27 <= len(data):
            packets, last_granule, pos = _ogg_chain(
                data, pos, 1 << 20, first)
            if not packets:
                break
            try:
                dec = _decode_packets(
                    packets, last_granule, budget, parse_budget)
            except (_VorbisError, _Eop):
                dec = None
            if dec is None:
                if first:
                    return None
                break  # later chain undecodable: keep the prefix
            if first:
                out = dec
                parts.append(dec[0])
            else:
                if dec[1] != out[1] or dec[2] != out[2]:
                    break  # parameter change: stop at the boundary
                parts.append(dec[0])
            budget -= len(parts[-1])
            first = False
        if out is None:
            return None
        samples = parts[0] if len(parts) == 1 else np.concatenate(parts)
        return samples, out[1], out[2], "vorbis-pcm"
    except (_VorbisError, _Eop):
        return None
    except Exception:  # hostile bytes must degrade, never raise
        return None


def vorbis_packets_pcm(packets, granule=None, max_samples: int = 1 << 24):
    """REAL Vorbis sample decode from an already-demuxed packet list
    (3 header packets + audio packets) — the entry point for Vorbis in
    non-Ogg containers (Matroska/WebM ``A_VORBIS`` tracks, whose
    CodecPrivate carries the three headers Xiph-laced). ``granule``
    optionally caps the emitted sample count the way the final Ogg
    page granule does; Matroska has no equivalent, so WebM callers
    leave it None and get the full lapped output."""
    try:
        return _decode_packets(list(packets), granule, max_samples)
    except (_VorbisError, _Eop):
        return None
    except Exception:  # hostile bytes must degrade, never raise
        return None


def _decode_packets(
    packets, last_granule, max_samples: int,
    budget: "_ParseBudget | None" = None,
):
    if len(packets) < 3:
        return None
    s = _parse_ident(packets[0])
    if packets[1][:7] != b"\x03vorbis":
        return None
    _parse_setup(packets[2], s, budget)
    if 0 in s.floor_types:
        # legacy LSP floors: parsed for sync, not synthesized
        return None
    ch = s.channels
    bs0, bs1 = s.bs
    books = s.codebooks
    n_modes = len(s.modes)
    mode_bits = _ilog(n_modes - 1)

    cap = max_samples // ch
    acc = None
    acc_len = 0
    # bias the origin by bs1: a long block right after a short first
    # block legally starts BEFORE the first block's first sample
    # (offset = prev_right_start - left_start goes negative by up to
    # ~bs1/4), and a negative offset would wrap the numpy slice
    offset = bs1  # absolute sample index of current block start
    emit_start = None
    finish = 0
    prev_right_start = None  # absolute
    for pkt in packets[3:]:
        if not pkt:
            continue
        b = _Bits(pkt)
        try:
            if b.read(1):
                continue  # non-audio packet type in the audio section
            mode_idx = b.read(mode_bits) if mode_bits else 0
            if mode_idx >= n_modes:
                continue
            blockflag, mapping_idx = s.modes[mode_idx]
            n = bs1 if blockflag else bs0
            if blockflag:
                prev_flag = b.read(1)
                next_flag = b.read(1)
            else:
                prev_flag = next_flag = 1
        except _Eop:
            continue
        mp = s.mappings[mapping_idx]
        n2 = n // 2

        floor_ys = [None] * ch
        residue_v = np.zeros((ch, n2), dtype=np.float64)
        try:
            for c in range(ch):
                fl = s.floors[mp.floor[mp.mux[c]]]
                floor_ys[c] = _floor1_decode(b, fl, books)
            no_res = [floor_ys[c] is None for c in range(ch)]
            for mag, ang in mp.coupling:
                if not (no_res[mag] and no_res[ang]):
                    no_res[mag] = no_res[ang] = False
            for sm in range(mp.submaps):
                ch_list = [c for c in range(ch) if mp.mux[c] == sm]
                res = s.residues[mp.residue[sm]]
                dec = _residue_decode(
                    b, res, books, [no_res[c] for c in ch_list], n2
                )
                for i, c in enumerate(ch_list):
                    residue_v[c] = dec[i]
        except _Eop:
            pass  # remainder of the spectrum is zero, per spec

        # inverse coupling (spec §4.3.5), steps in reverse order
        for mag, ang in reversed(mp.coupling):
            M = residue_v[mag]
            A = residue_v[ang]
            # piecewise per spec pseudocode:
            #   M>0, A>0: M'=M,   A'=M-A      M>0, A<=0: A'=M, M'=M+A
            #   M<=0,A>0: M'=M,   A'=M+A      M<=0,A<=0: A'=M, M'=M-A
            pos_m = M > 0
            pos_a = A > 0
            new_m = np.where(
                pos_m,
                np.where(pos_a, M, M + A),
                np.where(pos_a, M, M - A),
            )
            new_a = np.where(
                pos_m,
                np.where(pos_a, M - A, M),
                np.where(pos_a, M + A, M),
            )
            residue_v[mag] = new_m
            residue_v[ang] = new_a

        # floor curve * residue -> spectrum, then IMDCT + window
        left_start, left_size, right_start, right_size = _window_geometry(
            n, blockflag, prev_flag, next_flag, bs0
        )
        w = _window_shape(n, left_start, left_size, right_start, right_size)

        # lap alignment: this block's left slope start coincides with
        # the previous block's right slope start
        if prev_right_start is not None:
            offset = prev_right_start - left_start
        if emit_start is None:
            emit_start = offset + right_start
        need = offset + n
        if need > cap:
            return None  # stream larger than the decode bound
        if acc is None or need > acc.shape[1]:
            new_len = max(need, 4096, (acc.shape[1] * 2) if acc is not None
                          else 0)
            grown = np.zeros((ch, new_len), dtype=np.float64)
            if acc is not None:
                grown[:, : acc_len] = acc[:, :acc_len]
            acc = grown
        for c in range(ch):
            ys = floor_ys[c]
            if ys is None:
                continue
            fl = s.floors[mp.floor[mp.mux[c]]]
            spectrum = residue_v[c] * _floor1_curve(fl, ys, n2)
            acc[c, offset : offset + n] += _imdct(spectrum, n) * w
        acc_len = max(acc_len, need)
        prev_right_start = offset + right_start
        finish = prev_right_start

    if emit_start is None or finish <= emit_start:
        return None
    total = finish - emit_start
    if last_granule is not None:
        total = min(total, last_granule)
    if total <= 0:
        return None
    out = acc[:, emit_start : emit_start + total]
    return np.ravel(out, order="F"), ch, s.rate, "vorbis-pcm"
