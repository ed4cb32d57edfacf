"""WebP lossless (VP8L) codec, pure python/numpy — decoder AND encoder.

Implements the public VP8L bitstream (RFC 9649 / WebP lossless spec):

- LSB-first bit stream, 14-bit dims header.
- All four transforms: predictor (14 modes, per-tile, subresolution
  mode image), cross-color (signed 3.5 fixed-point deltas), subtract-green,
  color indexing (palette, delta-coded, sub-byte pixel bundling).
- Canonical prefix codes, DEFLATE convention: "simple" (1-2 symbol) codes
  and "normal" codes whose code lengths are themselves prefix-coded via the
  19-symbol code-length code (incl. repeat ops 16/17/18 and the
  max_symbol early-stop).
- Color cache (0x1e35a7bd multiplicative hash).
- LZ77 backward references with the 40-symbol distance alphabet and the
  120-entry 2D distance-to-neighborhood mapping.
- Optional meta prefix-code image (per-tile code-group selection).

The encoder is the deterministic synth side (same round-trip discipline as
the PNG/GIF/JPEG codecs): it emits real canonical prefix codes (simple and
normal, with 16/17/18 run-length code-length coding), optional transforms,
optional color cache and a greedy LZ77 (distance-1 / distance-width runs),
so every decoder path is exercised by round-trip tests. Lossy WebP (VP8)
needs a full intra-prediction + boolean-arithmetic video decoder and stays
the honest boundary, as does animation (ANIM/ANMF).

The reference engine treats images as opaque blobs; this codec is part of
the training-data-pipeline extension surface (multimodal decode).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_webp", "encode_webp_lossless", "decode_vp8l", "encode_vp8l"]

# code-length-code symbol transmission order (spec §"Normal Code Length Code")
_CLCODE_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 120-entry distance-code -> (dx, dy) 2D neighborhood map (spec §"Decoding
# the Code", distance mapping); dist = dy * width + dx, min 1. Derived from
# the public plane_to_code_lut grid (8 rows x 16 cols; dx = 8 - col,
# dy = row; 255 cells = invalid dy=0, dx<=0 positions): table[code] is the
# grid cell whose value is `code`. Unique 0..119, dy in 0..7, dx in -7..8;
# the first 24 entries match the RFC 9649 listing verbatim.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


# ---------------------------------------------------------------------------
# bit I/O (LSB-first)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise NotImplementedError("VP8L bitstream truncated")
        byte0 = self.pos >> 3
        nbytes = ((end + 7) >> 3) - byte0
        chunk = int.from_bytes(self.data[byte0 : byte0 + nbytes], "little")
        val = (chunk >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos = end
        return val


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.cur |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def getvalue(self) -> bytes:
        out = bytes(self.buf)
        if self.nbits:
            out += bytes([self.cur & 0xFF])
        return out


# ---------------------------------------------------------------------------
# canonical prefix codes (DEFLATE convention: codes assigned in (length,
# symbol) order, bits read/written MSB-of-code first)
# ---------------------------------------------------------------------------


class _PrefixCode:
    """Decoder-side canonical code from a lengths array."""

    def __init__(self, lengths):
        lengths = list(lengths)
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise NotImplementedError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        self.single = None
        maxlen = max(ln for ln, _ in nz)
        if maxlen > 15:
            raise NotImplementedError("prefix code length > 15")
        bl_count = [0] * (maxlen + 1)
        for ln, _ in nz:
            bl_count[ln] += 1
        # Kraft check: complete codes only (spec requirement)
        kraft = sum(bl_count[ln] << (maxlen - ln) for ln in range(1, maxlen + 1))
        if kraft != (1 << maxlen):
            raise NotImplementedError("over/under-subscribed prefix code")
        code = 0
        self.first_code = [0] * (maxlen + 1)
        self.offset = [0] * (maxlen + 1)
        self.count = bl_count
        nz.sort()
        self.symbols = [sym for _, sym in nz]
        off = 0
        for ln in range(1, maxlen + 1):
            self.first_code[ln] = code
            self.offset[ln] = off
            code = (code + bl_count[ln]) << 1
            off += bl_count[ln]
        self.maxlen = maxlen

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | br.read(1)
            idx = code - self.first_code[ln]
            if 0 <= idx < self.count[ln]:
                return self.symbols[self.offset[ln] + idx]
        raise NotImplementedError("invalid prefix code word")


def _huffman_lengths(freqs, max_len: int) -> list[int]:
    """Length-limited huffman code lengths (complete Kraft). Deterministic;
    skewed counts are halved until the depth fits max_len."""
    freqs = list(freqs)
    n = len(freqs)
    used = [i for i in range(n) if freqs[i] > 0]
    lengths = [0] * n
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    f = [max(1, x) if i in set(used) else 0 for i, x in enumerate(freqs)]
    while True:
        import heapq

        heap = [(f[i], i, ("leaf", i)) for i in used]
        heapq.heapify(heap)
        tick = n
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            heapq.heappush(heap, (a[0] + b[0], tick, ("node", a[2], b[2])))
            tick += 1
        depths = {}

        def walk(t, d):
            if t[0] == "leaf":
                depths[t[1]] = max(1, d)
            else:
                walk(t[1], d + 1)
                walk(t[2], d + 1)

        walk(heap[0][2], 0)
        if max(depths.values()) <= max_len:
            for i, d in depths.items():
                lengths[i] = d
            return lengths
        f = [(x + 1) // 2 if x > 0 else 0 for x in f]


def _canonical_codes(lengths) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    maxlen = max(lengths) if lengths else 0
    bl_count = [0] * (maxlen + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (maxlen + 1)
    for ln in range(1, maxlen + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym in sorted(range(len(lengths)), key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _write_code_msb(bw: _BitWriter, code: int, length: int) -> None:
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


# ---------------------------------------------------------------------------
# LZ77 prefix-value coding (shared by length and distance alphabets)
# ---------------------------------------------------------------------------


def _lz77_decode_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_code_for(v: int) -> tuple[int, int, int]:
    """value (>=1) -> (prefix_code, extra_bits, extra_value)."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    extra = x.bit_length() - 2
    rem = x - (2 << extra)
    hi = rem >> extra  # 0 or 1
    return 2 + 2 * extra + hi, extra, rem & ((1 << extra) - 1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_bits = 8 if br.read(1) else 1
        lengths = [0] * alphabet_size
        s0 = br.read(first_bits)
        if s0 >= alphabet_size:
            raise NotImplementedError("simple-code symbol out of range")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise NotImplementedError("bad simple-code symbols")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _PrefixCode(lengths)
    # normal code: code lengths are themselves prefix-coded
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CLCODE_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_nz = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = cl_code.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_nz = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_nz
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _PrefixCode(lengths)


def _read_code_group(br: _BitReader, cache_size: int) -> list[_PrefixCode]:
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    return [_read_prefix_code(br, s) for s in sizes]


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, is_level0: bool
) -> np.ndarray:
    """Decode an entropy-coded ARGB image (spatially-coded when level0:
    optional meta prefix groups). Returns uint32 array (h*w,) of ARGB."""
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):  # meta prefix codes present
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)  # (r<<8)|g
        n_groups = int(meta.max()) + 1
        meta_w = mw
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise NotImplementedError("color cache bits > 11")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = np.zeros(cache_size, np.uint32) if cache_size else None
    groups = [_read_code_group(br, cache_size) for _ in range(n_groups)]

    n = w * h
    out = np.zeros(n, np.uint32)
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])]
        else:
            g = groups[0]
        s = g[0].decode(br)
        if s < 256:  # literal: green, then red, blue, alpha
            green = s
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            px = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _lz77_decode_value(s - 256, br)
            dist_code = _lz77_decode_value(g[4].decode(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > n:
                raise NotImplementedError("VP8L backward reference out of range")
            for k in range(length):
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[(0x1E35A7BD * int(px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += 1
        else:  # color cache
            if cache is None:
                raise NotImplementedError("cache symbol without color cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _avg2(a, b):
    return (a + b) // 2


def _predict(mode: int, argb: np.ndarray, w: int, pos: int) -> int:
    """One predicted ARGB pixel (python ints; per-channel byte math)."""

    def chans(p):
        p = int(p)
        return [(p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF]

    def pack(cs):
        return (cs[0] << 24) | (cs[1] << 16) | (cs[2] << 8) | cs[3]

    x = pos % w
    L = argb[pos - 1] if x > 0 else None
    T = argb[pos - w] if pos >= w else None
    TL = argb[pos - w - 1] if (pos >= w and x > 0) else None
    # top-right: one past the top pixel; for the rightmost column this is
    # the first pixel of the CURRENT row (libwebp memory layout semantics)
    TR = argb[pos - w + 1] if pos >= w else None
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return int(L)
    if mode == 2:
        return int(T)
    if mode == 3:
        return int(TR)
    if mode == 4:
        return int(TL)
    cl, ct = chans(L), chans(T)
    if mode == 5:
        ctr = chans(TR)
        return pack([_avg2(_avg2(cl[i], ctr[i]), ct[i]) for i in range(4)])
    if mode == 6:
        ctl = chans(TL)
        return pack([_avg2(cl[i], ctl[i]) for i in range(4)])
    if mode == 7:
        return pack([_avg2(cl[i], ct[i]) for i in range(4)])
    if mode == 8:
        ctl = chans(TL)
        return pack([_avg2(ctl[i], ct[i]) for i in range(4)])
    if mode == 9:
        ctr = chans(TR)
        return pack([_avg2(ct[i], ctr[i]) for i in range(4)])
    if mode == 10:
        ctl, ctr = chans(TL), chans(TR)
        return pack([
            _avg2(_avg2(cl[i], ctl[i]), _avg2(ct[i], ctr[i])) for i in range(4)
        ])
    if mode == 11:  # Select
        ctl = chans(TL)
        p = [cl[i] + ct[i] - ctl[i] for i in range(4)]
        pL = sum(abs(p[i] - cl[i]) for i in range(4))
        pT = sum(abs(p[i] - ct[i]) for i in range(4))
        return int(L) if pL < pT else int(T)
    if mode == 12:  # ClampAddSubtractFull
        ctl = chans(TL)
        return pack([
            min(255, max(0, cl[i] + ct[i] - ctl[i])) for i in range(4)
        ])
    if mode == 13:  # ClampAddSubtractHalf
        ctl = chans(TL)
        out = []
        for i in range(4):
            a = _avg2(cl[i], ct[i])
            d = a - ctl[i]
            half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
            out.append(min(255, max(0, a + half)))
        return pack(out)
    raise NotImplementedError(f"predictor mode {mode}")


def _apply_inverse_predictor(
    argb: np.ndarray, w: int, h: int, size_bits: int, modes: np.ndarray
) -> None:
    tiles_w = (w + (1 << size_bits) - 1) >> size_bits
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred, mode = 0xFF000000, 0
        elif y == 0:
            pred = int(argb[pos - 1])  # mode 1 (left) on first row
        elif x == 0:
            pred = int(argb[pos - w])  # mode 2 (top) on first column
        else:
            mode = (int(modes[(y >> size_bits) * tiles_w + (x >> size_bits)]) >> 8) & 0xFF
            pred = _predict(mode, argb, w, pos)
        # per-channel byte add
        p = int(argb[pos])
        s = (
            (((p >> 24) + (pred >> 24)) & 0xFF) << 24
            | ((((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
            | ((((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
            | (((p & 0xFF) + (pred & 0xFF)) & 0xFF)
        )
        argb[pos] = s


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 product, arithmetic >> 5."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _apply_inverse_color_transform(
    argb: np.ndarray, w: int, h: int, size_bits: int, elements: np.ndarray
) -> None:
    tiles_w = (w + (1 << size_bits) - 1) >> size_bits
    for pos in range(w * h):
        x, y = pos % w, pos // w
        el = int(elements[(y >> size_bits) * tiles_w + (x >> size_bits)])
        g2r = (el >> 16) & 0xFF  # red channel of the element pixel
        g2b = (el >> 8) & 0xFF   # green channel
        r2b = el & 0xFF          # blue channel
        p = int(argb[pos])
        a = (p >> 24) & 0xFF
        r = (p >> 16) & 0xFF
        g = (p >> 8) & 0xFF
        b = p & 0xFF
        r = (r + _ct_delta(g2r, g)) & 0xFF
        b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
        argb[pos] = (a << 24) | (r << 16) | (g << 8) | b


def decode_vp8l(data: bytes) -> dict:
    """Decode a raw VP8L payload (the bytes inside the RIFF 'VP8L' chunk)."""
    br = _BitReader(bytes(data))
    if br.read(8) != 0x2F:
        raise NotImplementedError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    _alpha_hint = br.read(1)
    if br.read(3) != 0:
        raise NotImplementedError("VP8L version != 0")

    transforms = []  # (type, data) in read order
    seen = set()
    dec_w = w  # width of the entropy-coded image (indexing may pack it)
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise NotImplementedError("repeated VP8L transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            size_bits = br.read(3) + 2
            tw = (dec_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            modes = _decode_entropy_image(br, tw, th, False)
            transforms.append((0, (size_bits, modes)))
        elif ttype == 1:  # cross-color
            size_bits = br.read(3) + 2
            tw = (dec_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            els = _decode_entropy_image(br, tw, th, False)
            transforms.append((1, (size_bits, els)))
        elif ttype == 2:  # subtract green
            transforms.append((2, None))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1, False)
            pal = pal_img.astype(np.uint32)
            # delta-coded per channel
            for i in range(1, n_colors):
                p, q = int(pal[i]), int(pal[i - 1])
                pal[i] = (
                    (((p >> 24) + (q >> 24)) & 0xFF) << 24
                    | ((((p >> 16) & 0xFF) + ((q >> 16) & 0xFF)) & 0xFF) << 16
                    | ((((p >> 8) & 0xFF) + ((q >> 8) & 0xFF)) & 0xFF) << 8
                    | (((p & 0xFF) + (q & 0xFF)) & 0xFF)
                )
            if n_colors <= 2:
                xbits = 3
            elif n_colors <= 4:
                xbits = 2
            elif n_colors <= 16:
                xbits = 1
            else:
                xbits = 0
            dec_w = (w + (1 << xbits) - 1) >> xbits
            transforms.append((3, (n_colors, pal, xbits)))

    argb = _decode_entropy_image(br, dec_w, h, True)
    cur_w = dec_w

    for ttype, tdata in reversed(transforms):
        if ttype == 0:
            _apply_inverse_predictor(argb, cur_w, h, tdata[0], tdata[1])
        elif ttype == 1:
            _apply_inverse_color_transform(argb, cur_w, h, tdata[0], tdata[1])
        elif ttype == 2:
            a = (argb >> 24) & 0xFF
            r = (argb >> 16) & 0xFF
            g = (argb >> 8) & 0xFF
            b = argb & 0xFF
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
            argb = (a << 24) | (r << 16) | (g << 8) | b
        else:  # color indexing: unbundle + palette lookup
            n_colors, pal, xbits = tdata
            img = argb.reshape(h, cur_w)
            green = (img >> 8) & 0xFF
            if xbits:
                per = 1 << xbits
                bits = 8 >> xbits
                cols = []
                for k in range(per):
                    cols.append((green >> (k * bits)) & ((1 << bits) - 1))
                idx = np.stack(cols, axis=2).reshape(h, cur_w * per)[:, :w]
            else:
                idx = green
            oob = idx >= n_colors
            lut = pal.copy()
            out = lut[np.where(oob, 0, idx)]
            out[oob] = 0  # spec: out-of-range palette index -> transparent black
            argb = out.reshape(-1)
            cur_w = w

    px = np.zeros((h, w, 4), np.uint8)
    img = argb.reshape(h, w)
    px[:, :, 0] = (img >> 16) & 0xFF  # R
    px[:, :, 1] = (img >> 8) & 0xFF   # G
    px[:, :, 2] = img & 0xFF          # B
    px[:, :, 3] = (img >> 24) & 0xFF  # A
    channels = 4 if (px[:, :, 3] != 255).any() else 3
    if channels == 3:
        px = px[:, :, :3]
    return {"width": w, "height": h, "channels": channels, "pixels": px}


def decode_webp(b: bytes) -> dict | None:
    """Decode a WebP file. Lossless (VP8L, incl. inside VP8X) is REAL;
    lossy (VP8) and animation raise NotImplementedError — the honest
    boundary (full video-style intra prediction / boolean arithmetic
    decoding). Returns None for non-WebP payloads."""
    b = bytes(b)
    if len(b) < 16 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(b):
        fourcc = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        payload = b[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(payload)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs a full video-intra decoder; "
                "not available in this environment"
            )
        if fourcc in (b"ANIM", b"ANMF"):
            raise NotImplementedError("animated WebP not supported")
        pos += 8 + size + (size & 1)
    raise NotImplementedError("WebP container without VP8L/VP8 chunk")


# ---------------------------------------------------------------------------
# encoder (synth side)
# ---------------------------------------------------------------------------


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> dict:
    """Write a prefix code (simple when <=2 symbols, else normal with the
    code-length code incl. 16/17/18 run ops); returns symbol->(code,len)."""
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nz) <= 2 and max(nz) <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if len(nz) == 1:
            s0 = nz[0]
            if s0 <= 1:
                bw.write(0, 1)  # 1-bit first symbol
                bw.write(s0, 1)
            else:
                bw.write(1, 1)
                bw.write(s0, 8)
            return {s0: (0, 0)}
        s0, s1 = nz
        bw.write(1, 1)
        bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    bw.write(0, 1)  # normal
    # tokenize the lengths array with 16/17/18 run ops
    tokens = []  # (symbol, extra_value, extra_bits)
    i = 0
    prev_nz = 8
    n = len(lengths)
    while i < n:
        ln = lengths[i]
        if ln == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                take = min(run, 11 + 127)
                tokens.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 3 + 7)
                tokens.append((17, take - 3, 3))
                run -= take
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            tokens.append((ln, 0, 0))
            ref = ln
            i += 1
            run = 0
            while i < n and lengths[i] == ref:
                run += 1
                i += 1
            emitted = 0
            while run - emitted >= 3:
                take = min(run - emitted, 3 + 3)
                tokens.append((16, take - 3, 2))
                emitted += take
            for _ in range(run - emitted):
                tokens.append((ref, 0, 0))
            prev_nz = ref
    cl_freq = [0] * 19
    for s, _, _ in tokens:
        cl_freq[s] += 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    # write code-length-code lengths in transmission order, trimmed
    order_lens = [cl_lengths[_CLCODE_ORDER[i]] for i in range(19)]
    num_cl = 19
    while num_cl > 4 and order_lens[num_cl - 1] == 0:
        num_cl -= 1
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(order_lens[i], 3)
    bw.write(0, 1)  # no max_symbol early stop
    cl_codes = _canonical_codes(cl_lengths)
    for s, ev, eb in tokens:
        c, ln = cl_codes[s]
        _write_code_msb(bw, c, ln)
        if eb:
            bw.write(ev, eb)
    return _canonical_codes(lengths)


def _encode_entropy_image(
    bw: _BitWriter, tokens: list, cache_bits: int, is_level0: bool,
    meta_bits: int = 0, w: int = 0, h: int = 0,
) -> None:
    """Encode a token stream (('lit',a,r,g,b) / ('copy',len,dist_code_value)
    / ('cache',idx)) as one entropy-coded image with a single code group.
    When is_level0 and meta_bits, a trivial all-zero meta image is emitted
    (one group) to exercise the decoder's meta path."""
    if is_level0:
        if meta_bits:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            # subres image of mw*mh zero pixels: all-literal, simple codes
            sub = [("lit", 0, 0, 0, 0)] * (mw * mh)
            _encode_entropy_image(bw, sub, 0, False)
        else:
            bw.write(0, 1)
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0

    gfreq = [0] * (256 + 24 + cache_size)
    rfreq = [0] * 256
    bfreq = [0] * 256
    afreq = [0] * 256
    dfreq = [0] * 40
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b2 = t
            gfreq[g] += 1
            rfreq[r] += 1
            bfreq[b2] += 1
            afreq[a] += 1
        elif t[0] == "copy":
            lc, _, _ = _lz77_code_for(t[1])
            gfreq[256 + lc] += 1
            dc, _, _ = _lz77_code_for(t[2])
            dfreq[dc] += 1
        else:
            gfreq[256 + 24 + t[1]] += 1
    codes = []
    for freq, limit in ((gfreq, 15), (rfreq, 15), (bfreq, 15), (afreq, 15), (dfreq, 15)):
        if not any(freq):
            freq = list(freq)
            freq[0] = 1  # unused alphabet still needs a valid code
        codes.append(_write_prefix_code(bw, _huffman_lengths(freq, limit)))
    gc, rc, bc, ac, dc_ = codes

    def emit(codebook, sym):
        c, ln = codebook[sym]
        _write_code_msb(bw, c, ln)

    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b2 = t
            emit(gc, g)
            emit(rc, r)
            emit(bc, b2)
            emit(ac, a)
        elif t[0] == "copy":
            lc, eb, ev = _lz77_code_for(t[1])
            emit(gc, 256 + lc)
            if eb:
                bw.write(ev, eb)
            dcc, eb, ev = _lz77_code_for(t[2])
            emit(dc_, dcc)
            if eb:
                bw.write(ev, eb)
        else:
            emit(gc, 256 + 24 + t[1])


def _tokenize(
    argb: np.ndarray, w: int, cache_bits: int, use_lz77: bool
) -> list:
    """Greedy tokenizer: distance-1 / distance-w runs when use_lz77, color
    cache hits when cache_bits. argb is a (n,) uint32 array."""
    n = argb.shape[0]
    cache = {}
    tokens = []
    pos = 0
    while pos < n:
        px = int(argb[pos])
        if use_lz77 and pos > 0:
            best_len, best_dist = 0, 0
            for dist in (1, w):
                if dist > pos:
                    continue
                ln = 0
                while pos + ln < n and int(argb[pos + ln]) == int(argb[pos + ln - dist]):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                tokens.append(("copy", best_len, best_dist + 120))
                if cache_bits:
                    for k in range(best_len):
                        v = int(argb[pos + k])
                        cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)] = v
                pos += best_len
                continue
        if cache_bits:
            hidx = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache.get(hidx) == px:
                tokens.append(("cache", hidx))
                pos += 1
                continue
            cache[hidx] = px
        tokens.append((
            "lit", (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF
        ))
        pos += 1
    return tokens


def encode_vp8l(
    pixels: np.ndarray, *, subtract_green: bool = False,
    predictor_mode: int | None = None, cache_bits: int = 0,
    use_lz77: bool = False, palette: bool = False, meta_bits: int = 0,
    color_transform: tuple[int, int, int] | None = None,
) -> bytes:
    """Encode (h, w, 3|4) uint8 pixels as a raw VP8L payload. Options pick
    which decoder paths the stream exercises: subtract-green, a fixed
    predictor mode (per-tile image with one mode), a fixed cross-color
    element (g2r, g2b, r2b as unsigned bytes of the signed 3.5 values),
    palette/color-indexing (with sub-byte bundling when few colors), color
    cache, greedy LZ77, and a trivial meta-prefix image."""
    pixels = np.asarray(pixels, np.uint8)
    h, w, ch = pixels.shape
    if ch == 3:
        a = np.full((h, w), 255, np.uint8)
        r, g, b = pixels[:, :, 0], pixels[:, :, 1], pixels[:, :, 2]
    else:
        r, g, b, a = (pixels[:, :, i] for i in range(4))
    argb = (
        a.astype(np.uint32) << 24
        | r.astype(np.uint32) << 16
        | g.astype(np.uint32) << 8
        | b.astype(np.uint32)
    ).reshape(-1)

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if ch == 4 else 0, 1)
    bw.write(0, 3)

    enc_w = w
    if palette:
        vals, idx = np.unique(argb, return_inverse=True)
        n_colors = len(vals)
        if n_colors > 256:
            raise NotImplementedError("palette encoding needs <=256 colors")
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(n_colors - 1, 8)
        # delta-coded palette image (1 x n_colors)
        pal_tokens = []
        prev = 0
        for v in vals:
            v = int(v)
            d = (
                (((v >> 24) - (prev >> 24)) & 0xFF) << 24
                | ((((v >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16
                | ((((v >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8
                | (((v & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            pal_tokens.append((
                "lit", (d >> 24) & 0xFF, (d >> 16) & 0xFF, (d >> 8) & 0xFF, d & 0xFF
            ))
            prev = v
        _encode_entropy_image(bw, pal_tokens, 0, False)
        if n_colors <= 2:
            xbits = 3
        elif n_colors <= 4:
            xbits = 2
        elif n_colors <= 16:
            xbits = 1
        else:
            xbits = 0
        idx = idx.reshape(h, w).astype(np.uint32)
        if xbits:
            per = 1 << xbits
            bits = 8 >> xbits
            enc_w = (w + per - 1) >> xbits
            packed = np.zeros((h, enc_w), np.uint32)
            for k in range(per):
                col = idx[:, k::per]
                packed[:, : col.shape[1]] |= col << (k * bits)
            green = packed
        else:
            enc_w = w
            green = idx
        argb = (np.uint32(0xFF) << 24 | (green << 8)).reshape(-1).astype(np.uint32)
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            rr = (argb >> 16) & 0xFF
            gg = (argb >> 8) & 0xFF
            bb = argb & 0xFF
            aa = (argb >> 24) & 0xFF
            rr = (rr - gg) & 0xFF
            bb = (bb - gg) & 0xFF
            argb = aa << 24 | rr << 16 | gg << 8 | bb
        if color_transform is not None:
            g2r, g2b, r2b = color_transform
            bw.write(1, 1)
            bw.write(1, 2)  # cross-color
            size_bits = 4
            bw.write(size_bits - 2, 3)
            tw = (enc_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            el = 0xFF000000 | (g2r << 16) | (g2b << 8) | r2b
            sub = [(
                "lit", (el >> 24) & 0xFF, (el >> 16) & 0xFF,
                (el >> 8) & 0xFF, el & 0xFF,
            )] * (tw * th)
            _encode_entropy_image(bw, sub, 0, False)
            # forward: subtract the deltas the decoder will add back
            res = np.zeros_like(argb)
            for pos in range(enc_w * h):
                p = int(argb[pos])
                aa = (p >> 24) & 0xFF
                rr = (p >> 16) & 0xFF
                gg = (p >> 8) & 0xFF
                bb = p & 0xFF
                rr_res = (rr - _ct_delta(g2r, gg)) & 0xFF
                bb_res = (bb - _ct_delta(g2b, gg) - _ct_delta(r2b, rr)) & 0xFF
                res[pos] = (aa << 24) | (rr_res << 16) | (gg << 8) | bb_res
            argb = res
        if predictor_mode is not None:
            bw.write(1, 1)
            bw.write(0, 2)
            size_bits = 4
            bw.write(size_bits - 2, 3)
            tw = (enc_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            mode_px = 0xFF000000 | (predictor_mode << 8)
            sub = [(
                "lit", (mode_px >> 24) & 0xFF, (mode_px >> 16) & 0xFF,
                (mode_px >> 8) & 0xFF, mode_px & 0xFF,
            )] * (tw * th)
            _encode_entropy_image(bw, sub, 0, False)
            # forward-filter: residual = pixel - predicted, in scan order
            # against the ORIGINAL image (decoder reconstructs in order)
            orig = argb.copy()
            res = np.zeros_like(argb)
            for pos in range(enc_w * h):
                x, y = pos % enc_w, pos // enc_w
                if pos == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(orig[pos - 1])
                elif x == 0:
                    pred = int(orig[pos - enc_w])
                else:
                    pred = _predict(predictor_mode, orig, enc_w, pos)
                p = int(orig[pos])
                res[pos] = (
                    (((p >> 24) - (pred >> 24)) & 0xFF) << 24
                    | ((((p >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16
                    | ((((p >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8
                    | (((p & 0xFF) - (pred & 0xFF)) & 0xFF)
                )
            argb = res
    bw.write(0, 1)  # end of transforms

    tokens = _tokenize(argb, enc_w, cache_bits, use_lz77)
    _encode_entropy_image(
        bw, tokens, cache_bits, True, meta_bits=meta_bits, w=enc_w, h=h
    )
    return bw.getvalue()


def encode_webp_lossless(pixels: np.ndarray, **opts) -> bytes:
    """Wrap encode_vp8l in the RIFF/WEBP container."""
    payload = encode_vp8l(pixels, **opts)
    if len(payload) & 1:
        padded = payload + b"\x00"
    else:
        padded = payload
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + padded
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
