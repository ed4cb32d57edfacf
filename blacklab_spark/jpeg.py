"""Baseline JPEG (ITU-T T.81) codec in pure python/numpy.

REAL encoder + decoder for baseline sequential 8-bit JPEG — no PIL/libjpeg
in this container, so the whole pipeline is implemented here: JFIF marker
structure, quantization tables with libjpeg-style quality scaling, 8x8
DCT-II via an orthonormal matrix product, zigzag, differential DC +
run-length AC Huffman coding with the T.81 Annex K tables, byte stuffing,
optional restart intervals, and (encode) optional 4:2:0 chroma subsampling.
The decoder handles any baseline sampling-factor combination (4:4:4, 4:2:0,
4:2:2, ...) via generic MCU assembly + block replication upsampling.

Rounding discipline: quantization and final pixel reconstruction use
floor(x + 0.5) (half-up) so a constant-fill image's decoded value has a
closed form the SQL oracle can recompute exactly (mm_decode_jpeg).

The reference treats images as opaque binary payloads; this is the decode
stage a multimodal training pipeline runs per payload, driven Arrow-batched
from multimodal.image_features. Scope (documented, asserted): baseline DCT
process only — progressive (SOF2), arithmetic coding, 12-bit precision and
lossless modes raise NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables ----

# T.81 Annex K.1 — base quantization tables (quality 50), zigzag order N/A
# (stored in natural row-major order here).
_Q_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.int64)
_Q_CHR = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.int64)

# zigzag scan order: _ZIGZAG[k] = flat (row*8+col) index of the k-th
# coefficient in scan order
def _zigzag_order() -> np.ndarray:
    idx = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - j, j) for j in rng]  # down the anti-diagonal
        if s % 2 == 1:  # odd diagonals run top-right -> bottom-left reversed
            diag.reverse()
        idx += [r * 8 + c for r, c in diag]
    return np.array(idx, np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# T.81 Annex K.3 — typical Huffman tables: (bits[1..16] counts, values)
_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal 8x8 DCT-II basis: dct = _C @ block @ _C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K base tables."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((_Q_LUM * scale + 50) // 100, 1, 255)
    chr_ = np.clip((_Q_CHR * scale + 50) // 100, 1, 255)
    return lum, chr_


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5).astype(np.int64)


# ------------------------------------------------------------- bit writer ---


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81 F.1.2.3


def _build_enc_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the canonical (bits, values) spec."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) per T.81 F.1.2.1: negatives as ones' complement."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------- encoder ---


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shift, 8x8 block DCT, quantize. plane (H,W) multiple of 8.
    Returns (n_blocks_v, n_blocks_h, 64) zigzag-ordered quantized ints."""
    h, w = plane.shape
    b = plane.astype(np.float64).reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    b = b - 128.0
    coef = np.einsum("ij,abjk,lk->abil", _C, b, _C)
    q = _round_half_up(coef / qtab)
    return q.reshape(h // 8, w // 8, 64)[..., _ZIGZAG]


def _encode_scan_component(
    blocks: np.ndarray, dc_tab, ac_tab, bw: _BitWriter, dc_pred: int
) -> int:
    """Entropy-encode one component's blocks (list of 64-int zigzag arrays)
    in order; returns the updated DC predictor."""
    for blk in blocks:
        diff = int(blk[0]) - dc_pred
        dc_pred = int(blk[0])
        size, bits = _magnitude(diff)
        code, ln = dc_tab[size]
        bw.write(code, ln)
        if size:
            bw.write(bits, size)
        run = 0
        last_nz = 0
        nz = np.flatnonzero(blk[1:])
        last_nz = int(nz[-1]) + 1 if nz.size else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_tab[(run << 4) | size]
            bw.write(code, ln)
            bw.write(bits, size)
            run = 0
        if last_nz < 63:
            code, ln = ac_tab[0x00]  # EOB
            bw.write(code, ln)
    return dc_pred


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (H,W) or (H,W,1) grayscale / (H,W,3) RGB uint8 as baseline
    JFIF. subsample=True emits 4:2:0 chroma; restart_interval>0 emits DRI +
    RSTn markers every that many MCUs."""
    px = np.asarray(px, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels")
    lum_q, chr_q = quality_tables(quality)
    if ch == 3:
        r = px[..., 0].astype(np.float64)
        g = px[..., 1].astype(np.float64)
        b = px[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(_round_half_up(p), 0, 255) for p in (y, cb, cr)]
    else:
        planes = [px[..., 0].astype(np.int64)]

    sub = subsample and ch == 3
    # (id, h_samp, v_samp, qtab_id) per component
    comps = [(1, 2 if sub else 1, 2 if sub else 1, 0)]
    if ch == 3:
        comps += [(2, 1, 1, 1), (3, 1, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # per-component quantized zigzag blocks
    comp_blocks = []
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    for (cid, hs, vs, qid), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:  # downsample chroma by box mean
            p = _pad_to(plane, vmax // vs * 2, hmax // hs * 2)
            fy, fx = vmax // vs, hmax // hs
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean((1, 3))
            p = _round_half_up(p)
        else:
            p = plane
        # pad so each component covers whole MCUs
        p = _pad_to(p, mcus_y * vs * 8, mcus_x * hs * 8)
        qt = lum_q if qid == 0 else chr_q
        comp_blocks.append(_fdct_quant(p, qt))

    # interleave in MCU order
    dc_lum = _build_enc_table(*_HUFF_DC_LUM)
    ac_lum = _build_enc_table(*_HUFF_AC_LUM)
    dc_chr = _build_enc_table(*_HUFF_DC_CHR)
    ac_chr = _build_enc_table(*_HUFF_AC_CHR)
    bw = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * len(comps)
            for ci, (cid, hs, vs, qid) in enumerate(comps):
                dt = dc_lum if qid == 0 else dc_chr
                at = ac_lum if qid == 0 else ac_chr
                for by in range(vs):
                    for bx in range(hs):
                        blk = comp_blocks[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _encode_scan_component([blk], dt, at, bw, preds[ci])
            mcu_i += 1
    bw.flush()

    # ---- marker stream
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for qid, qt in ((0, lum_q),) + (((1, chr_q),) if ch == 3 else ()):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([qid])
        out += bytes(int(x) for x in qt.reshape(64)[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, hs, vs, qid in comps:
        out += bytes([cid, (hs << 4) | vs, qid])
    huffs = [(0x00, _HUFF_DC_LUM), (0x10, _HUFF_AC_LUM)]
    if ch == 3:
        huffs += [(0x01, _HUFF_DC_CHR), (0x11, _HUFF_AC_CHR)]
    for tid, (bits, values) in huffs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tid])
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, hs, vs, qid in comps:
        out += bytes([cid, 0x00 if qid == 0 else 0x11])
    out += bytes([0, 63, 0])
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder ---


class _BitReader:
    """Entropy-segment bit reader: consumes stuffed bytes, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # a marker: feed 0 bits (decoder must stop before here)
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def align_to_marker(self) -> None:
        self.acc = 0
        self.nbits = 0
        d = self.data
        while not (d[self.pos] == 0xFF and d[self.pos + 1] != 0x00):
            self.pos += 1


def _build_dec_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(b: bytes) -> dict | None:
    """Decode a baseline JFIF payload. Returns
    {width, height, channels, pixels} like the other decoders, or None for
    non-JPEG bytes. Progressive/arithmetic/12-bit raise NotImplementedError."""
    b = bytes(b)
    if b[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", b, pos)[0]
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec = seg[p] >> 4
                tid = seg[p] & 0x0F
                if prec == 0:
                    tab = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.int64)
                    p += 65
                else:
                    tab = np.frombuffer(seg, ">u2", 64, p + 1).astype(np.int64)
                    p += 129
                qt = np.zeros(64, np.int64)
                qt[_ZIGZAG] = tab  # stored in zigzag order
                qtabs[tid] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc = seg[p] >> 4
                th = seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                values = list(seg[p + 17 : p + 17 + nv])
                tab = _build_dec_table(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = tab
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, sf, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0x0F, "q": qid})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential is supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i : 3 + 2 * i]
                c = next(c for c in comps if c["id"] == cid)
                scan.append((c, tabs >> 4, tabs & 0x0F))
            pixels = _decode_scan(
                b, pos + seglen, scan, qtabs, huff_dc, huff_ac,
                h, w, restart_interval,
            )
            ch = len(comps)
            return {"width": w, "height": h, "channels": 3 if ch == 3 else 1,
                    "pixels": pixels, "n_frames": 1}
        pos += seglen
    raise ValueError("JPEG: no scan data found")


def _decode_scan(b, pos, scan, qtabs, huff_dc, huff_ac, h, w, restart_interval):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    # per-component coefficient planes (in blocks)
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64)
        for c, _, _ in scan
    ]
    br = _BitReader(b, pos)
    preds = [0] * len(scan)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.align_to_marker()
                m = b[br.pos + 1]
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("JPEG: expected restart marker")
                br.pos += 2
                preds = [0] * len(scan)
            for ci, (c, dct, act) in enumerate(scan):
                qt = qtabs[c["q"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        size = _huff_decode(br, huff_dc[dct])
                        diff = _extend(br.read(size), size) if size else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k <= 63:
                            rs = _huff_decode(br, huff_ac[act])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[_ZIGZAG] = zz
                        blk = coef.reshape(8, 8) * qt
                        pix = _C.T @ blk @ _C
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_i += 1

    # upsample + color convert
    full = []
    for (c, _, _), p in zip(scan, planes):
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, bl], axis=-1)
    else:
        out = full[0][:, :, None]
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
