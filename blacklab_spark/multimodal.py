"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for a 100 TB training-data pipeline: image/audio/video payloads live in
`binary` columns (or object-store references) beside typed metadata; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched pandas UDFs
over `mapInPandas` so payload bytes never pass through per-row Python.

Decode is REAL for formats numpy/stdlib can handle without external
libraries: PNG (full baseline: zlib inflate, all five row filters, color
types 0/2/3/4/6, bit depths 1-16, Adam7 — `decode_png`), baseline JPEG
(full T.81 pipeline: Huffman + dequant + IDCT + 4:2:0 upsampling —
jpeg.decode_jpeg), GIF87a/89a (pure python/numpy LZW, interlace, local
color tables, transparency, multi-frame — `decode_gif`), uncompressed
24/32-bit BMP, binary PPM/PGM (`decode_image`, `image_features`) and PCM
WAV audio (`decode_wav`, `audio_metadata`), round-trip-tested against the
deterministic `encode_png`/`encode_jpeg`/`encode_gif`/`encode_bmp`/
`encode_wav` synths. Codecs that genuinely need external libraries
(WebP/video — PIL/ffmpeg territory, NOT in this container) raise
`NotImplementedError`; `_decode_image_batch`
keeps the documented md5-derived fake for arbitrary non-image payloads so
the generic plumbing (image_metadata / sample_frames / resize_images)
stays testable on any bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "doc_id long, n_bytes int, width int, height int, channels int"
FRAME_SCHEMA = "doc_id long, frame_id int, frame_hash string"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in payload: utf-8 bytes of the text column as the opaque binary.
    In production this column arrives from the ingest pipeline (WARC body,
    image bytes, ...)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """DECODE STUB — deterministic fake dimensions from the payload hash.

    Real implementation would be:
        from PIL import Image; Image.open(io.BytesIO(b)) ...
    which is unavailable in this container. The fake keeps every byte of the
    Spark-side contract (vectorized batch in, typed frame out) testable.
    """
    h16 = payloads.map(
        lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:4], 16) if b is not None else 0
    ).to_numpy(dtype=np.int64)
    n_bytes = payloads.map(lambda b: len(b) if b is not None else 0).to_numpy(np.int64)
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int32"),
            "width": (1 + (h16 % 64)).astype("int32"),
            "height": (1 + (h16 // 64 % 64)).astype("int32"),
            "channels": np.full(len(payloads), 3, dtype="int32"),
        }
    )


def decode_image_real(payloads: pd.Series) -> pd.DataFrame:
    """The real-decoder integration point. REAL for formats decodable with
    numpy/stdlib alone (PNG, baseline JPEG, GIF, uncompressed BMP, binary
    PPM/PGM — see decode_image below); raises NotImplementedError for codecs
    (WebP/video) this container has no libraries for."""
    rows = []
    for b in payloads:
        d = decode_image(b)
        if d is None:
            raise NotImplementedError(
                "payload is not a PNG/JPEG/GIF/BMP/PNM image; WebP/video "
                "need PIL/ffmpeg, unavailable in this environment"
            )
        rows.append((len(bytes(b)), d["width"], d["height"], d["channels"]))
    return pd.DataFrame(rows, columns=["n_bytes", "width", "height", "channels"]).astype("int32")


def image_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-payload decoded metadata via Arrow-batched mapInPandas."""

    def kernel(batches):
        for pdf in batches:
            meta = _decode_image_batch(pdf[payload_col])
            meta.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield meta

    return df.select("doc_id", payload_col).mapInPandas(kernel, IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = "payload", max_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads. REAL for MP4 containers: the
    sample table is resolved (stts/stsc/stsz/stco/stss) and the first
    `max_frames` KEYFRAME payloads are extracted from mdat; frame_id is the
    sample index, frame_hash the md5 of the actual sample bytes — exactly
    the bytes a codec/feature stage would consume. Non-MP4 payloads keep
    the documented md5-derived fake (1 + hash%max frames) so the generic
    plumbing stays testable on any bytes. Output is exploded
    (doc_id, frame_id, frame_hash)."""
    from . import mp4 as M4

    def kernel(batches):
        for pdf in batches:
            out_d, out_f, out_h = [], [], []
            for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(b) if b is not None else b""
                if M4.is_mp4(b):
                    for si, _dts, _key, payload in M4.extract_samples(
                        b, 0, keyframes_only=True, max_samples=max_frames
                    ):
                        out_d.append(did)
                        out_f.append(si)
                        out_h.append(hashlib.md5(payload).hexdigest())
                    continue
                n = 1 + int(hashlib.md5(b).hexdigest()[:4], 16) % max_frames
                for fi in range(n):
                    out_d.append(did)
                    out_f.append(fi)
                    out_h.append(hashlib.md5(b + str(fi).encode()).hexdigest())
            yield pd.DataFrame({"doc_id": out_d, "frame_id": out_f, "frame_hash": out_h})

    return df.select("doc_id", payload_col).mapInPandas(kernel, FRAME_SCHEMA)


def resize_images(df: DataFrame, payload_col: str = "payload", size: int = 224) -> DataFrame:
    """Resize stub: passes payloads through a mapInPandas stage that would
    hold the vectorized resize; emits target dims so the plumbing is typed."""

    def kernel(batches):
        for pdf in batches:
            meta = _decode_image_batch(pdf[payload_col])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "out_width": np.minimum(meta["width"], size).astype("int32"),
                    "out_height": np.minimum(meta["height"], size).astype("int32"),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kernel, "doc_id long, out_width int, out_height int"
    )


# ---------------------------------------------------------------------------
# REAL codecs — formats decodable with numpy/stdlib alone (no PIL/ffmpeg):
# PNG + GIF (below), baseline JPEG (jpeg.py), uncompressed BMP (24/32-bit),
# binary PPM/PGM, PCM WAV. WebP/video still raise — the honest boundary.
# ---------------------------------------------------------------------------

import io
import struct
import wave


def encode_bmp(width: int, height: int, value: int) -> bytes:
    """Minimal uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up, BGR,
    4-byte row padding), constant fill — the deterministic synth side of the
    decode round-trip tests/oracles."""
    row = width * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rowbytes = bytes([value % 256] * row) + b"\x00" * pad
    return header + dib + rowbytes * height


def decode_bmp(b: bytes) -> dict | None:
    """Decode an uncompressed 24/32-bit BMP to an RGB(A) ndarray + dims.
    Returns None when the payload is not a BMP; raises NotImplementedError
    on compressed/packed variants (RLE, 1/4/8/16 bpp)."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP variant not supported: bpp={bpp} compression={comp}")
    top_down, h = h < 0, abs(h)
    ch = bpp // 8
    row = w * ch
    pad = (4 - row % 4) % 4
    arr = (
        np.frombuffer(b, np.uint8, count=(row + pad) * h, offset=off)
        .reshape(h, row + pad)[:, :row]
        .reshape(h, w, ch)
    )
    if not top_down:
        arr = arr[::-1]
    arr = arr[:, :, 2::-1] if ch == 3 else arr[:, :, [2, 1, 0, 3]]  # BGR(A)->RGB(A)
    return {"width": w, "height": h, "channels": ch, "pixels": arr}


def decode_pnm(b: bytes) -> dict | None:
    """Decode binary PPM (P6) / PGM (P5): whitespace/comment-tolerant header,
    then a raw frombuffer. Returns None for non-PNM payloads."""
    if len(b) < 2 or b[:1] != b"P" or b[1:2] not in b"56":
        return None
    ch = 3 if b[1:2] == b"6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos] in b" \t\r\n":
            pos += 1
        if pos < len(b) and b[pos] == ord("#"):  # comment to EOL
            while pos < len(b) and b[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and b[pos] not in b" \t\r\n":
            pos += 1
        if pos == start:
            return None  # truncated header
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    n = w * h * ch
    if len(b) - pos < n:
        return None
    arr = np.frombuffer(b, np.uint8, count=n, offset=pos).reshape(h, w, ch)
    return {"width": w, "height": h, "channels": ch, "pixels": arr}


def decode_image(b: bytes) -> dict | None:
    """Magic-byte dispatch to the real decoders. None = not a recognized
    decodable image; NotImplementedError = recognized but needs a codec this
    container lacks (WebP/video)."""
    if b is None:
        return None
    b = bytes(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:1] == b"P" and b[1:2] in b"56":
        return decode_pnm(b)
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    if b[:4] == b"GIF8":
        return decode_gif(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from .vp8l import decode_webp

        # lossless (VP8L) decodes for real; lossy VP8 raises inside
        return decode_webp(b)
    return None


# ---------------------------------------------------------------------------
# PNG — REAL decoder, pure stdlib (zlib) + numpy. Full baseline coverage:
# color types 0/2/3/4/6, bit depths 1/2/4/8/16 (16 -> high byte), all five
# row filters, Adam7 interlace, PLTE + tRNS palette alpha. The reference
# treats images as opaque blobs; this is the decode stage a multimodal
# training pipeline runs per payload (Arrow-batched via image_features).
# ---------------------------------------------------------------------------

import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert PNG row filters (spec §6): raw is h*(1+stride) filtered bytes,
    returns (h, stride) reconstructed samples. None/Up/Sub are fully
    vectorized (Sub = per-lane cumsum mod 256); Average/Paeth walk the row in
    bpp-wide vectorized groups (their x-recurrence is inherently serial)."""
    rr = raw.reshape(h, 1 + stride)
    ftypes = rr[:, 0]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    ngroups = stride // bpp
    for y in range(h):
        f = ftypes[y]
        cur = rr[y, 1:].astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 2:  # up
            rec = (cur + prev) & 0xFF
        elif f == 1:  # sub: recon[i] = cur[i] + recon[i-bpp] -> lane cumsum
            rec = (np.cumsum(cur.reshape(ngroups, bpp), axis=0) & 0xFF).ravel()
        elif f == 3:  # average
            g = cur.reshape(ngroups, bpp)
            pg = prev.reshape(ngroups, bpp)
            rec = np.empty_like(g)
            left = np.zeros(bpp, np.int64)
            for i in range(ngroups):
                left = (g[i] + ((left + pg[i]) >> 1)) & 0xFF
                rec[i] = left
            rec = rec.ravel()
        elif f == 4:  # paeth
            g = cur.reshape(ngroups, bpp)
            pg = prev.reshape(ngroups, bpp)
            rec = np.empty_like(g)
            left = np.zeros(bpp, np.int64)
            ul = np.zeros(bpp, np.int64)
            for i in range(ngroups):
                up = pg[i]
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                left = (g[i] + pred) & 0xFF
                rec[i] = left
                ul = up
            rec = rec.ravel()
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out


def _png_samples(rows: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(h, stride) reconstructed bytes -> (h, w, channels) uint8 samples:
    unpack sub-byte depths (MSB-first, scaled to 0..255), take the high byte
    of 16-bit samples."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        return rows[:, : w * channels * 2].reshape(h, w, channels, 2)[..., 0]
    # 1/2/4-bit: only valid for 1-channel types (gray / palette)
    bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(h, w, depth)
    vals = np.zeros((h, w), np.uint8)
    for i in range(depth):
        vals = (vals << 1) | bits[:, :, i]
    return vals.reshape(h, w, 1)


def decode_png(b: bytes) -> dict | None:
    """Decode a PNG payload to RGB(A)/gray pixels + dims. Pure zlib+numpy.
    Palette images expand through PLTE (channels=3, or 4 with tRNS alpha);
    sub-byte gray scales to full 8-bit range; 16-bit takes the high byte.
    Returns None for non-PNG payloads."""
    b = bytes(b)
    if b[:8] != _PNG_SIG:
        return None
    pos, idat, plte, trns = 8, [], None, None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc (crc not verified)
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp != 0 or filt != 0:
                raise NotImplementedError("nonzero PNG compression/filter method")
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    bpp = max(1, channels * depth // 8)

    def pass_pixels(pw, ph, chunk):
        stride = (pw * channels * depth + 7) // 8
        rows = _png_unfilter(chunk, ph, stride, bpp)
        return _png_samples(rows, pw, channels, depth)

    if interlace == 0:
        stride = (w * channels * depth + 7) // 8
        px = pass_pixels(w, h, raw[: h * (1 + stride)])
    elif interlace == 1:
        px = np.zeros((h, w, channels), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = (pw * channels * depth + 7) // 8
            n = ph * (1 + stride)
            px[y0::dy, x0::dx] = pass_pixels(pw, ph, raw[off : off + n])
            off += n
    else:
        raise NotImplementedError(f"PNG interlace method {interlace}")

    if ctype == 3:  # palette -> RGB(A)
        if plte is None:
            raise NotImplementedError("palette PNG without PLTE")
        idx = px[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            px = np.dstack([rgb, alpha[idx]])
        else:
            px = rgb
    elif depth < 8:  # sub-byte gray: scale 0..(2^d-1) -> 0..255
        px = (px.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    return {
        "width": int(w), "height": int(h), "channels": px.shape[2], "pixels": px,
    }


def _png_filter_row(cur, prev, ftype, bpp):
    """Forward filter (encoder side of the round-trip tests)."""
    c = cur.astype(np.int64)
    p = prev.astype(np.int64)
    left = np.concatenate([np.zeros(bpp, np.int64), c[:-bpp]]) if len(c) >= bpp else np.zeros_like(c)
    ul = np.concatenate([np.zeros(bpp, np.int64), p[:-bpp]]) if len(p) >= bpp else np.zeros_like(p)
    if ftype == 0:
        out = c
    elif ftype == 1:
        out = c - left
    elif ftype == 2:
        out = c - p
    elif ftype == 3:
        out = c - ((left + p) >> 1)
    else:
        pr = left + p - ul
        pa, pb, pc = np.abs(pr - left), np.abs(pr - p), np.abs(pr - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, ul))
        out = c - pred
    return (out & 0xFF).astype(np.uint8)


def encode_png(
    pixels: np.ndarray, filters=None, interlace: int = 0,
    palette: np.ndarray | None = None, depth: int = 8,
) -> bytes:
    """Encode uint8 pixels (h, w, c) as a PNG — the deterministic synth side
    of the decode round-trip. `filters`: per-row filter type list (cycled),
    default all-0. With `palette`, pixels must be (h, w, 1) palette indices.
    depth<8 packs sub-byte grayscale/palette; interlace=1 writes Adam7."""
    pixels = np.asarray(pixels, np.uint8)
    h, w, c = pixels.shape
    if palette is not None:
        ctype = 3
    else:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = max(1, c * depth // 8)
    filters = list(filters or [0])

    def pack_rows(px):
        if depth == 8:
            return px.reshape(px.shape[0], -1)
        vals = px[:, :, 0]
        bits = np.zeros((px.shape[0], px.shape[1], depth), np.uint8)
        for i in range(depth):
            bits[:, :, depth - 1 - i] = (vals >> i) & 1
        return np.packbits(bits.reshape(px.shape[0], -1), axis=1)

    def filter_pass(px):
        rows = pack_rows(px)
        out = []
        prev = np.zeros(rows.shape[1], np.uint8)
        for y in range(rows.shape[0]):
            f = filters[y % len(filters)]
            out.append(bytes([f]) + _png_filter_row(rows[y], prev, f, bpp).tobytes())
            prev = rows[y]
        return b"".join(out)

    if interlace == 0:
        body = filter_pass(pixels)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(filter_pass(sub))
        body = b"".join(parts)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    out = [_PNG_SIG, chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )]
    if palette is not None:
        out.append(chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes()))
    out.append(chunk(b"IDAT", zlib.compress(body)))
    out.append(chunk(b"IEND", b""))
    return b"".join(out)


# ---------------------------------------------------------------------------
# GIF — REAL decoder, pure python/numpy LZW. GIF87a/89a, global + local color
# tables, interlace, transparency (GCE), multi-frame (first frame's pixels +
# frame count). Synth side: encode_gif with a real LZW compressor.
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW: variable-width codes LSB-first, clear/EOI codes, dictionary
    grows to 12 bits then waits for a clear (deferred-clear tolerated)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as prefix links: entry -> (prefix_code, appended_pixel)
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    bitpos = 0
    nbits = len(data) * 8
    arr = np.frombuffer(data, np.uint8)

    def read_code(width):
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi
        byte0 = bitpos >> 3
        chunk = int.from_bytes(
            arr[byte0 : byte0 + 3].tobytes().ljust(3, b"\0"), "little"
        )
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return code

    def reset():
        return list(range(clear)) + [None, None], min_code_size + 1

    # table holds decoded byte-strings (python lists of ints are slow; use
    # bytes — appends build new bytes but entries are short in practice)
    table, width = None, 0
    strings: list[bytes] = []
    prev: bytes | None = None
    strings = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            strings = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = strings[code]
        elif code < len(strings):
            entry = strings[code]
            strings.append(prev + entry[:1])
        elif code == len(strings):  # KwKwK case
            entry = prev + prev[:1]
            strings.append(entry)
        else:
            raise NotImplementedError(f"corrupt GIF LZW stream (code {code})")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        prev = entry
        if len(strings) == (1 << width) and width < 12:
            width += 1
    return out


def _lzw_encode(pixels: np.ndarray, min_code_size: int) -> bytes:
    """Real GIF LZW compressor (encoder side of the round-trip tests)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    curbits = 0

    def emit(code, width):
        nonlocal cur, curbits
        cur |= code << curbits
        curbits += width
        while curbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            curbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for px in pixels.tobytes():
        cand = prev + bytes([px])
        if cand in table:
            prev = cand
            continue
        emit(table[prev], width)
        if next_code < (1 << 12):
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: clear and restart
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([px])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if curbits:
        out.append(cur & 0xFF)
    return bytes(out)


_GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]  # (start, step) per pass


def decode_gif(b: bytes) -> dict | None:
    """Decode a GIF payload: first frame's pixels (RGB, or RGBA when the
    frame's graphic control marks a transparent index) + dims + n_frames.
    Pure python/numpy — real LZW, interlace, local color tables. Returns
    None for non-GIF payloads."""
    b = bytes(b)
    if b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        return None
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    n_frames = 0
    first = None
    transparent_idx = None
    pending_transparent = None
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = b[pos]
                gce_flags = b[pos + 1]
                tidx = b[pos + 4]
                if gce_flags & 1:
                    pending_transparent = tidx
                pos += 1 + sz
            while b[pos] != 0:  # skip (remaining) sub-blocks
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:  # image descriptor expected
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        lct = None
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            lct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        min_code_size = b[pos]
        pos += 1
        chunks = []
        while b[pos] != 0:
            ln = b[pos]
            chunks.append(b[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        n_frames += 1
        if first is None:
            idx = _lzw_decode(b"".join(chunks), min_code_size, iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: reorder rows
                de = np.empty_like(idx)
                src = 0
                for start, step in _GIF_INTERLACE:
                    rows = range(start, ih, step)
                    de[list(rows)] = idx[src : src + len(rows)]
                    src += len(rows)
                idx = de
            ct = lct if lct is not None else gct
            if ct is None:
                raise NotImplementedError("GIF frame without a color table")
            rgb = ct[idx]
            transparent_idx = pending_transparent
            if transparent_idx is not None:
                alpha = np.where(idx == transparent_idx, 0, 255).astype(np.uint8)
                first = np.dstack([rgb, alpha])
            else:
                first = rgb
            fw, fh = iw, ih
        pending_transparent = None
    if first is None:
        raise NotImplementedError("GIF with no image data")
    return {
        "width": int(fw), "height": int(fh), "channels": first.shape[2],
        "pixels": first, "n_frames": n_frames,
    }


def encode_gif(
    frames: list[np.ndarray], palette: np.ndarray, interlace: bool = False,
    transparent_idx: int | None = None,
) -> bytes:
    """Encode palette-index frames (each (h, w) uint8) + (N,3) palette as a
    GIF89a with real LZW — the deterministic synth side of the round-trip."""
    palette = np.asarray(palette, np.uint8)
    h, w = frames[0].shape
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    n = 1 << bits
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    min_code = max(2, bits)
    for fi, fr in enumerate(frames):
        fr = np.asarray(fr, np.uint8)
        if transparent_idx is not None and fi == 0:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent_idx, 0])
        iflags = 0x40 if interlace else 0
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, fr.shape[1], fr.shape[0], iflags)
        if interlace:
            rows = []
            for start, step in _GIF_INTERLACE:
                rows.extend(range(start, fr.shape[0], step))
            fr = fr[rows]
        out += bytes([min_code])
        lzw = _lzw_encode(fr.ravel(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure-numpy index gather (vectorized; the
    batch path a Pandas-UDF resize stage runs per image)."""
    h, w = pixels.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ri][:, ci]


def encode_wav(
    sample_rate: int, n_frames: int, n_channels: int = 1, amplitude: int = 1000
) -> bytes:
    """Constant-signal PCM16 WAV via stdlib wave — deterministic synth side
    of the audio round-trip."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            np.full(n_frames * n_channels, amplitude, dtype="<i2").tobytes()
        )
    return buf.getvalue()


def decode_wav(b: bytes) -> dict | None:
    """Decode a PCM WAV: rate/channels/frames + RMS over the samples.
    Returns None for non-WAV payloads."""
    if b is None or bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"WAVE":
        return None
    with wave.open(io.BytesIO(bytes(b))) as w:
        nch, sw, sr, nf = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
        )
        raw = w.readframes(nf)
    if sw == 2:
        data = np.frombuffer(raw, "<i2")
    elif sw == 1:
        data = np.frombuffer(raw, np.uint8).astype(np.int16) - 128
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    rms = float(np.sqrt(np.mean(data.astype(np.float64) ** 2))) if data.size else 0.0
    return {
        "sample_rate": sr,
        "n_channels": nch,
        "n_frames": nf,
        "duration_ms": nf * 1000 // sr if sr else 0,
        "rms": rms,
    }


IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, channels int, mean_px double"
)
AUDIO_META_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_frames int, "
    "duration_ms int, rms double"
)


def image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL decode + per-image mean pixel over decodable payloads
    (BMP/PPM/PGM); undecodable rows yield NULL dims. Arrow-batched
    mapInPandas: payload bytes stay inside the executor batch."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    d = decode_image(b)
                except NotImplementedError:
                    d = None
                if d is None:
                    rows.append((did, None, None, None, None))
                else:
                    rows.append((
                        did, d["width"], d["height"], d["channels"],
                        float(d["pixels"].mean()),
                    ))
            out = pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "mean_px"]
            )
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["channels"] = out["channels"].astype("Int32")
            yield out

    return df.select("doc_id", payload_col).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


VIDEO_META_SCHEMA = (
    "doc_id long, brand string, n_tracks int, width int, height int, "
    "n_samples int, n_keyframes int, duration_ms int"
)
MP3_META_SCHEMA = (
    "doc_id long, mpeg_version int, bitrate_kbps int, sample_rate int, "
    "channels int, n_frames int, duration_ms int, has_id3 boolean"
)


def video_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL MP4 container parse per payload (mp4.parse_mp4): brand, track
    count, first video track's dims + sample/keyframe counts, duration.
    Non-MP4 rows yield NULLs. Arrow-batched mapInPandas — payload bytes
    never leave the executor batch."""
    from . import mp4 as M4

    def kernel(batches):
        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    m = M4.parse_mp4(bytes(b)) if b is not None else None
                except NotImplementedError:
                    m = None
                if m is None:
                    rows.append((did,) + (None,) * 7)
                    continue
                vid = next((t for t in m["tracks"] if t["handler"] == "vide"), None)
                rows.append((
                    did, m["brand"], m["n_tracks"],
                    vid["width"] if vid else None,
                    vid["height"] if vid else None,
                    vid["n_samples"] if vid else None,
                    vid["n_keyframes"] if vid else None,
                    m["duration_ms"],
                ))
            out = pd.DataFrame(rows, columns=[
                "doc_id", "brand", "n_tracks", "width", "height",
                "n_samples", "n_keyframes", "duration_ms",
            ])
            for c in ("n_tracks", "width", "height", "n_samples",
                      "n_keyframes", "duration_ms"):
                out[c] = out[c].astype("Int32")
            yield out

    return df.select("doc_id", payload_col).mapInPandas(kernel, VIDEO_META_SCHEMA)


def mp3_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL MP3 frame-header scan per payload (mp3.parse_mp3): version,
    first-frame bitrate, sample rate, channels, frame count, exact duration
    from summed per-frame samples, ID3v2 presence. Non-MP3 rows -> NULLs."""
    from . import mp3 as M3

    def kernel(batches):
        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                m = M3.parse_mp3(bytes(b)) if b is not None else None
                if m is None:
                    rows.append((did,) + (None,) * 7)
                else:
                    rows.append((
                        did, m["mpeg_version"], m["bitrate_kbps"],
                        m["sample_rate"], m["channels"], m["n_frames"],
                        m["duration_ms"], m["has_id3"],
                    ))
            out = pd.DataFrame(rows, columns=[
                "doc_id", "mpeg_version", "bitrate_kbps", "sample_rate",
                "channels", "n_frames", "duration_ms", "has_id3",
            ])
            for c in ("mpeg_version", "bitrate_kbps", "sample_rate",
                      "channels", "n_frames", "duration_ms"):
                out[c] = out[c].astype("Int32")
            yield out

    return df.select("doc_id", payload_col).mapInPandas(kernel, MP3_META_SCHEMA)


def audio_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode — PCM WAV (stdlib wave) or FLAC (flac.py: Rice
    residuals, fixed/LPC predictors, stereo decorrelation, CRC-verified):
    rate/channels/frames/duration/RMS per payload; other rows yield NULLs."""
    from .flac import decode_flac, is_flac

    def kernel(batches):
        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    if b is not None and is_flac(bytes(b)):
                        f = decode_flac(bytes(b))
                        d = f and {
                            "sample_rate": f["sample_rate"],
                            "n_channels": f["n_channels"],
                            "n_frames": f["n_frames"],
                            "duration_ms": f["duration_ms"],
                            "rms": f["rms"],
                        }
                    else:
                        d = decode_wav(b)
                except (NotImplementedError, wave.Error, EOFError):
                    d = None
                if d is None:
                    rows.append((did, None, None, None, None, None))
                else:
                    rows.append((
                        did, d["sample_rate"], d["n_channels"], d["n_frames"],
                        d["duration_ms"], d["rms"],
                    ))
            out = pd.DataFrame(rows, columns=[
                "doc_id", "sample_rate", "n_channels", "n_frames",
                "duration_ms", "rms",
            ])
            for c in ("sample_rate", "n_channels", "n_frames", "duration_ms"):
                out[c] = out[c].astype("Int32")
            yield out

    return df.select("doc_id", payload_col).mapInPandas(kernel, AUDIO_META_SCHEMA)
