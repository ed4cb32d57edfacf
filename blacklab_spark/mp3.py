"""MPEG audio (MP3) frame-header scanning, pure stdlib.

The audio-metadata operation a 100 TB multimodal pipeline runs per MP3
payload is container-level: skip the ID3v2 tag, walk the frame headers
(sync, version, layer, bitrate/samplerate indices, padding), count frames
and derive duration/bitrate — no PCM decode needed, and none attempted
(the MDCT/huffman audio decode is ffmpeg territory, the honest boundary).

`build_mp3` writes structurally-valid frames (correct headers + sized
dummy payloads, optional ID3v2 tag) so the writer and scanner check each
other, the same round-trip discipline as the image codecs.

The reference engine treats non-text payloads as opaque blobs; this module
is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp3", "build_mp3", "is_mp3"]

# MPEG-1 Layer III bitrates (kbps), index 1..14; 0 = free, 15 = bad
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
# MPEG-2/2.5 Layer III
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}
# samples per frame, Layer III: MPEG-1 1152, MPEG-2/2.5 576
_SPF = {3: 1152, 2: 576, 0: 576}


def _id3v2_len(b: bytes) -> int:
    """Length of a leading ID3v2 tag (0 if none). Size is synchsafe."""
    if len(b) < 10 or b[:3] != b"ID3":
        return 0
    sz = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    return 10 + sz + (10 if b[5] & 0x10 else 0)  # footer flag


def _frame_at(b: bytes, pos: int):
    """Parse one frame header at pos; returns (frame_len, version_bits,
    bitrate_kbps, sample_rate, channels) or None if not a valid L3 header."""
    if pos + 4 > len(b):
        return None
    h = struct.unpack_from(">I", b, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver = (h >> 19) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (h >> 17) & 3  # 1 = Layer III
    if ver == 1 or layer != 1:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    pad = (h >> 9) & 1
    mode = (h >> 6) & 3
    table = _BITRATES_V1_L3 if ver == 3 else _BITRATES_V2_L3
    kbps = table[br_idx]
    rate = _RATES[ver][sr_idx]
    coeff = 144 if ver == 3 else 72  # spf/8: 1152/8, 576/8
    flen = coeff * kbps * 1000 // rate + pad
    return flen, ver, kbps, rate, 1 if mode == 3 else 2


def is_mp3(b: bytes) -> bool:
    b = bytes(b)
    pos = _id3v2_len(b)
    return _frame_at(b, pos) is not None


def parse_mp3(b: bytes) -> dict | None:
    """Walk the frame chain (resyncing on garbage) and report:
    {"mpeg_version" (1/2/25), "bitrate_kbps" (of the first frame),
     "sample_rate", "channels", "n_frames", "duration_ms", "has_id3",
     "vbr"} — duration from summed per-frame samples (so VBR streams with
    mixed bitrates are exact). Returns None for non-MP3 payloads."""
    b = bytes(b)
    tag = _id3v2_len(b)
    pos = tag
    first = _frame_at(b, pos)
    if first is None:
        return None
    n = 0
    total_samples = 0
    rate0 = first[3]
    kbps_seen = set()
    vbr_header = False
    while pos + 4 <= len(b):
        fr = _frame_at(b, pos)
        if fr is None:
            pos += 1  # resync scan
            continue
        flen, ver, kbps, rate, ch = fr
        if n == 0:
            # Xing/Info VBR header sits after the side info of frame 0
            side = (17 if ch == 1 else 32) if ver == 3 else (9 if ch == 1 else 17)
            probe = b[pos + 4 + side : pos + 4 + side + 4]
            vbr_header = probe in (b"Xing", b"Info")
        kbps_seen.add(kbps)
        total_samples += _SPF[ver]
        n += 1
        pos += flen
    ver_name = {3: 1, 2: 2, 0: 25}[first[1]]
    return {
        "mpeg_version": ver_name,
        "bitrate_kbps": first[2],
        "sample_rate": rate0,
        "channels": first[4],
        "n_frames": n,
        "duration_ms": total_samples * 1000 // rate0 if rate0 else 0,
        "has_id3": tag > 0,
        "vbr": vbr_header or len(kbps_seen) > 1,
    }


def build_mp3(
    n_frames: int, bitrate_kbps: int = 128, sample_rate: int = 44100,
    channels: int = 2, id3_tag: bytes | None = None, pad_every: int = 0,
) -> bytes:
    """Write n_frames structurally-valid MPEG-1 Layer III frames (headers
    real, audio payload zeroed) with an optional ID3v2 tag. `pad_every`:
    set the padding bit on every k-th frame to exercise variable frame
    lengths in the scanner."""
    br_idx = _BITRATES_V1_L3.index(bitrate_kbps)
    sr_idx = _RATES[3].index(sample_rate)
    out = bytearray()
    if id3_tag is not None:
        sz = len(id3_tag)
        ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
        out += b"ID3" + bytes([4, 0, 0]) + ss + id3_tag
    mode = 3 if channels == 1 else 0
    for i in range(n_frames):
        pad = 1 if pad_every and (i + 1) % pad_every == 0 else 0
        h = (
            (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)  # sync V1 L3 no-crc
            | (br_idx << 12) | (sr_idx << 10) | (pad << 9) | (mode << 6)
        )
        flen = 144 * bitrate_kbps * 1000 // sample_rate + pad
        out += struct.pack(">I", h) + b"\x00" * (flen - 4)
    return bytes(out)
