"""H.264/AVC sequence-parameter-set (SPS) parsing, pure stdlib.

The deepest honestly-reachable layer of a video payload without a full
codec: the SPS header inside an `avcC` box (or Annex-B stream) carries
profile/level, bit depths, chroma format and the TRUE coded dimensions
(macroblock counts + frame cropping) — exactly what a 100 TB video-corpus
pipeline extracts per payload for filtering/routing before any decode.

Implemented per the public H.264 spec (ISO/IEC 14496-10 §7.3.2.1):

- RBSP extraction (0x000003 emulation-prevention stripping),
- Exp-Golomb ue(v)/se(v) coding (reader AND writer),
- full seq_parameter_set_data: high-profile branch (chroma_format_idc,
  separate colour planes, bit depths, scaling lists incl. the
  delta-coded scaling_list() syntax), pic_order_cnt types 0/1,
  frame_mbs_only / MBAFF, frame cropping with chroma-dependent crop
  units -> display width/height,
- avcC (AVCDecoderConfigurationRecord) walk to the first SPS.

`build_sps`/`build_avcc` are the deterministic synth side (round-trip
discipline). Decoding slice data (CABAC/CAVLC, inter prediction) is the
honest boundary.
"""

from __future__ import annotations

import struct

__all__ = ["parse_sps", "parse_avcc", "build_sps", "build_avcc"]

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def _strip_emulation(b: bytes) -> bytes:
    """NAL -> RBSP: remove emulation_prevention_three_byte (00 00 03)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(b):
        c = b[i]
        if zeros >= 2 and c == 3:
            zeros = 0
            i += 1
            continue
        out.append(c)
        zeros = zeros + 1 if c == 0 else 0
        i += 1
    return bytes(out)


def _add_emulation(b: bytes) -> bytes:
    """RBSP -> NAL: insert 03 after any 00 00 followed by 00/01/02/03."""
    out = bytearray()
    zeros = 0
    for c in b:
        if zeros >= 2 and c <= 3:
            out.append(3)
            zeros = 0
        out.append(c)
        zeros = zeros + 1 if c == 0 else 0
    return bytes(out)


class _EGReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise NotImplementedError("bad exp-Golomb code")
        return (1 << zeros) - 1 + self.u(zeros) if zeros else 0

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 == 1 else -(k // 2)


class _EGWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def getvalue(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i : i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
        return bytes(out)


def _skip_scaling_list(r: _EGReader, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        if nxt != 0:
            last = nxt


def parse_sps(nal: bytes) -> dict:
    """Parse one SPS NAL unit (with or without the NAL header byte):
    {"profile_idc", "level_idc", "chroma_format_idc", "bit_depth_luma",
    "bit_depth_chroma", "width", "height"} — width/height are display
    dims after frame cropping."""
    nal = bytes(nal)
    if nal[:1] and (nal[0] & 0x1F) == 7:  # NAL header present (type 7)
        nal = nal[1:]
    r = _EGReader(_strip_emulation(nal))
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    r.ue()  # sps_id
    chroma = 1
    bdl = bdc = 8
    if profile in _HIGH_PROFILES:
        chroma = r.ue()
        if chroma == 3:
            r.u(1)  # separate_colour_plane_flag
        bdl = r.ue() + 8
        bdc = r.ue() + 8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma != 3 else 12):
                if r.u(1):
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    pw_mbs = r.ue() + 1
    ph_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    r.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # crop units (spec table 6-1): 4:2:0 -> (2, 2*frame_factor)
    if chroma == 0:
        cux, cuy = 1, 2 - frame_mbs_only
    elif chroma == 1:
        cux, cuy = 2, 2 * (2 - frame_mbs_only)
    elif chroma == 2:
        cux, cuy = 2, 1 * (2 - frame_mbs_only)
    else:
        cux, cuy = 1, 1 * (2 - frame_mbs_only)
    width = pw_mbs * 16 - (crop_l + crop_r) * cux
    height = (2 - frame_mbs_only) * ph_units * 16 - (crop_t + crop_b) * cuy
    return {
        "profile_idc": profile, "level_idc": level,
        "chroma_format_idc": chroma, "bit_depth_luma": bdl,
        "bit_depth_chroma": bdc, "width": width, "height": height,
    }


def parse_avcc(b: bytes) -> dict:
    """Parse an AVCDecoderConfigurationRecord (the `avcC` box payload):
    version/profile/level/nal-length-size + the first SPS's parsed fields."""
    b = bytes(b)
    if len(b) < 7 or b[0] != 1:
        raise NotImplementedError("bad avcC configuration version")
    out = {
        "profile_idc": b[1], "level_idc": b[3],
        "nal_length_size": (b[4] & 3) + 1,
    }
    n_sps = b[5] & 0x1F
    pos = 6
    if n_sps:
        (ln,) = struct.unpack_from(">H", b, pos)
        sps = b[pos + 2 : pos + 2 + ln]
        out["sps"] = parse_sps(sps)
    return out


def build_sps(
    width: int, height: int, *, profile: int = 66, level: int = 30,
    crop_right: int = 0, crop_bottom: int = 0, chroma: int = 1,
) -> bytes:
    """Write a valid SPS NAL for the given DISPLAY dims: macroblock counts
    are rounded up and the remainder is expressed as frame cropping (plus
    any extra crop requested), so parse_sps(build_sps(w, h)) returns
    exactly (w, h). High profiles emit the chroma/bit-depth branch."""
    if chroma == 1:
        cux, cuy = 2, 2  # frame_mbs_only = 1
    elif chroma == 3:
        cux, cuy = 1, 1
    elif chroma == 2:
        cux, cuy = 2, 1
    else:
        cux, cuy = 1, 1
    coded_w = width + crop_right * cux
    coded_h = height + crop_bottom * cuy
    pw_mbs = (coded_w + 15) // 16
    ph_units = (coded_h + 15) // 16
    pad_r = (pw_mbs * 16 - coded_w)
    pad_b = (ph_units * 16 - coded_h)
    if pad_r % cux or pad_b % cuy:
        raise NotImplementedError("dims not expressible with this chroma's crop units")
    total_crop_r = crop_right + pad_r // cux
    total_crop_b = crop_bottom + pad_b // cuy

    w = _EGWriter()
    w.u(profile, 8)
    w.u(0, 8)
    w.u(level, 8)
    w.ue(0)  # sps_id
    if profile in _HIGH_PROFILES:
        w.ue(chroma)
        if chroma == 3:
            w.u(0, 1)
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)
        w.u(0, 1)
        w.u(0, 1)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # poc type 0
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(pw_mbs - 1)
    w.ue(ph_units - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    if total_crop_r or total_crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(total_crop_r)
        w.ue(0)
        w.ue(total_crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # no VUI
    return bytes([0x67]) + _add_emulation(w.getvalue())  # NAL header: SPS


def build_avcc(sps: bytes, *, level: int = 30, profile: int = 66) -> bytes:
    """Wrap one SPS (and a minimal PPS) as an avcC payload."""
    pps = bytes([0x68, 0xCE, 0x38, 0x80])  # minimal valid-shaped PPS NAL
    return (
        bytes([1, profile, 0, level, 0xFF, 0xE1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1]) + struct.pack(">H", len(pps)) + pps
    )
