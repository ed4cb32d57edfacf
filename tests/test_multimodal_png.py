"""REAL PNG decode (multimodal.decode_png): pure zlib+numpy baseline codec —
all five row filters, color types 0/2/3/4/6, bit depths 1/2/4/8/16, Adam7
interlace, PLTE/tRNS. Round-tripped against the deterministic encode_png
synth; 16-bit and tRNS vectors are hand-assembled so the decoder, not the
encoder, is the thing under test."""

import struct
import zlib

import numpy as np
import pytest

from blacklab_spark import multimodal as M


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def _roundtrip(px, **kw):
    d = M.decode_png(M.encode_png(px, **kw))
    assert (d["height"], d["width"]) == px.shape[:2]
    return d


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_rgb_all_filters(filters):
    rng = np.random.RandomState(sum(filters) + 11)
    px = rng.randint(0, 256, (23, 17, 3), np.uint8)
    assert np.array_equal(_roundtrip(px, filters=filters)["pixels"], px)


@pytest.mark.parametrize("channels,ctype_name", [(1, "gray"), (2, "gray+alpha"), (4, "rgba")])
def test_other_color_types(channels, ctype_name):
    rng = np.random.RandomState(channels)
    px = rng.randint(0, 256, (9, 31, channels), np.uint8)
    d = _roundtrip(px, filters=[4, 3, 1, 2])
    assert d["channels"] == channels
    assert np.array_equal(d["pixels"], px)


def test_palette_expands_to_rgb():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (16, 3), np.uint8)
    idx = rng.randint(0, 16, (11, 13, 1), np.uint8)
    d = _roundtrip(idx, palette=pal, filters=[0, 2])
    assert d["channels"] == 3
    assert np.array_equal(d["pixels"], pal[idx[:, :, 0]])


def test_palette_trns_alpha():
    rng = np.random.RandomState(4)
    pal = rng.randint(0, 256, (4, 3), np.uint8)
    idx = rng.randint(0, 4, (9, 7, 1), np.uint8)
    b = M.encode_png(idx, palette=pal, depth=2)
    i = b.index(b"IDAT") - 4  # splice tRNS between PLTE and IDAT
    b = b[:i] + _chunk(b"tRNS", bytes([10, 200])) + b[i:]
    d = M.decode_png(b)
    assert d["channels"] == 4
    want_alpha = np.array([10, 200, 255, 255], np.uint8)[idx[:, :, 0]]
    assert np.array_equal(d["pixels"][:, :, 3], want_alpha)
    assert np.array_equal(d["pixels"][:, :, :3], pal[idx[:, :, 0]])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_scales_to_255(depth):
    rng = np.random.RandomState(depth)
    maxv = (1 << depth) - 1
    vals = rng.randint(0, maxv + 1, (8, 19, 1), np.uint8)
    d = _roundtrip(vals, depth=depth)
    want = (vals.astype(np.uint16) * 255 // maxv).astype(np.uint8)
    assert np.array_equal(d["pixels"], want)


def test_16bit_takes_high_byte():
    rng = np.random.RandomState(16)
    h, w = 3, 4
    s16 = rng.randint(0, 65536, (h, w), np.uint32)
    rows = b"".join(b"\x00" + s16[y].astype(">u2").tobytes() for y in range(h))
    png = (
        M._PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(rows))
        + _chunk(b"IEND", b"")
    )
    d = M.decode_png(png)
    assert np.array_equal(d["pixels"][:, :, 0], (s16 >> 8).astype(np.uint8))


@pytest.mark.parametrize("filters", [[0], [1, 2, 3, 4]])
def test_adam7_interlace(filters):
    rng = np.random.RandomState(len(filters))
    # 21x14 exercises partial passes; 16x16 exercises full blocks
    for shape in [(21, 14, 3), (16, 16, 4), (1, 1, 3), (7, 3, 1)]:
        px = rng.randint(0, 256, shape, np.uint8)
        d = _roundtrip(px, interlace=1, filters=filters)
        assert np.array_equal(d["pixels"], px), shape


def test_multi_idat_chunks():
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (6, 6, 3), np.uint8)
    b = M.encode_png(px, filters=[2])
    # split the IDAT payload across two chunks
    i = b.index(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", b, i)
    payload = b[i + 8 : i + 8 + ln]
    rest = b[i + 12 + ln :]
    b2 = b[:i] + _chunk(b"IDAT", payload[:5]) + _chunk(b"IDAT", payload[5:]) + rest
    assert np.array_equal(M.decode_png(b2)["pixels"], px)


def test_dispatch_and_non_png():
    assert M.decode_png(b"not a png") is None
    px = np.full((4, 5, 3), 77, np.uint8)
    d = M.decode_image(M.encode_png(px))
    assert (d["width"], d["height"], d["channels"]) == (5, 4, 3)
    # JPEG is a real decoder now too; truncated JPEG bytes fail loudly and
    # the honest NotImplementedError boundary is WebP/video (test_multimodal)
    with pytest.raises((ValueError, IndexError)):
        M.decode_image(b"\xff\xd8\xe0rest")


def test_image_features_over_png_payloads(spark):
    """The Arrow-batched mapInPandas pipeline decodes PNG payloads end-to-end
    (constant fill -> mean_px == fill exactly)."""
    import pandas as pd

    rows = [(i, M.encode_png(
        np.full((3 + i % 5, 4 + i % 7, 3), i % 256, np.uint8),
        filters=[i % 5],
    )) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in M.image_features(df).collect()}
    for i in range(20):
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (4 + i % 7, 3 + i % 5, 3)
        assert r["mean_px"] == float(i % 256)
