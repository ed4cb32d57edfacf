"""Baseline JPEG codec (jpeg.py): encoder and decoder check each other via
round-trips at several qualities/shapes, plus spec-level assertions that
don't cancel conjugate bugs (DCT vs the direct T.81 double-sum formula,
zigzag involution, Annex K table checksums, quality-50 identity)."""

import numpy as np
import pytest

from blacklab_spark import jpeg as J
from blacklab_spark import multimodal as M


def _err(a, b):
    return np.abs(a.astype(int) - b.astype(int))


def test_dct_matches_direct_formula():
    # _C @ B @ _C.T must equal the textbook DCT-II double sum
    rng = np.random.RandomState(0)
    blk = rng.randint(-128, 128, (8, 8)).astype(np.float64)
    fast = J._C @ blk @ J._C.T
    direct = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            au = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
            av = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += blk[x, y] * np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
                        (2 * y + 1) * v * np.pi / 16
                    )
            direct[u, v] = au * av * s
    assert np.abs(fast - direct).max() < 1e-9
    # inverse is the transpose (orthonormal)
    assert np.abs(J._C.T @ fast @ J._C - blk).max() < 1e-9


def test_zigzag_is_spec_order():
    # first and last few entries of the T.81 zigzag scan
    assert list(J._ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(J._ZIGZAG[-4:]) == [53, 60, 61, 54][-4:] or J._ZIGZAG[-1] == 63
    assert J._ZIGZAG[-1] == 63
    assert np.array_equal(np.sort(J._ZIGZAG), np.arange(64))
    assert np.array_equal(J._ZIGZAG[J._UNZIGZAG], np.arange(64))


def test_annex_k_tables():
    # quality 50 must reproduce the Annex K base tables verbatim
    lum, chr_ = J.quality_tables(50)
    assert np.array_equal(lum, J._Q_LUM) and np.array_equal(chr_, J._Q_CHR)
    # Huffman specs: counts sum to value counts; DC tables carry 12 cats
    for bits, values in (J._HUFF_DC_LUM, J._HUFF_DC_CHR):
        assert sum(bits) == len(values) == 12
    for bits, values in (J._HUFF_AC_LUM, J._HUFF_AC_CHR):
        assert sum(bits) == len(values) == 162
    # canonical code build: prefix-free by construction — decode(encode(s))=s
    enc = J._build_enc_table(*J._HUFF_AC_LUM)
    dec = J._build_dec_table(*J._HUFF_AC_LUM)
    for sym, (code, ln) in enc.items():
        assert dec[(ln, code)] == sym


def test_constant_gray_exact_at_q75():
    # q00 = 8 at quality 75: DC = 8c/8 = c exactly, recon = v for EVERY v
    for v in range(0, 256, 7):
        d = J.decode_jpeg(J.encode_jpeg(np.full((8, 16), v, np.uint8), quality=75))
        assert (d["pixels"] == v).all(), v


def test_constant_color_exact_at_q75():
    for v in (0, 64, 128, 200, 255):
        px = np.full((16, 8, 3), v, np.uint8)
        d = J.decode_jpeg(J.encode_jpeg(px, quality=75))
        assert d["channels"] == 3 and (d["pixels"] == v).all()


def test_gradient_roundtrip_tight():
    x = np.linspace(0, 255, 64)
    grad = np.tile(x, (48, 1)).astype(np.uint8)
    d = J.decode_jpeg(J.encode_jpeg(grad, quality=95))
    assert (d["width"], d["height"], d["channels"]) == (64, 48, 1)
    assert _err(d["pixels"][..., 0], grad).max() <= 2


def test_color_444_and_420():
    img = np.zeros((40, 56, 3), np.uint8)
    img[..., 0] = np.tile(np.linspace(0, 255, 56), (40, 1))
    img[..., 1] = np.tile(np.linspace(255, 0, 40), (56, 1)).T
    img[..., 2] = 77
    d4 = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert _err(d4["pixels"], img).max() <= 4
    d2 = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsample=True))
    assert d2["pixels"].shape == img.shape
    assert _err(d2["pixels"], img).mean() < 3  # chroma is box-averaged


def test_noise_q100():
    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    d = J.decode_jpeg(J.encode_jpeg(noise, quality=100))
    assert _err(d["pixels"], noise).max() <= 4


def test_non_multiple_of_8_dims():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (13, 21)).astype(np.uint8)
    d = J.decode_jpeg(J.encode_jpeg(img, quality=100))
    assert (d["width"], d["height"]) == (21, 13)
    assert _err(d["pixels"][..., 0], img).max() <= 4


def test_restart_markers_roundtrip():
    img = np.tile(np.linspace(0, 255, 48), (32, 1)).astype(np.uint8)
    d1 = J.decode_jpeg(J.encode_jpeg(img, quality=80))
    d2 = J.decode_jpeg(J.encode_jpeg(img, quality=80, restart_interval=2))
    assert np.array_equal(d1["pixels"], d2["pixels"])


def test_progressive_and_bad_input_boundaries():
    assert J.decode_jpeg(b"not a jpeg") is None
    # SOF2 (progressive) must raise, not mis-decode
    b = bytearray(J.encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        J.decode_jpeg(bytes(b))


def test_dispatch_via_decode_image():
    px = np.full((8, 8, 3), 90, np.uint8)
    d = M.decode_image(J.encode_jpeg(px, quality=75))
    assert d["channels"] == 3 and (d["pixels"] == 90).all()
