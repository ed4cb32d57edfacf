"""Multimodal codecs (multimodal.py): REAL numpy/stdlib decoders for
uncompressed BMP / binary PNM / PCM WAV, round-tripped against the
deterministic encoders, plus the Arrow-batched mapInPandas feature kernels
(image_features / audio_metadata) over mixed decodable/undecodable payloads.
The honest boundary — compressed codecs raise NotImplementedError — is
asserted too."""

import numpy as np
import pytest

from blacklab_spark import multimodal as M


# ---------------------------------------------------------------- BMP ----


def test_bmp_roundtrip_dims_and_fill():
    b = M.encode_bmp(7, 5, 200)
    d = M.decode_bmp(b)
    assert (d["width"], d["height"], d["channels"]) == (7, 5, 3)
    assert d["pixels"].shape == (5, 7, 3)
    assert float(d["pixels"].mean()) == 200.0


def test_bmp_row_padding_exact():
    # width 5 * 3 bytes = 15 -> 1 pad byte per row; pad must NOT leak into
    # pixels (pad bytes are 0, fill is 255 — any leak drags the mean down)
    d = M.decode_bmp(M.encode_bmp(5, 4, 255))
    assert float(d["pixels"].min()) == 255.0


def test_bmp_bottom_up_and_top_down():
    import struct

    b = bytearray(M.encode_bmp(2, 2, 0))
    # hand-paint: bottom-up BMP, first stored row = BOTTOM image row.
    # rows are 2*3=6 bytes + 2 pad. Set stored row 0 pixel 0 blue=9.
    off = struct.unpack_from("<I", b, 10)[0]
    b[off] = 9  # blue channel, stored row 0, col 0
    d = M.decode_bmp(bytes(b))
    # decoded RGB: bottom row is index h-1 -> pixel [1,0], blue = channel 2
    assert d["pixels"][1, 0, 2] == 9 and d["pixels"][0, 0, 2] == 0
    # top-down variant: negative height in the DIB header
    struct.pack_into("<i", b, 22, -2)
    d2 = M.decode_bmp(bytes(b))
    assert d2["pixels"][0, 0, 2] == 9 and d2["pixels"][1, 0, 2] == 0


def test_bmp_32bit():
    import struct

    # synthesize a 32-bit BMP: 2x1 BGRA
    off = 54
    header = struct.pack("<2sIHHI", b"BM", off + 8, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 32, 0, 8, 0, 0, 0, 0)
    pix = bytes([10, 20, 30, 40, 50, 60, 70, 80])  # BGRA BGRA
    d = M.decode_bmp(header + dib + pix)
    assert d["channels"] == 4
    assert list(d["pixels"][0, 0]) == [30, 20, 10, 40]  # RGBA
    assert list(d["pixels"][0, 1]) == [70, 60, 50, 80]


def test_bmp_unsupported_variants():
    import struct

    b = bytearray(M.encode_bmp(2, 2, 0))
    struct.pack_into("<H", b, 28, 8)  # 8 bpp palette
    with pytest.raises(NotImplementedError):
        M.decode_bmp(bytes(b))
    assert M.decode_bmp(b"not a bmp at all, way too short?") is None


# ---------------------------------------------------------------- PNM ----


def test_pnm_ppm_with_comment():
    ppm = b"P6\n# a comment line\n4 2\n255\n" + bytes(range(24))
    d = M.decode_pnm(ppm)
    assert (d["width"], d["height"], d["channels"]) == (4, 2, 3)
    assert int(d["pixels"].sum()) == sum(range(24))


def test_pnm_pgm_grayscale():
    pgm = b"P5 3 2 255 " + bytes([1, 2, 3, 4, 5, 6])
    d = M.decode_pnm(pgm)
    assert (d["width"], d["height"], d["channels"]) == (3, 2, 1)
    assert list(d["pixels"].ravel()) == [1, 2, 3, 4, 5, 6]


def test_pnm_rejects_truncated_and_16bit():
    assert M.decode_pnm(b"P6\n4 2\n255\n" + b"\x00" * 5) is None  # short body
    with pytest.raises(NotImplementedError):
        M.decode_pnm(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    assert M.decode_pnm(b"plain text") is None


# ------------------------------------------------------- magic dispatch ----


def test_decode_image_dispatch_and_honest_boundary():
    assert M.decode_image(M.encode_bmp(3, 3, 9))["width"] == 3
    assert M.decode_image(b"some document text") is None
    # PNG/JPEG/GIF/lossless-WebP are real decoders now; the honest
    # NotImplementedError boundary is lossy WebP (VP8) and video bitstreams.
    import struct as _s

    lossy = (b"RIFF" + _s.pack("<I", 16) + b"WEBP"
             + b"VP8 " + _s.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        M.decode_image(lossy)
    from blacklab_spark.vp8l import encode_webp_lossless

    webp = encode_webp_lossless(np.full((2, 5, 3), 77, np.uint8))
    assert M.decode_image(webp)["width"] == 5  # lossless decodes for real
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG\r\n\x1a\n1234")  # truncated PNG
    with pytest.raises((ValueError, IndexError, NotImplementedError)):
        M.decode_image(b"\xff\xd8\xff\xe0more")  # truncated JPEG


def test_resize_nearest():
    px = M.decode_pnm(b"P5 4 4 255 " + bytes(range(16)))["pixels"]
    r = M.resize_nearest(px, 2, 2)
    assert r.shape == (2, 2, 1)
    assert list(r.ravel()) == [0, 2, 8, 10]  # every-other gather
    up = M.resize_nearest(px, 8, 8)
    assert up.shape == (8, 8, 1) and up[0, 0, 0] == 0 and up[7, 7, 0] == 15


# ---------------------------------------------------------------- WAV ----


def test_wav_roundtrip_mono_and_stereo():
    d = M.decode_wav(M.encode_wav(16000, 160, 1, 1234))
    assert d == {
        "sample_rate": 16000, "n_channels": 1, "n_frames": 160,
        "duration_ms": 10, "rms": 1234.0,
    }
    d2 = M.decode_wav(M.encode_wav(44100, 441, 2, 99))
    assert d2["n_channels"] == 2 and d2["n_frames"] == 441
    assert d2["duration_ms"] == 10 and d2["rms"] == 99.0


def test_wav_rms_nonconstant():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.array([3, -4], dtype="<i2").tobytes())
    d = M.decode_wav(buf.getvalue())
    assert d["rms"] == pytest.approx(np.sqrt((9 + 16) / 2))


def test_wav_rejects_non_wav():
    assert M.decode_wav(b"RIFFxxxxNOPE") is None
    assert M.decode_wav(b"just text") is None


# ----------------------------------------------- distributed kernels ----


def test_image_features_mixed_payloads(spark):
    rows = [
        (0, M.encode_bmp(4, 3, 50)),
        (1, b"P5 2 2 255 " + bytes([10, 20, 30, 40])),
        (2, b"not an image"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in M.image_features(df).collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["channels"]) == (4, 3, 3)
    assert out[0]["mean_px"] == 50.0
    assert (out[1]["width"], out[1]["channels"]) == (2, 1)
    assert out[1]["mean_px"] == 25.0
    assert out[2]["width"] is None and out[3]["width"] is None


def test_audio_metadata_mixed_payloads(spark):
    rows = [
        (0, M.encode_wav(8000, 80, 1, 700)),
        (1, b"definitely not audio"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in M.audio_metadata(df).collect()}
    assert out[0]["sample_rate"] == 8000 and out[0]["duration_ms"] == 10
    assert out[0]["rms"] == 700.0
    assert out[1]["sample_rate"] is None


def test_decode_image_real_batch():
    import pandas as pd

    payloads = pd.Series([M.encode_bmp(5, 2, 7), M.encode_bmp(3, 3, 8)])
    meta = M.decode_image_real(payloads)
    assert list(meta["width"]) == [5, 3] and list(meta["height"]) == [2, 3]
    with pytest.raises(NotImplementedError):
        M.decode_image_real(pd.Series([b"utf-8 text payload"]))


# ---------------------------------------------------------------- GIF ----
# Pure python/numpy LZW (GIF87a/89a): round-trips against encode_gif, which
# uses a real LZW compressor — so decoder and encoder check each other.


def _pal(n, seed):
    return np.random.RandomState(seed).randint(0, 256, (n, 3)).astype(np.uint8)


def test_gif_roundtrip_plain():
    pal = _pal(16, 42)
    fr = np.random.RandomState(1).randint(0, 16, (23, 37)).astype(np.uint8)
    d = M.decode_image(M.encode_gif([fr], pal))
    assert (d["width"], d["height"], d["channels"]) == (37, 23, 3)
    assert np.array_equal(d["pixels"], pal[fr])
    assert d["n_frames"] == 1


def test_gif_interlaced():
    pal = _pal(16, 42)
    fr = np.random.RandomState(2).randint(0, 16, (30, 11)).astype(np.uint8)
    d = M.decode_gif(M.encode_gif([fr], pal, interlace=True))
    assert np.array_equal(d["pixels"], pal[fr])


def test_gif_transparency_alpha_plane():
    pal = _pal(8, 3)
    fr = np.random.RandomState(3).randint(0, 8, (9, 9)).astype(np.uint8)
    d = M.decode_gif(M.encode_gif([fr], pal, transparent_idx=5))
    assert d["channels"] == 4
    assert np.array_equal(d["pixels"][..., :3], pal[fr])
    assert np.array_equal(d["pixels"][..., 3] == 0, fr == 5)


def test_gif_multiframe_first_frame_and_count():
    pal = _pal(4, 4)
    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 4, (6, 7)).astype(np.uint8) for _ in range(3)]
    d = M.decode_gif(M.encode_gif(frames, pal))
    assert d["n_frames"] == 3
    assert np.array_equal(d["pixels"], pal[frames[0]])


def test_gif_lzw_dict_overflow_and_runs():
    # 256-entry palette + 64k random pixels forces 12-bit codes and clear
    # codes mid-stream; long runs force deep prefix chains.
    pal = _pal(256, 7)
    rng = np.random.RandomState(7)
    big = rng.randint(0, 256, (256, 256)).astype(np.uint8)
    assert np.array_equal(M.decode_gif(M.encode_gif([big], pal))["pixels"], pal[big])
    runs = np.repeat(np.arange(256, dtype=np.uint8), 300).reshape(300, 256).T.copy()
    assert np.array_equal(M.decode_gif(M.encode_gif([runs], pal))["pixels"], pal[runs])


def test_gif_rejects_non_gif():
    assert M.decode_gif(b"not a gif at all") is None
    assert M.decode_gif(b"GIF00junkjunk") is None
