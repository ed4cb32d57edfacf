import numpy as np
import pytest

from blacklab_spark.codec import (
    decode_block,
    delta_decode,
    delta_decode_segmented,
    delta_encode,
    delta_encode_segmented,
    encode_block,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**62], dtype=np.int64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert varint_encode(np.empty(0, np.int64)) == b""
    assert varint_decode(b"").size == 0


@pytest.mark.parametrize("seed", range(5))
def test_varint_random(seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2**40, size=1000)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_delta_roundtrip():
    v = np.array([3, 9, 10, 10000, 10001], dtype=np.int64)
    assert (delta_decode(delta_encode(v)) == v).all()


def test_delta_segmented_roundtrip():
    rng = np.random.default_rng(7)
    lens = rng.integers(1, 9, size=50)
    vals = np.concatenate([np.sort(rng.choice(300, size=n, replace=False)) for n in lens])
    enc = delta_encode_segmented(vals, lens)
    assert (delta_decode_segmented(enc, lens) == vals).all()


def test_block_roundtrip():
    rng = np.random.default_rng(1)
    docs = np.sort(rng.choice(10**12, size=128, replace=False))
    tfs = rng.integers(1, 6, 128)
    pos = np.concatenate([np.sort(rng.choice(400, size=t, replace=False)) for t in tfs])
    db, tb, pb = encode_block(docs, tfs, pos)
    d2, t2, p2 = decode_block(db, tb, pb)
    assert (d2 == docs).all() and (t2 == tfs).all() and (p2 == pos).all()


def test_varint_is_compact():
    # small deltas ~ 1 byte each
    docs = np.arange(0, 128 * 50, 50, dtype=np.int64)
    enc = varint_encode(delta_encode(docs))
    assert len(enc) <= 2 * 128
