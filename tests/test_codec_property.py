"""Property-based codec tests (hypothesis): the posting-block codecs must
round-trip ANY valid input, not just the fixtures — mirrors the reference's
randomized codec tests (core/util TestsUtil + codec unit tests)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from blacklab_spark.codec import (
    decode_block,
    delta_decode,
    delta_decode_segmented,
    delta_encode,
    delta_encode_segmented,
    encode_block,
    varint_decode,
    varint_encode,
    varint_lengths,
)

nonneg = st.integers(min_value=0, max_value=2**62)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(nonneg, max_size=300))
def test_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(nonneg, max_size=300))
def test_varint_lengths_slice(vals):
    """Per-value lengths partition the bulk stream: slicing at the reported
    boundaries decodes each value independently."""
    v = np.array(vals, dtype=np.int64)
    buf = varint_encode(v)
    lens = varint_lengths(v)
    assert int(lens.sum()) == len(buf)
    off = 0
    for val, ln in zip(v, lens):
        got = varint_decode(buf[off : off + int(ln)])
        assert got.size == 1 and got[0] == val
        off += int(ln)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_delta_roundtrip_sorted(vals):
    v = np.sort(np.array(vals, dtype=np.int64))
    assert np.array_equal(delta_decode(delta_encode(v)), v)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=2**30),
            min_size=1,
            max_size=20,
        ),
        max_size=30,
    )
)
def test_delta_segmented_roundtrip(segs):
    """Per-doc position lists: each segment sorted internally, deltas reset
    at segment starts; both length- and start-based encodes round-trip."""
    segs = [np.sort(np.array(s, dtype=np.int64)) for s in segs]
    flat = (
        np.concatenate(segs) if segs else np.empty(0, dtype=np.int64)
    )
    lens = np.array([len(s) for s in segs], dtype=np.int64)
    enc = delta_encode_segmented(flat, lens)
    assert np.array_equal(delta_decode_segmented(enc, lens), flat)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else lens
    enc2 = delta_encode_segmented(flat, None, seg_starts=starts)
    assert np.array_equal(enc, enc2)


@settings(max_examples=100, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),  # doc id
            st.lists(
                st.integers(min_value=0, max_value=2**20),  # positions
                min_size=1,
                max_size=10,
            ),
        ),
        max_size=40,
    )
)
def test_block_roundtrip(postings):
    """Whole-block encode/decode: sorted unique doc ids, tf = len(positions),
    per-doc sorted positions."""
    by_doc = {}
    for d, ps in postings:
        by_doc.setdefault(d, []).extend(ps)
    docs = np.array(sorted(by_doc), dtype=np.int64)
    tfs = np.array([len(by_doc[d]) for d in docs], dtype=np.int64)
    pos = (
        np.concatenate([np.sort(np.array(by_doc[d], dtype=np.int64)) for d in docs])
        if len(docs)
        else None
    )
    db, tb, pb = encode_block(docs, tfs, pos)
    d2, t2, p2 = decode_block(db, tb, pb)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)
    if pos is not None and len(pos):
        assert np.array_equal(p2, pos)


# -------------------------------------------------------------- PForDelta ---

from blacklab_spark.codec import decode_ints, encode_ints, pfor_encode  # noqa: E402


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=0, max_value=2**53 - 1), max_size=400))
def test_pfor_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(decode_ints(pfor_encode(v)), v)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=300),
    st.lists(st.integers(min_value=2**40, max_value=2**52), max_size=8),
)
def test_pfor_outlier_patching(small, outliers):
    """The exception path: a few huge values among small ones must patch
    exactly and keep the packed width small."""
    v = np.array(small + outliers, dtype=np.int64)
    rng = np.random.RandomState(len(v))
    rng.shuffle(v)
    blob = pfor_encode(v)
    assert np.array_equal(decode_ints(blob), v)
    if outliers and len(small) >= 32 * len(outliers):
        # chosen width must not blow up to outlier size: blob beats 8B/value
        assert len(blob) < 8 * v.size


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=100))
def test_encode_ints_tagged_dispatch(vals):
    """encode_ints('pfor') must fall back to the varint blob whenever values
    are out of pfor range (negative / >= 2**53) and round-trip either way."""
    v = np.array(vals, dtype=np.int64)
    for codec in ("varint", "pfor"):
        blob = encode_ints(v, codec)
        assert blob[0] in (0x01, 0x02)
        assert np.array_equal(decode_ints(blob), v)
