"""Posting-block codecs: delta + varint (LEB128) and delta + fixed-width packed.

Mirrors the *role* of the reference's compressed structures — varint/zint
payload codecs (reference: doc/technical/index-formats/integrated.md:82-100)
and the adaptive 1/2/3/4-byte token codec
(engine/.../codec/TokensCodec.java:14-46) — with a brand-new numpy-vectorized
implementation (no per-element Python in either direction).

Layout per posting block (one row of the postings table):
    doc_ids   : delta-encoded (first value absolute) then varint
    tfs       : varint (values >= 1)
    positions : per-doc position lists concatenated; each doc's positions are
                delta-encoded within the doc, then the whole stream varint'd.
                Per-doc lengths are exactly the tfs, so no extra length array.

All arrays are int64 on the numpy side.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- varint ----


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64 array, fully vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (at least 1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    # 64 bits -> at most 10 groups; compute bit length via successive shifts
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        nbits[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    nbits += 1  # bit_length (>=1 even for 0)
    ngroups = (nbits + 6) // 7
    total = int(ngroups.sum())
    out = np.empty(total, dtype=np.uint8)
    # position of each byte within its value
    starts = np.concatenate(([0], np.cumsum(ngroups)[:-1]))
    idx = np.arange(total, dtype=np.int64)
    owner = np.repeat(np.arange(v.size, dtype=np.int64), ngroups)
    within = idx - starts[owner]
    shifted = v[owner] >> (within.astype(np.uint64) * np.uint64(7))
    out[:] = (shifted & np.uint64(0x7F)).astype(np.uint8)
    is_last = within == (ngroups[owner] - 1)
    out[~is_last] |= 0x80
    return out.tobytes()


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte count (vectorized) — lets callers slice a bulk-
    encoded stream at arbitrary value boundaries without re-encoding."""
    v = np.asarray(values, dtype=np.uint64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        nbits[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    nbits += 1
    return (nbits + 6) // 7


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to an int64 array, fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    is_last = (b & 0x80) == 0
    n_values = int(is_last.sum())
    # group id per byte: 0-based index of the value this byte belongs to
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last)[:-1]
    # position of byte within its group
    starts = np.zeros(n_values, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[1:] = ends[:-1] + 1
    within = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b & 0x7F).astype(np.uint64) << (within.astype(np.uint64) * np.uint64(7))
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, group, contrib)
    return out.astype(np.int64)


# ----------------------------------------------------------------- delta ----


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    v = np.asarray(sorted_vals, dtype=np.int64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.int64)
    return np.cumsum(d)


def delta_encode_segmented(
    values: np.ndarray, seg_lengths: np.ndarray | None, seg_starts: np.ndarray | None = None
) -> np.ndarray:
    """Delta-encode within consecutive segments (per-doc position lists).
    Segments given as lengths OR directly as start indexes."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    if seg_starts is not None:
        starts = np.asarray(seg_starts, dtype=np.int64)
    else:
        starts = np.concatenate(([0], np.cumsum(seg_lengths)[:-1])).astype(np.int64)
    starts = starts[starts < v.size]
    out[starts] = v[starts]  # reset at each segment start (absolute value)
    return out


def delta_decode_segmented(deltas: np.ndarray, seg_lengths: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode_segmented, vectorized via offset-corrected cumsum."""
    d = np.asarray(deltas, dtype=np.int64)
    if d.size == 0:
        return d
    seg_lengths = np.asarray(seg_lengths, dtype=np.int64)
    seg_lengths = seg_lengths[seg_lengths > 0]
    starts = np.concatenate(([0], np.cumsum(seg_lengths)[:-1]))
    cs = np.cumsum(d)
    # value at segment start must be d[start]; subtract the running total
    # accumulated before each segment from every element of that segment
    correction = np.repeat(cs[starts] - d[starts], seg_lengths)
    return cs - correction


# ------------------------------------------------------------ block codec ---


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, positions: np.ndarray | None):
    """Encode one posting block. Returns (doc_ids_b, tfs_b, positions_b)."""
    doc_b = varint_encode(delta_encode(doc_ids))
    tf_b = varint_encode(np.asarray(tfs, dtype=np.int64))
    if positions is None or len(positions) == 0:
        pos_b = b""
    else:
        pos_b = varint_encode(delta_encode_segmented(positions, np.asarray(tfs)))
    return doc_b, tf_b, pos_b


def decode_block(doc_b: bytes, tf_b: bytes, pos_b: bytes | None):
    """Decode one posting block. Returns (doc_ids, tfs, positions|None)."""
    doc_ids = delta_decode(varint_decode(doc_b))
    tfs = varint_decode(tf_b)
    positions = None
    if pos_b:
        positions = delta_decode_segmented(varint_decode(pos_b), tfs)
    return doc_ids, tfs, positions
